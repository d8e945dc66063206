package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming transforms over the events stream. The reference
  * has no streaming surface (SURVEY §2.10); these are the beyond-reference
  * extension ops. Each transform takes a (possibly streaming) DataFrame
  * with columns (ts:timestamp, user_id, event_type, value) and returns a
  * plan valid for both `readStream` and batch execution — the same code
  * path is exercised by the batch oracle query q15 and the streaming specs.
  *
  * Scale notes: all aggregations are keyed by (window, type) or
  * (user, session) — state is bounded by the watermark horizon, so a
  * 1000-executor streaming job holds O(windows × keys) state, not O(events).
  */
object EventStreams {

  /** Tumbling 1-hour windows per event type, 2-hour watermark. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding windows (1 hour every 15 minutes). */
  def slidingValue(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .select(col("window.start").as("w_start"), col("n"), col("avg_value"))

  /** Session windows: 30-minute inactivity gap per user (built-in
    * session_window — state merges adjacent windows). */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming dedup by event_id within the watermark horizon. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom state machine via flatMapGroupsWithState: per-user running
    * totals emitted on every update (Update mode). State is one small
    * case class per active user — O(users), watermark-independent. */
  final case class UserStat(user_id: Long, n: Long, total: Double)

  def runningUserTotals(events: org.apache.spark.sql.Dataset[Event])
      : org.apache.spark.sql.Dataset[UserStat] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStat, UserStat](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserStat(uid, prev.n + batch.size,
            prev.total + batch.map(_.value).sum)
          state.update(next)
          Iterator.single(next)
      }
  }
}

/** Typed event row for the stateful transforms. */
final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
  event_type: String, value: Double)
