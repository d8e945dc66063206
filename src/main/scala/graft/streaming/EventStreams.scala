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

  /** Stream-static join: enrich the event stream against a static
    * dimension (e.g. a user/label table). The static side is planned per
    * micro-batch like any batch join — broadcast when small — and needs
    * no watermark or state. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream inner join within a time bound: match each event with
    * the other stream's rows for the same user no older than 1 hour.
    * Both sides are watermarked and the join carries an explicit event-
    * time range, so state on each side is bounded by watermark + range —
    * the canonical scalable shape for click/impression-style joins. */
  def correlate(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withWatermark("ts", "2 hours")
      .select(col("event_id").as("l_id"), col("user_id"),
        col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", "2 hours")
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr("INTERVAL 1 HOUR") &&
        col("r_ts") <= col("l_ts"))
      .select(col("l_id"), col("r_id"), col("user_id"),
        col("l_ts"), col("r_ts"), (col("l_value") + col("r_value")).as("pair_value"))
  }

  /** [[correlate]]'s LEFT OUTER form — the join whose state semantics
    * differ in kind, not degree: matched pairs emit immediately, but a
    * left row's null-augmented result can only emit once the watermark
    * proves no future right row can match it (right-side rows with
    * r_ts ≤ l_ts stop arriving when the watermark passes l_ts). State
    * on both sides stays bounded by watermark + range exactly as in the
    * inner form; the OUTPUT is what waits on the watermark. */
  def correlateOuter(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withWatermark("ts", "2 hours")
      .select(col("event_id").as("l_id"), col("user_id"),
        col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.withWatermark("ts", "2 hours")
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr("INTERVAL 1 HOUR") &&
        col("r_ts") <= col("l_ts"),
      "left_outer")
      .select(col("l_id"), col("r_id"), col("user_id"),
        col("l_ts"), col("r_ts"))
  }

  /** Custom state machine via flatMapGroupsWithState: per-user running
    * totals emitted on every update (Update mode). State is one small
    * case class per active user — O(users), watermark-independent.
    * `expired` is false for live updates; the expiring variant emits the
    * final stat with `expired = true` (an explicit column: sign-encoding
    * the key was ambiguous for user_id 0). */
  final case class UserStat(user_id: Long, n: Long, total: Double,
    expired: Boolean = false)

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

  /** As [[runningUserTotals]] but with BOUNDED state: a user idle past
    * `idle` (event time, enforced by the watermark) times out — the final
    * stat is emitted with `expired = true` and the state is removed, so
    * the store holds only ACTIVE users. On an unbounded key space (every
    * user ever seen) the NoTimeout form grows forever; this is the shape
    * a production stream runs. */
  def runningUserTotalsExpiring(events: org.apache.spark.sql.Dataset[Event],
      idleMs: Long = 60L * 60 * 1000)
      : org.apache.spark.sql.Dataset[UserStat] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStat, UserStat](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserStat]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(last.copy(expired = true))
          } else {
            val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
            val batch = rows.toSeq
            val next = UserStat(uid, prev.n + batch.size,
              prev.total + batch.map(_.value).sum)
            state.update(next)
            // expire when the watermark passes the user's last event + idle
            val maxTs = batch.map(_.ts.getTime).max
            state.setTimeoutTimestamp(maxTs + idleMs)
            Iterator.single(next)
          }
      }
  }

  /** [[runningUserTotals]] re-expressed on Spark 4's `transformWithState`
    * — the arbitrary-state API that supersedes `flatMapGroupsWithState`:
    * named typed state variables acquired from a
    * `StatefulProcessorHandle` in `init` (composable — a processor can
    * hold several; TTL per variable), explicit `TimeMode`, and per-batch
    * `handleInputRows`. Requires the RocksDB state store provider (the
    * only backend TWS supports — q66 sets it on its cloned session).
    * Semantics are identical to the legacy form by construction, which
    * the q66 gate pins against the batch aggregate. */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserStat] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var st: ValueState[UserStat] = _
    override def init(outputMode: streaming.OutputMode,
        timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserStat]("totals",
        Encoders.product[UserStat], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: streaming.TimerValues): Iterator[UserStat] = {
      val prev = if (st.exists()) st.get() else UserStat(key, 0L, 0.0)
      val batch = rows.toSeq
      val next = UserStat(key, prev.n + batch.size,
        prev.total + batch.map(_.value).sum)
      st.update(next)
      Iterator.single(next)
    }
  }

  def runningUserTotalsTws(events: org.apache.spark.sql.Dataset[Event])
      : org.apache.spark.sql.Dataset[UserStat] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}

/** Typed event row for the stateful transforms. */
final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
  event_type: String, value: Double)
