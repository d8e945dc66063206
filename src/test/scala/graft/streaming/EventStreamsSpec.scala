package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
  event_type: String, value: Double)

class EventStreamsSpec extends SparkSpec {

  private def t(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def runStream(name: String, build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      events: Seq[Ev], mode: String = "append") = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Ev]
    src.addData(events: _*)
    val q = build(src.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling hourly windows (streaming, complete mode)") {
    val events = Seq(
      Ev(1, t(5), 1, "click", 1.0), Ev(2, t(30), 1, "click", 2.0),
      Ev(3, t(65), 2, "view", 3.0), Ev(4, t(70), 2, "click", 4.0))
    val out = runStream("hourly", EventStreams.hourlyByType, events, "complete")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(out.toSet === Set(
      ("2024-01-01 00:00:00.0", "click", 2L),
      ("2024-01-01 01:00:00.0", "view", 1L),
      ("2024-01-01 01:00:00.0", "click", 1L)))
  }

  test("expiring state: idle users time out, state resets afterwards") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.runningUserTotalsExpiring(src.toDS(), idleMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("expiring").outputMode("update").start()
    // batch 1: user 1 active at t=0..10
    src.addData(Event(1, t(0), 1, "click", 1.0), Event(2, t(10), 1, "click", 2.0))
    q.processAllAvailable()
    // batch 2: a much later event (user 2) pushes the watermark (1h lag)
    // past user 1's last event + 30min idle -> user 1 expires
    src.addData(Event(3, t(200), 2, "view", 5.0))
    q.processAllAvailable()
    // batch 3: another event advances the watermark beyond t(100) so the
    // timeout actually fires, and user 1 returns -> state restarted
    src.addData(Event(4, t(400), 2, "view", 1.0))
    q.processAllAvailable()
    src.addData(Event(5, t(410), 1, "click", 9.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("expiring").as[EventStreams.UserStat].collect()
    // expiry row for user 1 carries the totals at timeout
    val expired = rows.filter(r => r.user_id == 1L && r.expired)
    assert(expired.nonEmpty && expired.head.n === 2 && expired.head.total === 3.0)
    // the post-expiry event starts a FRESH state (n=1), not n=3
    val after = rows.filter(r => r.user_id == 1L && r.n == 1L && r.total == 9.0)
    assert(after.nonEmpty, rows.mkString(", "))
  }

  test("stream-static join enriches against a broadcast dimension") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val src = MemoryStream[Ev]
    src.addData(Ev(1, t(5), 1, "click", 1.0), Ev(2, t(6), 2, "view", 2.0),
      Ev(3, t(7), 9, "view", 3.0)) // user 9 not in dim -> null tier
    val q = EventStreams.enrich(src.toDF(), dim, "user_id").writeStream
      .format("memory").queryName("enriched").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("enriched")
      .select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("-")).toMap
    assert(out === Map(1L -> "gold", 2L -> "basic", 3L -> "-"))
  }

  test("stream-stream join matches within the 1-hour event-time bound") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val lSrc = MemoryStream[Ev]
    val rSrc = MemoryStream[Ev]
    // left event at t=90 joins right events in [t=30, t=90] for same user
    lSrc.addData(Ev(10, t(90), 1, "click", 1.0), Ev(11, t(90), 2, "click", 1.0))
    rSrc.addData(
      Ev(20, t(80), 1, "imp", 2.0),  // in range -> match
      Ev(21, t(10), 1, "imp", 4.0),  // too old (> 1h before) -> no match
      Ev(22, t(95), 1, "imp", 8.0),  // after the left event -> no match
      Ev(23, t(85), 3, "imp", 16.0)) // different user -> no match
    val q = EventStreams.correlate(lSrc.toDF(), rSrc.toDF()).writeStream
      .format("memory").queryName("correlated").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("correlated")
      .select("l_id", "r_id", "pair_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSet === Set((10L, 20L, 3.0)))
  }

  test("stream-stream LEFT OUTER join: matches emit, nulls wait for the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val lSrc = MemoryStream[Ev]
    val rSrc = MemoryStream[Ev]
    val q = EventStreams.correlateOuter(lSrc.toDF(), rSrc.toDF()).writeStream
      .format("memory").queryName("outer_correlated").outputMode("append").start()
    // batch 1: one matchable left, one matchless left (user 2)
    lSrc.addData(Ev(10, t(90), 1, "click", 1.0), Ev(11, t(90), 2, "click", 1.0))
    rSrc.addData(Ev(20, t(80), 1, "imp", 2.0))
    q.processAllAvailable()
    val afterB1 = spark.table("outer_correlated")
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // the match emits immediately; the null row must NOT have emitted yet —
    // the watermark hasn't proven user 2 can't still match
    assert(afterB1.toSet === Set((10L, 20L)))
    // batch 2: far-future events on BOTH sides push both watermarks past
    // t(90) -> the unmatched left provably evicts and emits with null
    lSrc.addData(Ev(12, t(400), 9, "click", 1.0))
    rSrc.addData(Ev(29, t(400), 9, "imp", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("outer_correlated")
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSet === Set((10L, 20L), (11L, -1L), (12L, 29L)))
  }

  test("session windows: 30-min gap splits sessions") {
    val events = Seq(
      Ev(1, t(0), 1, "click", 1.0), Ev(2, t(10), 1, "click", 1.0),
      Ev(3, t(100), 1, "click", 1.0), // > 30 min after -> new session
      Ev(4, t(5), 2, "view", 1.0))
    val out = runStream("sessions", EventStreams.userSessions, events, "complete")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.count(_._1 == 1L) === 2) // two sessions for user 1
    assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq === Seq(1L, 2L))
    assert(out.count(_._1 == 2L) === 1)
  }

  test("session windows: events exactly one gap apart MERGE (q37's oracle rule)") {
    // the q37 oracle restates sessionization as gaps-and-islands splitting
    // strictly ABOVE the gap (`ts - lag(ts) > 30 min`) — valid only if
    // session_window's state merge treats a touching window [t+30m, ...)
    // as part of [t, t+30m). Pin that boundary here, in both engines.
    val events = Seq(
      Ev(1, t(0), 1, "click", 1.0),
      Ev(2, t(30), 1, "click", 1.0),  // exactly 30 min later -> same session
      Ev(3, t(61), 1, "click", 1.0))  // 31 min after #2 -> new session
    val out = runStream("sessions_edge", EventStreams.userSessions, events,
        "complete")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq.sorted === Seq((1L, 1L), (1L, 2L)),
      "exactly-gap events must merge; strictly-past-gap events must split")
    // batch session_window (q37's comparison side) agrees byte-for-byte
    import spark.implicits._
    val batch = EventStreams.userSessions(events.toDF())
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(batch.toSeq.sorted === out.toSeq.sorted)
  }

  test("streaming dedup by event_id within watermark") {
    val events = Seq(
      Ev(1, t(0), 1, "click", 1.0), Ev(1, t(1), 1, "click", 1.0),
      Ev(2, t(2), 1, "view", 2.0))
    val out = runStream("dedup", EventStreams.dedupEvents, events)
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("flatMapGroupsWithState: running per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.runningUserTotals(src.toDS()).writeStream
      .format("memory").queryName("running").outputMode("update").start()
    src.addData(Event(1, t(0), 1, "click", 2.0), Event(2, t(1), 1, "click", 3.0))
    q.processAllAvailable()
    src.addData(Event(3, t(2), 1, "view", 5.0), Event(4, t(3), 2, "view", 7.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("running")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // last emission per user reflects cumulative state
    assert(rows.contains((1L, 3L, 10.0))) // 2+3 then +5 across batches
    assert(rows.contains((2L, 1L, 7.0)))
  }

  test("transformWithState matches the legacy flatMapGroupsWithState kernel") {
    // TWS only runs on the RocksDB state store backend: isolated clone
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    implicit val sq = s2.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.runningUserTotalsTws(src.toDS()).toDF().writeStream
      .format("memory").queryName("running_tws").outputMode("update").start()
    src.addData(Event(1, t(0), 1, "click", 2.0), Event(2, t(1), 1, "click", 3.0))
    q.processAllAvailable()
    src.addData(Event(3, t(2), 1, "view", 5.0), Event(4, t(3), 2, "view", 7.0))
    q.processAllAvailable()
    q.stop()
    val rows = s2.table("running_tws")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical cumulative emissions to the legacy API's test above
    assert(rows.contains((1L, 3L, 10.0)))
    assert(rows.contains((2L, 1L, 7.0)))
  }

  test("streaming and batch hourly aggregation agree on the corpus") {
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", col("ts").cast("timestamp"))
    val fromStream = EventStreams.hourlyByType(batch) // same plan, batch exec
      .select("hour", "event_type", "n")
    val direct = batch.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(fromStream.except(direct).isEmpty && direct.except(fromStream).isEmpty)
  }
}
