package graft.plans

import graft.SparkSpec
import graft.operators.Relational
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("custom exec agrees with the union-sort-window formulation on the corpus") {
    val viaWindow = Relational.q17AsofJoin(spark, sf)
      .select("event_id", "last_orderkey")
    val viaCustom = Relational.q27AsofCustom(spark, sf)
      .select("event_id", "last_orderkey")
    assert(viaWindow.count() === viaCustom.count())
    assert(viaWindow.except(viaCustom).isEmpty &&
      viaCustom.except(viaWindow).isEmpty)
  }

  test("plan contains AsOfJoinExec (not a fallback join)") {
    val plan = Relational.q27AsofCustom(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(1500))
  }

  test("hand-built case: latest-at-or-before semantics, unmatched -> null") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L),
      (1L, t("2024-01-01 11:00:00"), 110L),
      (2L, t("2024-01-01 10:30:00"), 200L)
    ).toDF("k", "ts", "qid")
      .select(col("k"), col("ts").cast("timestamp_ntz").as("ts"), col("qid"))
    val trades = Seq(
      (1L, t("2024-01-01 09:59:00"), 1L), // before any quote -> null
      (1L, t("2024-01-01 10:00:00"), 2L), // == quote ts -> inclusive match 100
      (1L, t("2024-01-01 10:59:59"), 3L), // -> 100
      (1L, t("2024-01-01 12:00:00"), 4L), // -> 110
      (2L, t("2024-01-01 11:00:00"), 5L), // -> 200
      (3L, t("2024-01-01 11:00:00"), 6L)  // key never quoted -> null
    ).toDF("k", "ts", "tid")
      .select(col("k"), col("ts").cast("timestamp_ntz").as("ts"), col("tid"))
    val got = AsOf.join(trades, quotes, "k", "k", "ts", "ts")
      .select(col("tid"), col("qid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> -1L, 2L -> 100L, 3L -> 100L, 4L -> 110L,
      5L -> 200L, 6L -> -1L))
  }

  test("string keys + int times work (typed orderings, not long-only)") {
    import spark.implicits._
    val right = Seq(("a", 10, 1), ("a", 20, 2), ("b", 15, 3))
      .toDF("rk", "rt", "rid")
    val left = Seq(("a", 5, 10L), ("a", 12, 11L), ("a", 25, 12L),
      ("b", 15, 13L), ("c", 9, 14L)).toDF("k", "t", "lid")
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(got === Map(10L -> -1, 11L -> 1, 12L -> 2, 13L -> 3, 14L -> -1))
  }

  test("null keys/times join to the null-extended row, not to key 0") {
    import spark.implicits._
    val right = Seq((0L, 10L, 77L), (1L, 10L, 88L)).toDF("rk", "rt", "rid")
    val left = Seq(
      (Some(0L), Some(20L), 1L),  // real key-0 match -> 77
      (None, Some(20L), 2L),      // null key: must NOT match key 0
      (Some(1L), None, 3L),       // null time: no match
      (Some(1L), Some(20L), 4L)   // -> 88
    ).toDF("k", "t", "lid")
    val got = AsOf.join(left, right, "k", "rk", "t", "rt")
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> 77L, 2L -> -1L, 3L -> -1L, 4L -> 88L))
  }

  test("mismatched key types fail fast with a clear error") {
    import spark.implicits._
    val l = Seq((1, 1L)).toDF("k", "t")
    val r = Seq(("1", 1L)).toDF("rk", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("key types differ"))
  }
}
