package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaxKSpec extends SparkSpec {

  import spark.implicits._

  test("max_k returns k largest descending; partial+final merge correct") {
    val df = (1 to 1000).map(i => ((i % 7).toString, i.toDouble))
      .toDF("g", "v").repartition(8) // force multi-partition partial aggs
    val got = df.groupBy("g").agg(MaxKExpr.maxK(col("v"), 3).as("topk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    // group g holds values {i : i % 7 == g}; 1000 % 7 == 6
    assert(got("0") === Seq(994.0, 987.0, 980.0))
    assert(got("6") === Seq(1000.0, 993.0, 986.0))
  }

  test("groups smaller than k return all values, descending") {
    val df = Seq(("a", 5.0), ("a", 9.0), ("b", 1.0)).toDF("g", "v")
    val got = df.groupBy("g").agg(MaxKExpr.maxK(col("v"), 4).as("topk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(got("a") === Seq(9.0, 5.0))
    assert(got("b") === Seq(1.0))
  }

  test("duplicates and negative values survive the heap") {
    val df = Seq.fill(5)(("a", -2.0)).toDF("g", "v")
      .union(Seq(("a", -1.0), ("a", -3.0)).toDF("g", "v"))
    val got = df.groupBy("g").agg(MaxKExpr.maxK(col("v"), 3).as("topk"))
      .head().getSeq[Double](1).toSeq
    assert(got === Seq(-1.0, -2.0, -2.0))
  }
}
