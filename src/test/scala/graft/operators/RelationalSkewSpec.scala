package graft.operators

import graft.SparkSpec

/** q34's claim is about the physical shuffle, which the oracle can't see:
  * with ~99% of rows on one key, the salted join must spread that key
  * across reducers (max partition ≤ 2× mean) while the unsalted join
  * provably funnels it through one. */
class RelationalSkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Reducer partition sizes with AQE's small-partition coalescing off:
    * at sf0.001 AQE merges the whole shuffle into one partition, which
    * hides the per-reducer distribution this spec exists to measure (at
    * real scale partitions are far above the advisory size and coalescing
    * never engages). */
  private def partitionSizes(mkDf: => org.apache.spark.sql.DataFrame): Array[Long] = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try mkDf.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect()
    finally spark.conf.set(key, prev)
  }

  test("q34 salted join: no reducer partition exceeds 2x the mean") {
    val plan = Relational.q34SkewJoined(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastHashJoin"), plan.take(2000))
    // mean over ALL reducer partitions: idle reducers are the waste the
    // salt exists to prevent
    val sizes = partitionSizes(Relational.q34SkewJoined(spark, sf))
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.max <= 2 * mean,
      s"salted skew join unbalanced: max ${sizes.max} vs mean $mean " +
        s"(${sizes.mkString(",")})")
  }

  test("the unsalted form of the same join DOES violate the balance bound") {
    val sizes = partitionSizes(Relational.q34SkewJoinedUnsalted(spark, sf))
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.max > 2 * mean,
      s"expected hot-key funnel, got ${sizes.mkString(",")}")
  }

  test("q34 salted aggregate equals the unsalted aggregate") {
    val salted = Relational.q34AdversarialSkewJoin(spark, sf)
    val unsalted = Relational.q34SkewJoinedUnsalted(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("k"))
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("k_weight"))
          .cast("long").as("total_weight"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("l_quantity"))
          .cast("long").as("total_qty"))
    assert(salted.except(unsalted).isEmpty && unsalted.except(salted).isEmpty)
  }
}
