package graft.operators

import graft.SparkSpec

/** d11's 100 TB claim is about the physical shuffles, which neither the
  * oracle nor the gate row can see: candidate generation must spread over
  * uniform band keys and the keep join over uniform doc_id hashes — no
  * hot reducer anywhere in the wired pipeline (q34 technique). */
class DedupSkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Reducer partition sizes with AQE coalescing off and a partition count
    * small enough that per-partition means are statistically stable at
    * this corpus size (at real scale partitions sit far above the advisory
    * size and coalescing never engages). */
  private def partitionSizes(mkDf: => org.apache.spark.sql.DataFrame): Array[Long] = {
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val prevCoalesce = spark.conf.get(coalesceKey)
    val prevParts = spark.conf.get(partsKey)
    spark.conf.set(coalesceKey, "false")
    spark.conf.set(partsKey, "8")
    try mkDf.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect()
    finally {
      spark.conf.set(coalesceKey, prevCoalesce)
      spark.conf.set(partsKey, prevParts)
    }
  }

  private def assertBalanced(what: String, sizes: Array[Long]): Unit = {
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.max <= 2 * mean,
      s"$what unbalanced: max ${sizes.max} vs mean $mean (${sizes.mkString(",")})")
  }

  test("d11 kept output: no reducer partition exceeds 2x the mean") {
    assertBalanced("d11 keep join", partitionSizes(
      Dedup.nearDedupKeep(graft.Tables.documents(spark, sf), 0.8)))
  }

  test("d03 band-key candidate shuffle: no reducer partition exceeds 2x the mean") {
    // the skew-prone stage of the wired pipeline — candidates come out of
    // the band-bucket self-join, so a hot band key would surface here
    assertBalanced("band-key candidates", partitionSizes(
      Dedup.d03MinhashLsh(spark, sf)))
  }
}
