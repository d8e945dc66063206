package graft.operators

import graft.SparkSpec

/** x03 is the driver row that finally scans THROUGH the bam DSv2 reader
  * (sink → index → multi-split scan → pushed validity mask → aggregate);
  * these asserts pin the plan shape the CORRECTNESS gate relies on. */
class MitoQueriesSpec extends SparkSpec {

  test("x03 executes as a multi-split bam scan with the validity mask pushed") {
    val df = MitoQueries.x03BamRoundTrip(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [((flag & 2315) = 3)]"), plan.take(2000))
    val row = df.head()
    // sf0.001 lineitem has 6005 rows; each l_orderkey%4=0 row emits exactly
    // one valid record — the count equals the Spark-side selection
    val expected = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .where(org.apache.spark.sql.functions.col("l_orderkey") % 4 === 0).count()
    assert(row.getAs[Long]("n_valid") === expected)
    // the written file really scans as many byte-range partitions at bench
    // splitsize only when big enough; assert the partition math directly on
    // the file the query just wrote
    val bam = s"${graft.sources.HadoopIO.scratchDir(spark)}/graft_x03__root_testdata_sf0_001.bam"
    val parts = spark.read.format("bam").option("splitsize", 4096).load(bam)
    assert(parts.rdd.getNumPartitions > 1)
    assert(parts.count() === 2 * expected)
  }
}
