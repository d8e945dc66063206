package graft.functions

import graft.SparkSpec

/** Every native expression usable from SQL after registration. */
class GraftSqlSpec extends SparkSpec {

  test("all graft functions are SQL-callable") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  md_variants('==G===C===', '2A3T3', 5) AS v,
        |  shingle_hashes('abcabc', 3) AS sh,
        |  intersect_count_sorted(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS ic,
        |  minhash_sig(shingle_hashes('hello world', 3), 8) AS sig,
        |  dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |              array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS dp,
        |  sam_tags('NM:i:2 MD:Z:2A3T3 NH:i:1').nm AS nm,
        |  top_bigram_fraction(array('a', 'b', 'a', 'b', 'a')) AS tbf
        |""".stripMargin).head()
    assert(row.getSeq[String](0) === Seq("7G", "11C"))
    assert(row.getSeq[Long](1).length === 3) // abc, bca, cab (abc dedupes)
    assert(row.getInt(2) === 2)
    assert(row.getSeq[Long](3).length === 8)
    assert(row.getDouble(4) === 11.0)
    assert(row.getInt(5) === 2)
    assert(row.getDouble(6) === 0.5) // ab ba ab ba -> 2/4
  }

  test("SQL and Column APIs agree") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(Tuple1("the quick brown fox")).toDF("t")
    val viaCol = df.select(
      MinHashSigExpr.minhashSig(ShingleHashesExpr.shingleHashes(col("t"), 3), 16))
      .head().getSeq[Long](0)
    val viaSql = df.selectExpr("minhash_sig(shingle_hashes(t, 3), 16)")
      .head().getSeq[Long](0)
    assert(viaCol === viaSql)
  }
}
