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
        |  top_bigram_fraction(array('a', 'b', 'a', 'b', 'a')) AS tbf,
        |  pq_encode(array(CAST(0.9 AS FLOAT), CAST(0.1 AS FLOAT)),
        |            array(array(array(0.0D, 0.0D), array(1.0D, 0.0D)))) AS pq
        |""".stripMargin).head()
    assert(row.getSeq[String](0) === Seq("7G", "11C"))
    assert(row.getSeq[Long](1).length === 3) // abc, bca, cab (abc dedupes)
    assert(row.getInt(2) === 2)
    assert(row.getSeq[Long](3).length === 8)
    assert(row.getDouble(4) === 11.0)
    assert(row.getInt(5) === 2)
    assert(row.getDouble(6) === 0.5) // ab ba ab ba -> 2/4
    assert(row.getSeq[Int](7) === Seq(1)) // (0.9,0.1) nearer (1,0) than (0,0)
  }

  test("round-11 registrations: char_ngrams, cigar_sums, lsh_buckets, " +
      "max_k, count_min, heavy_hitters are SQL-callable") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  char_ngrams('abcd', 3) AS ng,
        |  cigar_sums('3M1I2D4M') AS cs
        |""".stripMargin).head()
    assert(row.getSeq[String](0) === Seq("abc", "bcd"))
    assert(row.getStruct(1).getLong(0) === 9L) // ref_len = 3M + 2D + 4M
    val agg = spark.sql(
      """SELECT max_k(v, 3) AS mk, heavy_hitters(k, 2) AS hh
        |FROM VALUES (1.0D, 7L), (5.0D, 7L), (3.0D, 7L), (2.0D, 8L)
        |  AS t(v, k)""".stripMargin).head()
    assert(agg.getSeq[Double](0) === Seq(5.0, 3.0, 2.0))
    assert(agg.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
      .contains(7L))
    val cm = spark.sql(
      "SELECT count_min(k, 3, 64) FROM VALUES (1L), (1L), (2L) AS t(k)")
      .head().getSeq[Long](0)
    assert(cm.length === 3 * 64)
    // static int params must be literals — a per-row column is refused
    val err = intercept[Exception] {
      spark.sql("SELECT char_ngrams('ab', CAST(v AS INT)) " +
        "FROM VALUES (2) AS t(v)").collect()
    }
    assert(err.getMessage.contains("literal") ||
      err.getMessage.toLowerCase.contains("foldable"))
    // a Long literal beyond Int range must be refused, not wrapped
    // (4294967297 wraps to 1 under toInt — ADVICE r11)
    val wrap = intercept[Exception] {
      spark.sql("SELECT char_ngrams('ab', 4294967297)").collect()
    }
    assert(wrap.getMessage.contains("Int range"), wrap.getMessage)
  }

  test("round-13 registration: quality_trim is SQL-callable with static " +
      "int params") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT quality_trim('IIIIIIII', 5, 15) AS a, " +
        "quality_trim('########', 5, 15) AS b, " +
        "quality_trim('III', 5, 15) AS c").head()
    assert(row.getLong(0) === 8L)
    assert(row.getLong(1) === 0L)
    assert(row.getLong(2) === 3L)
    val err = intercept[Exception] {
      spark.sql("SELECT quality_trim('IIII', CAST(v AS INT), 15) " +
        "FROM VALUES (2) AS t(v)").collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("shingle_hashes windows by codepoints (astral chars count once)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 𝕏a𝕏a𝕏 — five CODEPOINTS (𝕏 is a surrogate pair, 8 UTF-16 units):
    // 3-codepoint windows are 𝕏a𝕏, a𝕏a, 𝕏a𝕏 → 2 distinct, matching
    // Spark's length/substr and the DuckDB oracles' character semantics
    val t = "𝕏a𝕏a𝕏"
    val sh = Seq(Tuple1(t)).toDF("t")
      .select(ShingleHashesExpr.shingleHashes(col("t"), 3)).head.getSeq[Long](0)
    assert(sh.length === 2, s"got ${sh.length} windows")
    // and the builtin-substr formulation produces the same distinct count
    val viaSubstr = Seq(Tuple1(t)).toDF("t").select(
      size(array_distinct(transform(
        sequence(lit(1), length(col("t")) - 2),
        i => col("t").substr(i, lit(3)))))).head.getInt(0)
    assert(viaSubstr === 2)
  }

  test("top_bigram_fraction tolerates null array elements") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT top_bigram_fraction(array('a', NULL, 'a', NULL))").head.getDouble(0)
    // nulls hash as the empty token: bigrams (a,''),('',a),(a,'') -> 2/3
    assert(r === 2.0 / 3)
  }

  test("pq_encode fails loudly on an embedding shorter than the codebook span") {
    GraftExtensions.register(spark)
    val t = intercept[Throwable] {
      spark.sql(
        """SELECT pq_encode(array(CAST(1.0 AS FLOAT)),
          |  array(array(array(0.0D, 0.0D), array(1.0D, 0.0D))))""".stripMargin)
        .head()
    }
    // unsafe array reads are not bounds-checked, so a silent garbage code
    // is the failure mode this guard exists to prevent — walk the cause
    // chain for the loud message
    val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("pq_encode"), msgs.take(500))
  }

  test("pq_encode fails loudly on a null embedding element") {
    GraftExtensions.register(spark)
    val t = intercept[Throwable] {
      spark.sql(
        """SELECT pq_encode(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
          |  array(array(array(0.0D, 0.0D), array(1.0D, 0.0D))))""".stripMargin)
        .head()
    }
    // a null slot read through the unsafe getter yields 0.0 and a silently
    // wrong code (ADVICE r7) — the guard must surface it instead
    val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("null"), msgs.take(500))
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
