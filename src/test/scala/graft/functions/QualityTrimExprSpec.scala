package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class QualityTrimExprSpec extends SparkSpec {

  private def trim(q: String, w: Int = 5, mq: Int = 15): Long = {
    import spark.implicits._
    Seq(q).toDF("quality")
      .select(QualityTrimExpr.qualityTrim(col("quality"), w, mq).as("t"))
      .as[Long].head()
  }

  /** The r12 builtin-lambda formulation — kept verbatim as the equality
    * oracle (and as PlanAuditSpec's planted offender: its optimized plan
    * IS the x81 inlined-builder collapse). */
  private def hofTrim(reads: DataFrame, window: Int, meanQ: Int): DataFrame = {
    val thresh = window * meanQ
    reads
      .withColumn("len", length(col("quality")))
      .withColumn("qs", expr(
        "transform(sequence(1, len), i -> ascii(substring(quality, i, 1)) - 33)"))
      .withColumn("fails", expr(
        s"""IF(len >= $window,
           |  filter(sequence(1, len - $window + 1),
           |    i -> aggregate(sequence(i, i + $window - 1), 0,
           |           (acc, j) -> acc + qs[j - 1]) < $thresh),
           |  array())""".stripMargin))
      .withColumn("trimmed_len",
        expr("IF(size(fails) = 0, len, array_min(fails) - 1)")
          .cast("long"))
      .drop("qs", "fails")
  }

  test("hand cases: pass-through, first-window fail, junction cut") {
    // all Phred 40 ('I'): never fails
    assert(trim("I" * 30) === 30L)
    // shorter than one window: passes through whole
    assert(trim("III") === 3L)
    assert(trim("") === 0L)
    // all Phred 2 ('#'): first window fails -> 0
    assert(trim("#" * 30) === 0L)
    // 8 good then bad tail, w=5 q=15 (thresh 75): first failing window
    // starts where sum 40*(good in window) + 2*(bad) < 75 — window at
    // 0-based s covers [s, s+4]; s=5 has 3 good (40*3+2*2=124), s=6 has
    // 2 good (84), s=7 has 1 good (48 < 75) -> trimmed_len 7
    assert(trim("I" * 8 + "#" * 22) === 7L)
    // exactly one window, failing
    assert(trim("#####") === 0L)
    // exactly one window, passing
    assert(trim("IIIII") === 5L)
  }

  test("equality with the r12 HOF formulation on randomized Phred strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 400).map { i =>
      val len = rnd.nextInt(80) // includes 0 and sub-window lengths
      (i, new String(Array.fill(len)((33 + rnd.nextInt(94)).toChar)))
    }
    val df = rows.toDF("id", "quality")
    for ((w, q) <- Seq((5, 15), (1, 20), (4, 2), (10, 40))) {
      val native = graft.operators.Genomics.qualityTrim(df, w, q)
        .select("id", "trimmed_len").as[(Int, Long)].collect().sortBy(_._1)
      val hof = hofTrim(df, w, q)
        .select("id", "trimmed_len").as[(Int, Long)].collect().sortBy(_._1)
      assert(native === hof, s"window=$w meanQ=$q")
    }
  }

  test("pure-Scala model agrees (independent of both Spark formulations)") {
    val rnd = new scala.util.Random(99)
    def model(q: String, w: Int, mq: Int): Long = {
      if (q.length < w) q.length.toLong
      else (0 to q.length - w)
        .find(s => q.substring(s, s + w).map(_ - 33).sum < w * mq)
        .map(_.toLong).getOrElse(q.length.toLong)
    }
    (1 to 200).foreach { _ =>
      val len = rnd.nextInt(60)
      val s = new String(Array.fill(len)((33 + rnd.nextInt(94)).toChar))
      val w = 1 + rnd.nextInt(8)
      val mq = rnd.nextInt(45)
      assert(trim(s, w, mq) === model(s, w, mq), s"'$s' w=$w mq=$mq")
    }
  }

  test("non-Phred bytes raise loudly (decoder-fuzz discipline)") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    Seq("IIII", "abcé", " space is 32? no: ").foreach { bad =>
      val e = intercept[Exception](trim(bad))
      assert(msgs(e).exists(_.contains("quality_trim")),
        s"'$bad' must raise, got: $e")
    }
    // space (32) is one below the floor
    val e = intercept[Exception](trim("IIII II"))
    assert(msgs(e).exists(_.contains("non-Phred")))
  }

  test("x81 optimized plan carries no inlined array builder; the r12 " +
      "formulation is the planted offender PlanAudit flags") {
    import spark.implicits._
    val fixed = graft.operators.Genomics
      .x81QualityTrim(spark, "/root/testdata/sf0.001")
    assert(graft.operators.PlanAudit.inlinedArrayBuilders(fixed).isEmpty)

    // plant over the parquet source, not a local Seq: ConvertToLocalRelation
    // would otherwise evaluate the whole projection at optimize time and
    // leave nothing to audit
    val src = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey").as("id"),
        expr("repeat('I', 10 + cast(l_partkey % 20 as int))").as("quality"))
    val offender = hofTrim(src, 3, 15)
      .select(col("id"), col("trimmed_len"))
    val hits = graft.operators.PlanAudit.inlinedArrayBuilders(offender)
    assert(hits.nonEmpty,
      "the r12 two-step HOF kernel must trip the inlined-builder audit")
    val e = intercept[IllegalArgumentException](
      graft.operators.PlanAudit
        .requireNoInlinedArrayBuilders(offender, "planted"))
    assert(e.getMessage.contains("planted"))
  }
}
