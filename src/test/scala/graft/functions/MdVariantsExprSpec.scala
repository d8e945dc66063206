package graft.functions

import graft.SparkSpec
import graft.mito.MdParser
import org.apache.spark.sql.functions._

class MdVariantsExprSpec extends SparkSpec {

  import spark.implicits._

  private val cases = Seq(
    ("==G===C===", "2A3T3", 5),
    ("N====A=", "0A2^ACG2T1", 1),
    ("========", "8", 100),
    ("GT", "0A0C0", 1))

  test("native expression matches the pure-Scala scanner (codegen path)") {
    val df = cases.toDF("seq", "md", "start")
    val got = df.select(
        MdVariantsExpr.mdVariants(col("seq"), col("md"), col("start")).as("v"))
      .collect().map(_.getSeq[String](0).toSeq)
    val expected = cases.map { case (s, m, st) => MdParser.variants(s, m, st).toSeq }
    assert(got.toSeq === expected)
  }

  test("interpreted (non-codegen) eval agrees") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val df = cases.toDF("seq", "md", "start")
      val got = df.select(
          MdVariantsExpr.mdVariants(col("seq"), col("md"), col("start")).as("v"))
        .collect().map(_.getSeq[String](0).toSeq)
      assert(got.toSeq === cases.map { case (s, m, st) => MdParser.variants(s, m, st).toSeq })
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("SQL registration via function registry") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md_variants", MdVariantsExpr.functionDescription._3, "scala_udf")
    val got = spark.sql("SELECT md_variants('==G===C===', '2A3T3', 5) AS v")
      .collect().head.getSeq[String](0)
    assert(got.toSeq === Seq("7G", "11C"))
  }

  test("null inputs yield null, not a crash") {
    val df = Seq(("==", null.asInstanceOf[String], 1)).toDF("seq", "md", "start")
    val got = df.select(
      MdVariantsExpr.mdVariants(col("seq"), col("md"), col("start")).as("v")).collect()
    assert(got.head.isNullAt(0))
  }
}
