package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `info_field` / `info_map` (r14): one-pass VCF INFO extraction with
  * whole-key boundaries — the regexp_extract replacement on the VCF
  * surface. Runs through real plans (codegen path), not just eval. */
class InfoFieldExprSpec extends SparkSpec {
  import spark.implicits._

  private def field(info: String, key: String): Option[String] = {
    val r = Seq(Tuple1(info)).toDF("info")
      .select(InfoFieldExpr.infoField(col("info"), key).as("v")).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("key=value, flags, absence, and the '.' marker") {
    assert(field("AC=3;DP=9;DB", "AC") === Some("3"))
    assert(field("AC=3;DP=9;DB", "DP") === Some("9"))
    assert(field("AC=3;DP=9;DB", "DB") === Some("")) // bare flag present
    assert(field("AC=3;DP=9;DB", "AF") === None)
    assert(field(".", "AC") === None)
    assert(field("", "AC") === None)
  }

  test("whole-key boundaries: AC never matches inside MLEAC, and a key " +
      "that PREFIXES another stays distinct") {
    assert(field("MLEAC=7;AC=2", "AC") === Some("2"))
    assert(field("MLEAC=7", "AC") === None)
    assert(field("AC=2;ACX=9", "AC") === Some("2"))
    assert(field("ACX=9", "AC") === None)
    // the r13 regexp form 'AC=(\\d+)' would have matched MLEAC's value
    assert(field("MLEAC=7", "MLEAC") === Some("7"))
  }

  test("values may contain '=' (only the FIRST '=' splits key/value)") {
    assert(field("EQ=a=b;DP=1", "EQ") === Some("a=b"))
  }

  test("info_map: all keys, flags as '', '.' empty, first dup wins") {
    val m = Seq(Tuple1("AC=3;DB;DP=9;AC=8")).toDF("info")
      .select(InfoFieldExpr.infoMap(col("info")).as("m")).head()
      .getMap[String, String](0)
    assert(m === Map("AC" -> "3", "DB" -> "", "DP" -> "9"))
    val empty = Seq(Tuple1(".")).toDF("info")
      .select(InfoFieldExpr.infoMap(col("info")).as("m")).head()
      .getMap[String, String](0)
    assert(empty.isEmpty)
  }

  test("infoFieldLong: digits parse, garbage nulls (TRY cast), flag nulls") {
    val r = Seq(Tuple1("AC=3;BAD=x;DB")).toDF("info").select(
      InfoFieldExpr.infoFieldLong(col("info"), "AC").as("a"),
      InfoFieldExpr.infoFieldLong(col("info"), "BAD").as("b"),
      InfoFieldExpr.infoFieldLong(col("info"), "DB").as("c"),
      InfoFieldExpr.infoFieldLong(col("info"), "NOPE").as("d")).head()
    assert(r.getLong(0) === 3L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("infoFieldLong: multi-valued Number=A keys cast their FIRST " +
      "element (bcftools first-allele convention, ADVICE r14)") {
    val r = Seq(Tuple1("AC=1,2;AF=0.5,0.25;DP=9")).toDF("info").select(
      InfoFieldExpr.infoFieldLong(col("info"), "AC").as("a"),
      InfoFieldExpr.infoFieldLong(col("info"), "DP").as("b"),
      InfoFieldExpr.infoFieldLong(col("info"), "AF").as("c")).head()
    assert(r.getLong(0) === 1L) // NOT null: whole-value cast would TRY-null
    assert(r.getLong(1) === 9L) // single-valued path unchanged
    assert(r.isNullAt(2)) // first element '0.5' still isn't a BIGINT
    // and strict read must not raise a spec-valid multi-allelic record:
    // pipeline shape — first-element long survives the null guard
    val ok = Seq(Tuple1("AC=4,1;DP=7")).toDF("info")
      .select(InfoFieldExpr.infoFieldLong(col("info"), "AC").as("ac"))
      .where(col("ac").isNull).count()
    assert(ok === 0L)
  }

  test("null info propagates null; equivalence with the regexp form on a " +
      "generated corpus") {
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("info")
      .select(InfoFieldExpr.infoField(col("info"), "AC").as("v")).head()
    assert(r.isNullAt(0))
    // corpus where keys are never suffixes of other keys — the regex and
    // the kernel must agree exactly there
    val df = (0 until 500).map { i =>
      s"AC=${i % 7};DP=${i % 13}" + (if (i % 3 == 0) ";DB" else "")
    }.map(Tuple1(_)).toDF("info")
    val diff = df.select(
        InfoFieldExpr.infoFieldLong(col("info"), "AC").as("a"),
        expr("try_cast(regexp_extract(info, 'AC=(\\\\d+)', 1) AS BIGINT)")
          .as("b"))
      .where(not(col("a") <=> col("b"))).count()
    assert(diff === 0L)
  }

  test("SQL registration: info_field and info_map callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT info_field('AC=3;DP=9;DB', 'AC') AS a, " +
        "info_field('MLEAC=7', 'AC') AS b, " +
        "info_map('AC=3;DB')['DB'] AS c").head()
    assert(row.getString(0) === "3")
    assert(row.isNullAt(1))
    assert(row.getString(2) === "")
  }
}
