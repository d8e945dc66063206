package graft.mito

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamSpec extends SparkSpec {

  lazy val mtmd = Sam.read(spark, resource("mito/sample_MT_MD.sam"))

  test("header lines dropped, records parsed") {
    assert(mtmd.count() === 7)
    val r1 = mtmd.where(col("readName") === "r1" && col("flag") === 99)
      .select("referenceName", "start", "mapQ", "sequence").head()
    assert(r1.getString(0) === "chrM")
    assert(r1.getInt(1) === 5)
    assert(r1.getInt(2) === 30)
    assert(r1.getString(3) === "==G===C===")
  }

  test("flag expansion") {
    val flags = mtmd.select("readName", "flag", "primaryAlignment",
        "readPaired", "properPair", "mateMapped", "supplementaryAlignment")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
      .toMap
    assert(flags(("r1", 99)) === ((true, true, true, true, false)))
    assert(flags(("r3", 2147)) === ((true, true, true, true, true)))  // supplementary
    assert(flags(("r4", 355)) === ((false, true, true, true, false))) // secondary
    assert(flags(("r5", 1)) === ((true, true, false, true, false)))   // not proper
  }

  test("validity filter keeps only r1/r2 records") {
    val valid = mtmd.where(Sam.isValid).select("readName").collect().map(_.getString(0))
    assert(valid.sorted.toSeq === Seq("r1", "r1", "r2", "r2"))
  }

  test("attribute map extraction with defaults (NM->0, NH->1, XQ->0)") {
    val m = Sam.attrMap(col("attributes"))
    val row = mtmd.where(col("readName") === "r2" && col("flag") === 147)
      .select(
        Sam.tagOrDefault(m, "NM", 0).as("nm"),
        Sam.tagOrDefault(m, "NH", 1).as("nh"),
        Sam.tagOrDefault(m, "XQ", 0).as("xq"),
        element_at(m, "MD").as("md"))
      .head()
    assert(row.getInt(0) === 0)
    assert(row.getInt(1) === 1) // NH absent -> default 1
    assert(row.getInt(2) === 0) // XQ absent -> default 0
    assert(row.getString(3) === "8")
  }

  test("MD values containing colons survive attribute parsing") {
    import spark.implicits._
    val df = Seq("AB:Z:x:y:z NM:i:7").toDF("attributes")
    val got = df.select(element_at(Sam.attrMap(col("attributes")), "AB")).head().getString(0)
    assert(got === "x:y:z")
  }

  test("single-file sink: empty header writes zero header bytes, not a newline") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("samw").toString
    val recs = Seq("rec1\t0\tchrM", "rec2\t16\tchrM").toDF("line")
    Sam.writeSingleSamWithHeader(Nil, recs, s"$tmp/empty_hdr.sam")
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$tmp/empty_hdr.sam"))
    assert(lines.size() === 2)
    assert(lines.get(0).startsWith("rec")) // no leading blank line
    Sam.writeSingleSamWithHeader(Seq("@HD\tVN:1.6"), recs, s"$tmp/hdr.sam")
    val withHdr = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$tmp/hdr.sam"))
    assert(withHdr.size() === 3 && withHdr.get(0).startsWith("@HD"))
  }
}
