package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[BamMerge]] (r15): union-of-records semantics with merged `@RG`
  * headers and the loud refusals (RG ID collision, dictionary
  * disagreement, tag-less RG). The oracle-checked x88 gate carries the
  * value contract; this spec pins the API edges. */
class BamMergeSpec extends SparkSpec {
  import spark.implicits._

  private val root =
    s"/tmp/graft_bammerge_${java.util.UUID.randomUUID().toString.take(8)}"
  private val refs = Seq("chrA" -> 100000, "chrB" -> 100000)

  private def writeSample(rg: String, recs: Seq[(String, String, Int)],
      out: String, dict: Seq[(String, Int)] = refs): Unit =
    BamWriter.sortAndWrite(
      recs.map { case (name, contig, start) =>
        (name, 0, contig, start, 60, "4M", "*", 0, 0, "ACGT", "*",
          s"RG:Z:$rg")
      }.toDF("readName", "flag", "referenceName", "start", "mapQ",
        "cigar", "rnext", "pnext", "tlen", "sequence", "qual",
        "attributes"),
      "@HD\tVN:1.6\tSO:coordinate\n" +
        dict.map { case (n, l) => s"@SQ\tSN:$n\tLN:$l\n" }.mkString +
        s"@RG\tID:$rg\tSM:sm_$rg\n",
      dict, out)

  test("merge unions records, sorts by dictionary order, and carries " +
      "every @RG line; index-on-write .bai byte-identical to post-hoc") {
    val a = s"$root/a.bam"
    val b = s"$root/b.bam"
    writeSample("rgA", Seq(("a1", "chrB", 500), ("a2", "chrA", 900)), a)
    writeSample("rgB", Seq(("b1", "chrA", 100), ("b2", "chrB", 700)), b)
    val out = s"$root/ab.bam"
    assert(BamMerge.merge(spark, Seq(a, b), out, numPartitions = 2,
      index = true) === 4L)
    val (h, r) = BamWriter.readHeader(out)
    assert(r === refs)
    assert(h.contains("@RG\tID:rgA\tSM:sm_rgA") &&
      h.contains("@RG\tID:rgB\tSM:sm_rgB"))
    val back = spark.read.format("bam").load(out)
      .select("readName", "referenceName", "start").collect()
      .map(x => (x.getString(0), x.getString(1), x.getInt(2))).toSeq
    // dictionary order chrA < chrB, position within
    assert(back === Seq(("b1", "chrA", 100), ("a2", "chrA", 900),
      ("a1", "chrB", 500), ("b2", "chrB", 700)))
    // write-emitted .bai identical to a post-hoc build (x16 discipline)
    val conf = spark.sparkContext.hadoopConfiguration
    val iow = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out + ".bai")).toSeq
    java.nio.file.Files.delete(java.nio.file.Paths.get(out + ".bai"))
    BaiIndex.build(out, conf)
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out + ".bai")).toSeq === iow)
  }

  test("@RG ID collision across inputs refuses loudly") {
    val a = s"$root/dup_a.bam"
    val b = s"$root/dup_b.bam"
    writeSample("same", Seq(("a1", "chrA", 10)), a)
    writeSample("same", Seq(("b1", "chrA", 20)), b)
    val e = intercept[IllegalArgumentException](
      BamMerge.merge(spark, Seq(a, b), s"$root/dup.bam"))
    assert(e.getMessage.contains("@RG ID collision"))
  }

  test("reference dictionary disagreement refuses loudly") {
    val a = s"$root/dict_a.bam"
    val b = s"$root/dict_b.bam"
    writeSample("r1", Seq(("a1", "chrA", 10)), a)
    writeSample("r2", Seq(("b1", "chrZ", 10)), b,
      dict = Seq("chrZ" -> 50000))
    val e = intercept[IllegalArgumentException](
      BamMerge.merge(spark, Seq(a, b), s"$root/dict.bam"))
    assert(e.getMessage.contains("reference dictionary"))
  }

  test("empty input list refuses loudly") {
    val e = intercept[IllegalArgumentException](
      BamMerge.merge(spark, Nil, s"$root/none.bam"))
    assert(e.getMessage.contains("no inputs"))
  }
}
