package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[VcfMerge]] (r14): union-of-sites semantics with `./.:.` fill, and
  * the loud refusals (duplicate samples, dictionary disagreement,
  * site-only inputs). The oracle-checked x87 gate carries the value
  * contract; this spec pins the API edges. */
class VcfMergeSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private val root =
    s"/tmp/graft_vcfmerge_${java.util.UUID.randomUUID().toString.take(8)}"
  private val refs = Seq("chr1" -> 100000)

  private def writeSample(name: String, sites: Seq[(Long, String, Long)],
      out: String): Unit =
    VcfWriter.writeGenotypes(
      sites.map { case (p, gt, dp) => ("chr1", p, "A", "G", name, gt, dp) }
        .toDF("contig", "pos", "ref", "alt", "sample", "gt", "dp"),
      refs, Seq(name), out)

  test("merge unions sites, fills ./. and keeps input sample order") {
    val a = s"$root/a.vcf.gz"
    val b = s"$root/b.vcf.gz"
    writeSample("sA", Seq((100L, "0/1", 7L), (300L, "1/1", 9L)), a)
    writeSample("sB", Seq((100L, "0/0", 4L), (200L, "0/1", 5L)), b)
    val out = s"$root/ab.vcf.gz"
    assert(VcfMerge.merge(spark, Seq(a, b), out) === 3L)
    assert(VcfDataSource.headerSamples(out, conf) === Seq("sA", "sB"))
    assert(VcfDataSource.headerContigs(out, conf) === refs)
    val back = VcfWriter.readGenotypes(spark, out)
      .select("pos", "sample", "gt", "dp").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(back.toSeq === Seq(
      (100L, "sA", "0/1", 7L), (100L, "sB", "0/0", 4L),
      (200L, "sA", "./.", -1L), (200L, "sB", "0/1", 5L),
      (300L, "sA", "1/1", 9L), (300L, "sB", "./.", -1L)))
  }

  test("duplicate sample names across inputs refuse loudly") {
    val a = s"$root/dup_a.vcf.gz"
    val b = s"$root/dup_b.vcf.gz"
    writeSample("same", Seq((100L, "0/1", 1L)), a)
    writeSample("same", Seq((200L, "0/1", 1L)), b)
    val e = intercept[IllegalArgumentException](
      VcfMerge.merge(spark, Seq(a, b), s"$root/dup.vcf.gz"))
    assert(e.getMessage.contains("duplicate sample names"))
  }

  test("contig dictionary disagreement refuses loudly") {
    val a = s"$root/dict_a.vcf.gz"
    val b = s"$root/dict_b.vcf.gz"
    writeSample("s1", Seq((100L, "0/1", 1L)), a)
    VcfWriter.writeGenotypes(
      Seq(("chr2", 100L, "A", "G", "s2", "0/1", 1L))
        .toDF("contig", "pos", "ref", "alt", "sample", "gt", "dp"),
      Seq("chr2" -> 100000), Seq("s2"), b)
    val e = intercept[IllegalArgumentException](
      VcfMerge.merge(spark, Seq(a, b), s"$root/dict.vcf.gz"))
    assert(e.getMessage.contains("contig dictionary"))
  }

  test("a malformed input record raises naming the line instead of " +
      "silently rendering ./.:. in the cohort (ADVICE r14: strict scan)") {
    val good = s"$root/strict_ok.vcf.gz"
    writeSample("sG", Seq((100L, "0/1", 3L)), good)
    // hand-written input with an unparseable POS: lenient readGenotypes
    // would null it out and the merged cohort silently loses/corrupts
    // the site; strict merge must raise naming the record
    val bad = s"$root/strict_bad.vcf"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      ("##fileformat=VCFv4.2\n" +
        "##contig=<ID=chr1,length=100000>\n" +
        "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"Genotype\">\n" +
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsB\n" +
        "chr1\t100\t.\tA\tG\t.\tPASS\t.\tGT:DP\t0/1:5\n" +
        "chr1\tnotanumber\t.\tA\tG\t.\tPASS\t.\tGT:DP\t1/1:9\n")
        .getBytes("UTF-8"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception](
      VcfMerge.merge(spark, Seq(good, bad), s"$root/strict.vcf.gz"))
    assert(msgs(e).exists(_.contains("malformed VCF genotype record")),
      e.toString)
  }

  test("a site-only VCF (no sample columns) refuses loudly") {
    val a = s"$root/sites.vcf.gz"
    VcfWriter.write(Seq(("chr1", 100L, "A", "T", 1L, 2L))
      .toDF("contig", "pos", "ref", "alt", "ac", "dp"), refs, a)
    val b = s"$root/ok.vcf.gz"
    writeSample("s1", Seq((100L, "0/1", 1L)), b)
    val e = intercept[IllegalArgumentException](
      VcfMerge.merge(spark, Seq(a, b), s"$root/mixed.vcf.gz"))
    assert(e.getMessage.contains("no sample columns"))
  }
}
