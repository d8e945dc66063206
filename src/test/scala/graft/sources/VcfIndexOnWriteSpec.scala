package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VCF index-on-write (VERDICT r14 next-round #3): the `.tbi`/`.csi`
  * sidecars emitted DURING [[VcfWriter.write]]/[[VcfWriter
  * .writeGenotypes]]/[[Tabix.writeIndexedVcf]] must be BYTE-IDENTICAL to
  * the post-hoc [[Tabix.build]]/[[Tabix.buildCsi]] over the finished
  * file — the x16/BamWriter discipline on the text surface. Fixtures
  * carry ≥100k coordinate spread and enough volume for multiple BGZF
  * members per part and real part seams (the member-boundary rounding
  * and part-tail rewrite paths). */
class VcfIndexOnWriteSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private val root =
    s"/tmp/graft_vcfiow_${java.util.UUID.randomUUID().toString.take(8)}"

  private def bytes(p: String): Seq[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq

  private def rm(p: String): Unit =
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p))

  /** Write-emitted sidecar(s) vs the post-hoc builders on the same
    * finished file. */
  private def assertIdentical(vcf: String): Unit = {
    val iowTbi = bytes(vcf + ".tbi")
    val iowCsi = bytes(vcf + ".csi")
    rm(vcf + ".tbi"); rm(vcf + ".csi")
    Tabix.build(vcf, conf)
    Tabix.buildCsi(vcf, conf)
    assert(bytes(vcf + ".tbi") === iowTbi, s"$vcf.tbi differs from post-hoc")
    assert(bytes(vcf + ".csi") === iowCsi, s"$vcf.csi differs from post-hoc")
  }

  test("site-level write: write-emitted .tbi/.csi byte-identical to " +
      "post-hoc builds (multi-contig, multi-member, multi-part)") {
    // ~24k sites over 2 contigs, 0..~2.4M coordinate spread, REF lengths
    // 1-12 (bin-spanning variety); 4 range partitions → real part seams,
    // several BGZF members per part
    val variants = spark.range(24000).select(
      concat(lit("c"), (col("id") % 2)).as("contig"),
      (col("id") * 100 + 1).as("pos"),
      expr("repeat('A', CAST(1 + id % 12 AS INT))").as("ref"),
      lit("T").as("alt"),
      (col("id") % 7 + 1).as("ac"),
      (col("id") % 89 + 1).as("dp"))
    val out = s"$root/sites.vcf.gz"
    val n = VcfWriter.write(variants,
      Seq("c0" -> 3000000, "c1" -> 3000000), out,
      numPartitions = 4, index = true, csi = true)
    assert(n === 24000L)
    assertIdentical(out)
    // and the write-emitted index actually serves a region query: the
    // pruned scan's rows equal an unpruned filter's (value contract)
    val scan = spark.read.format("vcf").option("splitsize", 4093).load(out)
      .where(col("contig") === "c0" && col("pos").between(100000, 140000))
    val full = spark.read.format("vcf")
      .option("splitsize", Int.MaxValue).load(out)
      .where(col("contig") === "c0" && col("pos").between(100000, 140000))
    assert(scan.select("pos").collect().map(_.getLong(0)).sorted.toSeq
      === full.select("pos").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("genotype write + cohort merge: write-emitted sidecars " +
      "byte-identical (the VcfMerge production path)") {
    val refs = Seq("chr1" -> 5000000)
    def sample(name: String, k: Int, out: String): Unit = {
      val gt = spark.range(6000).select(
        lit("chr1").as("contig"), (col("id") * 331 + k + 1).as("pos"),
        lit("A").as("ref"), lit("G").as("alt"), lit(name).as("sample"),
        when(col("id") % 3 === 0, "1/1").otherwise("0/1").as("gt"),
        (col("id") % 60 + 1).as("dp"))
      VcfWriter.writeGenotypes(gt, refs, Seq(name), out, numPartitions = 3)
    }
    val a = s"$root/gA.vcf.gz"
    val b = s"$root/gB.vcf.gz"
    sample("sA", 0, a)
    sample("sB", 7, b)
    val merged = s"$root/cohort.vcf.gz"
    val n = VcfMerge.merge(spark, Seq(a, b), merged, numPartitions = 3,
      index = true, csi = true)
    assert(n === 12000L)
    assertIdentical(merged)
  }

  test("END=-widened records index over their whole span (the raw-line " +
      "writeIndexedVcf surface the fuzz drives)") {
    // every third record carries INFO END= far past its REF footprint —
    // recordEnd widening must land write-side records in the same
    // (coarser) bins the post-hoc builder picks
    val lines = spark.range(5000).select(
      lit("k0").as("contig"), (col("id") * 400 + 1).as("pos"))
      .repartitionByRange(3, col("pos"))
      .sortWithinPartitions(col("pos"))
      .select(concat_ws("\t", col("contig"), col("pos"), lit("."),
        lit("ACGT"), lit("T"), lit("."), lit("PASS"),
        concat(lit("AC=1;DP=2"),
          when(col("pos") % 3 === 0,
            concat(lit(";END="), col("pos") + 90000)).otherwise(lit(""))))
        .as("line"))
    val header = Seq("##fileformat=VCFv4.2",
      "##contig=<ID=k0,length=10000000>",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO")
    val out = s"$root/endspan.vcf.gz"
    val n = Tabix.writeIndexedVcf(header, lines, out, tbi = true, csi = true)
    assert(n === 5000L)
    assertIdentical(out)
  }

  test("single empty-input edge: header-only file still gets a valid " +
      "(zero-ref) sidecar, identical to post-hoc") {
    val out = s"$root/empty.vcf.gz"
    val lines = spark.range(0).select(lit("x").as("line"))
    val n = Tabix.writeIndexedVcf(
      Seq("##fileformat=VCFv4.2", "##contig=<ID=c0,length=1000>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"),
      lines, out, tbi = true, csi = true)
    assert(n === 0L)
    assertIdentical(out)
  }

  test("unsorted input refuses loudly (the index must never exist over " +
      "an unsorted file)") {
    val lines = Seq("k0\t500\t.\tA\tT\t.\tPASS\tAC=1;DP=1",
      "k0\t100\t.\tA\tT\t.\tPASS\tAC=1;DP=1")
      .toDF("line").coalesce(1)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception](Tabix.writeIndexedVcf(
      Seq("##fileformat=VCFv4.2", "#CHROM"), lines,
      s"$root/unsorted.vcf.gz", tbi = true))
    assert(msgs(e).exists(_.contains("not coordinate-sorted")), e.toString)
  }
}
