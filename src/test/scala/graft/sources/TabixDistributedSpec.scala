package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Tabix.buildDistributed]] / [[Tabix.buildCsiDistributed]] (r14): the
  * executor-parallel index builds must emit sidecars BYTE-IDENTICAL to
  * the sequential builders' at every split size — the BaiIndexSpec
  * discipline on the VCF surface — plus the END-aware interval rule
  * (ADVICE r13) and its scanner. */
class TabixDistributedSpec extends SparkSpec {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private val root =
    s"/tmp/graft_tbxdist_${java.util.UUID.randomUUID().toString.take(8)}"

  // three contigs, positions spread over > 100k coordinates so records
  // land in MANY 16 kb windows and several bin levels; 8 range
  // partitions → 8+ self-contained BGZF member runs, so mid-file splits
  // cut between AND inside member chains
  private lazy val bgz: String = {
    val out = s"$root/sites.vcf.gz"
    val sites = (0 until 900).flatMap { i =>
      Seq(("chr1", i * 131L + 1), ("chr2", i * 97L + 5),
        ("chrX", i * 113L + 2))
    }.map { case (c, p) => (c, p, p % 5 + 1, p % 90 + 1) }
      .toDF("contig", "pos", "ac", "dp")
      .select(col("contig"), col("pos"), lit("AT").as("ref"),
        lit("T").as("alt"), col("ac"), col("dp"))
    VcfWriter.write(sites,
      Seq("chr1" -> 200000, "chr2" -> 200000, "chrX" -> 200000), out,
      numPartitions = 8)
    out
  }

  private def bytesOf(p: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))

  test("distributed tbi build == sequential, byte-for-byte, all split sizes") {
    val nSeq = Tabix.build(bgz, conf)
    assert(nSeq === 2700)
    val seqBytes = bytesOf(bgz + ".tbi")
    for (split <- Seq(1000L, 4093L, 1L << 30)) {
      val n = Tabix.buildDistributed(spark, bgz, split)
      assert(n === nSeq, s"record count at split $split")
      assert(java.util.Arrays.equals(bytesOf(bgz + ".tbi"), seqBytes),
        s"distributed .tbi differs from sequential at split $split")
    }
  }

  test("distributed tabix-csi build == sequential, byte-for-byte") {
    val nSeq = Tabix.buildCsi(bgz, conf)
    assert(nSeq === 2700)
    val seqBytes = bytesOf(bgz + ".csi")
    for (split <- Seq(1000L, 4093L, 1L << 30)) {
      val n = Tabix.buildCsiDistributed(spark, bgz, split)
      assert(n === nSeq, s"record count at split $split")
      assert(java.util.Arrays.equals(bytesOf(bgz + ".csi"), seqBytes),
        s"distributed .csi differs from sequential at split $split")
    }
    // and the distributed sidecar actually drives region pruning
    val q = spark.read.format("vcf").option("splitsize", 4093).load(bgz)
      .where(col("contig") === "chr2" &&
        col("pos") >= 20000 && col("pos") < 40000)
    assert(q.count() ===
      (0 until 900).map(_ * 97L + 5).count(p => p >= 20000 && p < 40000))
  }

  test("distributed build refuses an unsorted VCF loudly") {
    val p = s"$root/unsorted.vcf.gz"
    val lines = Seq(("chr1", 50000L), ("chr1", 100L)).toDF("contig", "pos")
      .coalesce(1).sortWithinPartitions(col("pos").desc)
      .select(concat_ws("\t", col("contig"), col("pos"), lit("."),
        lit("A"), lit("T"), lit("."), lit("PASS"), lit("AC=1;DP=1"))
        .as("line"))
    TextSink.write(Seq("##fileformat=VCFv4.2",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"), lines, p)
    val e = intercept[Exception](Tabix.buildDistributed(spark, p))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not coordinate-sorted")), e.toString)
  }

  test("INFO END= widens the index interval (htslib VCF preset rule)") {
    // record at POS 100 with REF length 1 but END=50000: an END-blind
    // index would bin it [99, 100) and a query at 40000 would miss it
    val p = s"$root/span.vcf.gz"
    val lines = Seq(
      "chr1\t100\t.\tA\t<DEL>\t.\tPASS\tSVTYPE=DEL;END=50000",
      "chr1\t200000\t.\tA\tT\t.\tPASS\tAC=1").toDF("line")
    TextSink.write(Seq("##fileformat=VCFv4.2",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"), lines, p)
    assert(Tabix.build(p, conf) === 2)
    val tbi = Tabix.read(p, conf)
    assert(BaiIndex.chunks(tbi.bai, 0, 40000, 40001).nonEmpty,
      "a query inside the END= span must see the spanning record's chunk")
    // a region past the span AND outside both records' bins (the span's
    // level-4 bin covers [0, 131072), the point record's leaf sits at
    // 200000) stays empty
    assert(BaiIndex.chunks(tbi.bai, 0, 150000, 151000).isEmpty)
  }

  test("parseInfoEnd: whole-key boundaries only") {
    assert(Tabix.parseInfoEnd("END=123") === 123L)
    assert(Tabix.parseInfoEnd("SVTYPE=DEL;END=7") === 7L)
    assert(Tabix.parseInfoEnd("SVEND=5") === -1L)
    assert(Tabix.parseInfoEnd("AC=2;XEND=5") === -1L)
    assert(Tabix.parseInfoEnd("END=5x") === -1L)
    assert(Tabix.parseInfoEnd("END=") === -1L)
    assert(Tabix.parseInfoEnd("END=9;AC=1") === 9L)
    assert(Tabix.parseInfoEnd(".") === -1L)
  }
}
