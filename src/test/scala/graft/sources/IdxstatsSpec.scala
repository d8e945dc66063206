package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata-only idxstats ([[Idxstats]], r16): counts from the
  * pseudo-bins alone — `.bai` and `.csi` arms, the `*` unplaced slot,
  * and the loud refusals (no sidecar; pre-stats sidecar). */
class IdxstatsSpec extends SparkSpec {
  import spark.implicits._

  private def recs = Seq(
    // (name, flag, contig, start, cigar): 3 mapped chr1, 1 placed-
    // unmapped chr1, 2 mapped chr2, 2 unplaced
    ("r1", 0, "chr1", 100, "10M"), ("r2", 0, "chr1", 5000, "10M"),
    ("r3", 0, "chr1", 90000, "10M"), ("r4", 4, "chr1", 120000, "*"),
    ("r5", 0, "chr2", 70, "10M"), ("r6", 0, "chr2", 150000, "10M"),
    ("r7", 4, "*", 0, "*"), ("r8", 4, "*", 0, "*"))
    .map { case (n, f, c, st, cg) =>
      (n, f, c, st, 60, cg, "*", 0, 0, "ACGTACGTAC", "*", "NM:i:0") }
    .toDF("readName", "flag", "referenceName", "start", "mapQ", "cigar",
      "rnext", "pnext", "tlen", "sequence", "qual", "attributes")

  private val refs = Seq("chr1" -> 200000, "chr2" -> 200000)
  private val header = "@HD\tVN:1.6\tSO:coordinate\n" +
    "@SQ\tSN:chr1\tLN:200000\n@SQ\tSN:chr2\tLN:200000\n"

  private val want = Seq(
    Idxstats.ContigStat("chr1", 200000L, 3L, 1L),
    Idxstats.ContigStat("chr2", 200000L, 2L, 0L),
    Idxstats.ContigStat("*", 0L, 0L, 2L))

  test("stats from a write-emitted .bai match the record truth, " +
      "including the placed-unmapped split and the * slot") {
    val tmp = java.nio.file.Files.createTempDirectory("idxs").toString
    val out = s"$tmp/a.bam"
    BamWriter.sortAndWrite(recs, header, refs, out, numPartitions = 3,
      index = true)
    val conf = spark.sparkContext.hadoopConfiguration
    assert(Idxstats.rows(out, conf) === want)
    // the DataFrame face
    val df = Idxstats.toDF(spark, out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(df.toSeq === want.map(c =>
      (c.contig, c.length, c.nMapped, c.nUnmapped)))
  }

  test("the .csi arm serves the same stats (bai deleted, " +
      "distributed-built csi)") {
    val tmp = java.nio.file.Files.createTempDirectory("idxs2").toString
    val out = s"$tmp/b.bam"
    BamWriter.sortAndWrite(recs, header, refs, out, numPartitions = 2)
    CsiIndex.build(out)
    val conf = spark.sparkContext.hadoopConfiguration
    assert(Idxstats.rows(out, conf) === want)
  }

  test("refusals: no count-capable sidecar; pre-stats sidecar") {
    val tmp = java.nio.file.Files.createTempDirectory("idxs3").toString
    val out = s"$tmp/c.bam"
    BamWriter.sortAndWrite(recs, header, refs, out, numPartitions = 2)
    val conf = spark.sparkContext.hadoopConfiguration
    val e1 = intercept[IllegalArgumentException](Idxstats.rows(out, conf))
    assert(e1.getMessage.contains("no .bai/.csi sidecar"))
    // a .gai alone is not count-capable either
    BamIndex.build(out)
    val e2 = intercept[IllegalArgumentException](Idxstats.rows(out, conf))
    assert(e2.getMessage.contains("no .bai/.csi sidecar"))
    // pre-stats .bai (bins but no pseudo-bins): built via the shared
    // encoder with a null stats array, as pre-r16 sidecars were
    BaiIndex.build(out)
    val bai = BaiIndex.read(out, conf)
    val bins = bai.refs.map { r =>
      val m = scala.collection.mutable.LinkedHashMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[BaiIndex.Chunk]]
      r.bins.foreach { case (b, cs) =>
        if (b != BaiIndex.metaBin(5))
          m(b) = scala.collection.mutable.ArrayBuffer(cs: _*)
      }
      m
    }
    val linear = bai.refs.map(r =>
      scala.collection.mutable.ArrayBuffer(r.linear: _*))
    BaiIndex.writeBai(out, conf, bins, linear, bai.noCoor,
      Array.fill[BaiIndex.RefStat](refs.length)(null))
    val e3 = intercept[IllegalArgumentException](Idxstats.rows(out, conf))
    assert(e3.getMessage.contains("pre-stats"))
  }
}
