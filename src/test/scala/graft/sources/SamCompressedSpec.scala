package graft.sources

import java.io.{BufferedReader, FileOutputStream, InputStreamReader}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compressed SAM text through the `sam` DSv2: BGZF keeps byte-range
  * splits (member-boundary ownership + prev-byte newline sync), plain
  * gzip degrades to one whole-file split. Fixtures are generated from
  * `sample_split.sam` (3000 records) with adversarial member layouts:
  * boundaries right after newlines (the line-at-member-start edge the
  * sync rule exists for), mid-line straddles, and an interior empty
  * member. */
class SamCompressedSpec extends SparkSpec {

  private lazy val plainPath = resource("mito/sample_split.sam")

  private lazy val srcLines: Seq[String] = {
    val in = Files.newBufferedReader(Paths.get(plainPath.stripPrefix("file:")))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).toVector
    finally in.close()
  }

  /** bgzip the fixture with many small members: flush after every ~40
    * lines — every such boundary lands exactly AFTER a '\n' (the edge
    * case); additionally split one line across a member boundary
    * mid-line, and emit one empty flush (no-op payload-wise) to keep the
    * walk-back honest. */
  private lazy val bgzfPath: String = {
    val out = Files.createTempFile("sam_bgzf", ".sam.gz")
    val os = new FileOutputStream(out.toFile)
    val bz = new BgzfOutputStream(os)
    srcLines.zipWithIndex.foreach { case (l, i) =>
      if (i == 1517) { // straddle: first half of the line, boundary, rest
        val bytes = (l + "\n").getBytes("UTF-8")
        bz.write(bytes, 0, bytes.length / 2)
        bz.flushBlock()
        bz.write(bytes, bytes.length / 2, bytes.length - bytes.length / 2)
      } else {
        bz.write((l + "\n").getBytes("UTF-8"))
      }
      if (i % 40 == 39) bz.flushBlock() // boundary exactly after a newline
    }
    bz.close() // final member + EOF marker
    out.toString
  }

  private lazy val gzipPath: String = {
    val out = Files.createTempFile("sam_gzip", ".sam.gz")
    val os = new GZIPOutputStream(new FileOutputStream(out.toFile))
    srcLines.foreach(l => os.write((l + "\n").getBytes("UTF-8")))
    os.close()
    out.toString
  }

  test("codec sniff: bgzf vs gzip vs plain") {
    val conf = HadoopIO.driverConf()
    assert(SamDataSource.fileCodec(bgzfPath, conf) === "bgzf")
    assert(SamDataSource.fileCodec(gzipPath, conf) === "gzip")
    assert(SamDataSource.fileCodec(plainPath, conf) === "plain")
  }

  test("BGZF sam scans in many byte-range splits, line-exact vs plain") {
    val whole = spark.read.format("sam").load(plainPath)
    val parts = spark.read.format("sam").option("splitsize", 16384)
      .load(bgzfPath)
    assert(parts.rdd.getNumPartitions > 3,
      s"expected intra-file splits, got ${parts.rdd.getNumPartitions}")
    assert(parts.count() === 3000)
    assert(parts.select("line").distinct().count() === 3000) // exactly-once
    val a = whole.select("line")
    val b = parts.select("line")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("BGZF split exactness holds across adversarial splitsizes") {
    // prime-ish sizes steer boundaries into members, straddles, and the
    // post-newline member starts; each must still partition lines exactly
    for (sz <- Seq(4099, 7919, 30011)) {
      val parts = spark.read.format("sam").option("splitsize", sz)
        .load(bgzfPath)
      assert(parts.count() === 3000, s"splitsize $sz lost/duped lines")
      assert(parts.select("line").distinct().count() === 3000,
        s"splitsize $sz produced duplicates")
    }
  }

  test("plain gzip degrades to one whole-file split with identical rows") {
    val df = spark.read.format("sam").option("splitsize", 4096).load(gzipPath)
    assert(df.rdd.getNumPartitions === 1) // not seekable — never split
    assert(df.count() === 3000)
    val a = spark.read.format("sam").load(plainPath).select("line")
    assert(a.except(df.select("line")).isEmpty &&
      df.select("line").except(a).isEmpty)
  }

  test("pushdown still applies under BGZF (flags evaluated pre-row)") {
    val plain = spark.read.format("sam").load(plainPath)
      .where(col("flag") === 99)
    val bgzf = spark.read.format("sam").option("splitsize", 16384)
      .load(bgzfPath).where(col("flag") === 99)
    assert(bgzf.count() === plain.count())
  }

  test("compressed single-file SAM sink: write .sam.gz, re-scan with splits") {
    val recs = graft.mito.Sam.withFlags(
      spark.read.format("sam").load(plainPath))
    val out = Files.createTempDirectory("samgz_sink").toString + "/out.sam.gz"
    graft.mito.Sam.writeSingleSamWithHeader(
      Seq("@HD\tVN:1.6", "@SQ\tSN:chrM\tLN:16569"), recs, out)
    // the sink's product is a genuine bgzip file: the compressed reader
    // scans it WITH intra-file splits, and the line sets agree exactly
    val conf = HadoopIO.driverConf()
    assert(SamDataSource.fileCodec(out, conf) === "bgzf")
    val back = spark.read.format("sam").option("splitsize", 16384).load(out)
    assert(back.count() === 3000)
    val a = recs.select("line")
    val b = back.select("line")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // plain gzip tools read it too (BGZF IS gzip): header line first
    val gin = new BufferedReader(new InputStreamReader(
      new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(out)), "UTF-8"))
    try assert(gin.readLine() === "@HD\tVN:1.6") finally gin.close()
  }

  test("x03-style roundtrip: compressed SAM in, single-file BAM out, scan back") {
    val recs = graft.mito.Sam.withFlags(
      spark.read.format("sam").option("splitsize", 16384).load(bgzfPath))
    val out = Files.createTempDirectory("sam_gz_rt").toString + "/rt.bam"
    // the fixture's real dictionary (MT + chr1): r15's unknown-contig
    // refusal caught this test writing with a 'chrM' dictionary — the
    // old silent-unplaced behavior masked exactly this mismatch class
    val refs = Seq("MT" -> 16569, "chr1" -> 248956422)
    BamWriter.write(
      recs.select("readName", "flag", "referenceName", "start", "mapQ",
        "cigar", "rnext", "pnext", "tlen", "sequence", "qual", "attributes"),
      "@HD\tVN:1.6\n@SQ\tSN:MT\tLN:16569\n@SQ\tSN:chr1\tLN:248956422\n",
      refs, out)
    val back = spark.read.format("bam").option("splitsize", 65536).load(out)
    assert(back.count() === 3000)
    val a = recs.select("readName", "flag", "start", "sequence")
    val b = back.select("readName", "flag", "start", "sequence")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
