package graft.sources

import graft.SparkSpec
import graft.mito.Sam
import org.apache.spark.sql.functions._

class BamWriterSpec extends SparkSpec {

  private val recordCols = Seq("readName", "flag", "referenceName", "start",
    "mapQ", "cigar", "sequence", "attributes").map(col)

  test("round trip: sam text -> BamWriter -> format(\"bam\") preserves records") {
    val tmp = java.nio.file.Files.createTempDirectory("bamw").toString
    val src = Sam.read(spark, resource("mito/sample_MT_MD.sam"))
    val (text, refs) = BamWriter.readHeader(resource("mito/sample_MT_MD.bam"))
    val n = BamWriter.write(src, text, refs, s"$tmp/out.bam")
    assert(n === 7)
    val back = spark.read.format("bam").load(s"$tmp/out.bam").select(recordCols: _*)
    val orig = src.select(recordCols: _*)
    assert(back.except(orig).isEmpty && orig.except(back).isEmpty)
  }

  test("written file carries the BGZF EOF marker and a valid header") {
    val tmp = java.nio.file.Files.createTempDirectory("bamw2").toString
    val src = Sam.read(spark, resource("mito/sample_NT.sam"))
    val (text, refs) = BamWriter.readHeader(resource("mito/sample_NT.bam"))
    BamWriter.write(src, text, refs, s"$tmp/nt.bam")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/nt.bam"))
    // gzip magic at start, spec EOF marker at end
    assert((bytes(0) & 0xff) === 0x1f && (bytes(1) & 0xff) === 0x8b)
    val eof = bytes.takeRight(28)
    assert((eof(0) & 0xff) === 0x1f && (eof(12), eof(13)) === (('B'.toByte, 'C'.toByte)))
    // header round-trips through our own header reader
    val (text2, refs2) = BamWriter.readHeader(s"$tmp/nt.bam")
    assert(refs2 === refs)
    assert(text2 === text)
  }

  test("writer refuses records with unsupported tag types") {
    import spark.implicits._
    val bad = Seq(("r1", 0, "chrM", 1, 60, "4M", "ACGT", "XX:Q:weird"))
      .toDF("readName", "flag", "referenceName", "start", "mapQ", "cigar",
        "sequence", "attributes")
    val tmp = java.nio.file.Files.createTempDirectory("bamw3").toString
    intercept[RuntimeException] {
      BamWriter.write(bad, "@HD\tVN:1.6\n", Seq("chrM" -> 16569), s"$tmp/bad.bam")
    }
  }
}
