package graft.sources

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

/** Every custom source and sink does its I/O through
  * `org.apache.hadoop.fs.FileSystem`, so explicit `file:///` URIs (and by
  * the same code path hdfs:// or s3a://) must behave identically to bare
  * local paths — that is the property that lets the connectors open a
  * cluster-resident 100 TB corpus at all. */
class HadoopFsSpec extends SparkSpec {

  private def asUri(p: String): String = "file://" + p

  test("sam source reads a file:/// URI, multi-split, identically to a bare path") {
    val bare = resource("mito/sample_split.sam")
    val plain = spark.read.format("sam").load(bare)
    val uri = spark.read.format("sam").option("splitsize", 32768).load(asUri(bare))
    assert(uri.rdd.getNumPartitions > 1)
    assert(uri.count() === plain.count())
    assert(uri.except(plain).isEmpty && plain.except(uri).isEmpty)
  }

  test("bam source reads a file:/// URI, multi-split, identically to a bare path") {
    val bare = resource("mito/sample_split.bam")
    val plain = spark.read.format("bam").load(bare)
    val uri = spark.read.format("bam").option("splitsize", 32768).load(asUri(bare))
    assert(uri.rdd.getNumPartitions > 1)
    assert(uri.count() === 3000)
    assert(uri.except(plain).isEmpty && plain.except(uri).isEmpty)
  }

  test("gai index builds and resolves through a file:/// URI") {
    val dir = java.nio.file.Files.createTempDirectory("fsuri")
    val dst = dir.resolve("s.bam")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(resource("mito/sample_split.bam")), dst)
    val uri = asUri(dst.toString)
    BamIndex.build(uri, new Configuration())
    assert(java.nio.file.Files.exists(dir.resolve("s.bam.gai")),
      "sidecar must land next to the data file")
    assert(BamIndex.exists(uri, new Configuration()))
    val indexed = spark.read.format("bam").option("splitsize", 32768).load(uri)
    assert(indexed.count() === 3000)
    // pruned read through the index, still via URI
    val chrM = indexed.where(col("referenceName") === "chrM")
    assert(chrM.count() === indexed.where(col("referenceName") === "chrM").count())
  }

  test("bam writer writes to a file:/// URI and the result round-trips") {
    val tmp = java.nio.file.Files.createTempDirectory("fsw").toString
    val src = spark.read.format("bam").load(resource("mito/sample_MT_MD.bam"))
    val (text, refs) = BamWriter.readHeader(asUri(resource("mito/sample_MT_MD.bam")))
    val out = asUri(s"$tmp/out.bam")
    val n = BamWriter.write(src, text, refs, out)
    assert(n === 7)
    val back = spark.read.format("bam").load(out)
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }

  test("a missing path fails fast at planning, not as a bogus split") {
    val e = intercept[Exception] {
      spark.read.format("sam").load("/no/such/file.sam").count()
    }
    assert(e.getMessage.contains("no/such") ||
      e.getCause != null && e.getCause.getMessage.contains("no/such"))
  }

  test("no java.nio.file usage remains in the source/sink layer") {
    // the I/O-layer contract, kept honest at test time: every path in
    // graft/sources goes through HadoopIO/SeekableFile
    val dir = new java.io.File("src/main/scala/graft/sources")
    if (dir.isDirectory) {
      val offenders = dir.listFiles().filter(_.getName.endsWith(".scala"))
        .filter { f =>
          val text = new String(
            java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          text.contains("java.nio.file")
        }
        .map(_.getName)
      assert(offenders.isEmpty,
        s"java.nio.file I/O in sources: ${offenders.mkString(", ")}")
    }
  }
}
