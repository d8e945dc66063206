package graft.sources

import graft.SparkSpec
import graft.mito.Sam
import org.apache.spark.sql.functions._

class BamWriterSpec extends SparkSpec {

  private val recordCols = Seq("readName", "flag", "referenceName", "start",
    "mapQ", "cigar", "rnext", "pnext", "tlen", "sequence", "qual",
    "attributes").map(col)

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

  test("sortAndWrite: dictionary-ORDER sort (not name order), unmapped last") {
    import spark.implicits._
    // dictionary order chr2 < chr1; name order would invert it. One
    // unmapped record ("*") must land at the very end, encoded refId -1.
    val recs = Seq(
      ("r1", 0, "chr1", 500, 60), ("r2", 0, "chr2", 900, 60),
      ("r3", 0, "chr1", 10, 60), ("r4", 0, "chr2", 5, 60),
      ("r5", 0, "*", 1, 0), ("r6", 0, "chr2", 901, 60))
      .toDF("readName", "flag", "referenceName", "start", "mapQ")
      .select(col("readName"), col("flag"), col("referenceName"),
        col("start"), col("mapQ"), lit("10M").as("cigar"),
        lit("*").as("rnext"), lit(0).as("pnext"), lit(0).as("tlen"),
        lit("ACGTACGTAC").as("sequence"), lit("*").as("qual"),
        lit("NM:i:0").as("attributes"))
    val tmp = java.nio.file.Files.createTempDirectory("bamsort").toString
    val refs = Seq("chr2" -> 10000, "chr1" -> 10000)
    val n = BamWriter.sortAndWrite(recs,
      "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr2\tLN:10000\n@SQ\tSN:chr1\tLN:10000\n",
      refs, s"$tmp/sorted.bam", numPartitions = 3)
    assert(n === 6)
    // single split -> DataFrame row order is file order
    val back = spark.read.format("bam").load(s"$tmp/sorted.bam")
      .select("readName").collect().map(_.getString(0)).toSeq
    assert(back === Seq("r4", "r2", "r6", "r3", "r1", "r5"))
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

  test("records larger than one BGZF member split across members (BSIZE cap)") {
    // a 70 KB sequence makes the encoded record (~105 KB with qual) exceed
    // the 60 KB member payload cap: without the pre-append flush the
    // member would exceed 65535 bytes and BSIZE (uint16) silently wraps
    import spark.implicits._
    val longSeq = ("ACGT" * (70 * 1024 / 4))
    val qual = "I" * longSeq.length
    val rec = Seq(("rBig", 0, "chrM", 1, 60, s"${longSeq.length}M", "*", 0, 0,
        longSeq, qual, "NM:i:0"))
      .toDF("readName", "flag", "referenceName", "start", "mapQ", "cigar",
        "rnext", "pnext", "tlen", "sequence", "qual", "attributes")
    val tmp = java.nio.file.Files.createTempDirectory("bamw4").toString
    BamWriter.write(rec, "@HD\tVN:1.6\n", Seq("chrM" -> 16569), s"$tmp/big.bam")
    // every BGZF member in the file must respect the uint16 BSIZE bound
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/big.bam"))
    var off = 0
    var members = 0
    while (off < bytes.length) {
      assert((bytes(off) & 0xff) === 0x1f && (bytes(off + 1) & 0xff) === 0x8b,
        s"bad member magic at $off")
      val bsize = ((bytes(off + 16) & 0xff) | ((bytes(off + 17) & 0xff) << 8)) + 1
      assert(bsize <= 65536, s"member at $off has size $bsize")
      off += bsize
      members += 1
    }
    assert(off === bytes.length) // members tile the file exactly
    assert(members > 2)          // the record really did span members
    val back = spark.read.format("bam").load(s"$tmp/big.bam")
    val r = back.head()
    assert(r.getAs[String]("sequence") === longSeq)
    assert(r.getAs[String]("qual") === qual)
  }

  test("multi-partition write: executor part-files, driver concat, no funnel") {
    import spark.implicits._
    // 5 explicit partitions, each big enough to emit several BGZF members —
    // the write path must stream every partition to its own part-file
    // (bounded ~60 KB member buffer) and leave only the concatenated file
    val recs = spark.range(0, 5000).repartition(5).select(
      concat(lit("r"), col("id")).as("readName"),
      lit(99).as("flag"), lit("chrM").as("referenceName"),
      (col("id") % 16000 + 1).cast("int").as("start"),
      lit(60).as("mapQ"), lit("10M").as("cigar"), lit("=").as("rnext"),
      lit(0).as("pnext"), lit(0).as("tlen"),
      lit("ACGTACGTAC").as("sequence"), lit("IIIIIIIIII").as("qual"),
      concat(lit("NM:i:"), col("id") % 4).as("attributes"))
    val tmp = java.nio.file.Files.createTempDirectory("bamw5").toString
    val out = s"$tmp/multi.bam"
    val n = BamWriter.write(recs, "@HD\tVN:1.6\n@SQ\tSN:chrM\tLN:16569\n",
      Seq("chrM" -> 16569), out)
    assert(n === 5000)
    // the scratch part-file dir is cleaned up after the commit concat
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out.parts")))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out))
    // members tile the file exactly and each respects the uint16 BSIZE cap
    // (the structural witness that only ≤60 KB member buffers ever existed)
    var off = 0
    var members = 0
    while (off < bytes.length) {
      assert((bytes(off) & 0xff) === 0x1f && (bytes(off + 1) & 0xff) === 0x8b,
        s"bad member magic at $off")
      val bsize = ((bytes(off + 16) & 0xff) | ((bytes(off + 17) & 0xff) << 8)) + 1
      assert(bsize <= 65536, s"member at $off has size $bsize")
      off += bsize
      members += 1
    }
    assert(off === bytes.length)
    assert(members >= 6) // header member + at least one per partition
    // exactly one EOF marker, at the tail: part runs must not carry EOFs
    val eof = BgzfOutputStream.EofMarker
    val eofCount = (0 to bytes.length - eof.length).count(i =>
      eof.indices.forall(j => bytes(i + j) == eof(j)))
    assert(eofCount === 1 && bytes.takeRight(28).sameElements(eof))
    // full-fidelity round trip through the bam DSv2 reader
    val back = spark.read.format("bam").load(out)
    assert(back.count() === 5000)
    assert(back.agg(sum(col("start"))).head.getLong(0) ===
      (0L until 5000L).map(_ % 16000 + 1).sum)
    assert(back.select(recordCols: _*).except(recs.select(recordCols: _*)).isEmpty)
  }

  test("concat ignores stray part-files from failed/duplicate task attempts") {
    import spark.implicits._
    // simulate a retried/zombie attempt: a garbage file named like a
    // second attempt (-a1) sits in the scratch dir alongside the real
    // tasks' -a0 parts; the commit concat must read ONLY the (pid, count,
    // path) triples the successful tasks returned, so the garbage never
    // reaches the output — and the scratch dir (stray included) is dropped
    val recs = spark.range(0, 300).repartition(3).select(
      concat(lit("r"), col("id")).as("readName"),
      lit(0).as("flag"), lit("chrM").as("referenceName"),
      (col("id") % 16000 + 1).cast("int").as("start"),
      lit(60).as("mapQ"), lit("10M").as("cigar"), lit("*").as("rnext"),
      lit(0).as("pnext"), lit(0).as("tlen"),
      lit("ACGTACGTAC").as("sequence"), lit("IIIIIIIIII").as("qual"),
      lit("NM:i:0").as("attributes"))
    val tmp = java.nio.file.Files.createTempDirectory("bamw6").toString
    val out = s"$tmp/retry.bam"
    val partsDir = java.nio.file.Paths.get(s"$out.parts")
    java.nio.file.Files.createDirectories(partsDir)
    java.nio.file.Files.write(partsDir.resolve("part-00001-a1"),
      "GARBAGE-NOT-BGZF-FROM-A-FAILED-ATTEMPT".getBytes("US-ASCII"))
    val n = BamWriter.write(recs, "@HD\tVN:1.6\n@SQ\tSN:chrM\tLN:16569\n",
      Seq("chrM" -> 16569), out)
    assert(n === 300)
    assert(!java.nio.file.Files.exists(partsDir), "scratch dir not dropped")
    // the file still tiles as valid BGZF members end to end — any stray
    // ASCII bytes in the concat would break the member framing
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out))
    var off = 0
    while (off < bytes.length) {
      assert((bytes(off) & 0xff) === 0x1f && (bytes(off + 1) & 0xff) === 0x8b,
        s"bad member magic at $off")
      off += ((bytes(off + 16) & 0xff) | ((bytes(off + 17) & 0xff) << 8)) + 1
    }
    assert(off === bytes.length)
    // and round-trips to exactly the input records
    val back = spark.read.format("bam").load(out)
    assert(back.count() === 300)
    assert(back.select(recordCols: _*).except(recs.select(recordCols: _*)).isEmpty)
  }

  test("index-on-write emits a .bai byte-identical to a post-hoc " +
      "BaiIndex.build over the finished file") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bamiow").toString
    // 2500 records over two contigs, positions spread across many 16 kb
    // windows, mixed CIGARs (deletions widen spans; '*' spans 1 base),
    // plus unmapped records that must land in n_no_coor on both paths
    val recs = (1 to 2500).map { i =>
      val unmapped = i % 17 == 0
      val contig = if (unmapped) "*" else if (i % 3 == 0) "chr1" else "MT"
      val start = if (unmapped) 0 else (i * 37) % 150000 + 1
      val cigar = if (unmapped || i % 5 == 0) "*" else "30M5D20M"
      (f"r$i%04d", if (unmapped) 4 else 0, contig, start, 60, cigar,
        "*", 0, 0, "A" * 50, "*", "NM:i:0")
    }.toDF("readName", "flag", "referenceName", "start", "mapQ", "cigar",
      "rnext", "pnext", "tlen", "sequence", "qual", "attributes")
    val refs = Seq("MT" -> 200000, "chr1" -> 200000)
    val out = s"$tmp/iow.bam"
    val n = BamWriter.sortAndWrite(recs,
      "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:MT\tLN:200000\n" +
        "@SQ\tSN:chr1\tLN:200000\n",
      refs, out, numPartitions = 7, index = true)
    assert(n === 2500)
    val fromWrite = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out + ".bai"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(out + ".bai"))
    assert(BaiIndex.build(out) === 2500)
    assert(java.util.Arrays.equals(fromWrite,
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out + ".bai"))),
      "write-emitted .bai differs from the post-hoc sequential build")
    // the write-emitted index drives a correct pruned region scan
    def regionCount() = spark.read.format("bam")
      .option("splitsize", 7001).load(out)
      .where(col("referenceName") === "MT" &&
        col("start") >= 40000 && col("start") < 90000).count()
    val indexed = regionCount()
    java.nio.file.Files.delete(java.nio.file.Paths.get(out + ".bai"))
    assert(indexed === regionCount(),
      "indexed region scan diverged from the unindexed scan")
  }

  test("index-on-write refuses unsorted input loudly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bamiow2").toString
    val recs = Seq(
      ("r1", 0, "MT", 900, 60, "10M", "*", 0, 0, "A" * 10, "*", "NM:i:0"),
      ("r2", 0, "MT", 5, 60, "10M", "*", 0, 0, "A" * 10, "*", "NM:i:0"))
      .toDF("readName", "flag", "referenceName", "start", "mapQ", "cigar",
        "rnext", "pnext", "tlen", "sequence", "qual", "attributes")
      .coalesce(1)
    val e = intercept[Exception](BamWriter.write(recs,
      "@HD\tVN:1.6\n@SQ\tSN:MT\tLN:16569\n", Seq("MT" -> 16569),
      s"$tmp/bad.bam", index = true))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not coordinate-sorted")), e.toString)
  }

  test("writer refuses a referenceName absent from the header dictionary " +
      "(ADVICE r14: silently encoding it unplaced hides the read from " +
      "every region query)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bamw4").toString
    def rec(rname: String, rnext: String) =
      Seq(("r1", 0, rname, 5, 60, "4M", rnext, 0, 0, "ACGT", "*", "NM:i:0"))
        .toDF("readName", "flag", "referenceName", "start", "mapQ", "cigar",
          "rnext", "pnext", "tlen", "sequence", "qual", "attributes")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // typo'd referenceName raises naming the contig — both plain and
    // index-on-write paths go through the same encode
    val e1 = intercept[Exception](BamWriter.write(rec("chrMT", "*"),
      "@HD\tVN:1.6\n@SQ\tSN:chrM\tLN:16569\n", Seq("chrM" -> 16569),
      s"$tmp/a.bam"))
    assert(msgs(e1).exists(_.contains("'chrMT'")), e1.toString)
    // same discipline for the MATE contig
    val e2 = intercept[Exception](BamWriter.write(rec("chrM", "chr17"),
      "@HD\tVN:1.6\n@SQ\tSN:chrM\tLN:16569\n", Seq("chrM" -> 16569),
      s"$tmp/b.bam"))
    assert(msgs(e2).exists(_.contains("'chr17'")), e2.toString)
    // '*' (unplaced) stays legal
    val n = BamWriter.write(rec("*", "*").withColumn("start", lit(0))
      .withColumn("mapQ", lit(0)).withColumn("cigar", lit("*")),
      "@HD\tVN:1.6\n@SQ\tSN:chrM\tLN:16569\n", Seq("chrM" -> 16569),
      s"$tmp/c.bam")
    assert(n === 1)
  }

  test("writer refuses records with unsupported tag types") {
    import spark.implicits._
    val bad = Seq(("r1", 0, "chrM", 1, 60, "4M", "*", 0, 0, "ACGT", "*", "XX:Q:weird"))
      .toDF("readName", "flag", "referenceName", "start", "mapQ", "cigar",
        "rnext", "pnext", "tlen", "sequence", "qual", "attributes")
    val tmp = java.nio.file.Files.createTempDirectory("bamw3").toString
    // encode now runs in executor tasks, so the failure surfaces as a
    // SparkException wrapping the encode error
    val e = intercept[Exception] {
      BamWriter.write(bad, "@HD\tVN:1.6\n", Seq("chrM" -> 16569), s"$tmp/bad.bam")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("unsupported tag type")), e.toString)
  }
}
