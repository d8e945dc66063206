package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** DecoderFuzzSpec's truncation/garbage discipline extended to the text
  * sequence formats (VERDICT r11 #8): fastq (truncation at every
  * mid-record cut point, CRLF, '>'-led quality lines under splits),
  * fasta (CRLF equivalence, truncation structure), bed (strict-mode
  * truncation loudness, CRLF equivalence). */
class SourceFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: java.nio.file.Path, name: String,
      body: String): String = {
    val p = dir.resolve(name)
    Files.write(p, body.getBytes("UTF-8"))
    p.toString
  }

  private def rootOf(e: Throwable): Throwable = {
    var r = e
    while (r.getCause != null) r = r.getCause
    r
  }

  // ------------------------------------------------------------ FASTQ
  test("fastq truncation at every mid-record cut point raises, never " +
      "reads as a shorter valid file") {
    val dir = Files.createTempDirectory("fuzz_fq")
    val good = "@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+\nJJJJ\n"
    assert(spark.read.format("fastq")
      .load(write(dir, "ok.fastq", good)).count() === 2L)
    val cuts = Seq(
      "@r1\nACGT\n+\nIIII\n@r2\n",           // after header
      "@r1\nACGT\n+\nIIII\n@r2\nGGCC\n",     // after sequence
      "@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+\n",  // after separator
      "@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+\nJJ\n") // mid-quality
    cuts.zipWithIndex.foreach { case (body, i) =>
      val p = write(dir, s"cut_$i.fastq", body)
      val e = intercept[Throwable] {
        spark.read.format("fastq").load(p).count()
      }
      val m = rootOf(e).getMessage
      assert(m != null &&
        (m.contains("malformed FASTQ") || m.contains("truncated FASTQ")),
        s"cut $i -> ${rootOf(e)}")
    }
  }

  test("fastq CRLF file parses identically to LF (lengths after CR " +
      "strip)") {
    val dir = Files.createTempDirectory("fuzz_fq_crlf")
    val lf = write(dir, "lf.fastq", "@r1 c=1\nACGTA\n+\nIIIII\n")
    val crlf = write(dir, "crlf.fastq",
      "@r1 c=1\r\nACGTA\r\n+\r\nIIIII\r\n")
    val a = spark.read.format("fastq").load(lf)
      .select("name", "comment", "sequence", "quality", "length")
      .collect().toSeq
    val b = spark.read.format("fastq").load(crlf)
      .select("name", "comment", "sequence", "quality", "length")
      .collect().toSeq
    assert(a === b && a.head.getInt(4) === 5)
  }

  test("fastq '>'-led quality lines survive byte-range splits exactly") {
    val dir = Files.createTempDirectory("fuzz_fq_gt")
    val recs = (0 until 120).map { i =>
      val len = 8 + i % 11
      val q = ">" + (">=<;@?" * 4).substring(0, len - 1)
      s"@g$i\n${("ACGTN" * 4).take(len)}\n+\n$q"
    }
    val p = write(dir, "gt.fastq", recs.mkString("", "\n", "\n"))
    val whole = spark.read.format("fastq").load(p)
      .select("name").as[String].collect().sorted.toSeq
    assert(whole.size === 120)
    for (ss <- Seq(101, 257, 1021)) {
      val split = spark.read.format("fastq")
        .option("splitsize", ss.toString).load(p)
        .select("name").as[String].collect().sorted.toSeq
      assert(split === whole, s"splitsize $ss")
    }
  }

  // ------------------------------------------------------------ FASTA
  test("fasta CRLF file parses identically to LF") {
    val dir = Files.createTempDirectory("fuzz_fa")
    val lf = write(dir, "lf.fa", ">s1 d\nACGT\nGGCC\n>s2\nTTAA\n")
    val crlf = write(dir, "crlf.fa",
      ">s1 d\r\nACGT\r\nGGCC\r\n>s2\r\nTTAA\r\n")
    val a = Fasta.read(spark, lf).collect().toSeq
    val b = Fasta.read(spark, crlf).collect().toSeq
    assert(a === b)
    assert(a.map(_.getString(2)).toSet === Set("ACGTGGCC", "TTAA"))
  }

  test("fasta truncation keeps record structure: never a garbage " +
      "record, the cut record just shortens (format carries no length " +
      "redundancy)") {
    val dir = Files.createTempDirectory("fuzz_fa_tr")
    val full = ">s1\nACGTACGT\n>s2\nGGCCGGCC\n"
    val cut = write(dir, "cut.fa", full.take(full.length - 5))
    val rows = Fasta.read(spark, cut)
      .as[(String, Option[String], String)].collect()
      .map { case (n, _, s) => n -> s }.toMap
    assert(rows.keySet === Set("s1", "s2"))
    assert(rows("s1") === "ACGTACGT")
    assert("GGCCGGCC".startsWith(rows("s2")))
  }

  // -------------------------------------------------------------- BED
  test("bed strict mode: truncation mid-line raises; lenient salvages; " +
      "CRLF parses identically") {
    val dir = Files.createTempDirectory("fuzz_bed")
    val okBody = "chr1\t5\t9\tg1\nchr2\t1\t4\tg2\n"
    val ok = write(dir, "ok.bed", okBody)
    val crlf = write(dir, "crlf.bed", okBody.replace("\n", "\r\n"))
    assert(Bed.read(spark, ok).collect().toSeq ===
      Bed.read(spark, crlf).collect().toSeq)
    // truncated mid-number: "chr2\t1\t4" cut to "chr2\t1\t"
    val cut = write(dir, "cut.bed", "chr1\t5\t9\tg1\nchr2\t1\t")
    val e = intercept[Throwable] { Bed.read(spark, cut).collect() }
    assert(rootOf(e).getMessage.contains("malformed BED line"))
    assert(Bed.read(spark, cut, strict = false).count() === 2L)
  }
}
