package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FastaSpec extends SparkSpec {
  import spark.implicits._

  test("fasta write wraps at width and read reassembles, with desc") {
    val seqs = Seq(
      ("beta", "ACGTACGTACGTA"), // 13 chars, wraps at 5 into 3 lines
      ("alpha", "GGCC"))
      .toDF("name", "seq")
    val out = java.nio.file.Files.createTempDirectory("fa").toString + "/t.fa"
    Fasta.write(seqs, out, width = 5, numPartitions = 2)
    val lines = scala.io.Source.fromFile(out).getLines().toSeq
    assert(lines === Seq(">alpha", "GGCC", ">beta", "ACGTA", "CGTAC", "GTA"),
      "records sorted by name, sequence wrapped at width")
    val back = Fasta.read(spark, out)
      .select("name", "seq").as[(String, String)].collect().toSet
    assert(back === Set(("alpha", "GGCC"), ("beta", "ACGTACGTACGTA")))
  }

  test("fasta read parses descriptions and header-only records") {
    val dir = java.nio.file.Files.createTempDirectory("fa2")
    val p = dir.resolve("h.fa")
    java.nio.file.Files.writeString(p,
      ">chrM Homo sapiens mitochondrion\nACGT\nACGT\n" +
        ">empty_rec\n" +
        ">plain\nTTTT\n")
    val back = Fasta.read(spark, p.toString)
      .as[(String, Option[String], String)].collect().toSet
    assert(back === Set(
      ("chrM", Some("Homo sapiens mitochondrion"), "ACGTACGT"),
      ("empty_rec", None, ""),
      ("plain", None, "TTTT")))
  }

  test("fasta writeFai: closed-form offsets match the written bytes; " +
      "fetchRegions serves ranged reads across line wraps") {
    val seqs = Seq(("aa", "ACGTACG"), ("bb", "ACGTACGTACGT"))
      .toDF("name", "seq")
    val dir = java.nio.file.Files.createTempDirectory("fai").toString
    val fa = s"$dir/x.fa"
    Fasta.write(seqs, fa, width = 5, numPartitions = 2)
    Fasta.writeFai(seqs, fa + ".fai", width = 5, numPartitions = 2)
    val fai = scala.io.Source.fromFile(fa + ".fai").getLines().toSeq
    assert(fai === Seq("aa\t7\t4\t5\t6", "bb\t12\t17\t5\t6"),
      "samtools-shaped fai rows with arithmetic offsets")
    // the claimed offsets against the actual file bytes
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fa))
    assert(bytes(4).toChar === 'A' && bytes(17).toChar === 'A')
    val regions = Seq(("aa", 4L, 7L), ("aa", 5L, 9L), ("bb", 3L, 11L))
      .toDF("name", "start", "end")
    val got = Fasta.fetchRegions(spark, fa, fa + ".fai", regions)
      .as[(String, Long, Long, String)].collect().toSet
    // (aa, 5, 9) exceeds aa's length 7 and must drop; bb's region
    // crosses two line wraps, so the newline-strip math is exercised
    assert(got === Set(
      ("aa", 4L, 7L, "TACG"),
      ("bb", 3L, 11L, "GTACGTACG")))
  }

  test("fasta roundtrip property: random lengths x widths, descs survive") {
    val rnd = new scala.util.Random(7)
    val bases = "ACGTN"
    val seqs = (0 until 60).map { i =>
      val len = rnd.nextInt(200) + 1
      val sq = Array.fill(len)(bases(rnd.nextInt(5))).mkString
      val desc = if (i % 3 == 0) s" some desc $i" else ""
      (f"n$i%03d$desc", sq)
    }
    for (width <- Seq(1, 3, 60, 1000)) {
      val df = seqs.toDF("name", "seq")
        // write() takes the full header in `name`; read() splits name/desc
        .select(col("name"), col("seq"))
      val out = java.nio.file.Files.createTempDirectory("fap").toString +
        s"/w$width.fa"
      Fasta.write(df, out, width = width)
      val back = Fasta.read(spark, out)
        .select(concat_ws(" ", col("name"),
          coalesce(col("desc"), lit(""))).as("hdr"), col("seq"))
        .as[(String, String)].collect()
        .map { case (h, sq) => (h.trim, sq) }.toSet
      val want = seqs.map { case (n, sq) => (n.trim, sq) }.toSet
      assert(back === want, s"roundtrip mismatch at width=$width")
    }
  }

  test("fasta read tolerates CRLF line endings") {
    val dir = java.nio.file.Files.createTempDirectory("facrlf")
    val p = dir.resolve("w.fa")
    java.nio.file.Files.writeString(p,
      ">chr1 built on Windows\r\nACGT\r\nAC\r\n>chr2\r\nTTTT\r\n")
    val back = Fasta.read(spark, p.toString)
      .as[(String, Option[String], String)].collect().toSet
    assert(back === Set(
      ("chr1", Some("built on Windows"), "ACGTAC"),
      ("chr2", None, "TTTT")))
  }

  test("fasta read is splittable: tiny splits reassemble boundary records") {
    val seqs = (0 until 200).map { i =>
      (f"s$i%04d", "ACGT" * (i % 17 + 1))
    }.toDF("name", "seq")
    val out = java.nio.file.Files.createTempDirectory("fa3").toString + "/b.fa"
    Fasta.write(seqs, out, width = 10)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", "512")
    s2.conf.set("spark.sql.files.openCostInBytes", "0")
    val back = Fasta.read(s2, out)
    assert(back.rdd.getNumPartitions > 4, "must actually split")
    val got = back.select("name", "seq").as[(String, String)].collect().toSet
    assert(got === seqs.as[(String, String)].collect().toSet)
  }
}
