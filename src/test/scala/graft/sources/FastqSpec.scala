package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FASTQ DataSource V2: record-boundary sync under adversarial quality
  * lines, split exactness, compressed roundtrips, malformed-file refusal. */
class FastqSpec extends SparkSpec {
  import spark.implicits._

  /** Records whose QUALITY lines start with '@' — the sync ambiguity. */
  private def adversarial(n: Int): Seq[(String, String, String)] =
    (0 until n).map { i =>
      val len = 10 + i % 37
      val seq = Iterator.continually("ACGTN").flatten.slice(i % 5,
        i % 5 + len).mkString
      // every third record's quality STARTS with '@'
      val qhead = if (i % 3 == 0) "@" else "I"
      val qual = qhead + Iterator.continually("@IJK@LMH").flatten
        .slice(i % 7, i % 7 + len - 1).mkString
      (s"read_$i", seq, qual)
    }

  private def writeFixture(recs: Seq[(String, String, String)],
      comments: Boolean = false): String = {
    val f = Files.createTempFile("graft_fastq", ".fastq")
    val body = recs.map { case (n, s, q) =>
      val hdr = if (comments && n.hashCode % 2 == 0) s"@$n lane=1 x"
        else s"@$n"
      s"$hdr\n$s\n+\n$q"
    }.mkString("", "\n", "\n")
    Files.write(f, body.getBytes("UTF-8"))
    f.toString
  }

  test("whole-file read decodes every record with names and lengths") {
    val recs = adversarial(50)
    val path = writeFixture(recs)
    val got = spark.read.format("fastq").load(path)
      .select("name", "sequence", "quality")
      .as[(String, String, String)].collect().toSet
    assert(got === recs.toSet)
  }

  test("split exactness: every prime splitsize yields the identical " +
      "record multiset despite '@'-led quality lines") {
    val recs = adversarial(300)
    val path = writeFixture(recs)
    val whole = spark.read.format("fastq").load(path)
      .select("name").as[String].collect().sorted.toSeq
    for (ss <- Seq(127, 509, 1021, 4093)) {
      val split = spark.read.format("fastq")
        .option("splitsize", ss.toString).load(path)
        .select("name").as[String].collect().sorted.toSeq
      assert(split === whole, s"splitsize $ss lost or doubled records")
    }
  }

  test("comments parse; absent comment is null") {
    val recs = adversarial(20)
    val path = writeFixture(recs, comments = true)
    val got = spark.read.format("fastq").load(path)
      .select("name", "comment").as[(String, Option[String])]
      .collect().toMap
    recs.foreach { case (n, _, _) =>
      if (n.hashCode % 2 == 0) assert(got(n).contains("lane=1 x"))
      else assert(got(n).isEmpty)
    }
  }

  test("write → read roundtrip, plain and bgzip, with splits") {
    val df = adversarial(200).toDF("name", "sequence", "quality")
    val dir = Files.createTempDirectory("graft_fastq_rt")
    for (ext <- Seq("fastq", "fastq.gz")) {
      val out = s"$dir/rt.$ext"
      FastqDataSource.write(df, out)
      val back = spark.read.format("fastq").option("splitsize", "257")
        .load(out)
        .select("name", "sequence", "quality")
        .as[(String, String, String)].collect().toSet
      assert(back === adversarial(200).toSet, s"roundtrip $ext")
    }
  }

  test("zero-length reads (post-adapter-trimming) survive the write → " +
      "read roundtrip, plain and bgzip, with splits") {
    val recs = (0 until 60).map { i =>
      if (i % 5 == 0) (s"empty_$i", "", "")
      else {
        val len = 8 + i % 13
        (s"read_$i", ("ACGTN" * 8).take(len), "I" * len)
      }
    }
    val df = recs.toDF("name", "sequence", "quality")
    val dir = Files.createTempDirectory("graft_fastq_empty")
    for (ext <- Seq("fastq", "fastq.gz")) {
      val out = s"$dir/rt.$ext"
      FastqDataSource.write(df, out)
      val back = spark.read.format("fastq").option("splitsize", "113")
        .load(out)
        .select("name", "sequence", "quality")
        .as[(String, String, String)].collect().toSet
      assert(back === recs.toSet,
        s"roundtrip $ext must keep zero-length reads")
    }
  }

  test("non-ASCII bytes in names and comments roundtrip as UTF-8, " +
      "not Latin-1 mojibake") {
    val recs = Seq(
      ("lector_α", Some("muestra=año"), "ACGT", "IIII"),
      ("r2", None, "GGCC", "@@@@"),
      ("читатель", Some("λ=3 日本"), "ACGTACGT", "IJKLIJKL"))
    val df = recs.map { case (n, c, s, q) => (n, c.orNull, s, q) }
      .toDF("name", "comment", "sequence", "quality")
    val dir = Files.createTempDirectory("graft_fastq_utf8")
    for (ext <- Seq("fastq", "fastq.gz")) {
      val out = s"$dir/rt.$ext"
      FastqDataSource.write(df, out)
      val back = spark.read.format("fastq").load(out)
        .select("name", "comment", "sequence", "quality")
        .as[(String, Option[String], String, String)].collect().toSet
      assert(back === recs.toSet, s"UTF-8 roundtrip $ext")
    }
  }

  test("column pruning: a length-only scan never materializes strings") {
    val path = writeFixture(adversarial(10))
    val df = spark.read.format("fastq").load(path).select("length")
    assert(df.schema.fieldNames.toSeq === Seq("length"))
    assert(df.as[Int].collect().sum ===
      adversarial(10).map(_._2.length).sum)
  }

  test("malformed: quality shorter than sequence raises, never " +
      "truncates silently") {
    val f = Files.createTempFile("graft_fastq_bad", ".fastq")
    Files.write(f, "@r1\nACGTACGT\n+\nIII\n".getBytes("UTF-8"))
    val e = intercept[Exception] {
      spark.read.format("fastq").load(f.toString).collect()
    }
    assert(e.getMessage.contains("malformed FASTQ") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("malformed FASTQ"))
  }

  test("x73 gate: invariants hold at sf0.001") {
    val r = graft.operators.Genomics
      .x73FastqGate(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().head
    assert(r._1 > 0 && r._2 > r._1, s"gate row: $r")
    assert(r._5, "splitsize invariance")
    assert(r._6, "gz invariance")
  }
}
