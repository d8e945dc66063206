package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the alignment-QC / variant-emission family (x18-x21)
  * and the mixture materializer (t34). */
class GenomicsSpec extends SparkSpec {

  test("x18 coverage intervals: maximal runs, exclusive ends, gaps dropped") {
    import spark.implicits._
    // chr1: [10,20) and [15,25) overlap -> depths 1,2,1; gap; [40,50)
    // chr2: two identical reads -> one depth-2 run (net-zero inner
    // boundary must not split it)
    val reads = Seq(
      ("chr1", 10L, 20L), ("chr1", 15L, 25L), ("chr1", 40L, 50L),
      ("chr2", 5L, 9L), ("chr2", 5L, 9L))
      .toDF("contig", "start", "end")
    val got = Genomics.coverageIntervals(reads)
      .orderBy("contig", "start_pos")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("chr1", 10L, 15L, 1L), ("chr1", 15L, 20L, 2L), ("chr1", 20L, 25L, 1L),
      ("chr1", 40L, 50L, 1L), ("chr2", 5L, 9L, 2L)))
    // maximality: no two adjacent segments share a depth
    got.sliding(2).foreach {
      case Seq(a, b) if a._1 == b._1 && a._3 == b._2 =>
        assert(a._4 !== b._4, s"non-maximal adjacent runs: $a $b")
      case _ =>
    }
  }

  test("x18 equals the naive per-base formulation on a random fixture") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val reads = Seq.fill(300)(
      (if (rnd.nextBoolean()) "c1" else "c2",
        rnd.nextInt(200).toLong + 1, rnd.nextInt(30).toLong + 1))
      .map { case (c, st, len) => (c, st, st + len) }
      .toDF("contig", "start", "end")
    val sweep = Genomics.coverageIntervals(reads)
      .select(col("contig"),
        explode(sequence(col("start_pos"), col("end_pos") - 1)).as("pos"),
        col("depth"))
    val naive = reads
      .select(col("contig"),
        explode(sequence(col("start"), col("end") - 1)).as("pos"))
      .groupBy("contig", "pos").agg(count(lit(1)).as("depth"))
    assert(sweep.exceptAll(naive).isEmpty && naive.exceptAll(sweep).isEmpty)
  }

  test("x19 insert-size histogram counts each template once, exact bins") {
    import spark.implicits._
    // three templates: tlen 150 (bin 1), 250 (bin 2), 260 (bin 2);
    // negative-tlen mates and tlen-0 unmapped mates never count
    val reads = Seq(
      (99, 150), (147, -150), (99, 250), (147, -250),
      (99, 260), (147, -260), (4, 0))
      .toDF("flag", "tlen")
    val got = Genomics.insertSizeHistogram(reads, 100)
      .as[(Long, Long, Long, Int, Int)].collect().toSeq
    assert(got === Seq((1L, 1L, 150L, 150, 150), (2L, 2L, 510L, 250, 260)))
  }

  test("x20 VCF roundtrip: sorted by dictionary order, parse-back equals sites") {
    import spark.implicits._
    import graft.sources.VcfWriter
    // dictionary order chrB < chrA (non-alphabetical on purpose)
    val sites = Seq(
      ("chrA", 5L, "A", "G", 2L, 7L), ("chrB", 9L, "A", "G", 1L, 3L),
      ("chrB", 2L, "A", "G", 4L, 4L), ("chrA", 1L, "A", "G", 1L, 9L))
      .toDF("contig", "pos", "ref", "alt", "ac", "dp")
      .repartition(3) // scrambled input partitioning
    val refs = Seq("chrB" -> 1000, "chrA" -> 1000)
    val out = java.nio.file.Files.createTempDirectory("vcf").toString + "/t.vcf"
    VcfWriter.write(sites, refs, out, numPartitions = 3)
    val lines = scala.io.Source.fromFile(out).getLines().toSeq
    val meta = lines.takeWhile(_.startsWith("#"))
    assert(meta.head === "##fileformat=VCFv4.2")
    assert(meta.last.startsWith("#CHROM"))
    val body = lines.dropWhile(_.startsWith("#"))
    val keys = body.map { l =>
      val f = l.split("\t"); (f(0), f(1).toLong)
    }
    val ord = refs.map(_._1).zipWithIndex.toMap
    assert(keys === keys.sortBy { case (c, p) => (ord(c), p) },
      "records must land in reference-dictionary coordinate order")
    assert(keys.map(_._1) === Seq("chrB", "chrB", "chrA", "chrA"))
    val back = VcfWriter.read(spark, out)
      .as[(String, Long, String, String, Long, Long)].collect().toSet
    assert(back === sites.as[(String, Long, String, String, Long, Long)]
      .collect().toSet)
  }

  test("x20 strict read raises on malformed records; lenient yields nulls") {
    import graft.sources.VcfWriter
    val dir = java.nio.file.Files.createTempDirectory("vcfbad")
    val p = dir.resolve("bad.vcf")
    java.nio.file.Files.writeString(p,
      "##fileformat=VCFv4.2\n" +
        "chrM\t5\t.\tA\tG\t.\tPASS\tAC=1;DP=2\n" +
        "chrM\tNOTANUMBER\t.\tA\tG\t.\tPASS\tAC=1;DP=2\n")
    // lenient: bad row surfaces as null pos
    assert(VcfWriter.read(spark, p.toString).where(col("pos").isNull)
      .count() === 1L)
    // strict: the same file raises, naming the line
    val e = intercept[Exception] {
      VcfWriter.read(spark, p.toString, strict = true).collect()
    }
    assert(e.getMessage.contains("malformed VCF record") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("malformed VCF record"))
  }

  test("x35 genotype roundtrip: long form -> multi-sample VCF -> long form") {
    import spark.implicits._
    import graft.sources.VcfWriter
    val gt = Seq(
      ("chrA", 5L, "A", "T", "s1", "0/1", Some(12L)),
      ("chrA", 5L, "A", "T", "s2", "1/1", Some(30L)),
      // s3 absent at chrA:5 -> must render ./.:. and read back null gt
      ("chrB", 2L, "C", "G", "s1", "0/0", Some(7L)),
      ("chrB", 2L, "C", "G", "s2", "./.", None), // missing dp -> "."
      ("chrB", 2L, "C", "G", "s3", "0/1", Some(9L)))
      .toDF("contig", "pos", "ref", "alt", "sample", "gt", "dp")
    val refs = Seq("chrB" -> 1000, "chrA" -> 1000)
    val out = java.nio.file.Files.createTempDirectory("vcfgt").toString +
      "/g.vcf"
    VcfWriter.writeGenotypes(gt, refs, Seq("s1", "s2", "s3"), out,
      numPartitions = 2)
    val lines = scala.io.Source.fromFile(out).getLines().toSeq
    assert(lines.exists(_.startsWith("#CHROM")) &&
      lines.find(_.startsWith("#CHROM")).get.endsWith("FORMAT\ts1\ts2\ts3"))
    val body = lines.filterNot(_.startsWith("#"))
    assert(body.map(_.split("\t")(0)) === Seq("chrB", "chrA"),
      "dictionary coordinate order")
    assert(body.forall(_.split("\t")(8) === "GT:DP"))
    val back = VcfWriter.readGenotypes(spark, out)
      .as[(String, Long, String, String, String, Option[String], Option[Long])]
      .collect().toSet
    assert(back === Set(
      ("chrA", 5L, "A", "T", "s1", Some("0/1"), Some(12L)),
      ("chrA", 5L, "A", "T", "s2", Some("1/1"), Some(30L)),
      ("chrA", 5L, "A", "T", "s3", Some("./."), None),
      ("chrB", 2L, "C", "G", "s1", Some("0/0"), Some(7L)),
      ("chrB", 2L, "C", "G", "s2", Some("./."), None),
      ("chrB", 2L, "C", "G", "s3", Some("0/1"), Some(9L))))
  }

  test("x35 readGenotypes: FORMAT key order is respected; strict raises") {
    import spark.implicits._
    import graft.sources.VcfWriter
    val dir = java.nio.file.Files.createTempDirectory("vcfgt2")
    val p = dir.resolve("g.vcf")
    // DP before GT, an extra GQ key, and one sample field shorter than
    // FORMAT (trailing keys null, per VCF convention)
    java.nio.file.Files.writeString(p,
      "##fileformat=VCFv4.2\n" +
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsa\tsb\n" +
        "chrM\t5\t.\tA\tG\t.\tPASS\t.\tDP:GT:GQ\t11:0/1:99\t22:1/1\n")
    val back = VcfWriter.readGenotypes(spark, p.toString)
      .as[(String, Long, String, String, String, Option[String], Option[Long])]
      .collect().toSet
    assert(back === Set(
      ("chrM", 5L, "A", "G", "sa", Some("0/1"), Some(11L)),
      ("chrM", 5L, "A", "G", "sb", Some("1/1"), Some(22L))))
    // strict: a record whose FORMAT lacks GT raises naming the line
    val bad = dir.resolve("bad.vcf")
    java.nio.file.Files.writeString(bad,
      "##fileformat=VCFv4.2\n" +
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsa\n" +
        "chrM\t5\t.\tA\tG\t.\tPASS\t.\tDP\t11\n")
    val e = intercept[Exception] {
      VcfWriter.readGenotypes(spark, bad.toString, strict = true).collect()
    }
    assert(e.getMessage.contains("malformed VCF genotype") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("malformed VCF genotype"))
    // and strict survives column pruning: an aggregate that never touches
    // gt still trips the guard (the r10 advice failure mode)
    val e2 = intercept[Exception] {
      VcfWriter.readGenotypes(spark, bad.toString, strict = true)
        .agg(org.apache.spark.sql.functions.sum("dp")).collect()
    }
    assert(e2.getMessage.contains("malformed VCF genotype") ||
      e2.getCause != null &&
        e2.getCause.getMessage.contains("malformed VCF genotype"))
  }

  test("x20 strict read survives column pruning (guard is a filter)") {
    import graft.sources.VcfWriter
    val dir = java.nio.file.Files.createTempDirectory("vcfbad2")
    val p = dir.resolve("bad.vcf")
    java.nio.file.Files.writeString(p,
      "##fileformat=VCFv4.2\n" +
        "chrM\t5\t.\tA\tG\t.\tPASS\tAC=1;DP=2\n" +
        "chrM\tNOTANUMBER\t.\tA\tG\t.\tPASS\tAC=1;DP=2\n")
    // the aggregate consumes only ac — the old column-wrapper guard on
    // pos was pruned away here and malformed rows slid through silently
    val e = intercept[Exception] {
      VcfWriter.read(spark, p.toString, strict = true)
        .agg(org.apache.spark.sql.functions.sum("ac")).collect()
    }
    assert(e.getMessage.contains("malformed VCF record") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("malformed VCF record"))
  }

  test("x34 closestUnbounded: matches naive global argmin, no radius cut") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    def gen(n: Int, spread: Int) = Seq.fill(n) {
      val st = rnd.nextInt(spread).toLong + 1
      (if (rnd.nextBoolean()) "c1" else "c2", st, st + rnd.nextInt(30) + 1)
    }
    // sparse b over a wide span forces several doubling rounds from the
    // tiny initial radius
    val a = gen(120, 50000).distinct.toDF("contig", "start", "end")
    val b = gen(8, 50000).toDF("contig", "start", "end")
    val got = Genomics.closestUnbounded(a, b, binWidth = 64, initRadius = 4L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val d = greatest(lit(0L),
      greatest($"a.start" - $"b.end", $"b.start" - $"a.end"))
    val naive = a.as("a").join(b.as("b"), $"a.contig" === $"b.contig")
      .select($"a.contig".as("contig"), $"a.start".as("a_start"),
        $"a.end".as("a_end"), d.as("d"),
        $"b.start".as("b_start"), $"b.end".as("b_end"))
      .groupBy($"contig", $"a_start", $"a_end")
      .agg(min(struct($"d", $"b_start", $"b_end")).as("best"))
      .select($"contig", $"a_start", $"a_end", $"best.d",
        $"best.b_start", $"best.b_end")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === naive)
    assert(got.size === a.count(), "every a with a b on its contig matches")
  }

  test("x36 genotypeConcordance: all four tally classes, ./. is uncalled") {
    import spark.implicits._
    val a = Seq(
      ("c", 1L, "s1", "0/1"), // concordant
      ("c", 2L, "s1", "0/0"), // discordant (b says 1/1)
      ("c", 3L, "s1", "0/1"), // only_a (b has ./.)
      ("c", 5L, "s1", "./."), // only_b (a uncalled, b called)
      ("c", 6L, "s1", "1/1")) // only_a (b row absent)
      .toDF("contig", "pos", "sample", "gt")
    val b = Seq(
      ("c", 1L, "s1", "0/1"),
      ("c", 2L, "s1", "1/1"),
      ("c", 3L, "s1", "./."),
      ("c", 5L, "s1", "0/0"),
      ("c", 7L, "s1", "./.")) // uncalled on both axes -> nothing
      .toDF("contig", "pos", "sample", "gt")
    val got = Genomics.genotypeConcordance(a, b)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("s1", 1L, 1L, 2L, 1L)))
  }

  test("x37 mendelianViolations: interval rule matches exhaustive check") {
    import spark.implicits._
    // exhaustive 27-case truth table: c from each parent allele pair
    def possible(d: Long) = d match {
      case 0 => Set(0L); case 1 => Set(0L, 1L); case 2 => Set(1L)
    }
    val cases = for (c <- 0L to 2L; f <- 0L to 2L; m <- 0L to 2L) yield {
      val ok = (for (x <- possible(f); y <- possible(m)) yield x + y)
        .contains(c)
      (c, f, m, !ok)
    }
    def gtOf(d: Long) = d match {
      case 0 => "0/0"; case 1 => "0/1"; case _ => "1/1"
    }
    val gt = cases.zipWithIndex.flatMap { case ((c, f, m, _), i) =>
      Seq(("c", i.toLong + 1, s"k${i}_c", gtOf(c)),
        ("c", i.toLong + 1, s"k${i}_f", gtOf(f)),
        ("c", i.toLong + 1, s"k${i}_m", gtOf(m)))
    }.toDF("contig", "pos", "sample", "gt")
    val trios = cases.indices.map(i => (s"k${i}_c", s"k${i}_f", s"k${i}_m"))
      .toDF("child", "father", "mother")
    val got = Genomics.mendelianViolations(gt, trios)
      .as[(String, Long, Long)].collect()
      .map { case (ch, _, v) => ch -> v }.toMap
    cases.zipWithIndex.foreach { case ((c, f, m, viol), i) =>
      assert(got(s"k${i}_c") === (if (viol) 1L else 0L),
        s"c=$c f=$f m=$m expected viol=$viol")
    }
    // incomplete trio (missing father call) is counted, not a violation
    val gt2 = Seq(("c", 1L, "ch", "1/1"), ("c", 1L, "fa", "./."),
      ("c", 1L, "mo", "0/0")).toDF("contig", "pos", "sample", "gt")
    val t2 = Seq(("ch", "fa", "mo")).toDF("child", "father", "mother")
    val r2 = Genomics.mendelianViolations(gt2, t2)
      .as[(String, Long, Long)].collect().toSeq
    assert(r2 === Seq(("ch", 0L, 0L)))
  }

  test("x38 alleleFrequencySpectrum: dosage sums, uncalled reduces AN") {
    import spark.implicits._
    val gt = Seq(
      ("c", 1L, "s1", "0/1"), ("c", 1L, "s2", "1/1"), ("c", 1L, "s3", "0/0"),
      ("c", 2L, "s1", "./."), ("c", 2L, "s2", "0/1"), ("c", 2L, "s3", "0/1"),
      ("c", 3L, "s1", "0/0"), ("c", 3L, "s2", "0/0"), ("c", 3L, "s3", "0/0"))
      .toDF("contig", "pos", "sample", "gt")
    val got = Genomics.alleleFrequencySpectrum(gt)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((2L, 4L, 1L), (0L, 6L, 1L), (3L, 6L, 1L)))
  }

  test("x20 callSites: merged-event DP equals per-base depth at the sites") {
    import spark.implicits._
    // reads [10,20) x2, [15,25); variants observed at 12 (x2) and 18
    val reads = Seq(
      ("c", 10L, 20L, Some(12L)), ("c", 10L, 20L, Some(12L)),
      ("c", 15L, 25L, Some(18L)), ("c", 30L, 40L, None))
      .toDF("contig", "start", "end", "var_pos")
    val got = Genomics.callSites(reads)
      .as[(String, Long, Long, Long)].collect().toSet
    // depth at 12: two reads cover; at 18: all three [10,20)x2 + [15,25)
    assert(got === Set(("c", 12L, 2L, 2L), ("c", 18L, 1L, 3L)))
  }

  test("x21 downsample: deterministic, mate-consistent, threshold-monotone") {
    import spark.implicits._
    val reads = (1 to 400).flatMap { i =>
      Seq((s"r$i", 99, 10), (s"r$i", 147, 10))
    }.toDF("readName", "flag", "mapQ")
    val a = Genomics.downsampleReads(reads, 250, "s").collect().toSet
    val b = Genomics.downsampleReads(reads, 250, "s").collect().toSet
    assert(a === b, "same seed must select the same reads")
    // mate consistency: every kept name appears exactly twice
    val byName = a.groupBy(_.getString(0)).values.map(_.size).toSet
    assert(byName === Set(2) || a.isEmpty)
    // a larger keep fraction is a superset (hash threshold is monotone)
    val c = Genomics.downsampleReads(reads, 600, "s").collect().toSet
    assert(a.subsetOf(c))
    // a different seed selects a different subset
    val e = Genomics.downsampleReads(reads, 250, "other").collect().toSet
    assert(a !== e)
    // keep rate lands near the target (400 names, 25% ±10pt)
    val rate = a.size / 2 / 400.0
    assert(rate > 0.15 && rate < 0.35, s"keep rate $rate far from 0.25")
  }

  test("x22 nmAudit: MD subs + CIGAR I/D reconstruct NM, mismatches flagged") {
    import spark.implicits._
    val reads = Seq(
      // 2 subs (A,T), 1 ins, 2 del; NM=5 claimed -> ok, MD ^GG == CIGAR 2D
      ("3A2T4^GG1", "5M1I5M2D1M", "AS:i:0\tNM:i:5"),
      // clean read: no subs/ins/del, NM=0
      ("10", "10M", "NM:i:0"),
      // claimed NM wrong (2 vs actual 1 sub)
      ("5C4", "10M", "NM:i:2"),
      // MD deletion disagrees with CIGAR D (3 vs 2)
      ("4^GGG4", "4M2D4M", "NM:i:5"))
      .toDF("md", "cigar", "attributes")
    val got = Genomics.nmAudit(reads)
      .select("nm_expected", "nm_claimed", "nm_ok", "del_cigar", "del_md",
        "del_ok")
      .as[(Long, Long, Boolean, Long, Long, Boolean)].collect().toSeq
    assert(got(0) === ((5L, 5L, true, 2L, 2L, true)))
    assert(got(1) === ((0L, 0L, true, 0L, 0L, true)))
    assert(got(2) === ((1L, 2L, false, 0L, 0L, true)))
    assert(got(3)._4 === 2L && got(3)._5 === 3L && !got(3)._6)
  }

  test("x23 baseComposition: translate-kernel counts and integer GC") {
    import spark.implicits._
    val reads = Seq(
      ("c1", "AACCGGTT"), ("c1", "GGGG"), ("c2", "AT"))
      .toDF("contig", "sequence")
    val got = Genomics.baseComposition(reads)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // c1: 2 reads, 12 bases, A2 C2 G6 T2, GC = 8000/12 = 666
    assert(got === Seq(
      ("c1", 2L, 12L, 2L, 2L, 6L, 2L, 666L),
      ("c2", 1L, 2L, 1L, 0L, 0L, 1L, 0L)))
  }

  test("x24 composed workflow: dedup shrinks input, VCF accounting coheres") {
    val r = Genomics.x24WorkflowGate(spark, "/root/testdata/sf0.001").head()
    val (nIn, nKept) = (r.getLong(0), r.getLong(1))
    val (nIntervals, covSq) = (r.getLong(2), r.getLong(3))
    val (nSites, sumAc, sumDp) = (r.getLong(4), r.getLong(5), r.getLong(6))
    assert(nIn > nKept && nKept > 0, s"markdup must drop PCR copies ($nIn -> $nKept)")
    assert(nIntervals > 0 && covSq >= nKept * 10L,
      "coverage mass must be at least kept bases")
    assert(nSites > 0 && sumAc === nSites, "one kept fragment per site")
    assert(sumDp >= nSites, "site depth includes at least the carrying read")
  }

  test("x25 bucketDepth: boundary-spanning reads split mass exactly; batch ≡ stream plan") {
    import spark.implicits._
    // [60,70) spans buckets 0 and 1: mass 4 then 6; [64,74) is bucket-1-only
    val reads = Seq(("c", 60L, 70L), ("c", 64L, 74L), ("d", 0L, 10L))
      .toDF("contig", "start", "end")
    val got = Genomics.bucketDepth(reads, 64)
      .orderBy("contig", "bucket")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("c", 0L, 1L, 4L), ("c", 1L, 2L, 16L), ("d", 0L, 1L, 10L)))
    // mass conservation: total mass equals total read length
    assert(got.map(_._4).sum === 30L)
  }

  test("x26 classifyHaplogroups: best overlap wins, ties break to smaller hg") {
    import spark.implicits._
    val tree = Seq(
      (0L, "a"), (0L, "b"), (0L, "c"),
      (1L, "d"), (1L, "e"), (1L, "f"),
      (2L, "a"), (2L, "d")).toDF("hg", "var")
    val variants = Seq(
      // s1 carries a,b -> hg0 scores 2, hg2 scores 1
      (1L, "a"), (1L, "b"),
      // s2 carries a,d -> hg0 1, hg1 1, hg2 2 -> hg2 wins
      (2L, "a"), (2L, "d"),
      // s3 carries a only -> hg0 and hg2 tie at 1 -> smaller hg wins
      (3L, "a"),
      // s4 carries nothing in the tree -> no prediction row
      (4L, "zzz")).toDF("sample", "var")
    val out = Genomics.classifyHaplogroups(variants, tree)
    val got = out.as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 2L), (2L, 2L, 2L), (3L, 0L, 1L)))
    // the scaladoc's claimed plan: the tree joins as a broadcast dim
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "haplotree must broadcast, not shuffle the variant side twice")
  }

  test("x26 classifyHaplogroups: oversized tree fails loudly, cap is tunable") {
    val s2 = spark.newSession()
    import s2.implicits._
    s2.conf.set("spark.graft.haplotreeMaxRows", "10")
    val variants = Seq((1L, "a")).toDF("sample", "var")
    val bigTree = s2.range(12).select(col("id").as("hg"),
      concat(lit("v"), col("id") % 3).as("var"))
    val ex = intercept[IllegalArgumentException] {
      Genomics.classifyHaplogroups(variants, bigTree)
    }
    assert(ex.getMessage.contains("haplotreeMaxRows"),
      "guard must name the escape-hatch conf")
    // under the cap the same session works
    val ok = Genomics.classifyHaplogroups(
      variants, Seq((0L, "a")).toDF("hg", "var"))
    assert(ok.count() === 1L)
  }

  test("x27 mtDNA-CN: staged milli-ratios from per-side mass") {
    import spark.implicits._
    // 100 bases on a 1000 bp mito, 2000 bases on a 100000 bp nuclear side:
    // depths 0.1 and 0.02 -> CN = 2 * 5 = 10 (10000 milli)
    val reads = (Seq.fill(10)(("m", 1L, 11L)) ++ Seq.fill(200)(("n", 1L, 11L)))
      .toDF("contig", "start", "end")
    val r = Genomics.mtCopyNumber(reads, Seq("m" -> 1000, "n" -> 100000), "m")
      .head()
    assert((r.getLong(0), r.getLong(1)) === ((100L, 2000L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((100L, 20L, 10000L)))
  }

  test("x28 intervalIntersect: equals the naive overlap join, each pair once") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def gen(n: Int) = Seq.fill(n) {
      val st = rnd.nextInt(500).toLong + 1
      (if (rnd.nextBoolean()) "c1" else "c2", st,
        st + rnd.nextInt(120) + 1) // lengths up to 2x the bin width
    }
    val a = gen(200).toDF("contig", "start", "end")
    val b = gen(200).toDF("contig", "start", "end")
    val binned = Genomics.intervalIntersect(a, b, 64)
      .as[(String, Long, Long)].collect().toSeq.sorted
    val naive = a.as("a").join(b.as("b"),
        $"a.contig" === $"b.contig" &&
          $"a.start" < $"b.end" && $"b.start" < $"a.end")
      .select($"a.contig",
        greatest($"a.start", $"b.start"), least($"a.end", $"b.end"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(binned === naive, "bin rewrite must be pair-exact, no dups/misses")
    assert(binned.nonEmpty)
  }

  test("x29 intervalMerge: overlapping AND touching runs collapse, disjoint survive") {
    import spark.implicits._
    val ivs = Seq(
      ("c1", 1L, 5L), ("c1", 3L, 8L), ("c1", 8L, 10L), // overlap + touch
      ("c1", 20L, 25L),                                // disjoint
      ("c2", 5L, 6L))
      .toDF("contig", "start", "end")
    val got = Genomics.intervalMerge(ivs).orderBy("contig", "start_pos")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("c1", 1L, 10L), ("c1", 20L, 25L), ("c2", 5L, 6L)))
  }

  test("x30 intervalSubtract: head/tail clips, mid-splits, pass-throughs, full erasure") {
    import spark.implicits._
    val a = Seq(("c1", 10L, 30L), ("c1", 100L, 110L), ("c1", 50L, 55L))
      .toDF("contig", "start", "end")
    val b = Seq(("c1", 1L, 12L), ("c1", 15L, 18L), ("c1", 28L, 40L),
      ("c1", 45L, 60L), ("c2", 10L, 30L))
      .toDF("contig", "start", "end")
    val got = Genomics.intervalSubtract(a, b, 8)
      .select("contig", "a_start", "start_pos", "end_pos")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("c1", 10L, 12L, 15L), ("c1", 10L, 18L, 28L), // clipped + split
      ("c1", 100L, 100L, 110L)))                    // untouched; [50,55) erased
  }

  test("x31 n50Stats: histogram form equals the textbook definition") {
    import spark.implicits._
    // sample 1: lengths 10,9,8,7,6 (total 40); cumulative desc crosses 20
    // at 9+10=19 <20, +8=27 >=20 -> N50 = 8
    // sample 2: 5,5,5,5 -> N50 = 5; sample 3: single 100 -> N50 = 100
    val seqs = (Seq((1L, 10L), (1L, 9L), (1L, 8L), (1L, 7L), (1L, 6L)) ++
      Seq.fill(4)((2L, 5L)) ++ Seq((3L, 100L)))
      .toDF("sample", "len")
    val got = Genomics.n50Stats(seqs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 40L, 8L), (2L, 4L, 20L, 5L),
      (3L, 1L, 100L, 100L)))
  }

  test("region algebra: intersect + subtract partition A; merge preserves support") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def gen(n: Int) = Seq.fill(n) {
      val st = rnd.nextInt(400).toLong + 1
      (if (rnd.nextBoolean()) "c1" else "c2", st, st + rnd.nextInt(60) + 1)
    }
    // distinct a: per-a identity must be unambiguous for the partition law
    val a = gen(120).distinct.toDF("contig", "start", "end")
    val b = gen(120).toDF("contig", "start", "end")
    def mass(df: org.apache.spark.sql.DataFrame, s: String, e: String) =
      df.agg(sum(col(e) - col(s))).as[Long].head()
    // per-base conservation: |a| = |a ∩ B∪| + |a − B∪| summed over a's
    // (intersect vs MERGED b so segments per a are disjoint, mirroring
    // subtract's own normalization)
    val bm = Genomics.intervalMerge(b)
      .select(col("contig"), col("start_pos").as("start"),
        col("end_pos").as("end"))
    val interMass = mass(Genomics.intervalIntersect(a, bm, 64),
      "start_pos", "end_pos")
    val subMass = mass(Genomics.intervalSubtract(a, b, 64),
      "start_pos", "end_pos")
    val aMass = mass(a, "start", "end")
    assert(interMass + subMass === aMass,
      s"partition law violated: $interMass + $subMass != $aMass")
    // subtract by nothing is identity
    val empty = Seq.empty[(String, Long, Long)].toDF("contig", "start", "end")
    val idem = Genomics.intervalSubtract(a, empty, 64)
      .select(col("contig"), col("start_pos"), col("end_pos"))
      .as[(String, Long, Long)].collect().toSet
    assert(idem === a.as[(String, Long, Long)].collect().toSet)
  }

  test("x32 closestIntervals: overlap beats gap, tie-break deterministic, radius cuts") {
    import spark.implicits._
    val a = Seq(("c", 100L, 110L), ("c", 300L, 310L), ("c", 900L, 910L))
      .toDF("contig", "start", "end")
    val b = Seq(
      ("c", 105L, 108L),             // overlaps a1 -> distance 0
      ("c", 120L, 130L),             // gap 10 from a1 (loses to overlap)
      ("c", 260L, 270L), ("c", 340L, 350L), // a2: gaps 30 both -> tie,
                                            // smaller b_start wins
      ("c", 500L, 510L))             // 390 from a3: beyond radius
      .toDF("contig", "start", "end")
    val got = Genomics.closestIntervals(a, b, radius = 64L, binWidth = 32)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("c", 100L, 110L, 0L, 105L, 108L),
      ("c", 300L, 310L, 30L, 260L, 270L)))
  }

  test("x32 equals the naive argmin join on a random fixture") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def gen(n: Int) = Seq.fill(n) {
      val st = rnd.nextInt(800).toLong + 1
      (if (rnd.nextBoolean()) "c1" else "c2", st, st + rnd.nextInt(40) + 1)
    }
    val a = gen(150).distinct.toDF("contig", "start", "end")
    val b = gen(150).toDF("contig", "start", "end")
    val R = 96L
    val binned = Genomics.closestIntervals(a, b, R, 48)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val d = greatest(lit(0L), greatest($"a.start" - $"b.end", $"b.start" - $"a.end"))
    val naive = a.as("a").join(b.as("b"), $"a.contig" === $"b.contig")
      .select($"a.contig".as("contig"), $"a.start".as("a_start"),
        $"a.end".as("a_end"), d.as("d"),
        $"b.start".as("b_start"), $"b.end".as("b_end"))
      .where($"d" <= R)
      .groupBy($"contig", $"a_start", $"a_end")
      .agg(min(struct($"d", $"b_start", $"b_end")).as("best"))
      .select($"contig", $"a_start", $"a_end", $"best.d",
        $"best.b_start", $"best.b_end")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  test("two-level bucketed sweep equals the flat window at any bucket width") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // MONSTER-CONTIG synthesis: ~95% of boundaries land on c1 (the r10
    // verdict's 90%-one-contig ask) — the two-level sweep must neither
    // funnel c1 through one reducer nor mis-chain across its buckets
    val ivs = Seq.fill(400) {
      val st = rnd.nextInt(3000).toLong + 1
      (if (rnd.nextInt(20) == 0) "c2" else "c1", st,
        st + rnd.nextInt(60) + 1)
    }.toDF("contig", "start", "end")
    // the level-1 partition key bounds work per reducer: at bucket width
    // 64 no (contig, bucket) group may hold more than the bucket's
    // position capacity in boundary rows — the monster contig's 700+
    // boundaries spread across its ~47 buckets instead of one partition
    val maxBucketRows = ivs.select(col("contig"), explode(array(
        col("start"), col("end"))).as("pos"))
      .groupBy(col("contig"), expr("pos div 64"))
      .count().agg(max("count")).head().getLong(0)
    assert(maxBucketRows <= 64 * 2,
      "a (contig, bucket) level-1 partition exceeded its position capacity")
    // flat reference computed inline (the shape the kernel replaced)
    import org.apache.spark.sql.expressions.Window
    val diff = ivs.select(col("contig"), explode(array(
        struct(col("start").as("pos"), lit(1L).as("delta")),
        struct(col("end").as("pos"), lit(-1L).as("delta")))).as("e"))
      .select(col("contig"), col("e.pos").as("pos"), col("e.delta").as("delta"))
      .groupBy(col("contig"), col("pos")).agg(sum(col("delta")).as("delta"))
      .where(col("delta") =!= 0)
    val w = Window.partitionBy(col("contig")).orderBy(col("pos"))
    val flatCov = diff.select(col("contig"), col("pos").as("start_pos"),
        sum(col("delta")).over(w).as("depth"),
        lead(col("pos"), 1).over(w).as("end_pos"))
      .where(col("depth") > 0)
      .select(col("contig"), col("start_pos"), col("end_pos"), col("depth"))
      .as[(String, Long, Long, Long)].collect().toSet
    for (bw <- Seq(7L, 64L, 1024L, 1L << 20)) {
      val got = Genomics.coverageIntervals(ivs, bucketWidth = bw)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got === flatCov, s"coverage mismatch at bucketWidth=$bw")
    }
    // merge: union support must equal coverage support, disjoint, sorted
    for (bw <- Seq(13L, 512L)) {
      val merged = Genomics.intervalMerge(ivs, bucketWidth = bw)
        .as[(String, Long, Long)].collect()
      val mergedMass = merged.map { case (_, s0, e0) => e0 - s0 }.sum
      val covMass = flatCov.toSeq.map { case (_, s0, e0, _) => e0 - s0 }.sum
      assert(mergedMass === covMass, s"merge mass mismatch at bw=$bw")
      merged.groupBy(_._1).foreach { case (_, xs) =>
        val srt = xs.sortBy(_._2)
        srt.sliding(2).foreach {
          case Array((_, _, e1), (_, s2, _)) =>
            assert(e1 < s2, "merged intervals must be disjoint, non-touching")
          case _ => ()
        }
      }
    }
  }

  test("x32 bin-boundary at exactly distance R is found (both sides)") {
    import spark.implicits._
    // r10 advice: with the unpadded cover (a_start-R) div w ..
    // (a_end+R-1) div w, a b at distance EXACTLY R whose facing end
    // lands on a bin boundary shares no (contig,bin) key and is
    // silently dropped. Right side: b_start = a_end + R = 128, a
    // multiple of w=64. Left side mirror: b_end = a_start - R.
    val a = Seq(("c", 0L, 64L)).toDF("contig", "start", "end")
    val bRight = Seq(("c", 128L, 136L)).toDF("contig", "start", "end")
    val gotR = Genomics.closestIntervals(a, bRight, radius = 64L, binWidth = 64)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(gotR === Set(("c", 0L, 64L, 64L, 128L, 136L)))
    val a2 = Seq(("c", 192L, 200L)).toDF("contig", "start", "end")
    val bLeft = Seq(("c", 120L, 128L)).toDF("contig", "start", "end")
    val gotL = Genomics.closestIntervals(a2, bLeft, radius = 64L, binWidth = 64)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(gotL === Set(("c", 192L, 200L, 64L, 120L, 128L)))
  }

  test("x30/x33 tolerate duplicate a-side / target identities") {
    import spark.implicits._
    // r10 advice: duplicate (contig,start,end) rows in a corrupted the
    // gap algebra (each overlap gathered once per duplicate) and
    // double-counted covered mass (pct_milli > 1000). Both now dedup
    // identities internally.
    val aDup = Seq(("c", 10L, 30L), ("c", 10L, 30L))
      .toDF("contig", "start", "end")
    val b = Seq(("c", 15L, 20L)).toDF("contig", "start", "end")
    val sub = Genomics.intervalSubtract(aDup, b, 64)
      .select(col("contig"), col("start_pos"), col("end_pos"))
      .as[(String, Long, Long)].collect().toSet
    assert(sub === Set(("c", 10L, 15L), ("c", 20L, 30L)))
    val reads = Seq(("c", 10L, 30L), ("c", 10L, 30L))
      .toDF("contig", "start", "end")
    val tDup = Seq(("c", 10L, 30L), ("c", 10L, 30L))
      .toDF("contig", "start", "end")
    val cov = Genomics.targetCoverage(reads, tDup, 2L, 8)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(cov === Set(("c", 10L, 30L, 20L, 1000L)))
  }

  test("x33 targetCoverage: depth threshold, partial cover, zero targets") {
    import spark.implicits._
    // depth ≥2 region: [10,20) x2 reads; single-covered [30,40) won't count
    val reads = Seq(("c", 10L, 20L), ("c", 10L, 20L), ("c", 30L, 40L))
      .toDF("contig", "start", "end")
    val targets = Seq(
      ("c", 5L, 15L),   // half inside the ≥2 region -> 5/10 = 500
      ("c", 30L, 40L),  // only single-covered -> 0
      ("c", 12L, 18L))  // fully inside -> 1000
      .toDF("contig", "start", "end")
    val got = Genomics.targetCoverage(reads, targets, 2L, 8)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("c", 5L, 15L, 5L, 500L),
      ("c", 30L, 40L, 0L, 0L),
      ("c", 12L, 18L, 6L, 1000L)))
  }

  test("t34 per-source plan joins back broadcast (claimed shape)") {
    val df = TextAnalysis.t34MixtureMaterialize(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the per-source epoch plan must broadcast to the docs side")
  }

  test("t34 mixture: copies = full epochs + fractional coin, mass sane") {
    val out = TextAnalysis.t34MixtureMaterialize(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, tok, full) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0 && tok > 0 && full >= 0)
    }
    // determinism
    val again = TextAnalysis.t34MixtureMaterialize(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
