package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 tail additions: KMV distinct sketch, phase-by-transmission,
  * Hardy–Weinberg statistic. */
class R11TailOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q87 KMV: bottom-k plans as TakeOrderedAndProject and the " +
      "estimate brackets the truth") {
    val row = Relational.q87KmvSketch(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val (kActual, kth, est, exact, errPm) = row
    assert(kActual === 64L)
    assert(kth > 0L && kth < (1L << 32))
    assert(exact > 64L, "corpus must have more distinct keys than k")
    // KMV with k=64 has relative s.e. ~ 1/sqrt(62) ~ 13%; allow 4 sigma
    assert(errPm < 520L, s"estimate off by $errPm permille")
    assert(est === 63L * 4294967296L / kth, "estimator formula")
  }

  test("q87 KMV: merge-and-truncate — the distributed bottom-k equals " +
      "the driver-side bottom-k of the full hash set") {
    val hashes = graft.Tables.orders(spark, sf)
      .select(conv(substring(md5(col("o_custkey").cast("string")), 1, 8),
        16, 10).cast("long").as("h"))
      .distinct().as[Long].collect().sorted
    val kthDriver = hashes.take(64).last
    val got = Relational.q87KmvSketch(spark, sf)
      .select("kth_hash").as[Long].collect().head
    assert(got === kthDriver)
  }

  test("x57 phaseByTransmission: every rule on a hand trio fixture") {
    val trios = Seq(("c", "f", "m")).toDF("child", "father", "mother")
    // one site per rule; contig keys keep them apart
    val gt = Seq(
      // hom child phases trivially regardless of het parents
      ("s1", 1L, "c", "0/0"), ("s1", 1L, "f", "0/1"), ("s1", 1L, "m", "0/0"),
      ("s2", 1L, "c", "1/1"), ("s2", 1L, "f", "0/1"), ("s2", 1L, "m", "1/1"),
      // het child, hom-ref father => paternal 0
      ("s3", 1L, "c", "0/1"), ("s3", 1L, "f", "0/0"), ("s3", 1L, "m", "0/1"),
      // het child, hom-alt father => paternal 1
      ("s4", 1L, "c", "0/1"), ("s4", 1L, "f", "1/1"), ("s4", 1L, "m", "0/1"),
      // het child, het father, hom-ref mother => maternal 0, paternal 1
      ("s5", 1L, "c", "0/1"), ("s5", 1L, "f", "0/1"), ("s5", 1L, "m", "0/0"),
      // het child, het father, hom-alt mother => maternal 1, paternal 0
      ("s6", 1L, "c", "0/1"), ("s6", 1L, "f", "0/1"), ("s6", 1L, "m", "1/1"),
      // triple het: unphasable
      ("s7", 1L, "c", "0/1"), ("s7", 1L, "f", "0/1"), ("s7", 1L, "m", "0/1"),
      // violation: hom-alt child, both parents hom-ref
      ("s8", 1L, "c", "1/1"), ("s8", 1L, "f", "0/0"), ("s8", 1L, "m", "0/0"),
      // incomplete: father uncalled (row absent)
      ("s9", 1L, "c", "0/1"), ("s9", 1L, "m", "0/1"))
      .toDF("contig", "pos", "sample", "gt")
    val got = Genomics.phaseByTransmission(gt, trios)
      .select("contig", "status", "phased")
      .as[(String, String, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("s1") === (("phased", Some("0|0"))))
    assert(got("s2") === (("phased", Some("1|1"))))
    assert(got("s3") === (("phased", Some("0|1"))))
    assert(got("s4") === (("phased", Some("1|0"))))
    assert(got("s5") === (("phased", Some("1|0"))))
    assert(got("s6") === (("phased", Some("0|1"))))
    assert(got("s7") === (("ambiguous", None)))
    assert(got("s8") === (("violation", None)))
    assert(got("s9") === (("incomplete", None)))
  }

  test("x58 hweStats: perfect-HWE zero, monomorphic zero, and a " +
      "hand-computed deviation") {
    val mkGt = (contig: String, gts: Seq[String]) =>
      gts.zipWithIndex.map { case (g, i) => (contig, 1L, s"s$i", g) }
    val gt = (
      // 1:2:1 at n=4 is exactly p=q=1/2 equilibrium -> chi2 = 0
      mkGt("hwe0", Seq("0/0", "0/1", "0/1", "1/1")) ++
      // monomorphic: B = 0 -> e_ab = e_bb = 0, chi2 = 0
      mkGt("mono", Seq("0/0", "0/0", "0/0")) ++
      // all-het n=4 (A=B=4, e = 1/2/1): rational chi2 = 1+2+1 = 4.0
      mkGt("xhet", Seq("0/1", "0/1", "0/1", "0/1")) ++
      // uncalled rows excluded: n=2 called, counts 1/0/1, e = 0.5/1/0.5,
      // rational chi2 = 0.5 + 1 + 0.5 = 2.0
      mkGt("miss", Seq("0/0", "1/1", "./.", "./."))
      ).toDF("contig", "pos", "sample", "gt")
    val got = Genomics.hweStats(gt)
      .select("contig", "n_aa", "n_ab", "n_bb", "maf_milli", "chi2_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("hwe0") === (("hwe0", 1L, 2L, 1L, 500L, 0L)))
    assert(got("mono") === (("mono", 3L, 0L, 0L, 0L, 0L)))
    assert(got("xhet") === (("xhet", 0L, 4L, 0L, 500L, 4000L)))
    assert(got("miss") === (("miss", 1L, 0L, 1L, 500L, 2000L)))
  }

  test("t41 renderChatTemplate: offsets index the rendered string " +
      "losslessly, empty turns render") {
    val turns = Seq(
      (7L, 0L, "system", "sys."),
      (7L, 1L, "user", "hello there"),
      (7L, 2L, "assistant", "hi! how can I help?"),
      (7L, 3L, "user", ""), // empty content still renders
      (7L, 4L, "assistant", "ok"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val row = TextAnalysis.renderChatTemplate(turns)
      .as[(Long, Long, Long, Option[Long], Long, String)].collect().head
    val (conv, nTurns, textLen, asstStart, asstChars, md5got) = row
    assert(conv === 7L && nTurns === 5L)
    // reference render, driver-side
    val expect = Seq("system" -> "sys.", "user" -> "hello there",
      "assistant" -> "hi! how can I help?", "user" -> "",
      "assistant" -> "ok")
      .map { case (r, c) => s"<|im_start|>$r\n$c<|im_end|>\n" }.mkString
    assert(textLen === expect.length.toLong)
    val md5ref = java.security.MessageDigest.getInstance("MD5")
      .digest(expect.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5got === md5ref)
    // asst_start points at the first assistant content char (0-based)
    assert(asstStart.isDefined)
    assert(expect.substring(asstStart.get.toInt,
      asstStart.get.toInt + 3) === "hi!")
    assert(asstChars === 19L + 2L)
  }

  test("t41 no-assistant conversation: null start, zero chars") {
    val turns = Seq((1L, 0L, "user", "just a question"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val row = TextAnalysis.renderChatTemplate(turns)
      .as[(Long, Long, Long, Option[Long], Long, String)].collect().head
    assert(row._4.isEmpty && row._5 === 0L)
  }

  test("t42 rougeOverlap: clipped counts on a hand pair") {
    val pairs = Seq((1L, "a a b c", "a b b d")).toDF("pair_id", "cand", "ref")
    val row = TextAnalysis.rougeOverlap(pairs)
      .as[(Long, Long, Option[Long], Option[Long], Long, Option[Long],
        Option[Long])].collect().head
    // unigrams: min(2,1)[a] + min(1,2)[b] = 2; both sides 4 tokens
    assert(row._2 === 2L)
    assert(row._3 === Some(500L) && row._4 === Some(500L))
    // bigrams: only "a b" shared once; 3 bigrams each side
    assert(row._5 === 1L)
    assert(row._6 === Some(333L) && row._7 === Some(333L))
  }

  test("t42 identical pair scores 1000 permille everywhere") {
    val pairs = Seq((1L, "x y z", "x y z")).toDF("pair_id", "cand", "ref")
    val row = TextAnalysis.rougeOverlap(pairs)
      .as[(Long, Long, Option[Long], Option[Long], Long, Option[Long],
        Option[Long])].collect().head
    assert(row === ((1L, 3L, Some(1000L), Some(1000L), 2L, Some(1000L),
      Some(1000L))))
  }

  test("d29 paragraphDedup: first occurrence by (doc_id, pidx) wins, " +
      "later copies scrubbed everywhere") {
    val paras = Seq(
      (1L, 0L, "P1"), (1L, 1L, "P2"),
      (2L, 0L, "P2"), (2L, 1L, "P3"), (2L, 2L, "P2"),
      (3L, 0L, "P1"))
      .toDF("doc_id", "pidx", "para")
    val kept = Dedup.paragraphDedup(paras)
      .as[(Long, Long, String)].collect().toSet
    assert(kept === Set((1L, 0L, "P1"), (1L, 1L, "P2"), (2L, 1L, "P3")))
  }

  test("x59 spliceJunctions: ref-walk semantics — S/I never shift, D " +
      "shifts, multi-intron reads emit every junction") {
    val reads = Seq(
      ("c", 100L, "10M50N20M"),    // junction [110, 160)
      ("c", 100L, "5S10M50N20M"),  // soft clip consumes no ref: same
      ("c", 100L, "10M3I50N20M"),  // insertion consumes no ref: same
      ("c", 100L, "10M2D50N20M"),  // deletion consumes 2: [112, 162)
      ("c", 100L, "10M20N5M30N5M")) // two introns in one read
      .toDF("contig", "pos", "cigar")
    val all = Genomics.spliceJunctions(reads, minSupport = 1L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(all === Set(
      ("c", 110L, 160L, 3L),
      ("c", 112L, 162L, 1L),
      ("c", 110L, 130L, 1L),
      ("c", 135L, 165L, 1L)))
    val supported = Genomics.spliceJunctions(reads, minSupport = 3L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(supported === Set(("c", 110L, 160L, 3L)))
  }

  test("x59 unspliced reads produce no junctions") {
    val reads = Seq(("c", 1L, "76M"), ("c", 5L, "10S66M"))
      .toDF("contig", "pos", "cigar")
    assert(Genomics.spliceJunctions(reads, 1L).count() === 0L)
  }

  test("q88 z-order: aligned box prunes to one bucket and matches the " +
      "raw aggregate") {
    val row = Relational.q88ZorderGate(spark, sf)
      .as[(Long, Long, Long, Boolean, Boolean)].collect().head
    assert(row._4, "4x4 aligned box must decompose to a single z-bucket")
    assert(row._5, "scan must touch only the matching directory")
    val raw = graft.Tables.orders(spark, sf)
      .where(expr("o_custkey % 16 BETWEEN 4 AND 7") &&
        expr("(o_orderkey div 7) % 16 BETWEEN 8 AND 11"))
      .agg(count(lit(1)), sum(col("o_orderkey")))
      .as[(Long, Long)].collect().head
    assert((row._1, row._2) === raw)
  }

  test("q89 funnel: strict order and anchor-window semantics") {
    import java.sql.Timestamp
    val h = 3600L * 1000L // one hour in millis
    def ts(hours: Long) = new Timestamp(hours * h)
    val ev = Seq(
      // u1 completes the whole funnel in order
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // u2: click BEFORE the first view — step 2 never fires
      (2L, ts(5), "click"), (2L, ts(6), "view"), (2L, ts(7), "purchase"),
      // u3: click outside the 72h anchor window
      (3L, ts(0), "view"), (3L, ts(80), "click"),
      // u4: purchase before click — step 3 must anchor on t2, not t1
      (4L, ts(0), "view"), (4L, ts(2), "purchase"), (4L, ts(3), "click"),
      // u5: never views — not in the funnel at all
      (5L, ts(0), "click"), (5L, ts(1), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Relational.funnel(ev, Seq("view", "click", "purchase"),
        72L * 3600L * 1000000L)
      .select("step", "n_users", "conv_permille")
      .as[(Long, Long, Long)].collect().toSeq
    // step 1: u1 u2 u3 u4; step 2: u1 (click@1h) and u4 (click@3h) only —
    // u2's click precedes its view, u3's is outside the 72h window;
    // step 3: u1 only — u4's purchase precedes its click
    assert(got === Seq((1L, 4L, 1000L), (2L, 2L, 500L), (3L, 1L, 250L)))
  }

  test("s24 hierarchical IVF: full-probe theorem and partial recall " +
      "floor hold") {
    val row = Similarity.s24HierIvfGate(spark, sf)
      .as[(Long, Boolean, Boolean)].collect().head
    assert(row._1 === 10L)
    assert(row._2, "probing every (c1, c2) cell must reproduce brute " +
      "force exactly")
    assert(row._3, "2x2 probe must keep recall >= 0.5")
  }

  test("q90 KMV set ops: merged sketch equals the direct union sketch " +
      "(merge-and-truncate theorem) and estimates are consistent") {
    val row = Relational.q90KmvSetOps(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    val (k, uKth, unionEst, jNum, jaccPm, interEst, exU, exI) = row
    assert(k === 32L && jNum <= k)
    // direct bottom-k over the union predicate must give the same kth
    val direct = graft.Tables.orders(spark, sf)
      .where(expr("o_custkey % 3 != 0 OR o_custkey % 2 = 0"))
      .select(conv(substring(md5(col("o_custkey").cast("string")), 1, 8),
        16, 10).cast("long").as("h"))
      .distinct().orderBy("h").limit(32)
      .agg(max(col("h"))).as[Long].collect().head
    assert(uKth === direct,
      "sketch-of-sketches must equal the sketch of the union")
    assert(jaccPm === 1000L * jNum / 32L)
    assert(interEst === jNum * unionEst / 32L)
    assert(exI <= exU)
  }

  test("m16 caption alignment invariants: overlap bounded by caption " +
      "length, -1 exactly when unaligned") {
    val rows = Multimodal.m16CaptionAlign(spark, sf)
      .select("cap_start", "cap_end", "ov_frames", "best_seg_start")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (cs, ce, ov, seg) =>
      assert(ce - cs === 5L)
      assert(ov >= 0L && ov <= 5L)
      assert((seg === -1L) === (ov === 0L),
        s"segment $seg with overlap $ov")
    }
    assert(rows.exists(_._3 > 0L), "some caption must align")
    assert(rows.exists(_._3 === 0L), "some caption must miss")
  }

  test("x60 normalizeVariants: homopolymer deletion left-aligns to the " +
      "run head, trims and SNPs behave") {
    // reference around pos 100: positions 92..99 spell ACGTACGG
    val v = Seq(
      // del of one G in the G-run (98..101): walks left two bases and
      // anchors on the C at 97 — the bcftools-norm canonical form
      ("c", 100L, "GG", "G", "ACGTACGG"),
      // SNP: untouched
      ("c", 100L, "A", "T", "ACGTACGG"),
      // shared trailing base trims in place (no shift: alleles stay
      // non-empty)
      ("c", 100L, "ACT", "GT", "ACGTACGG"),
      // shared leading bases trim with pos advancing (rule 3 chain)
      ("c", 100L, "TAC", "TAG", "ACGTACGG"))
      .toDF("contig", "pos", "ref", "alt", "ctx")
    val got = Genomics.normalizeVariants(v)
      .select("orig_ref", "orig_alt", "pos", "ref", "alt", "converged")
      .as[(String, String, Long, String, String, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got(("GG", "G")) === (("GG", "G", 97L, "CG", "C", true)))
    assert(got(("A", "T")) === (("A", "T", 100L, "A", "T", true)))
    assert(got(("ACT", "GT")) === (("ACT", "GT", 100L, "AC", "G", true)))
    assert(got(("TAC", "TAG")) === (("TAC", "TAG", 102L, "C", "G", true)))
  }

  test("x60 left-align stops at the carried window edge") {
    // all-G context: the deletion would walk past the window; it must
    // stop after consuming the 8 carried bases, deterministically
    val v = Seq(("c", 100L, "GG", "G", "GGGGGGGG"))
      .toDF("contig", "pos", "ref", "alt", "ctx")
    val got = Genomics.normalizeVariants(v)
      .select("pos", "ref", "alt")
      .as[(Long, String, String)].collect().head
    assert(got._1 === 100L - 8L,
      "one base consumed per left step until the window is exhausted")
    assert(got._2 === "GG" && got._3 === "G")
  }

  test("t43 spanCorrupt: re-splicing targets into the input recovers " +
      "the original text; short docs pass through") {
    val text = (0 until 100).map(i => ('a' + i % 26).toChar).mkString
    val docs = Seq((5L, text), (6L, "short doc")).toDF("doc_id", "text")
    val got = TextAnalysis.spanCorrupt(docs)
      .as[(Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // short doc: nothing masked
    assert(got(6L) === ((6L, 0L, "short doc", "<EOS>")))
    val (_, nSpans, input, target) = got(5L)
    assert(nSpans === 2L, "100 chars = 2 full blocks + tail")
    // reconstruct: replace each sentinel in input with its target span
    val spans = "<X(\\d+)>([^<]*)".r.findAllMatchIn(target)
      .map(m => m.group(1) -> m.group(2)).toMap
    val rebuilt = "<X(\\d+)>".r.replaceAllIn(input,
      m => java.util.regex.Matcher.quoteReplacement(spans(m.group(1))))
    assert(rebuilt === text, "span corruption must be lossless")
    assert(target.endsWith("<EOS>"))
    spans.values.foreach(s => assert(s.length === 10))
  }

  test("m17 loudness: gain inverts rms within floor error") {
    val rows = Multimodal.m17Loudness(spark, sf)
      .select("n_samples", "energy", "rms_milli", "gain_permille")
      .as[(Long, Long, Long, Option[Long])].collect()
    assert(rows.length === 500)
    rows.foreach { case (n, e, rms, gain) =>
      assert(rms <= 128000L, "amplitude domain bounds rms")
      // rms_milli = floor(sqrt(1e6 * e div n))
      val x = 1000000L * e / n
      assert(rms * rms <= x && (rms + 1) * (rms + 1) > x)
      gain.foreach(g => assert(g === 80000000L / rms))
      assert(gain.isEmpty === (rms == 0L))
    }
  }

  test("x61 splitReadBreakpoints: clip-edge arithmetic, mate-swap " +
      "canonicalization, unsplit reads drop") {
    val reads = Seq(
      // trailing clip: junction at pos + ref_len = 1050; SA leading clip
      ("chrQ", 1000L, "50M30S", "chrA,2000,+,30S50M"),
      ("chrQ", 1000L, "50M30S", "chrA,2000,+,30S50M"),
      // same junction reported from the mate's perspective (swapped):
      // primary on chrA leading clip at 2000; SA trailing clip 1000+50
      ("chrA", 2000L, "30S50M", "chrQ,1000,+,50M30S"),
      // deletion-internal D consumes reference: 10M5D35M -> ref_len 50
      ("chrQ", 1000L, "10M5D35M30S", "chrA,2000,+,30S50M"),
      // no SA: drops
      ("chrQ", 1000L, "50M30S", null),
      // SA present but clipless primary: drops
      ("chrQ", 1000L, "80M", "chrA,2000,+,30S50M"))
      .toDF("contig", "pos", "cigar", "sa")
    val got = Genomics.splitReadBreakpoints(reads, minSupport = 1L)
      .as[(String, Long, String, Long, Long)].collect().toSet
    assert(got === Set(("chrA", 2000L, "chrQ", 1050L, 4L)))
    // support threshold drops the cluster when raised above its count
    assert(Genomics.splitReadBreakpoints(reads, minSupport = 5L)
      .count() === 0L)
  }

  test("q92 triangleCount: K4 minus an edge has 2 triangles; parallel " +
      "and self edges collapse") {
    val pairs = Seq(
      (1L, 2L), (2L, 1L), // parallel + reversed: one edge
      (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), // K4 minus (3,4)
      (5L, 5L)) // self edge drops
      .toDF("u", "v")
    val got = Relational.triangleCount(pairs)
      .as[(Long, Long, Long)].collect().head
    assert(got === ((4L, 5L, 2L)))
  }

  test("x62 somaticSubtract: all four classifications and the " +
      "candidate cut") {
    val tumor = Seq(
      ("c", 10L, 5L, 20L),   // af 250: candidate
      ("c", 20L, 5L, 20L),   // candidate, germline normal
      ("c", 30L, 5L, 20L),   // candidate, shallow normal
      ("c", 40L, 5L, 20L),   // candidate, no normal row
      ("c", 50L, 1L, 20L),   // af 50 < 100: filtered out
      ("c", 60L, 5L, 6L))    // depth 6 < 8: filtered out
      .toDF("contig", "pos", "alt_depth", "depth")
    val normal = Seq(
      ("c", 10L, 0L, 30L),   // clean deep normal -> somatic
      ("c", 20L, 3L, 30L),   // af 100 > 30 -> germline
      ("c", 30L, 0L, 4L))    // depth 4 < 8 -> low_normal_depth
      .toDF("contig", "pos", "alt_depth", "depth")
    val got = Genomics.somaticSubtract(tumor, normal)
      .select("pos", "status").as[(Long, String)].collect().toMap
    assert(got === Map(10L -> "somatic", 20L -> "germline",
      30L -> "low_normal_depth", 40L -> "no_normal"))
  }

  test("q91 LOCF: carries the latest at-or-before value, null before " +
      "first observation, same-ts dedup by max event_id") {
    import java.sql.Timestamp
    val h = 3600L * 1000L
    def ts(hours: Long) = new Timestamp(hours * h)
    val ev = Seq(
      // user 1: obs at 0h and 13h; 6h grid buckets 0,1,2
      (1L, 1L, ts(0), 1.5),
      (2L, 1L, ts(13), 2.5),
      // user 2: first obs at 5h -> bucket 0 (0h) is null
      (3L, 2L, ts(5), 9.0),
      // user 3: two events at the SAME instant; event_id 5 wins
      (4L, 3L, ts(6), 1.0),
      (5L, 3L, ts(6), 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val HourUs = 3600L * 1000000L
    val Period = 6L * HourUs
    val base = ev.select(col("user_id"),
      unix_micros(col("ts").cast(
        org.apache.spark.sql.types.TimestampType)).as("us"),
      col("event_id"), col("value"))
    val obs = base.groupBy(col("user_id"), col("us"))
      .agg(max(struct(col("event_id"), col("value"))).as("mx"))
      .select(col("user_id").as("r_user"),
        timestamp_micros(col("us")).as("r_ts"),
        expr("CAST(floor(mx.value * 1000) AS BIGINT)").as("val_milli"))
    val grid = base.groupBy(col("user_id"))
      .agg(expr(s"min(us) div ${Period}L").as("lo"),
        expr(s"max(us) div ${Period}L").as("hi"))
      .select(col("user_id"), explode(expr("sequence(lo, hi)")).as("bucket"))
      .withColumn("g_ts", timestamp_micros(col("bucket") * Period))
    val got = graft.plans.AsOf
      .join(grid, obs, "user_id", "r_user", "g_ts", "r_ts")
      .select(col("user_id"), col("bucket"), col("val_milli"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got === Set(
      (1L, 0L, Some(1500L)), (1L, 1L, Some(1500L)), (1L, 2L, Some(1500L)),
      (2L, 0L, None),
      (3L, 1L, Some(2000L))))
  }

  test("s25 matryoshka recall: monotone in prefix length, exact at " +
      "full dimension") {
    val rows = Similarity.s25MatryoshkaRecall(spark, sf)
      .select("dim_prefix", "recall_permille")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(8L, 16L, 32L, 64L))
    assert(rows.last._2 === 1000L, "64-of-64 dims IS the truth")
    // longer prefixes can only see more of the geometry
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2, s"recall dropped from $a to $b")
    }
  }

  test("x63 switchErrors: orientation flips count between surviving " +
      "neighbors only") {
    val ph = Seq(
      // block: T T F F T -> flips at 2->3 and 4->5: 2 switches, 4 pairs
      ("s", "c", 1L, "0|1", "0|1"),
      ("s", "c", 2L, "1|0", "1|0"),
      ("s", "c", 3L, "0|1", "1|0"),
      ("s", "c", 4L, "1|0", "0|1"),
      ("s", "c", 5L, "0|1", "0|1"),
      // unphased site between 5 and 7 drops; 5 and 7 become adjacent
      ("s", "c", 6L, null, "0|1"),
      ("s", "c", 7L, "1|0", "1|0"),
      // lone site on another contig: zero pairs, null rate
      ("s", "c2", 1L, "0|1", "0|1"))
      .toDF("sample", "contig", "pos", "call", "truth")
    val got = Genomics.switchErrors(ph)
      .as[(String, String, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    // ori: 1,1,0,0,1,(drop),1 -> pairs 5, switches at 2->3 and 4->5 = 2
    assert(got("c") === ((5L, 2L, Some(400L))))
    assert(got("c2") === ((0L, 0L, None)))
  }

  test("d30 LSH tuning: fold-powers match scala math.pow within one " +
      "milli and the S-curve picks the mid grid") {
    val rows = Dedup.d30LshTuning(spark, sf)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1)
    rows.foreach { case (b, r, p50, p80, _, _) =>
      def p(sv: Double) = 1.0 - math.pow(1.0 - math.pow(sv, r.toInt), b.toInt)
      assert(math.abs(p50 - math.floor(1000 * p(0.5))) <= 1.0)
      assert(math.abs(p80 - math.floor(1000 * p(0.8))) <= 1.0)
    }
    assert(rows.count(_._6) === 1L, "exactly one chosen row")
    val chosen = rows.find(_._6).get
    assert(chosen._1 === 16L && chosen._2 === 8L,
      "b=16, r=8 minimizes fp + miss at the 0.5/0.8 probes")
  }

  test("x64 tdtTallies: counting identity per configuration, " +
      "exclusions, McNemar milli") {
    val trios = Seq(("c", "f", "m")).toDF("child", "father", "mother")
    // one configuration per contig:
    //   c1 het father / hom-ref mother / het child  -> ALT transmitted
    //   c2 both het / hom-ref child                 -> two REF transmitted
    //   c3 both het / het child                     -> one of each
    //   c4 het father / hom-ref mother+child        -> REF transmitted
    //   c5 hom x hom                                -> uninformative
    //   c6 violation                                -> excluded
    val gt2 = Seq(
      ("c1", 1L, "f", "0/1"), ("c1", 1L, "m", "0/0"), ("c1", 1L, "c", "0/1"),
      ("c2", 1L, "f", "0/1"), ("c2", 1L, "m", "0/1"), ("c2", 1L, "c", "0/0"),
      ("c3", 1L, "f", "0/1"), ("c3", 1L, "m", "0/1"), ("c3", 1L, "c", "0/1"),
      ("c4", 1L, "f", "0/1"), ("c4", 1L, "m", "0/0"), ("c4", 1L, "c", "0/0"),
      ("c5", 1L, "f", "0/0"), ("c5", 1L, "m", "1/1"), ("c5", 1L, "c", "0/1"),
      ("c6", 1L, "f", "0/1"), ("c6", 1L, "m", "0/0"), ("c6", 1L, "c", "1/1"))
      .toDF("contig", "pos", "sample", "gt")
    val row = Genomics.tdtTallies(gt2, trios)
      .as[(String, Long, Long, Option[Long])].collect().head
    // b = 1 (c1) + 0 (c2) + 1 (c3) + 0 (c4) = 2
    // c = 0 + 2 + 1 + 1 = 4; tdt = 1000*(2-4)^2/(2+4) = 666
    assert(row === (("c", 2L, 4L, Some(666L))))
  }

  test("q93 time travel: the pinned manifest sees only commit 1, the " +
      "live read sees both") {
    val row = Relational.q93TimeTravelGate(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    val (v1Rows, v1Sum, curRows, curSum, manifestOk) = row
    assert(manifestOk, "commit 2 must add files and keep commit 1's")
    assert(v1Rows < curRows && v1Sum < curSum)
    val raw = graft.Tables.orders(spark, sf)
      .agg(count(lit(1)),
        sum(when(col("o_orderkey") % 2 === 0, 1L).otherwise(0L)))
      .as[(Long, Long)].collect().head
    assert(curRows === raw._1 && v1Rows === raw._2)
  }

  test("m18 split leakage: planted copies straddle the hash split and " +
      "the perceptual detector never misses an exact duplicate") {
    val row = Multimodal.m18SplitLeakageGate(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect().head
    val (nPlanted, nPlantedLeaking, nExact, supersetOk) = row
    assert(nPlanted === 20L)
    assert(nPlantedLeaking > 0L,
      "some planted copy must land opposite its original")
    assert(nExact >= nPlantedLeaking)
    assert(supersetOk, "identical payload => identical dHash")
  }

  test("x58 chi2_milli is exactly 1000x the rational chi-square on " +
      "divisible fixtures") {
    // all-het n=4: rational chi2 = 4.0 -> 4000 milli (all divisions exact)
    val gt = Seq.tabulate(4)(i => ("c", 1L, s"s$i", "0/1"))
      .toDF("contig", "pos", "sample", "gt")
    val chi = Genomics.hweStats(gt).select("chi2_milli").as[Long]
      .collect().head
    assert(chi === 4000L)
  }
}
