package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 additions: iterative PageRank and variant QC. */
class R11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("d27 wiring: banded and exact labelings agree on exact copies, " +
      "weights downweight every copy") {
    // three exact-copy families (sizes 2, 3, 1-singleton) + an unrelated
    // long doc — identical text guarantees both pipelines find every edge
    val mk = (i: Int, t: String) => (i.toLong, t, "en", "src1")
    val docs = Seq(
      mk(1, "the quick brown fox jumps over the lazy dog repeatedly"),
      mk(2, "the quick brown fox jumps over the lazy dog repeatedly"),
      mk(3, "completely different content about distributed query engines"),
      mk(4, "completely different content about distributed query engines"),
      mk(5, "completely different content about distributed query engines"),
      mk(6, "a singleton document sharing nothing with anything else here"))
      .toDF("doc_id", "text", "lang", "source")
    val banded = Dedup.nearDupClusters(docs.select("doc_id", "text"), 0.8)
    val exact = Dedup.connectedComponents(
      Dedup.exactJaccardPairs(docs, 0.8).select("a_id", "b_id"))
    val bl = banded.as[(Long, Long)].collect().toSet
    val el = exact.as[(Long, Long)].collect().toSet
    assert(bl === el, "labelings must coincide on exact copies")
    assert(bl === Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 3L)),
      "min-id labels per family; singleton absent from the dup graph")
    val w = Dedup.softDedupWeights(docs.select("doc_id"), banded)
      .select("doc_id", "w_ppm").as[(Long, Long)].collect().toMap
    assert(w(1L) === 500000L && w(2L) === 500000L, "pair halves")
    assert(w(3L) === 333333L && w(5L) === 333333L, "triple thirds (floor)")
    assert(w(6L) === 1000000L, "singleton keeps full weight")
  }

  test("x41 chain: sorted+indexed bam region scan -> markdup -> " +
      "target coverage, hand-checkable") {
    import graft.sources.{BamIndex, BamWriter, HadoopIO}
    // reads: chr1 starts 100 (x3 PCR copies), 105, 300; chrM noise 100
    val recs = Seq(
      ("a1", 100, "chr1", 60), ("a2", 100, "chr1", 50),
      ("a3", 100, "chr1", 40), ("b1", 105, "chr1", 60),
      ("c1", 300, "chr1", 60), ("m1", 100, "chrM", 60))
      .toDF("readName", "start0", "referenceName", "mapQ")
      .select(col("readName"), lit(99).as("flag"), col("referenceName"),
        col("start0").as("start"), col("mapQ"), lit("10M").as("cigar"),
        lit("=").as("rnext"), (col("start0") + 500).as("pnext"),
        lit(500).as("tlen"), lit("ACGTACGTAC").as("sequence"),
        lit("*").as("qual"), lit("NM:i:0").as("attributes"))
    val refs = Seq("chr1" -> 10000, "chrM" -> 16569)
    val dir = java.nio.file.Files.createTempDirectory("x41").toString
    val bam = s"$dir/c.bam"
    BamWriter.sortAndWrite(recs,
      "@HD\tVN:1.6\tSO:coordinate\n" +
        refs.map { case (n, l) => s"@SQ\tSN:$n\tLN:$l\n" }.mkString,
      refs, bam, numPartitions = 2)
    BamIndex.build(bam, HadoopIO.driverConf())
    val region = spark.read.format("bam").load(bam)
      .where(col("referenceName") === "chr1" &&
        col("start") >= 50 && col("start") <= 200)
    val kept = MitoQueries.markDuplicates(region)
      .where(col("flag").bitwiseAND(lit(1024)) === 0)
    // 3 copies at 100 collapse to the mapQ-60 read; c1=300 outside region
    assert(kept.select("readName").as[String].collect().toSet ===
      Set("a1", "b1"))
    val geo = kept.select(col("referenceName").as("contig"),
        col("start").cast("long").as("start"))
      .withColumn("end", col("start") + 10L)
    val targets = Seq(("chr1", 100L, 120L), ("chr1", 150L, 170L))
      .toDF("contig", "start", "end")
    // depth>=2 only on [105,110) (a1 ∩ b1): 5 covered bases in t1, 0 in t2
    val tc = Genomics.targetCoverage(geo, targets, minDepth = 2L,
        binWidth = 64, bucketWidth = 512L)
      .select("start_pos", "covered", "pct_milli")
      .as[(Long, Long, Long)].collect().toSet
    assert(tc === Set((100L, 5L, 250L), (150L, 0L, 0L)))
  }

  test("x42 kmerSpectrum: strand-neutral canonical counts, short seqs drop") {
    val seqs = Seq(("s1", "AAAAT"), ("s2", "ATTT"), ("s3", "ACG"))
      .toDF("name", "seq")
    val got = Genomics.kmerSpectrum(seqs, 4)
      .as[(String, Long)].collect().toMap
    // AAAAT -> AAAA, AAAT; ATTT's revcomp is AAAT -> collapses with it;
    // ACG is shorter than k and contributes nothing
    assert(got === Map("AAAA" -> 1L, "AAAT" -> 2L))
  }

  test("x43 liftOver: contained maps affinely, straddle/gap/missing-contig " +
      "unmap, duplicates dedup") {
    val chain = Seq(("chr1", 0L, 90L, "cX", 1000L))
      .toDF("contig", "start", "end", "dst_contig", "dst_start")
    val q = Seq(
      ("chr1", 10L, 18L), ("chr1", 10L, 18L), // duplicate -> one row
      ("chr1", 85L, 93L),                     // straddles the block edge
      ("chr2", 10L, 18L))                     // no chain on chr2
      .toDF("contig", "start", "end")
    val got = Genomics.liftOver(q, chain, binWidth = 64)
      .as[(String, Long, Long, Option[String], Option[Long], Option[Long])]
      .collect().toSet
    assert(got === Set(
      ("chr1", 10L, 18L, Some("cX"), Some(1010L), Some(1018L)),
      ("chr1", 85L, 93L, None, None, None),
      ("chr2", 10L, 18L, None, None, None)))
  }

  test("x44 kinshipTallies: IBS classes, both-het, missing sites excluded") {
    val gt = Seq(
      ("chr1", 1L, "s0", Some(0L)), ("chr1", 1L, "s1", Some(2L)),
      ("chr1", 2L, "s0", Some(1L)), ("chr1", 2L, "s1", Some(1L)),
      ("chr1", 3L, "s0", Some(2L)), ("chr1", 3L, "s1", Some(0L)),
      ("chr1", 4L, "s0", Some(1L)), ("chr1", 4L, "s1", None),
      ("chr1", 5L, "s0", None), ("chr1", 5L, "s1", Some(1L)))
      .toDF("contig", "pos", "sample", "g")
    val r = Genomics.kinshipTallies(gt).collect()
    assert(r.length === 1)
    val row = r.head
    assert((row.getString(0), row.getString(1)) === ("s0", "s1"))
    // 3 co-called sites: (0,2) ibs0, (1,1) ibs2+both-het, (2,0) ibs0
    assert(Seq(2, 3, 4, 5, 6, 7, 8).map(row.getLong) ===
      Seq(3L, 2L, 0L, 1L, 1L, 1L, 1L))
  }

  test("x45 rohRuns: het breaks, missing invisible, minSites filters") {
    val gt = Seq(
      ("s0", "chr1", 1L, Some(0L)), ("s0", "chr1", 2L, Some(2L)),
      ("s0", "chr1", 3L, Some(1L)),                  // het: breaks
      ("s0", "chr1", 4L, Some(0L)), ("s0", "chr1", 5L, None), // invisible
      ("s0", "chr1", 6L, Some(2L)), ("s0", "chr1", 7L, Some(0L)),
      ("s0", "chr1", 8L, Some(2L)))
      .toDF("sample", "contig", "pos", "g")
    val got = Genomics.rohRuns(gt, minSites = 3L, bucketWidth = 4L)
      .as[(String, String, Long, Long, Long)].collect().toSet
    // [1,2] is only 2 sites (dropped); [4..8] has 4 hom calls
    assert(got === Set(("s0", "chr1", 4L, 8L, 4L)))
  }

  test("x46 trinucContexts: tiled lookup, pyrimidine/revcomp classes, " +
      "edge drop") {
    val refs = Seq(("c", "ACGTA")).toDF("name", "seq")
    val tiles = Genomics.refTiles(refs, tileWidth = 2, flank = 1)
    val v = Seq(("c", 2L, "T"), ("c", 3L, "A"), ("c", 4L, "C"),
        ("c", 5L, "G"), ("c", 1L, "G")) // 5: window leaves seq; 1: pos<2
      .toDF("contig", "pos", "alt")
    val got = Genomics.trinucContexts(v, tiles, tileWidth = 2)
      .select("pos", "ctx", "sbs_class")
      .as[(Long, String, String)].collect().toSet
    assert(got === Set(
      (2L, "ACG", "A[C>T]G"),            // ref C: pyrimidine strand as-is
      (3L, "CGT", "A[C>T]G"),            // ref G: revcomp(CGT)=ACG, G>A -> C>T
      (4L, "GTA", "G[T>C]A")))           // ref T: as-is
  }

  test("x48 callableLoci: classes split, same-class neighbors merge, " +
      "gaps break") {
    def rep(n: Int, st: Long) = Seq.fill(n)(("c", st, st + 10L))
    val reads = (rep(1, 1L) ++ rep(2, 11L) ++ rep(4, 21L) ++ rep(3, 31L) ++
        rep(2, 41L) ++ rep(2, 60L))
      .toDF("contig", "start", "end")
    val got = Genomics.callableLoci(reads, minDepth = 2L, maxDepth = 3L,
        bucketWidth = 16L)
      .as[(String, String, Long, Long)].collect().toSet
    // CALLABLE: [11,21) + ([31,41) d3 merging [41,51) d2) + [60,70) = 3
    // regions, 40 bases; EXCESSIVE [21,31); LOW [1,11)
    assert(got === Set(
      ("c", "CALLABLE", 3L, 40L),
      ("c", "EXCESSIVE", 1L, 10L),
      ("c", "LOW_COVERAGE", 1L, 10L)))
  }

  test("t36 dropBoilerplateLines: corpus-frequent lines drop everywhere, " +
      "per-doc uniques survive") {
    val lines = Seq(
      (1L, 0L, "cookie banner"), (1L, 1L, "unique to one"),
      (2L, 0L, "cookie banner"), (2L, 1L, "also unique"),
      (3L, 0L, "cookie banner"), (3L, 1L, "cookie banner"), // same doc twice
      (3L, 2L, "third unique"))
      .toDF("doc_id", "lord", "line")
    // doc-frequency of "cookie banner" is 3 distinct docs > maxDocs=2;
    // its double occurrence inside doc 3 counts once toward frequency
    // but BOTH copies drop
    val kept = TextAnalysis.dropBoilerplateLines(lines, maxDocs = 2L)
      .select("doc_id", "lord").as[(Long, Long)].collect().toSet
    assert(kept === Set((1L, 1L), (2L, 1L), (3L, 2L)))
    // under the threshold nothing drops
    val none = TextAnalysis.dropBoilerplateLines(lines, maxDocs = 3L)
    assert(none.count() === 7L)
  }

  test("q80 as-of directions: exact tie, forward peek, nearest tie to " +
      "backward, tolerance null-extends") {
    import graft.plans.AsOf
    val l = Seq((1L, 10L), (1L, 11L), (1L, 2L), (2L, 11L), (3L, 5L))
      .toDF("k", "t")
    val r = Seq((1L, 4L), (1L, 10L), (1L, 13L), (2L, 9L), (2L, 13L))
      .toDF("rk", "rt")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "t", "rt").as[(Long, Long, Option[Long])]
        .collect().map { case (k, t, v) => (k, t) -> v }.toMap
    val b = m(AsOf.join(l, r, "k", "rk", "t", "rt"))
    assert(b((1L, 10L)) === Some(10L)) // exact hit
    assert(b((1L, 2L)) === None)       // nothing at or before
    val f = m(AsOf.join(l, r, "k", "rk", "t", "rt", direction = "forward"))
    assert(f((1L, 10L)) === Some(10L)) // exact hit matches both ways
    assert(f((1L, 11L)) === Some(13L)) // peeked head
    assert(f((1L, 2L)) === Some(4L))
    assert(f((3L, 5L)) === None)       // no key on the right
    val n = m(AsOf.join(l, r, "k", "rk", "t", "rt", direction = "nearest"))
    assert(n((1L, 11L)) === Some(10L)) // 1 below beats 2 above
    assert(n((2L, 11L)) === Some(9L))  // |9-11| = |13-11|: tie -> backward
    val tol = m(AsOf.join(l, r, "k", "rk", "t", "rt",
      direction = "nearest", tolerance = 1L))
    assert(tol((1L, 2L)) === None)     // 4 is 2 away > tolerance 1
    assert(tol((1L, 11L)) === Some(10L))
    // non-numeric time columns must refuse forward/nearest loudly
    val ls = Seq((1L, "a")).toDF("k", "t")
    val rs = Seq((1L, "a")).toDF("rk", "rt")
    val ex = intercept[IllegalArgumentException] {
      AsOf.join(ls, rs, "k", "rk", "t", "rt", direction = "forward")
    }
    assert(ex.getMessage.contains("backward only"))
  }

  test("x50 depthUniformity: rank-based discrete quantiles, fold-80") {
    // buckets 0..4 of width 64 carry 1..5 whole reads -> masses 10..50
    val reads = (0 until 5).flatMap { b =>
      Seq.fill(b + 1)(("c", b * 64L + 1, b * 64L + 11))
    }.toDF("contig", "start", "end")
    val r = Genomics.depthUniformity(reads, bucketWidth = 64)
      .select("contig", "n_buckets", "total_mass", "p20_mass", "p80_mass",
        "mean_milli", "fold80_milli")
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    // n=5, tot=150; p20 = rank-ceil(1) -> 10, p80 = rank-4 -> 40;
    // mean 30000 milli; fold80 = 150000 / (5 * 10) = 3000
    assert(r === (("c", 5L, 150L, 10L, 40L, 30000L, 3000L)))
  }

  val sfDirS21 = "/root/testdata/sf0.001"

  test("s21 NN-Descent round: monotone recall and floor hold at sf0.001; " +
      "2-hop expansion finds a bucket-split true neighbor") {
    val r = Similarity.s21NnDescentGate(spark, sfDirS21)
      .as[(Long, Boolean, Boolean)].head()
    assert(r._2, "refined recall dropped below base — superset top-k broken")
    assert(r._3, "refined graph lost the s19 recall floor")
    // and the round is not a no-op: the refined graph on the same node
    // set must contain at least one edge the base graph missed (2-hop
    // candidates beyond the probed buckets); equality would mean the
    // expansion never supplied a better neighbor anywhere in the corpus
    val e = Similarity.knnGraphNodes(spark, sfDirS21)
    val base = Similarity.bucketedKnnEdges(e, 3)
      .select("id", "b_id").as[(Long, Long)].collect().toSet
    val truth = Similarity.sampledKnnTruth(e, 3)
      .as[(Long, Long)].collect().toSet
    val missed = truth -- base
    assert(missed.nonEmpty,
      "fixture degenerate: bucketed base already perfect on the sample — " +
        "the monotone gate would be vacuous")
  }

  test("s22 graph search: gate booleans hold at sf0.001; the walk is " +
      "not a no-op (some final-beam edge was absent from the entry beam)") {
    val r = Similarity.s22GraphSearchGate(spark, sfDirS21)
      .as[(Long, Boolean, Boolean)].head()
    assert(r._2, "beam best-cos decreased across hops — top-beam of a " +
      "superset can never rank below its subset's best")
    assert(r._3, "graph walk lost the 0.6 recall floor")
    // non-vacuousness, the s21 discipline: expansion must have entered
    // the beam somewhere, else the fixture only tests the LSH entries
    val (_, init, fin, release) = Similarity.graphSearchBeams(spark,
      sfDirS21, k = 3, beam = 8, hops = 2)
    try {
      val i = init.select("qid", "id").as[(Long, Long)].collect().toSet
      val f = fin.select("qid", "id").as[(Long, Long)].collect().toSet
      assert((f -- i).nonEmpty,
        "fixture degenerate: no expansion node ever displaced an entry — " +
          "the monotone gate would be vacuous")
    } finally release()
  }

  test("x56 umiCollapse: directional boundary (2b-1) exact, distant UMIs " +
      "stay, one-round chains keep the intermediate rep") {
    def reads(umi: String, n: Int, pos: Long = 1L) =
      Seq.fill(n)(("c1", pos, umi))
    val rs = (
      reads("AAAA", 5) ++ reads("AAAT", 3) ++        // 5 >= 2*3-1: absorb
      reads("AAAA", 5, 2L) ++ reads("AAAT", 4, 2L) ++ // 5 < 7: separate
      reads("CCCC", 9, 3L) ++ reads("CCCT", 4, 3L) ++ // chain: CCCT->CCCC
      reads("CCTT", 2, 3L))                           // CCTT->CCCT (1 round)
      .toDF("contig", "pos", "umi")
    val got = Genomics.umiCollapse(rs)
      .as[(String, Long, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("c1", 1L, "AAAA", 8L, 2L),
      ("c1", 2L, "AAAA", 5L, 1L),
      ("c1", 2L, "AAAT", 4L, 1L),
      ("c1", 3L, "CCCC", 13L, 2L),
      ("c1", 3L, "CCCT", 2L, 1L)))
  }

  test("s23 farthestSeeds: hand-traced picks on a line, tie broken by " +
      "lowest id, radius zero once all points are centers") {
    val base = Seq(
      (10L, Seq(0.0f)), (11L, Seq(10.0f)), (12L, Seq(3.0f)),
      (13L, Seq(7.0f)))
      .toDF("id", "emb")
    val (centers, picks, radius) = Similarity.farthestSeeds(base, 4)
    assert(centers.map(_.head) === List(0.0, 10.0, 3.0, 7.0),
      "round 2 ties at d2=9 for ids 12 and 13 — lowest id must win")
    assert(picks.toList === List(100.0, 9.0, 9.0))
    assert(radius === 0.0)
  }

  test("m15 keyframes: shots partition each clip (n_shots = n_cuts + 1, " +
      "frame counts add up, shot 0 starts at frame 0)") {
    val dir = "/root/testdata/sf0.001"
    val shots = Multimodal.m15Keyframes(spark, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shots"), sum("n_frames").as("tot"),
        min(when(col("shot") === 0, col("shot_start"))).as("s0"))
    val cuts = Multimodal.m11SceneCuts(spark, dir)
      .select(col("doc_id"), col("n_cuts"), col("n_frames"))
    val bad = shots.join(cuts, Seq("doc_id"))
      .where(col("n_shots") =!= col("n_cuts") + 1 ||
        col("tot") =!= col("n_frames") || col("s0") =!= 0L)
      .count()
    assert(bad === 0L)
  }

  test("q86 count-min: sketch is partitioning-invariant (linear merge), " +
      "estimates exact when probes don't collide") {
    import graft.functions.CountMinExpr
    val xs = Seq(1L, 1L, 1L, 2L, 2L, 9L, 42L, 42L, 42L, 42L)
    // no pairwise bucket collision among these items in any row
    val items = xs.distinct
    for (d <- 0 until 3)
      assert(items.map(CountMinExpr.bucket(_, d, 64)).distinct.size ===
        items.size, s"fixture collides in row $d")
    val df = xs.toDF("v")
    val sk1 = df.repartition(1)
      .agg(CountMinExpr.countMin(col("v"), 3, 64)).as[Seq[Long]].head()
    val sk8 = df.repartition(8)
      .agg(CountMinExpr.countMin(col("v"), 3, 64)).as[Seq[Long]].head()
    assert(sk1 === sk8, "CMS must be invariant to the merge tree")
    val est = df.repartition(4)
      .agg(CountMinExpr.countMin(col("v"), 3, 64).as("sk"))
      .crossJoin(items.toDF("p"))
      .select(col("p"),
        CountMinExpr.cmsQuery(col("sk"), col("p"), 3, 64).as("e"))
      .as[(Long, Long)].collect().toMap
    assert(est === Map(1L -> 3L, 2L -> 2L, 9L -> 1L, 42L -> 4L))
  }

  test("q85 retention: cohort = first day, repeat same-day events " +
      "collapse, offsets count distinct users") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("q85").toString
    val mk = (u: Long, day: Int, eid: Long) =>
      (eid, Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00"), u,
        "click", 1.0, "{}")
    val ev = Seq(mk(1, 0, 10), mk(1, 2, 11), mk(2, 1, 12), mk(2, 1, 13),
      mk(3, 0, 14), mk(3, 1, 15))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.q85RetentionCohorts(spark, dir)
      .select(col("cohort_day").cast("string"), col("day_offset"),
        col("n_active"))
      .as[(String, Int, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L)))
  }

  test("q84 ivmMerge: existing keys update, zero-count keys leave the " +
      "view, brand-new delta keys enter") {
    val base = Seq(("a", 2L, 10L), ("b", 1L, 5L)).toDF("k", "n", "sq")
    val delta = Seq(("b", -1L, -5L), ("c", 1L, 7L), ("a", 1L, 3L))
      .toDF("k", "dn", "dsq")
    val got = Relational.ivmMerge(base, delta)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a", 3L, 13L), ("c", 1L, 7L)))
  }

  test("x55 cnvSegments: state islands merge, a missing bucket breaks " +
      "adjacency, zero-reference buckets drop") {
    val buckets = Seq(
      ("cA", 0L, 10L, 10L),  // neutral
      ("cA", 1L, 10L, 25L),  // gain 2500
      ("cA", 2L, 10L, 21L),  // gain 2100 -> one segment, mean 2300
      ("cA", 4L, 10L, 10L),  // neutral, but bucket 3 is missing
      ("cA", 5L, 10L, 0L),   // loss 0
      ("cB", 0L, 0L, 5L),    // ref 0: dropped entirely
      ("cB", 1L, 4L, 2L))    // loss 500
      .toDF("contig", "bucket", "ref_mass", "sample_mass")
    val got = Genomics.cnvSegments(buckets, lossMax = 700L, gainMin = 1300L)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("cA", "neutral", 0L, 0L, 1L, 1000L),
      ("cA", "gain", 1L, 2L, 2L, 2300L),
      ("cA", "neutral", 4L, 4L, 1L, 1000L),
      ("cA", "loss", 5L, 5L, 1L, 0L),
      ("cB", "loss", 1L, 1L, 1L, 500L)))
  }

  test("m14 contentBox: asymmetric bars found, all-dark frame reports " +
      "full bars and an empty box") {
    // 4x3 raster, single lit pixel at (x=2, y=1)
    val rgb = new Array[Byte](4 * 3 * 3)
    rgb((1 * 4 + 2) * 3 + 1) = 200.toByte
    assert(ImageOps.contentBox(ImageRaster(4, 3, rgb), 16) ===
      ((1, 1, 2, 1, 1, 1)))
    assert(ImageOps.contentBox(ImageRaster(4, 3, new Array[Byte](36)), 16)
      === ((3, 3, 4, 4, 0, 0)))
    // threshold boundary: a pixel AT thr counts as content
    val edge = new Array[Byte](36)
    edge(0) = 16
    assert(ImageOps.contentBox(ImageRaster(4, 3, edge), 16) ===
      ((0, 2, 0, 3, 1, 1)))
  }

  test("q83 partition prune: scan lists exactly one of the year dirs, " +
      "aggregate equals the unpartitioned filter") {
    val dir = "/root/testdata/sf0.001"
    val r = Relational.q83PartitionPruneGate(spark, dir)
      .as[(Long, Long, Long, Boolean, Boolean)].head()
    assert(r._4, "plan listed more than the matching partition")
    assert(r._5, "a scanned file lived outside oyear=1996")
    val expect = graft.Tables.orders(spark, dir)
      .where(year(col("o_orderdate")) === 1996).count()
    assert(r._1 === expect)
  }

  test("x54 svEvidenceClusters: mate-swapped reports join one cluster, " +
      "concordant pairs filtered, sub-support clusters dropped") {
    val pairs = Seq(
      ("c1", 5000L, "c0", 100L),  // BND reported from the other mate
      ("c0", 120L, "c1", 5100L),
      ("c0", 130L, "c1", 5200L),
      ("c0", 200L, "c0", 350L),   // concordant: insert 150 <= 500
      ("c0", 9000L, "c0", 1000L)) // DEL evidence but support 1 < 3
      .toDF("contig", "pos", "mate_contig", "mate_pos")
    val got = Genomics.svEvidenceClusters(pairs, binWidth = 1000L,
        maxInsert = 500L, minSupport = 3L)
      .as[(String, Long, String, Long, String, Long, Long, Long)]
      .collect().toSet
    assert(got === Set(("c0", 0L, "c1", 5L, "BND", 3L, 100L, 130L)))
  }

  test("t39 temperatureMix: isqrt weights, exact ppm shares, concave " +
      "boost (low-resource up, dominant down)") {
    val docs = Seq(
      (1L, Seq.fill(100)("w").mkString(" "), "lo", "s"),
      (2L, Seq.fill(400)("w").mkString(" "), "hi", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("t39").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.t39TemperatureMix(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // masses 400/100 -> w 20/10, m_tot 500, w_tot 30
    assert(got === Set(
      ("hi", 400L, 800000L, 666666L, 833L),
      ("lo", 100L, 200000L, 333333L, 1666L)))
  }

  test("t40 fim: lossless PSM reassembly incl. degenerate zero-width " +
      "prefix/middle; AR rows untouched") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      (0L, "abcdef", "en", "s"),      // cuts 0,0: empty prefix+middle
      (1L, "abcdef", "en", "s"),      // ar: unchanged
      (4L, "abcdefghij", "en", "s"))  // cuts 3,7: all three parts
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("t40").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.t40FimTransform(spark, dir)
      .as[(Long, String, Long, String)].collect().toSet
    assert(got === Set(
      (0L, "fim", 21L, md5hex("<PRE><SUF>abcdef<MID>")),
      (1L, "ar", 6L, md5hex("abcdef")),
      (4L, "fim", 25L, md5hex("<PRE>abc<SUF>hij<MID>defg"))))
  }

  test("x53 bqsrTable: covariate cells from real qual chars + MD parse; " +
      "N substitutions carry no mismatch evidence") {
    val reads = Seq(
      // sub at cycle 2, quals Q40 Q40 Q2 Q2
      ("rgA", "==C=", "II##", "2T1"),
      // clean read, quals Q40 Q2 Q40 Q2
      ("rgA", "====", "I#I#", "4"),
      // N at the substituted cycle: the scanner suppresses the variant,
      // so cycle 1 contributes an observation but NO mismatch
      ("rgB", "=N==", "IIII", "1G2"))
      .toDF("read_group", "seq", "qual", "md")
    val got = Genomics.bqsrTable(reads)
      .as[(String, Int, Int, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("rgA", 40, 0, 2L, 0L, 0L),
      ("rgA", 40, 1, 1L, 0L, 0L),
      ("rgA", 2, 1, 1L, 0L, 0L),
      ("rgA", 40, 2, 1L, 0L, 0L),
      ("rgA", 2, 2, 1L, 1L, 1000L),
      ("rgA", 2, 3, 2L, 0L, 0L),
      ("rgB", 40, 0, 1L, 0L, 0L),
      ("rgB", 40, 1, 1L, 0L, 0L),
      ("rgB", 40, 2, 1L, 0L, 0L),
      ("rgB", 40, 3, 1L, 0L, 0L)))
  }

  test("x51 gcBias: window GC from the string, zero-mass windows kept, " +
      "staged milli normalization, partial tail window") {
    val refs = Seq(("c", "GGGGAAAACC")).toDF("name", "seq")
    // windows of 4: "GGGG" gc=100, "AAAA" gc=0, tail "CC" len 2 gc=100
    val reads = Seq(("c", 0L, 4L), ("c", 0L, 4L)).toDF("contig", "start", "end")
    val got = Genomics.gcBias(reads, refs, windowWidth = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // tot_mass=8 over 3 windows -> overall_milli = 8000 div 3 = 2666
    // gc=0: 1 window, mass 0 -> (0, 0)
    // gc=100: 2 windows (GGGG mass 8, CC mass 0) -> mean 4000,
    //   norm = 4000*1000 div 2666 = 1500 (staged div, floor)
    assert(got === Set(
      (0L, 1L, 0L, 0L),
      (100L, 2L, 4000L, 1500L)))
  }

  test("t37 canonicalizeUrl: fragment, default port, www, tracking " +
      "params, trailing slash; non-default port and mid-query survive") {
    val cases = Seq(
      ("https://www.a.com:443/x/?utm_source=z&id=1#f", "https://a.com/x?id=1"),
      ("https://a.com/x", "https://a.com/x"),
      ("https://a.com/?utm_source=z", "https://a.com"),
      ("https://a.com:4430/x", "https://a.com:4430/x"),
      ("https://a.com/x?id=1&fbclid=abc", "https://a.com/x?id=1"),
      ("https://a.com/x?gclid=7&id=2&utm_medium=m", "https://a.com/x?id=2"))
    val got = cases.map(_._1).toDF("url")
      .select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("q81 heavy_hitters: MG presence/bounds guarantees vs exact counts; " +
      "exact when k covers the key space; grouped composition") {
    import graft.functions.HeavyHittersExpr
    // deterministic skewed stream: value v appears (30 - v) times
    val rows = (0 until 30).flatMap(v => Seq.fill(30 - v)(v.toLong))
    val k = 5
    val sketch = rows.toDF("v").repartition(8)
      .agg(HeavyHittersExpr.heavyHitters(col("v"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(Long, Long)].collect().toMap
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = rows.size / (k + 1)
    truth.foreach { case (it, f) =>
      if (f > bound)
        assert(sketch.contains(it), s"above-bound item $it (freq $f) missing")
    }
    sketch.foreach { case (it, e) =>
      val f = truth(it)
      assert(e <= f && e >= f - bound, s"item $it est $e outside [${f - bound}, $f]")
    }
    // k >= distinct keys -> no decrements ever fire, sketch is EXACT,
    // and the aggregate composes under groupBy
    val g = (0 until 140).map(i => ((i % 2).toLong, (i % 7).toLong))
      .toDF("grp", "v").repartition(8)
      .groupBy("grp")
      .agg(HeavyHittersExpr.heavyHitters(col("v"), 10).as("hh"))
      .select(col("grp"), explode(col("hh")).as("e"))
      .select(col("grp"), col("e.item"), col("e.est"))
      .as[(Long, Long, Long)].collect()
    assert(g.length === 14)
    g.foreach { case (_, _, est) => assert(est === 10L) }
  }

  test("x52 consensusPileup: plurality base, alphabetic tie rule, " +
      "min-depth mask") {
    val reads = Seq(("c", 0L, "AC"), ("c", 1L, "CT"), ("c", 1L, "CG"))
      .toDF("contig", "start", "seq")
    val got = Genomics.consensusPileup(reads, minDepth = 2L)
      .as[(String, Long, String, Long, Long)].collect().toSeq
    // pos 0: depth 1 -> masked; pos 1: C x3; pos 2: T/G tie -> G (alpha)
    assert(got === Seq(("c", 1L, "C", 3L, 3L), ("c", 2L, "G", 2L, 1L)))
  }

  test("d28 urlDedup: variant families genuinely collide (non-vacuous) " +
      "and partition the corpus") {
    val r = Dedup.d28UrlDedup(spark, sfDirS21)
      .as[(Long, Long)].collect()
    assert(r.map(_._2).max >= 2L,
      "fixture degenerate: no URL variant family has >1 member")
    assert(r.map(_._2).sum === 500L, "kept+collapsed must cover every doc")
    assert(r.map(_._1).distinct.length === r.length)
  }

  test("t38 ccnet buckets: terciles partition each lang with the integer " +
      "rule and monotone score ranges") {
    val r = TextAnalysis.t38CcnetBuckets(spark, sfDirS21)
      .as[(String, Long, Long, Long, Long)].collect()
    r.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._2).sorted.toSeq === Seq(0L, 1L, 2L), s"$lang terciles")
      val n = rows.map(_._3).sum
      // ((rk-1)*3) div n puts floor/ceil(n/3) in each tercile
      rows.foreach { case (_, _, nd, _, _) =>
        assert(math.abs(nd - n / 3) <= 1, s"$lang tercile size $nd vs n=$n")
      }
      val sorted = rows.sortBy(_._2).toSeq
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._5 <= b._4 || a._5 <= b._5,
          s"$lang tercile ranges not monotone: $a vs $b")
      }
    }
  }

  test("char_ngrams is bit-identical to the substr HOF form, including " +
      "multi-byte code points and short strings") {
    val texts = Seq("hello world", "ab", "", "héllo wörld", "日本語のテキスト",
      "aé中😀z")
    for (n <- Seq(1, 3, 5)) {
      val df = texts.toDF("text")
      val hof = df.select(when(length(col("text")) >= n,
        transform(sequence(lit(1), length(col("text")) - (n - 1)),
          i => col("text").substr(i, lit(n))))
        .otherwise(array().cast("array<string>")).as("g"))
        .as[Seq[String]].collect().toSeq
      val nat = df.select(
        graft.functions.CharNgramsExpr.charNgrams(col("text"), n).as("g"))
        .as[Seq[String]].collect().toSeq
      assert(nat === hof, s"n=$n diverged")
    }
  }

  test("q79 pageRankMilli matches a driver-side reference simulation") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val iters = 3
    val got = Relational.pageRankMilli(edges, iters)
      .as[(Long, Long)].collect().toMap
    // reference: same integer milli arithmetic, plain Scala
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val deg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank = nodes.map(_ -> 1000L).toMap
    for (_ <- 0 until iters) {
      val in = es.groupBy(_._2).map { case (dst, in0) =>
        dst -> in0.map { case (s0, _) => rank(s0) / deg(s0) }.sum
      }
      rank = nodes.map(n => n -> (150L + 850L * in.getOrElse(n, 0L) / 1000L))
        .toMap
    }
    assert(got === rank)
    // a sink-only node (2 receives, forwards to 3) ends below the hub 1
    assert(got(1L) > got(4L), "node with inflow outranks the pure source")
  }

  test("q79 rank vector stays distributed: no collect in the loop plan") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Relational.pageRankMilli(edges, 2)
    // the composed plan must still be a single declarative tree: 2 rounds
    // of join+agg fold into one optimized plan with only Aggregate/Join
    // operators — no LocalRelation materialization of ranks beyond the
    // leaf edges
    val collects = r.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    // only the edge literals themselves may be local
    assert(collects.forall(_.output.length <= 2))
    assert(r.as[(Long, Long)].collect().length === 2)
  }

  test("x39 variantQc: class tallies, TsTv, and tv=0 null") {
    val v = Seq(
      ("c1", "A", "G"),   // ts
      ("c1", "G", "A"),   // ts
      ("c1", "A", "C"),   // tv
      ("c1", "A", "AT"),  // ins
      ("c1", "ATT", "A"), // del
      ("c2", "C", "T"),   // ts only -> tv = 0 -> null ratio
      ("c2", "G", "GGG")) // ins
      .toDF("contig", "ref", "alt")
    val got = Genomics.variantQc(v)
      .as[(String, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    assert(got === Set(
      ("c1", 5L, 3L, 1L, 1L, 2L, 1L, Some(2000L)),
      ("c2", 2L, 1L, 1L, 0L, 1L, 0L, None)))
  }
}
