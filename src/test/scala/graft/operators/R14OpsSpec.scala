package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 head: checkpointed deep iteration (q108/q109). */
class R14OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q108
  test("q108 pageRankMilli K=12: hand graph matches a driver-side " +
      "recompute of the same integer recurrence") {
    // 4-node graph: 0->1, 0->2, 1->2, 2->0, 3->2 (3 is a dangling source)
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
      .toDF("src", "dst")
    val got = Relational.pageRankMilli(e, iters = 12)
      .as[(Long, Long)].collect().toMap
    // driver recompute: same milli recurrence, dangling mass dropped
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = nodes.map(_ -> 1000L).toMap
    for (_ <- 1 to 12) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = nodes.map(n => n -> (150L + 850L * in.getOrElse(n, 0L) / 1000L)).toMap
    }
    assert(got === rank)
  }

  test("q108: the in-row lineage bound holds at K=12 and the plan is " +
      "constant-size past a truncation point") {
    // would throw from requireBoundedLineage if the cadence regressed
    val df = Relational.q108DeepPageRank(spark, sf)
    assert(df.count() > 0)
  }

  // ------------------------------------------------------------- q109
  test("q109 bfsLevels on a path graph: exact levels, horizon capped " +
      "at maxIter, unvisited tail absent") {
    val e = (0L until 39L).map(k => (k, k + 1)).toDF("u", "v")
    val got = Relational.bfsLevels(e, src = 0L, maxIter = 12)
      .as[(Long, Long)].collect().toMap
    assert(got === (0L to 12L).map(k => k -> k).toMap)
  }

  test("q109 bfsLevels: branching graph takes the min level and " +
      "early-stops when the frontier drains") {
    // star + chord: 0-1, 0-2, 1-3, 2-3 (3 reachable at lvl 2 two ways)
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val got = Relational.bfsLevels(e, src = 0L, maxIter = 50)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  // ------------------------------------------------------------- x79
  import graft.sources.{FastqDataSource, FastqPaired}

  private def writePair(dir: java.nio.file.Path, legacy: Boolean,
      stems: Seq[String]): (String, String) = {
    def df(i: Int) = stems.map { st =>
      val nm = if (legacy) s"$st/$i" else st
      val cm = if (legacy) null else s"$i:N:0:ACGT"
      (nm, cm, "ACGT" * i, "IIII" * i)
    }.toDF("name", "comment", "sequence", "quality")
    val (r1, r2) = (s"$dir/R1.fastq", s"$dir/R2.fastq")
    FastqDataSource.write(df(1), r1)
    FastqDataSource.write(df(2), r2)
    (r1, r2)
  }

  test("x79 FastqPaired: strict pairing in both naming conventions") {
    for (legacy <- Seq(true, false)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_pe")
      val (r1, r2) = writePair(dir, legacy, (1 to 20).map(i => s"s$i"))
      val got = FastqPaired.read(spark, r1, r2, strict = true)
        .select("name", "len_1", "len_2")
        .as[(String, Int, Int)].collect()
      assert(got.length === 20)
      got.foreach { case (n, l1, l2) =>
        assert(n.startsWith("s") && !n.contains("/"))
        assert(l1 === 4 && l2 === 8)
      }
    }
  }

  test("x79 FastqPaired: lenient drops the orphan; strict raises on it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pe_o")
    val (r1, r2) = writePair(dir, legacy = true, (1 to 9).map(i => s"s$i"))
    // append an orphan record to R1 only
    java.nio.file.Files.write(java.nio.file.Paths.get(r1),
      "@orphan/1\nACGT\n+\nIIII\n".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    // raw nio append leaves the Hadoop LocalFS checksum sidecar stale
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/.R1.fastq.crc"))
    assert(FastqPaired.read(spark, r1, r2, strict = false).count() === 9L)
    val e = intercept[Throwable] {
      FastqPaired.read(spark, r1, r2, strict = true).count()
    }
    var root: Throwable = e
    while (root.getCause != null) root = root.getCause
    assert(root.getMessage.contains("unpaired read"), root.toString)
  }

  test("x79 FastqPaired: strict refuses duplicate stems within one file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pe_d")
    val (r1, r2) = writePair(dir, legacy = false, Seq("a", "b", "a"))
    assert(FastqPaired.read(spark, r1, r2, strict = false).count() === 5L,
      "lenient cross-pairs duplicates like any equi-join (2x2 + 1)")
    val e = intercept[Throwable] {
      FastqPaired.read(spark, r1, r2, strict = true).count()
    }
    var root: Throwable = e
    while (root.getCause != null) root = root.getCause
    assert(root.getMessage.contains("duplicate read name"), root.toString)
  }

  // ------------------------------------------------------------- t51
  test("t51 priority sampling: k >= n degrades to exact totals (tau=0), " +
      "and the k=50 sample is exactly the top-k by priority") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").as("w"))
    val n = docs.count().toInt
    val all = TextAnalysis.prioritySample(docs, k = n + 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(all.length === n)
    val totalW = docs.agg(sum("w")).head.getLong(0)
    all.foreach { case (_, w, _, tau, wHat, est) =>
      assert(tau === 0L && wHat === w && est === totalW,
        "k >= n must be the exact total (DLT theorem)")
    }
    // k = 50: the sampled set equals a driver-side recompute's top-k
    val got = TextAnalysis.prioritySample(docs, k = 50)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 50)
    val naive = docs.as[(Long, Long)].collect().map { case (id, w) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:t51".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex, 16) + 1L
      (id, w, w * 4294967296L / h)
    }.sortBy { case (id, _, p) => (-p, id) }
    val expTau = naive(50)._3
    assert(got.map(_._1).toSeq === naive.take(50).map(_._1).toSeq)
    assert(got.forall(_._4 == expTau))
    got.zip(naive.take(50)).foreach { case (g, (_, w, p)) =>
      assert(g._2 === w && g._3 === p && g._5 === math.max(w, expTau))
    }
  }

  // ------------------------------------------------------------- x81
  test("x81 qualityTrim: hand reads — first failing window cuts, short " +
      "reads pass whole, all-bad trims to zero") {
    // w=5, meanQ=15 → window sum threshold 75; 'I'=Q40, '#'=Q2, '5'=Q20
    val reads = Seq(
      ("clean", "IIIIIIIIII"),            // never fails -> 10
      ("tail", "IIIIII" + "####"),        // first window with >= 4 bad
                                          // bases starts at 6 -> keep 5
      ("allbad", "########"),             // first window fails -> 0
      ("short", "##"),                    // len < w -> passes whole
      ("border", "55555" + "IIIII"))      // Q20 window sum 100 >= 75 -> 10
      .toDF("name", "quality")
    val got = Genomics.qualityTrim(reads, window = 5, meanQ = 15)
      .select("name", "trimmed_len").as[(String, Long)].collect().toMap
    assert(got === Map("clean" -> 10L, "tail" -> 5L, "allbad" -> 0L,
      "short" -> 2L, "border" -> 10L))
  }

  test("x81 gate: class structure — clean keeps all, tails trim, " +
      "all-bad drops everything") {
    val rows = Genomics.x81QualityTrim(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(0, 1, 2))
    val byCls = rows.map(r => r._1 -> r).toMap
    assert(byCls(0)._3 === byCls(0)._4 && byCls(0)._5 === 0L,
      "clean class keeps every base")
    assert(byCls(1)._4 < byCls(1)._3 && byCls(1)._4 > 0L,
      "tail class genuinely trims but keeps heads")
    assert(byCls(2)._4 === 0L && byCls(2)._5 === byCls(2)._2,
      "all-bad class drops every read")
  }

  // ------------------------------------------------------------- t52
  test("t52 count-of-counts: sf corpus ties out against a driver-side " +
      "bigram recount; discount formula exact") {
    val rows = TextAnalysis.t52CountOfCounts(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty &&
      rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // driver recount over the same tokenization
    val texts = graft.Tables.documents(spark, sf)
      .select("text").as[String].collect()
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    texts.foreach { t =>
      val toks = t.trim.toLowerCase.split("\\s+")
      toks.sliding(2).filter(_.length == 2)
        .foreach(p => counts((p(0), p(1))) += 1)
    }
    val coc = counts.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    rows.foreach { case (c, n, tt, tk, dm) =>
      assert(n === coc(c), s"N_$c")
      assert(tt === counts.size.toLong && tk === counts.values.sum)
      val (n1, n2) = (coc.getOrElse(1L, 0L), coc.getOrElse(2L, 0L))
      assert(dm === 1000L * n1 / (n1 + 2 * n2))
    }
  }

  // ------------------------------------------------------------- q107
  test("q107 state evolution: evolved restart on the old checkpoint is " +
      "loud; recovery reprocess matches a batch recompute") {
    val rows = Relational.q107StateEvolutionGate(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._4), "schema evolution must fail loudly, " +
      "never silently produce numbers from incompatible state")
    // batch recompute of the final-watermark rule over the full input
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
    val wm = ev.agg(max(col("ts"))).head.getTimestamp(0).getTime * 1000L -
      3600L * 1000000L
    val expect = ev
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("ck"))
      .select(unix_micros(col("w.start")).as("ws"),
        unix_micros(col("w.end")).as("we"), col("n"), col("ck"))
      .where(col("we") <= wm)
      .select("ws", "n", "ck")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq === expect)
  }

  // ------------------------------------------------------------- d34
  test("d34 skew CC: giant 90% component labeled by its minimum, pairs " +
      "intact, closed form ties out") {
    val rows = Dedup.d34SkewCcGate(spark, sf)
      .as[(Long, Long)].collect()
    val n = graft.Tables.documents(spark, sf).count()
    val giant = rows.filter(_._1 == 1L)
    assert(giant.length === 1 && giant.head._2 === n - n / 10,
      s"giant component must hold the 90%: ${giant.toSeq}")
    val pairs = rows.filter(_._1 != 1L)
    assert(pairs.forall(_._2 == 2L))
    assert(pairs.map(_._1).toSeq ===
      (0L until n by 20).filter(_ + 10 < n).toSeq)
  }

  // ------------------------------------------------------------- x80
  test("x80 cohort gate: 8 per-sample rows partition x08's totals; " +
      "dims loaded once") {
    val rows = MitoQueries.x80CohortGate(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === (0L to 7L))
    // the slices partition x08's population: totals must tie out
    val x08 = MitoQueries.x08PipelineGate(spark, sf)
      .as[(Long, Long, Long)].collect().head
    assert(rows.map(_._2).sum === x08._1, "n_out partition")
    assert(rows.map(_._3).sum === x08._2, "sum_start partition")
    assert(rows.map(_._4).sum === x08._3, "sum_mapq partition")
    assert(rows.forall(_._2 > 0), "every slice classifies something")
  }

  test("x79 gate: booleans pin orphan behavior; counts positive") {
    val r = Genomics.x79PairedFastq(spark, sf)
      .as[(Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().head
    assert(r._1 > 0 && r._2 > 0 && r._3 > 0 && r._4 === r._1)
    assert(r._5 > 0 && r._5 < r._1, "both conventions present")
    assert(r._6, "lenient must drop exactly the orphan")
    assert(r._7, "strict must raise on the orphan")
  }
}
