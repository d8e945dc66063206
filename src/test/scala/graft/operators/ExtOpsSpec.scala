package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-9 extension operators (q47–q49, t24/t25,
  * s15/s16, m09) that the DuckDB oracle can't see: plan markers,
  * cross-formulation equalities, and kernel-level exactness. */
class ExtOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q47
  test("q47 runtime bloom filter: marker planned AND aggregate matches plain filter") {
    val row = Relational.q47RuntimeBloomGate(spark, sf).collect()(0)
    assert(row.getBoolean(3), "bloom filter was not planned")
    val expect = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf).where(col("o_custkey") % 97 === 0),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("o_custkey"))).collect()(0)
    assert(row.getLong(0) === expect.getLong(0))
    assert(row.getLong(1) === expect.getLong(1))
    assert(row.getLong(2) === expect.getLong(2))
  }

  // ------------------------------------------------------------- q48
  test("q48 grouping sets == union of the three group-bys plus grand total") {
    val got = Relational.q48GroupingSets(spark, sf).count()
    val li = graft.Tables.lineitem(spark, sf)
    val expect =
      li.select(col("l_returnflag"), col("l_linestatus")).distinct.count() +
        li.select(col("l_returnflag")).distinct.count() +
        li.select(col("l_linestatus")).distinct.count() + 1
    assert(got === expect)
  }

  // ------------------------------------------------------------- q49
  test("q49 RANGE frame equals the quadratic per-user reference") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
    val ref = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.us") >= col("a.us") - 3600000000L &&
          col("b.us") <= col("a.us"))
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(lit(1)).as("cnt_1h"), sum(col("b.event_id")).as("sum_ids_1h"))
    val got = Relational.q49RangeFrame(spark, sf)
      .select("event_id", "cnt_1h", "sum_ids_1h")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  // ------------------------------------------------------------- t24
  test("t24 LM score: zero OOV for the training language, model broadcast") {
    val df = TextAnalysis.t24LmScore(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "trigram model must broadcast, not shuffle")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val en = rows.find(_._1 == "en").get
    // every en trigram is in the en-trained model by construction
    assert(en._5 === 0L, "en docs must have zero OOV against an en model")
    // each in-vocab trigram contributes >= 1 bit (cnt >= 1 -> bin(2) = 2 chars)
    assert(en._4 >= en._3, "sum_bits must be >= n_grams for in-vocab text")
    rows.foreach { r =>
      assert(r._2 > 0 && r._3 > 0, s"${r._1}: empty lang slice")
      assert(r._5 <= r._3, s"${r._1}: OOV count exceeds gram count")
    }
  }

  // ------------------------------------------------------------- t25
  test("t25 BPE merges: hand-checked greedy merges and fold application") {
    import spark.implicits._
    // freq("ababc") = 10 dominates: pairs (a,b)=20, (b,a)=10, (b,c)=10
    val wc = Seq(("ababc", 10L), ("xy", 1L)).toDF("word", "freq")
    val merges = TextAnalysis.bpeMerges(wc, 3)
    // round 1: (a,b) -> "ab"; "ababc" = [ab, ab, c]
    // round 2: pairs (ab,ab)=10, (ab,c)=10, (x,y)=1 -> tie (ab,ab) < (ab,c)
    // round 3: "abab c" = [abab, c] -> (abab, c)
    assert(merges === Seq(("a", "b"), ("ab", "ab"), ("abab", "c")))
  }

  test("t25 gate derivation holds on the corpus") {
    val r = TextAnalysis.t25BpeGate(spark, sf).collect()(0)
    assert(r.getBoolean(4), s"merges were ${r.getString(1)}, ${r.getString(2)}, ${r.getString(3)}")
  }

  // ------------------------------------------------------------- s15
  test("s15 radius search agrees with a brute-force recount") {
    import graft.functions.VectorFns._
    val e = graft.Tables.embeddings(spark, sf)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val n = e.where(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val ref = n.crossJoin(broadcast(q))
      .where(round(cosine(col("q_emb"), col("n_emb")), 6) >= 0.2)
      .groupBy("q_id").agg(count(lit(1)).as("n_neighbors"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Similarity.s15RadiusSearch(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref)
  }

  // ------------------------------------------------------------- s16
  test("s16 MMR: diversifies a clustered shortlist; lambda=1 reduces to top-k") {
    def basis(i: Int, v: Double): Array[Double] = {
      val a = Array.fill(4)(0.0); a(i) = v; a
    }
    val shortlist = Array(
      (0L, 0.9, basis(0, 1.0)), (1L, 0.89, basis(0, 1.0)),
      (2L, 0.5, basis(1, 1.0)), (3L, 0.4, basis(2, 1.0)))
    // lambda=1: pure relevance
    assert(Similarity.mmrSelect(shortlist, 3, 1.0) === Seq(0L, 1L, 2L))
    // lambda=0.5: second pick of cluster 0 is fully penalized (cos=1)
    assert(Similarity.mmrSelect(shortlist, 3, 0.5) === Seq(0L, 2L, 3L))
    val gate = Similarity.s16MmrGate(spark, sf).collect()(0)
    assert(gate.getLong(0) === 1L && gate.getLong(1) === 3L)
    assert(gate.getBoolean(3) && gate.getLong(4) === 0L)
  }

  // ------------------------------------------------------------- d23
  test("d23 edit-distance pairs: all 20 planted substitutions surface with lev <= 1") {
    val rows = Dedup.d23EditDistancePairs(spark, sf).collect()
    val planted = rows.filter(_.getLong(1) >= 1000000000L)
    assert(planted.length >= 20)
    val direct = planted.filter(r => r.getLong(1) - 1000000000L === r.getLong(0))
    assert(direct.length === 20, "every planted copy must pair with its source")
    direct.foreach(r => assert(r.getInt(2) <= 1))
  }

  // ------------------------------------------------------------- t26/t27
  test("t26 hash split: partitions the corpus, stable across runs, ~98/1/1") {
    val rows = TextAnalysis.t26HashSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.values.sum === total)
    assert(rows.getOrElse("train", 0L) > total * 9 / 10)
    val again = TextAnalysis.t26HashSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === again)
  }

  test("t27 cluster-safe split: zero cluster straddle, planted groups counted") {
    val r = TextAnalysis.t27ClusterSafeSplit(spark, sf).collect()(0)
    val (nGroups, nDocs, nMulti) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nMulti >= 20, "the 20 planted copies must form multi-doc groups")
    assert(nDocs === graft.Tables.documents(spark, sf).count() + 20)
    assert(nGroups <= nDocs - 20)
    assert(r.getLong(3) === 0L, "cluster-keyed split must never straddle")
  }

  // ------------------------------------------------------------- s17
  test("s17 filtered KNN: every neighbor carries the query's label, pre-filter semantics") {
    val rows = Similarity.s17FilteredKnn(spark, sf).collect()
    assert(rows.nonEmpty)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(e(r.getLong(0)) === r.getInt(1), "label column must be the query's")
      assert(e(r.getLong(3)) === r.getInt(1), "neighbor label must match (pre-filter)")
    }
  }

  // ------------------------------------------------------------- q51
  test("q51 exchange reuse: marker present and self-join is a bijection") {
    val r = Relational.q51ReusedExchangeGate(spark, sf).collect()(0)
    assert(r.getBoolean(3), "no reused exchange/stage in the executed plan")
    assert(r.getLong(1) === r.getLong(2))
    val groups = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).distinct.count()
    assert(r.getLong(0) === groups)
  }

  // ------------------------------------------------------------- q52
  test("q52 binned interval join equals the nested-loop BETWEEN join") {
    val got = Relational.q52BinnedIntervalJoin(spark, sf)
    val ivals = spark.range(25).select(col("id").as("ival_id"),
      (col("id") * 7 % 180).as("lo"),
      (col("id") * 7 % 180 + col("id") % 12 + 1).as("hi"))
    val ref = graft.Tables.lineitem(spark, sf)
      .select((col("l_partkey") % 200).as("x"),
        col("l_quantity").cast("long").as("qty"))
      .join(ivals, col("x") >= col("lo") && col("x") <= col("hi"))
      .groupBy(col("ival_id"))
      .agg(count(lit(1)).as("n_points"), sum(col("qty")).as("sum_qty"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  // ------------------------------------------------------------- q53
  test("q53 distribution functions: quartiles partition evenly, pr/cd in [0,1]") {
    val rows = Relational.q53WindowDistribution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 4)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  // ------------------------------------------------------------- q54
  test("q54 datetime kernel: truncation floors, dow in range, interval exact") {
    val rows = Relational.q54DatetimeKernel(spark, sf).limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val day = r.getAs[java.time.LocalDateTime]("day")
      val week = r.getAs[java.time.LocalDateTime]("week")
      assert(day.getHour === 0 && day.getMinute === 0)
      assert(week.getDayOfWeek === java.time.DayOfWeek.MONDAY)
      assert(r.getInt(3) >= 0 && r.getInt(3) <= 23)
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 7)
    }
  }

  // ------------------------------------------------------------- q55
  test("q55 AvailableNow resume: run 2 processes only the new files") {
    val r = Relational.q55IncrementalResumeGate(spark, sf).collect()(0)
    assert(r.getBoolean(3), "checkpoint resume reprocessed run 1's input")
    val total = graft.Tables.events(spark, sf).count()
    assert(r.getLong(0) === total)
    assert(r.getLong(1) === total)
  }

  // ------------------------------------------------------------- q56
  test("q56 ORC roundtrip: filter and projection reach the ORC scan") {
    val r = Relational.q56OrcRoundtrip(spark, sf).collect()(0)
    assert(r.getBoolean(3), "ORC pushdown or column pruning missing")
    val expect = graft.Tables.lineitem(spark, sf)
      .where(col("l_quantity") >= 30)
      .agg(count(lit(1)), sum(col("l_quantity").cast("long"))).collect()(0)
    assert(r.getLong(0) === expect.getLong(0))
    assert(r.getLong(1) === expect.getLong(1))
  }

  // ------------------------------------------------------------- s18
  test("s18 nprobe sweep: recall monotone by inclusion, floor holds") {
    val r = Similarity.s18NprobeSweep(spark, sf).collect()(0)
    assert(r.getBoolean(1), "recall decreased as nprobe grew")
    assert(r.getBoolean(2) && r.getBoolean(3))
  }

  // ------------------------------------------------------------- t28
  test("t28 categorical encode: index = frequency rank, one-hot position = index") {
    val rows = TextAnalysis.t28CategoricalEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    // ordered by lang_idx == descending n_docs (ties alphabetical)
    val byIdx = rows.map(r => (r.getLong(1), r.getLong(2), r.getString(0)))
    byIdx.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._3 < b._3))
    }
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)}: hot bit not at index")
      assert(r.getInt(4) === rows.length)
    }
  }

  // ------------------------------------------------------------- d24
  test("d24 minhash estimator: mid-range J pairs within the error bound") {
    val r = Dedup.d24MinhashErrorGate(spark, sf).collect()(0)
    assert(r.getLong(0) === 20L)
    assert(r.getBoolean(1), "a pair estimate strayed > 0.35 from exact J")
    assert(r.getBoolean(2), "mean estimator error above 0.15")
  }

  // ------------------------------------------------------------- x10
  test("x10 cross-validation: both grid points learn the rule, selection deterministic") {
    val r1 = MitoQueries.x10CvGate(spark, sf).collect()(0)
    assert(r1.getBoolean(3), "CV best accuracy below 0.99 on the separable fixture")
    assert(r1.getLong(2) === 2L)
    val expect = graft.Tables.lineitem(spark, sf)
      .where(col("l_orderkey") % 4 === 2)
      .agg(count(lit(1)),
        sum((col("l_partkey") % 2 === 0).cast("long"))).collect()(0)
    assert(r1.getLong(0) === expect.getLong(0))
    assert(r1.getLong(1) === expect.getLong(1))
  }

  // ------------------------------------------------------------- q57
  test("q57 array kernel: distinct <= total, stopword count bounded, longest is longest") {
    val rows = Relational.q57ArrayKernel(spark, sf).limit(100).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) <= r.getInt(1))
      assert(r.getInt(4) <= 5)
      assert(r.getString(3).split(" ").length <= 5)
    }
  }

  // ------------------------------------------------------------- q58
  test("q58 null semantics: count skips nulls, count(*) does not, <=> is total") {
    val rows = Relational.q58NullSemantics(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "count(col) must skip nulls")
      assert(r.getLong(3) <= r.getLong(2), "null-safe matches are non-null")
    }
  }

  // ------------------------------------------------------------- m10
  test("m10 flip/crop kernels: hand-checked mirror and clamped window") {
    val r = ImageRaster(3, 2, Array[Byte](
      1, 2, 3,  4, 5, 6,  7, 8, 9,
      10, 11, 12,  13, 14, 15,  16, 17, 18))
    val f = ImageOps.flipH(r)
    assert(f.rgb.toSeq === Seq[Byte](
      7, 8, 9,  4, 5, 6,  1, 2, 3,
      16, 17, 18,  13, 14, 15,  10, 11, 12))
    // double flip is identity
    assert(ImageOps.flipH(f).rgb.toSeq === r.rgb.toSeq)
    val c = ImageOps.crop(r, 1, 0, 8, 8) // clamps to 2x2
    assert(c.width === 2 && c.height === 2)
    assert(c.rgb.toSeq === Seq[Byte](4, 5, 6, 7, 8, 9, 13, 14, 15, 16, 17, 18))
    val rows = Multimodal.m10ImageAugment(spark, sf).limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach(r2 => assert(r2.getInt(3) === 8 && r2.getInt(4) >= 1))
  }

  // ------------------------------------------------------------- t29
  test("t29 snapshot diff: content-keyed, shared plants unchanged, halves disjoint") {
    val r = TextAnalysis.t29SnapshotDiff(spark, sf).collect()(0)
    assert(r.getBoolean(3))
    assert(r.getLong(0) >= 20L)
    // the two id-halves have no common content beyond the plants (d01
    // showed zero exact dups), so added+removed ~ the halves' sizes
    assert(r.getLong(1) > 0 && r.getLong(2) > 0)
  }

  // ------------------------------------------------------------- t30
  test("t30 epoch shuffle: both epochs are permutations, epochs differ, reruns identical") {
    val rows = TextAnalysis.t30EpochShuffle(spark, sf).collect()
    val n = rows.length
    assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to n))
    assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to n))
    assert(rows.exists(r => r.getInt(1) != r.getInt(2)), "epochs must differ")
    val again = TextAnalysis.t30EpochShuffle(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ===
      again.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq)
  }

  test("t30 bucketed rank equals the flat global-sort window form") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    def pos(epoch: Int) = row_number().over(
      Window.orderBy(
        md5(encode(concat(col("doc_id").cast("string"), lit(s":e$epoch")),
          "UTF-8")), col("doc_id")))
    val flat = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), pos(1).as("pos_e1"), pos(2).as("pos_e2"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq
    val bucketed = TextAnalysis.t30EpochShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(bucketed === flat)
  }

  // ------------------------------------------------------------- m09
  test("m09 audio resample kernels: exact grids, negatives floor down, roundtrip") {
    import graft.operators.AudioOps._
    assert(upsample2x(Array(0, 10)).toSeq === Seq(0, 5, 10))
    // floor, not truncate: (-3 + 0)/2 -> -2
    assert(upsample2x(Array(-3, 0)).toSeq === Seq(-3, -2, 0))
    assert(upsample2x(Array(7)).toSeq === Seq(7))
    assert(downsample2x(Array(1, 2, 3, 4, 5)).toSeq === Seq(1, 3, 5))
    assert(downsample2x(Array[Int]()).toSeq === Seq())
    // decimating the upsampled stream recovers the original exactly
    val xs = Array(-128, 127, 0, 64, -64, 3)
    assert(downsample2x(upsample2x(xs)).toSeq === xs.toSeq)
  }

  test("m09 over the corpus: lengths obey the 2n-1 / ceil(n/2) contract") {
    val rows = Multimodal.m09AudioResample(spark, sf).limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, up, down) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(up === 2 * n - 1)
      assert(down === (n + 1) / 2)
    }
  }
}
