package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFns._

import scala.util.hashing.MurmurHash3

/** Approximate-nearest-neighbor / similarity search over the `embeddings`
  * table (array<float> column).
  */
object Similarity {

  /** Queries = the 10 lowest vec_ids; corpus = everything else. Norms are
    * precomputed per row so the O(q×n) stage folds each array once. */
  private def split(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val e = Tables.embeddings(s, d)
      .withColumn("nrm", norm2(col("embedding")))
    (e.where(col("vec_id") < 10)
       .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
         col("nrm").as("q_nrm")),
     e.where(col("vec_id") >= 10)
       .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
         col("nrm").as("n_nrm")))
  }

  // ---------------------------------------------------------------- s01
  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus — a map-side nested loop, embarrassingly parallel, no shuffle
    * until the per-query top-k (tiny). This is the exactness baseline the
    * ANN path (s02) is judged against. */
  def s01KnnBrute(s: SparkSession, d: String): DataFrame = {
    val (q, n) = split(s, d)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    n.crossJoin(broadcast(q))
      .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id", "rank")
  }

  val s01Sql: String =
    """SELECT q_id, rank, n_id, cos_r FROM (
      |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
      |    ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(n.embedding AS DOUBLE[])), 6) AS cos_r,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(n.embedding AS DOUBLE[])) DESC,
      |               n.vec_id ASC) AS rank
      |  FROM embeddings q JOIN embeddings n ON n.vec_id >= 10
      |  WHERE q.vec_id < 10) t
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- s02
  /** LSH-bucketed ANN (random hyperplanes), multi-table: `Tables_` hash
    * tables × `BitsPerTable` sign bits each; a corpus vector is a candidate
    * if it shares any table's bucket with the query. The scale path:
    * bucketing is a single narrow map + one skew-free shuffle on
    * (table, bucket); recall/cost tunes with bits-per-table and table
    * count. Rows-only driver check (approximation is not SQL-expressible);
    * recall vs s01 asserted in OperatorsSpec. */
  private[operators] val Tables_ = 4
  private val BitsPerTable = 4
  private val Dim = 64

  /** Deterministic hyperplane component in [-1, 1). */
  private def hp(plane: Int, dim: Int): Double =
    MurmurHash3.productHash((plane, dim)).toDouble / Int.MaxValue

  /** All hyperplanes as one literal array<array<double>> — the signature is
    * computed with data-driven higher-order-function loops (zip_with +
    * aggregate) instead of Tables_×Bits×Dim unrolled expression nodes,
    * which blew past JIT-able codegen size (measured 4× slower than brute
    * force before this). */
  private def planesLit: Column =
    array((0 until Tables_ * BitsPerTable).map { p =>
      array((0 until Dim).map(i => lit(hp(p, i))): _*)
    }: _*)

  /** array<int> of sign bits, one per hyperplane (native dot kernel). */
  private[operators] def signBits(emb: Column): Column =
    transform(planesLit, plane =>
      when(graft.functions.VectorFns.dot(emb, plane) >= 0, 1).otherwise(0))

  /** array<struct<tbl,key>> of per-table bucket keys from the bit array. */
  private[operators] def bucketsFromBits(bits: Column): Column =
    array((0 until Tables_).map { t =>
      val key = (0 until BitsPerTable).map { b =>
        element_at(bits, t * BitsPerTable + b + 1) * lit(1 << b)
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), key.as("key"))
    }: _*)

  /** The production bucketing kernel: all hyperplane dots, key packing,
    * and (optionally) multi-probe expansion as ONE native expression —
    * the composed `bucketsFromBits(signBits(emb))` form re-evaluated the
    * interpreted signBits transform once per `element_at` reference after
    * CollapseProject inlining (T·B× the dot-product work; measured ~1.5 s
    * per 1k rows on the s19 probe side). Bit-identical to the composed
    * helpers above, which stay for the parity spec. */
  private[operators] def lshBucketsOf(emb: Column, multiProbe: Boolean): Column =
    graft.functions.LshBucketsExpr.lshBuckets(
      emb, planesLit, Tables_, BitsPerTable, multiProbe)

  /** Multi-probe expansion (query side only): each table's bucket plus its
    * BitsPerTable Hamming-1 neighbors. The near-miss case for hyperplane
    * LSH is one flipped sign bit, so probing the 1-flip buckets recovers
    * most of it for (1+bits)× the candidate volume on the tiny query side
    * — the standard recall/cost dial that avoids adding whole tables. */
  private[operators] def bucketsMultiProbe(bits: Column): Column =
    flatten(array((0 until Tables_).map { t =>
      val key = (0 until BitsPerTable).map { b =>
        element_at(bits, t * BitsPerTable + b + 1) * lit(1 << b)
      }.reduce(_ + _)
      array((key +: (0 until BitsPerTable).map(b =>
        key.bitwiseXOR(lit(1 << b)))).map(k =>
        struct(lit(t).as("tbl"), k.as("key"))): _*)
    }: _*))

  def s02AnnLsh(s: SparkSession, d: String): DataFrame = {
    val (q, n) = split(s, d)
    def banded(df: DataFrame, id: String, emb: String, nrm: String,
        multiProbe: Boolean): DataFrame =
      df.select(col(id), col(emb), col(nrm),
        explode(lshBucketsOf(col(emb), multiProbe)).as("b"))
    val qb = banded(q, "q_id", "q_emb", "q_nrm", multiProbe = true)
    val nb = banded(n, "n_id", "n_emb", "n_nrm", multiProbe = false)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    // score before dedup: the (q_id, n_id) exchange then carries narrow
    // scored rows, not the embedding arrays (see s19 for the measured
    // trade); cos is deterministic per pair so dedup-after-scoring is
    // value-identical
    qb.hint("broadcast").join(nb, Seq("b"))
      .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")))
      .select(col("q_id"), col("n_id"), col("cos"))
      .dropDuplicates("q_id", "n_id") // same pair can match in several tables
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------- s04
  /** IVF (inverted-file) ANN: KMeans-partition the corpus (seeded, k=16),
    * probe the `NProbe` nearest centroids per query, exact cosine inside
    * probed cells only. The classic disk-friendly ANN layout: at 100 TB the
    * corpus would be written bucketed by cell id, so a query reads
    * NProbe/k of the data; here cells are a join key. Rows-only check;
    * recall vs s01 asserted in OperatorsSpec. */
  private val IvfK = 16
  private val NProbe = 6

  /** IVF index cache, one fitted KMeans model per dataset dir: index
    * construction is a build-time cost amortized over every probe (at
    * 100 TB the index is built once and the corpus is written bucketed by
    * cell id) — repeated s04 runs (bench warm passes, pipelines issuing
    * many queries) must pay probe cost, not a rebuild. Seeded, so a cached
    * model is identical to a refit. */
  private val ivfModels =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.ml.clustering.KMeansModel]

  private[operators] def ivfModel(e: DataFrame, d: String): org.apache.spark.ml.clustering.KMeansModel =
    ivfModels.getOrElseUpdate(d, {
      new org.apache.spark.ml.clustering.KMeans()
        .setK(IvfK).setSeed(42L).setFeaturesCol("vec").setPredictionCol("cell")
        .fit(e.select("vec"))
    })

  /** Rebuild the IVF index for `d` from scratch (bench instrumentation:
    * isolates the one-time index-build cost so s04's per-query timing
    * reads as pure probe cost — the split a capacity plan needs). */
  def rebuildIvfIndex(s: SparkSession, d: String): Unit = {
    import org.apache.spark.ml.functions.array_to_vector
    ivfModels.remove(d)
    // PQ codebooks (s08/s09) are index state over the same dir — stale
    // codebooks would silently encode against the previous corpus
    pqBooks.remove(d)
    // residual codebooks (s12) are derived from BOTH the IVF model and
    // the corpus — same invalidation rule
    resBooks.remove(d)
    // the bucketed corpus dir (s07) is derived from the same model + source
    // — a model invalidation must drop it too, or s07 silently probes a
    // layout built from the previous index
    graft.sources.HadoopIO.delete(ivfBucketedDir(s, d),
      graft.sources.HadoopIO.driverConf())
    ivfModel(Tables.embeddings(s, d)
      .withColumn("vec", array_to_vector(col("embedding"))), d)
  }

  /** Scratch location of the cell-partitioned corpus for `d` (s07). */
  private[operators] def ivfBucketedDir(s: SparkSession, d: String): String =
    s"${graft.sources.HadoopIO.scratchDir(s)}/graft_ivf_" +
      d.replaceAll("[^A-Za-z0-9]", "_")

  /** Per-query probe targets: each of the 10 query vectors paired with
    * its NProbe nearest centroids (broadcast centroid table, no corpus
    * access, no model transform on the query side). */
  private def ivfProbes(s: SparkSession, e: DataFrame,
      model: org.apache.spark.ml.clustering.KMeansModel,
      nprobe: Int = NProbe): DataFrame = {
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }.toSeq
    val centDf = s.createDataFrame(centroids).toDF("cell", "centroid")
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm2(col("embedding")).as("q_nrm"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("dist2").asc, col("cell").asc)
    q.crossJoin(broadcast(centDf))
      .withColumn("dist2", aggregate(
        zip_with(col("q_emb"), col("centroid"),
          (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cell"))
  }

  /** Exact cosine + per-query top-5 over probed (query, corpus-cell)
    * pairs — shared tail of s04 and s07. */
  private def probeTopK(probes: DataFrame, n: DataFrame): DataFrame = {
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    probes.hint("broadcast").join(n, Seq("cell"))
      .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id", "rank")
  }

  def s04AnnIvf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.embeddings(s, d)
      .withColumn("vec", array_to_vector(col("embedding")))
    val model = ivfModel(e, d)
    // query and corpus sides split BEFORE the model transform: the corpus
    // sub-plan (the dominant scan at scale) appears exactly once in the
    // executed plan, and the query side never runs the assignment at all —
    // probe cells come from the broadcast centroid table (ivfProbes). The
    // bucketed-by-cell corpus layout this delegates to at 100 TB is s07.
    val n = model.transform(e.where(col("vec_id") >= 10))
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        norm2(col("embedding")).as("n_nrm"), col("cell"))
    probeTopK(ivfProbes(s, e, model), n)
  }

  // ---------------------------------------------------------------- s07
  /** IVF with the corpus PHYSICALLY bucketed by cell: the assignment runs
    * once as an index-build write (`partitionBy("cell")` parquet, norms
    * precomputed), and each probe reads ONLY the probed cell partitions —
    * static partition pruning, so a query touches ~NProbe/k of the stored
    * bytes (SimilaritySpec asserts the PartitionFilters in the plan).
    * This is the disk layout a 100 TB ANN corpus actually uses; the
    * driver gate pins exact agreement with the join-formulated s04 (same
    * model, same probes, same tie-breaks → identical top-k). */
  def s07AnnIvfBucketed(s: SparkSession, d: String): DataFrame = {
    val viaBuckets = ivfBucketedTopK(s, d)
    val viaJoin = s04AnnIvf(s, d)
    viaJoin.agg(count_distinct(col("q_id")).as("n_queries"))
      .crossJoin(Dedup.setsMatch(viaBuckets, viaJoin))
      .select(col("n_queries"), col("sets_match").as("results_match"))
  }

  val s07Sql: String =
    """SELECT CAST(10 AS BIGINT) AS n_queries, true AS results_match""".stripMargin

  /** The bucketed path itself (also spec-asserted for partition pruning):
    * build-once cell-partitioned corpus, probe-time scan restricted to the
    * probed cells. */
  def ivfBucketedTopK(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.embeddings(s, d)
      .withColumn("vec", array_to_vector(col("embedding")))
    val model = ivfModel(e, d)
    val dir = ivfBucketedDir(s, d)
    // reuse the build-once layout only when it COMMITTED (_SUCCESS — a
    // half-written dir from a crashed run has none) and was built from
    // THIS source version: the recorded (length, mtime) sidecar compared
    // for equality, mirroring HadoopIO.stageFile — a `built >= src` mtime
    // compare would treat a same-tick source regeneration (or scratch/
    // corpus clock skew) as fresh and silently replay a stale layout
    // (ADVICE r7); otherwise rebuild.
    //
    // Writer protocol (VERDICT r8 #7 — concurrent writers): the layout is
    // built in a PRIVATE temp dir (sidecar written inside, parquet commit
    // drops _SUCCESS inside) and PUBLISHED with one atomic
    // rename-if-absent. Two same-version writers therefore never
    // interleave writes into one directory — the loser deletes its build
    // and adopts the winner's committed layout (re-checking _SUCCESS).
    // Cross-VERSION races keep delete-then-publish semantics: a writer
    // that saw a stale layout drops it before publishing, so a reader
    // concurrent with a source regeneration can observe a missing dir —
    // the same contract as any non-versioned cache invalidation; readers
    // retry at the next query. What can no longer happen is a torn or
    // half-written layout being READ: _SUCCESS only ever appears inside
    // a fully built directory that was renamed into place.
    val conf = graft.sources.HadoopIO.driverConf()
    val marker = s"$dir/.embeddings.src"
    val srcStat = graft.sources.HadoopIO.lenAndMtime(
      s"$d/embeddings.parquet", conf)
    val fresh = srcStat.nonEmpty &&
      graft.sources.HadoopIO.exists(s"$dir/_SUCCESS", conf) &&
      graft.sources.HadoopIO.readMarker(marker, conf) == srcStat
    if (!fresh) {
      graft.sources.HadoopIO.delete(dir, conf)
      val tmp = s"$dir.build-${java.util.UUID.randomUUID}"
      model.transform(e.where(col("vec_id") >= 10))
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
          norm2(col("embedding")).as("n_nrm"), col("cell"))
        .write.partitionBy("cell").parquet(tmp)
      srcStat.foreach(graft.sources.HadoopIO.writeMarker(
        s"$tmp/.embeddings.src", _, conf))
      if (!graft.sources.HadoopIO.renameIfAbsent(tmp, dir, conf))
        graft.sources.HadoopIO.delete(tmp, conf) // lost the race: adopt
      require(graft.sources.HadoopIO.exists(s"$dir/_SUCCESS", conf),
        s"s07 bucketed layout failed to publish at $dir")
    }
    val corpus = s.read.parquet(dir)
    val probes = ivfProbes(s, e, model)
    // probed cell set is ≤ k = 16 values — a bounded driver collect that
    // turns the probe into LITERAL partition filters on the bucketed scan
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    probeTopK(probes,
      corpus.where(col("cell").isin(probedCells.map(Int.box): _*)))
  }

  // ---------------------------------------------------------------- s08
  /** Product quantization (Jégou et al. 2011, the IVFADC family): the
    * memory-bound ANN layout for corpora whose float vectors don't fit —
    * split each 64-dim vector into `PqM`=8 subvectors, learn a `PqK`=16
    * centroid codebook per subspace (seeded KMeans — the same build-once,
    * cache-and-reuse discipline as the IVF index), store each vector as 8
    * 4-bit codes (64× smaller than float32). A query never decodes the
    * corpus: it computes one 8×16 lookup table of subspace distances
    * (`pqLut`), and the scan scores each corpus vector with 8 table
    * lookups + 7 adds (`adc` — asymmetric distance). The scan-side `adc`
    * is pure `element_at` + adds and the corpus-side encode is the
    * native codegen'd [[graft.functions.PqEncodeExpr]] kernel — both in
    * whole-stage codegen, no UDF. Interpreted HOF lambdas remain only on
    * the tiny query-side LUT (10 rows) and the gate's reconstruction
    * canary, which therefore runs over a quarter SAMPLE, not the corpus.
    *
    * Scale shape: codebook training is a bounded build cost (at corpus
    * scale, train on a deterministic id-modulus sample — codebook quality
    * saturates far below corpus size); encoding is one narrow pass; the
    * ADC scan is a broadcast of the tiny query LUTs against the code
    * column only — the float embeddings never leave storage. Encode
    * computes each subspace distance twice inside the HOF argmin (no
    * let-binding in column lambdas); a native Expression would halve
    * that constant if the one-time encode pass ever dominates. */
  private val PqM = 8
  private val PqK = 16
  private val PqSub = Dim / PqM

  /** PQ codebook cache per dataset dir: [m][k][subdim] doubles. */
  private val pqBooks = scala.collection.concurrent.TrieMap
    .empty[String, Array[Array[Array[Double]]]]

  private[operators] def pqCodebooks(
      s: SparkSession, d: String): Array[Array[Array[Double]]] =
    pqBooks.getOrElseUpdate(d, {
      import org.apache.spark.ml.functions.array_to_vector
      val corpus = Tables.embeddings(s, d).where(col("vec_id") >= 10)
      (0 until PqM).map { m =>
        val sub = corpus.select(array_to_vector(
          slice(col("embedding"), m * PqSub + 1, PqSub)).as("vec"))
        new org.apache.spark.ml.clustering.KMeans()
          .setK(PqK).setSeed(42L + m)
          .setFeaturesCol("vec").setPredictionCol("c")
          .fit(sub).clusterCenters.map(_.toArray)
      }.toArray
    })

  /** Codebook as one literal array<array<array<double>>> [m][k][sub]. */
  private def cbLit(cb: Array[Array[Array[Double]]]): Column =
    array(cb.map(m => array(m.map(k => array(k.map(lit): _*)): _*)): _*)

  /** Squared L2 between emb's m-th subvector and centroid `c`. */
  private def subDist2(emb: Column, m: Column, c: Column): Column =
    aggregate(zip_with(slice(emb, m * PqSub + 1, lit(PqSub)), c,
      (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
      lit(0.0), (a, v) => a + v)

  /** array<int> of PqM codes: per subspace, argmin centroid (strict `<`
    * keeps the FIRST index on exact ties — deterministic). Native
    * codegen'd kernel ([[graft.functions.PqEncodeExpr]]); the HOF
    * formulation below is kept as the independent reference the
    * equivalence spec pins it against. */
  private[operators] def pqCodes(emb: Column, cb: Column): Column =
    graft.functions.PqEncodeExpr.pqEncode(emb, cb)

  /** The builtin higher-order-function formulation of [[pqCodes]] —
    * interpreted lambdas, ~2 048 boxed calls per row (each subspace
    * distance evaluates twice: column lambdas have no let-binding).
    * Spec-only: `pqCodes` must match it bit-for-bit. */
  private[operators] def pqCodesHof(emb: Column, cb: Column): Column =
    transform(sequence(lit(0), lit(PqM - 1)), m =>
      aggregate(element_at(cb, m + 1),
        struct(lit(Double.MaxValue).as("d"), lit(0).as("i"), lit(0).as("k")),
        (acc, c) => {
          val d2 = subDist2(emb, m, c)
          struct(
            when(d2 < acc("d"), d2).otherwise(acc("d")).as("d"),
            when(d2 < acc("d"), acc("k")).otherwise(acc("i")).as("i"),
            (acc("k") + 1).as("k"))
        },
        acc => acc("i")))

  /** Query-side ADC lookup table: [m][k] = ||q_m − c_{m,k}||². */
  private[operators] def pqLut(emb: Column, cb: Column): Column =
    transform(sequence(lit(0), lit(PqM - 1)), m =>
      transform(element_at(cb, m + 1), c => subDist2(emb, m, c)))

  /** Asymmetric distance: Σ_m lut[m][codes[m]] — 8 lookups + 7 adds. */
  private[operators] def adc(lut: Column, codes: Column): Column =
    (0 until PqM).map(m =>
      element_at(element_at(lut, m + 1), element_at(codes, m + 1) + 1))
      .reduce(_ + _)

  /** Reconstruction: concat of the coded centroids (array<double>). */
  private[operators] def pqDecode(codes: Column, cb: Column): Column =
    flatten(transform(sequence(lit(0), lit(PqM - 1)), m =>
      element_at(element_at(cb, m + 1), element_at(codes, m + 1) + 1)))

  /** Driver gate for the PQ path. Three contracts in one row:
    *
    *  - `all_copies_min_adc`: exact copies of the 10 queries are planted
    *    into the corpus (d07 technique). A copy's codes are per-subspace
    *    argmins of the query's own LUT row, so its ADC distance
    *    Σ_m min_k lut[m][k] is the MINIMUM any vector can achieve —
    *    guaranteed, codebook-independent; every query's min-ADC row must
    *    be its copy's.
    *  - `recon_ok`: mean reconstruction cosine over a deterministic
    *    quarter sample of the natural corpus (vec_id % 4 == 2 — a
    *    canary floor needs no more; the decode runs the interpreted HOF
    *    path) above a floor with margin (measured 0.65–0.68 across
    *    sf0.001/0.01/0.1; floor 0.6).
    *  - `recall_ok`: ADC top-5 recall vs the in-engine brute truth (s01)
    *    above a floor with margin (measured 0.10–0.18; floor 0.05) — the
    *    s05 discipline.
    *
    * Floor honesty: this corpus is SYNTHETIC near-isotropic noise — the
    * worst case for PQ, whose 32-bit codes can only capture structure the
    * data has (natural embedding manifolds reconstruct far better, and
    * the standard quality dials are K=256 codebooks and IVF+PQ
    * composition). The quality floors here are regression CANARIES
    * pinning "the pipeline didn't break", not quality claims; the exact
    * contracts are `all_copies_min_adc` (construction-guaranteed) and
    * the naive-reference encode/ADC equivalence spec. */
  def s08PqGate(s: SparkSession, d: String): DataFrame = {
    val cb = cbLit(pqCodebooks(s, d))
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    Dedup.assertIdHeadroom(e, "vec_id", d)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val planted = q.select(
      (col("q_id") + lit(1000000000L)).as("n_id"), col("q_emb").as("n_emb"))
    val n = e.where(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .unionByName(planted)
      .select(col("n_id"), pqCodes(col("n_emb"), cb).as("codes"))
    val scored = n.crossJoin(broadcast(
        q.select(col("q_id"), pqLut(col("q_emb"), cb).as("lut"))))
      .select(col("q_id"), col("n_id"),
        adc(col("lut"), col("codes")).as("adc"))
    val minAdc = scored.groupBy(col("q_id"))
      .agg(min(col("adc")).as("min_adc"))
    val copyAdc = scored
      .where(col("n_id") === col("q_id") + lit(1000000000L))
      .select(col("q_id"), col("adc").as("copy_adc"))
    val copiesMin = minAdc.join(copyAdc, Seq("q_id"))
      .agg(count(lit(1)).as("nq"),
        sum(when(col("copy_adc") === col("min_adc"), 1L).otherwise(0L))
          .as("n_min"))
      .select((col("nq") === 10 && col("n_min") === 10)
        .as("all_copies_min_adc"))
    // recon canary over a DETERMINISTIC quarter sample: pqDecode is the
    // interpreted HOF path (fine at sample size, wasteful corpus-wide),
    // and a floor-with-margin canary needs no more than a sample
    val recon = e.where(col("vec_id") >= 10 && col("vec_id") % 4 === 2)
      .select(cosine(col("embedding"),
        pqDecode(pqCodes(col("embedding"), cb), cb)).as("rc"))
      .agg(graft.functions.Det.davg(col("rc"), 10).as("avg_rc"))
      .select((col("avg_rc") >= 0.6).as("recon_ok"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").asc, col("n_id").asc)
    val pqTop5 = scored.where(col("n_id") < lit(1000000000L))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("n_id"))
    val brute = s01KnnBrute(s, d).select(col("q_id"), col("n_id"))
    val recall = brute.join(pqTop5, Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
      .crossJoin(brute.agg(count(lit(1)).as("total")))
      .select((col("hits").cast("double") / col("total") >= 0.05)
        .as("recall_ok"))
    copiesMin.crossJoin(recon).crossJoin(recall)
      .select(lit(10L).as("n_queries"), col("all_copies_min_adc"),
        col("recon_ok"), col("recall_ok"))
  }

  val s08Sql: String =
    """SELECT CAST(10 AS BIGINT) AS n_queries,
      |  true AS all_copies_min_adc, true AS recon_ok,
      |  true AS recall_ok""".stripMargin

  // ---------------------------------------------------------------- s09
  /** IVF + PQ composed — IVFADC proper (the second half of Jégou et al.
    * 2011): the corpus is cell-assigned by the IVF index AND stored as
    * PQ codes; a query probes its NProbe nearest cells and ADC-scores
    * ONLY the codes in those cells. This composes the two scale levers
    * already built: s07's partition pruning (touch NProbe/k of the
    * corpus) and s08's compression (read 8-byte codes, not 256-byte
    * floats) — at 100 TB the probe scan is ~NProbe/k × 1/32 of the
    * stored bytes, at 8 lookups + 7 adds per row.
    *
    * Gate: planted exact copies of the queries. An identical vector gets
    * the query's own nearest-cell assignment (first probe — the same
    * seeded model computes both sides), and its codes are the
    * per-subspace argmins of the query's LUT, so within the probed set
    * every copy achieves the minimum possible ADC distance. The s08
    * contract, proven through the composed index path: every query must
    * find its copy (copy probed) at the per-query min ADC. */
  def s09IvfAdcGate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val cb = cbLit(pqCodebooks(s, d))
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    Dedup.assertIdHeadroom(e, "vec_id", d)
    val model = ivfModel(
      e.withColumn("vec", array_to_vector(col("embedding"))), d)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val planted = q.select(
      (col("q_id") + lit(1000000000L)).as("vec_id"), col("q_emb").as("embedding"))
    val corpus = e.where(col("vec_id") >= 10).unionByName(planted)
    val n = model.transform(
        corpus.withColumn("vec", array_to_vector(col("embedding"))))
      .select(col("vec_id").as("n_id"),
        pqCodes(col("embedding"), cb).as("codes"), col("cell"))
    val withLut = ivfProbes(s, e, model).select(col("q_id"), col("cell"))
      .join(q.select(col("q_id"), pqLut(col("q_emb"), cb).as("lut")),
        Seq("q_id"))
    val scored = withLut.hint("broadcast").join(n, Seq("cell"))
      .select(col("q_id"), col("n_id"),
        adc(col("lut"), col("codes")).as("adc"))
    val minAdc = scored.groupBy(col("q_id"))
      .agg(min(col("adc")).as("min_adc"))
    val copyAdc = scored
      .where(col("n_id") === col("q_id") + lit(1000000000L))
      .select(col("q_id"), col("adc").as("copy_adc"))
    minAdc.join(copyAdc, Seq("q_id"))
      .agg(count(lit(1)).as("nq"),
        sum(when(col("copy_adc") === col("min_adc"), 1L).otherwise(0L))
          .as("n_min"))
      .select(lit(10L).as("n_queries"),
        (col("nq") === 10 && col("n_min") === 10).as("all_copies_min_adc"))
  }

  val s09Sql: String =
    """SELECT CAST(10 AS BIGINT) AS n_queries,
      |  true AS all_copies_min_adc""".stripMargin

  // ---------------------------------------------------------------- s10
  /** IVFADC+R — re-ranked IVFADC (the refinement stage of Jégou et al.
    * 2011 §V): the composed IVF×PQ path produces a top-`RerankC` ADC
    * shortlist per query, then ONLY the shortlist rows fetch their full
    * float vectors (a broadcast join of the tiny candidate set against
    * the corpus — at 100 TB the refinement reads C×nq vectors, not the
    * corpus) and re-rank by exact cosine. Top-5 of the re-ranked list is
    * the answer.
    *
    * Gate contracts:
    *  - `rerank_ge_adc` is GUARANTEED, not statistical: ADC-top-5 ⊆ the
    *    shortlist, and a true-top-5 member in the shortlist always
    *    survives an exact re-rank (only other true-top-5 members can
    *    outrank it; ties broken by n_id on both sides, matching s01) —
    *    so re-ranked recall can never fall below ADC-only recall.
    *  - `rerank_beats_adc` (strict) is the measured point of the R stage:
    *    on this corpus ADC-only recall is PQ-noise-bound (~0.1–0.2, s08)
    *    while the exact re-rank recovers every true neighbor that lands
    *    anywhere in the top-50 shortlist. */
  private val RerankC = 50

  def s10IvfAdcRerankGate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val cb = cbLit(pqCodebooks(s, d))
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val model = ivfModel(
      e.withColumn("vec", array_to_vector(col("embedding"))), d)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm2(col("embedding")).as("q_nrm"))
    val corpus = e.where(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    // code-only ADC scan over the probed cells (s09's shape: the float
    // embeddings never enter this join)
    val n = model.transform(corpus
        .withColumn("vec", array_to_vector(col("n_emb"))))
      .select(col("n_id"), pqCodes(col("n_emb"), cb).as("codes"), col("cell"))
    val withLut = ivfProbes(s, e, model).select(col("q_id"), col("cell"))
      .join(q.select(col("q_id"), pqLut(col("q_emb"), cb).as("lut")),
        Seq("q_id"))
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").asc, col("n_id").asc)
    val shortlist = withLut.hint("broadcast").join(n, Seq("cell"))
      .select(col("q_id"), col("n_id"),
        adc(col("lut"), col("codes")).as("adc"))
      .withColumn("rank", row_number().over(wAdc))
      .where(col("rank") <= RerankC)
    val adcTop5 = shortlist.where(col("rank") <= 5)
      .select(col("q_id"), col("n_id"))
    // refinement: fetch full vectors for the C×nq shortlist rows only
    val wSim = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    val rerankTop5 = corpus
      .withColumn("n_nrm", norm2(col("n_emb")))
      .join(broadcast(shortlist.select(col("q_id"), col("n_id"))),
        Seq("n_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")))
      .withColumn("r", row_number().over(wSim))
      .where(col("r") <= 5)
      .select(col("q_id"), col("n_id"))
    val brute = s01KnnBrute(s, d).select(col("q_id"), col("n_id"))
    def recallOf(ann: DataFrame, as: String): DataFrame =
      brute.join(ann, Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(brute.agg(count(lit(1)).as("total")))
        .select((col("hits").cast("double") / col("total")).as(as))
    recallOf(adcTop5, "adc_recall").crossJoin(recallOf(rerankTop5, "rr_recall"))
      .select(lit(10L).as("n_queries"),
        (col("rr_recall") >= col("adc_recall")).as("rerank_ge_adc"),
        (col("rr_recall") > col("adc_recall")).as("rerank_beats_adc"))
  }

  val s10Sql: String =
    """SELECT CAST(10 AS BIGINT) AS n_queries,
      |  true AS rerank_ge_adc, true AS rerank_beats_adc""".stripMargin

  // ---------------------------------------------------------------- s12
  /** RESIDUAL-encoding IVFADC — the construction Jégou et al. 2011
    * actually specify (§III.C): PQ encodes the residual r = x −
    * centroid(cell(x)), not the raw vector. Removing the coarse
    * quantizer's contribution first leaves the codebooks modeling only
    * the within-cell spread, which is why production systems (FAISS
    * `IVFxPQy`) encode residuals — on clustered data the same code
    * budget reconstructs far better. The query side mirrors it: one LUT
    * per PROBED CELL over q − centroid(cell), so ADC compares
    * same-origin residuals.
    *
    * Scale shape = s09's exactly (the subtraction is a narrow per-row
    * zip_with on both sides; the LUT side grows to nq × NProbe rows,
    * still broadcast-sized), plus one residual-codebook build cached
    * like [[pqCodebooks]].
    *
    * Gate — two GUARANTEED contracts (nothing statistical):
    *  - `all_copies_min_in_cell`: a planted copy lands in its query's
    *    first-probe cell with residual IDENTICAL to the query's (same
    *    IEEE subtraction on the same values), so its codes are the
    *    argmins of that cell's LUT rows and no row scored under the same
    *    (query, cell) LUT can beat it.
    *  - `all_copies_lut_min`: each copy's ADC equals Σ_m min_k lut[m][k]
    *    — the argmin identity, codebook-independent. */
  private val resBooks = scala.collection.concurrent.TrieMap
    .empty[String, Array[Array[Array[Double]]]]

  /** Cluster centers as one literal array<array<double>> [k][dim]. */
  private def centersLit(
      model: org.apache.spark.ml.clustering.KMeansModel): Column =
    array(model.clusterCenters.map(c =>
      array(c.toArray.map(lit).toIndexedSeq: _*)): _*)

  /** r = emb − centroid(cell), as array<double> (both gate sides build
    * residuals through this same expression, so a copy's residual is
    * bit-identical to its query's). */
  private def residual(emb: Column, cell: Column, centers: Column): Column =
    zip_with(emb, element_at(centers, cell + 1),
      (x, c) => x.cast("double") - c)

  /** Residual PQ codebooks for `d`: per subspace, seeded KMeans over the
    * corpus residuals to their assigned cells. */
  private[operators] def residualCodebooks(
      s: SparkSession, d: String): Array[Array[Array[Double]]] =
    resBooks.getOrElseUpdate(d, {
      import org.apache.spark.ml.functions.array_to_vector
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val model = ivfModel(
        e.withColumn("vec", array_to_vector(col("embedding"))), d)
      val centers = centersLit(model)
      val res = model.transform(Tables.embeddings(s, d)
          .where(col("vec_id") >= 10)
          .withColumn("vec", array_to_vector(col("embedding"))))
        .select(residual(col("embedding"), col("cell"), centers).as("res"))
      (0 until PqM).map { m =>
        val sub = res.select(array_to_vector(
          slice(col("res"), m * PqSub + 1, PqSub)).as("vec"))
        new org.apache.spark.ml.clustering.KMeans()
          .setK(PqK).setSeed(1042L + m)
          .setFeaturesCol("vec").setPredictionCol("c")
          .fit(sub).clusterCenters.map(_.toArray)
      }.toArray
    })

  def s12IvfAdcResidualGate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    Dedup.assertIdHeadroom(e, "vec_id", d)
    val model = ivfModel(
      e.withColumn("vec", array_to_vector(col("embedding"))), d)
    val centers = centersLit(model)
    val cb = cbLit(residualCodebooks(s, d))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val planted = q.select(
      (col("q_id") + lit(1000000000L)).as("vec_id"),
      col("q_emb").as("embedding"))
    val corpus = e.where(col("vec_id") >= 10).unionByName(planted)
    // corpus side: cell assignment, then RESIDUAL codes
    val n = model.transform(
        corpus.withColumn("vec", array_to_vector(col("embedding"))))
      .select(col("vec_id").as("n_id"), col("cell"),
        pqCodes(residual(col("embedding"), col("cell"), centers), cb)
          .as("codes"))
    // query side: one LUT per probed cell, over q − centroid(cell)
    val withLut = ivfProbes(s, e, model).select(col("q_id"), col("cell"))
      .join(q, Seq("q_id"))
      .select(col("q_id"), col("cell"),
        pqLut(residual(col("q_emb"), col("cell"), centers), cb).as("lut"))
    val scored = withLut.hint("broadcast").join(n, Seq("cell"))
      .select(col("q_id"), col("cell"), col("n_id"),
        adc(col("lut"), col("codes")).as("adc"))
    // contract 1: per (query, its copy's cell), the copy achieves the min
    val copyRows = scored
      .where(col("n_id") === col("q_id") + lit(1000000000L))
      .select(col("q_id"), col("cell"), col("adc").as("copy_adc"))
    val cellMin = scored.groupBy(col("q_id"), col("cell"))
      .agg(min(col("adc")).as("cell_min"))
    val inCell = copyRows.join(cellMin, Seq("q_id", "cell"))
      .agg(count(lit(1)).as("nq"),
        sum(when(col("copy_adc") === col("cell_min"), 1L).otherwise(0L))
          .as("n_min"))
      .select((col("nq") === 10 && col("n_min") === 10)
        .as("all_copies_min_in_cell"))
    // contract 2: copy ADC equals the LUT's per-subspace minimum sum
    val lutMin = withLut.select(col("q_id"), col("cell"),
      aggregate(col("lut"), lit(0.0), (a, row) => a + array_min(row))
        .as("lut_min"))
    val lutEq = copyRows.join(lutMin, Seq("q_id", "cell"))
      .agg(count(lit(1)).as("nq"),
        sum(when(col("copy_adc") === col("lut_min"), 1L).otherwise(0L))
          .as("n_eq"))
      .select((col("nq") === 10 && col("n_eq") === 10)
        .as("all_copies_lut_min"))
    inCell.crossJoin(lutEq)
      .select(lit(10L).as("n_queries"), col("all_copies_min_in_cell"),
        col("all_copies_lut_min"))
  }

  val s12Sql: String =
    """SELECT CAST(10 AS BIGINT) AS n_queries,
      |  true AS all_copies_min_in_cell, true AS all_copies_lut_min""".stripMargin

  // ---------------------------------------------------------------- s13
  /** STREAMING ANN — continuous query arrival against a frozen IVF index
    * (the d19 pattern crossed into the similarity family: a production
    * retrieval service answers a query STREAM, it doesn't re-run batch
    * jobs). Query vectors replay as a micro-batch stream; each query's
    * NProbe probe cells are computed PER ROW from the broadcast-literal
    * centroid table (an argmin-N over 16 centroids via transform +
    * array_sort — no window, so it runs unmodified on a stream); a
    * stream-static equi-join on `cell` probes the batch-side corpus
    * (re-planned per micro-batch, zero streaming state on the corpus
    * side — at 100 TB this is the s07 bucketed layout, so each
    * micro-batch reads only probed partitions); per-query TOP-1 is a
    * complete-mode max-struct aggregate whose state is ONE struct per
    * query, not per candidate. Top-k generalizes by the same two-level
    * shape (per-cell partial top-k, final merge) without changing the
    * state bound.
    *
    * Gate: the streamed top-1 must equal batch s04's rank-1 row per
    * query, exactly — same cosine expression tree, same 6-decimal
    * rounding, same (cos desc, n_id asc) tie ordering (max of
    * struct(cos, −n_id) IS that ordering). Micro-batching provably
    * answer-preserving; the booleans restate as constants. */
  def s13StreamAnnGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    import org.apache.spark.ml.functions.array_to_vector
    // isolated session clone (q37 note): state-store sizing + the memory
    // sink view stay invisible to the caller's session
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val path = s"$d/embeddings.parquet"
    val rawSchema = s2.read.parquet(path).schema
    val conf = s.sparkContext.hadoopConfiguration
    val stageDir =
      s"${HadoopIO.scratchDir(s)}/graft_s13_" + d.replaceAll("[^A-Za-z0-9]", "_")
    HadoopIO.stageFile(path, s"$stageDir/embeddings.parquet", conf)
    val e = s2.read.parquet(path).select(col("vec_id"), col("embedding"))
    val model = ivfModel(
      e.withColumn("vec", array_to_vector(col("embedding"))), d)
    val centers = centersLit(model)
    // static corpus side: cell-assigned, norms precomputed (s04's n frame)
    val n = model.transform(e.where(col("vec_id") >= 10)
        .withColumn("vec", array_to_vector(col("embedding"))))
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        norm2(col("embedding")).as("n_nrm"), col("cell"))
    // streaming query side: per-row probe-cell selection, no window
    val qs = s2.readStream.schema(rawSchema).parquet(stageDir)
      .where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm2(col("embedding")).as("q_nrm"))
    def dist2(emb: Column, c: Column): Column =
      aggregate(zip_with(emb, c,
        (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
        lit(0.0), (a, v) => a + v)
    val probes = transform(centers,
      (c, i) => struct(dist2(col("q_emb"), c).as("d"), i.as("cell")))
    val probed = qs
      .withColumn("p", explode(slice(array_sort(probes), 1, NProbe)))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("p.cell").as("cell"))
    val tbl = "s13_streamed"
    val q = probed.join(n, Seq("cell"))
      .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")))
      .groupBy(col("q_id"))
      .agg(max(struct(round(col("cos"), 6).as("cos_r"),
        (-col("n_id")).as("neg_id"))).as("m"))
      .select(col("q_id"), col("m.cos_r").as("s_cos"),
        (-col("m.neg_id")).as("s_nid"))
      .writeStream.format("memory").queryName(tbl).outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    s2.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    val batchTop1 = s04AnnIvf(s2, d).where(col("rank") === 1)
      .select(col("q_id"), col("n_id").as("b_nid"), col("cos_r").as("b_cos"))
    s2.table(tbl).join(batchTop1, Seq("q_id"), "full_outer")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("s_nid") === col("b_nid") &&
          col("s_cos") === col("b_cos"), 1L).otherwise(0L)).as("n_match"))
      .select(col("n_queries"), col("n_match"),
        (col("n_queries") === 10 && col("n_match") === 10).as("all_match"))
  }

  val s13Sql: String =
    """SELECT CAST(10 AS BIGINT) AS n_queries,
      |  CAST(10 AS BIGINT) AS n_match, true AS all_match""".stripMargin

  // ---------------------------------------------------------------- s14
  /** Hard-negative mining — the contrastive-training data op (DPR /
    * SimCLR-family pipelines, public papers): for each anchor, the MOST
    * similar corpus vector that is NOT a near-duplicate (cos <
    * `HardNegCos`) — similar enough to shape the training margin,
    * distinct enough to be a true negative. The excluded band is exactly
    * what semantic dedup (d15) removes, so the threshold carries the
    * same meaning across both ops.
    *
    * This is the exact kernel over ANCHORS × corpus: the anchor set is a
    * dim by contract (the training micro-batch being mined), so the scan
    * is one broadcast nested loop with no shuffle until the per-anchor
    * argmax (d02's oracle-kernel discipline — the scale path swaps in
    * s09's IVF/PQ probe unchanged: candidates from probed cells, the
    * same threshold filter, the same argmax). Planted exact copies of
    * every anchor (cos = 1) prove the exclusion band works: a copy would
    * win every unfiltered argmax, and the oracle-checked result must
    * never contain one. */
  private val HardNegCos = 0.95

  def s14HardNegatives(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    Dedup.assertIdHeadroom(e, "vec_id", d)
    val anchors = e.where(col("vec_id") < 100)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm2(col("embedding")).as("q_nrm"))
    val planted = e.where(col("vec_id") < 100).select(
      (col("vec_id") + lit(1000000000L)).as("vec_id"), col("embedding"))
    val corpus = e.where(col("vec_id") >= 100).unionByName(planted)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        norm2(col("embedding")).as("n_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    corpus.crossJoin(broadcast(anchors))
      .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")))
      .where(col("cos") < HardNegCos)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") === 1)
      .select(col("q_id"), col("n_id").as("hard_neg_id"),
        round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id")
  }

  val s14Sql: String =
    """WITH corp AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 100
      |  UNION ALL
      |  SELECT vec_id + 1000000000, embedding FROM embeddings
      |  WHERE vec_id < 100)
      |SELECT q_id, n_id AS hard_neg_id, cos_r FROM (
      |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
      |    ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(n.embedding AS DOUBLE[])), 6)
      |      AS cos_r,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(n.embedding AS DOUBLE[])) DESC,
      |               n.vec_id ASC) AS rank
      |  FROM embeddings q JOIN corp n
      |    ON list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                              CAST(n.embedding AS DOUBLE[])) < 0.95
      |  WHERE q.vec_id < 100) t
      |WHERE rank = 1 ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------- s05
  /** Driver-visible ANN recall gate: computes recall@5 of the LSH (s02)
    * and IVF (s04) paths against the in-engine brute-force truth (s01),
    * and emits pass/fail booleans against fixed floors. The approximation
    * itself is not SQL-expressible, but the CONTRACT is: every query must
    * report `true`, and the oracle pins exactly that — so a recall
    * regression (plane/seed drift, banding bug, probe miscount) flips a
    * driver CORRECTNESS row, not just a local spec. Floors carry margin
    * under the measured recalls (LSH avg 0.92–0.98 and IVF avg 0.76–0.80
    * across sf0.001/0.01/0.1) so data-scale variance doesn't flap the
    * gate while a real regression still trips it. */
  def s05AnnRecallGate(s: SparkSession, d: String): DataFrame = {
    // one declarative plan, one action — no driver-side counts: hit
    // fractions are aggregated scalar rows cross-joined into the gate row
    val brute = s01KnnBrute(s, d).select(col("q_id"), col("n_id"))
    def hitFrac(ann: DataFrame, as: String): DataFrame =
      brute
        .join(ann.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"),
          "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(brute.agg(count(lit(1)).as("total")))
        .select((col("hits").cast("double") / col("total")).as(as))
    hitFrac(s02AnnLsh(s, d), "lsh_recall")
      .crossJoin(hitFrac(s04AnnIvf(s, d), "ivf_recall"))
      .select(
        lit(10).cast("long").as("n_queries"),
        (col("lsh_recall") >= 0.6).as("lsh_recall_ok"),
        (col("ivf_recall") >= 0.5).as("ivf_recall_ok"))
  }

  val s05Sql: String =
    """SELECT CAST(10 AS BIGINT) AS n_queries,
      |  true AS lsh_recall_ok, true AS ivf_recall_ok""".stripMargin

  // ---------------------------------------------------------------- s06
  /** Symmetric int8 quantization of the embedding column — the storage
    * path for a 100 TB embedding corpus (4× smaller than float32, cheap
    * SIMD distance kernels): per vector, scale = max|x|/127, q = round(x/
    * scale). Emits the scale, an exact integer checksum of the codes, and
    * a reconstruction-quality gate (cosine(x, dequantized) ≥ 0.99 — int8
    * symmetric quantization of 64-dim vectors loses well under 1%%).
    * Entirely narrow (no shuffle until the final sort). */
  def s06EmbedQuantize(s: SparkSession, d: String): DataFrame = {
    val x = col("embedding")
    val withScale = Tables.embeddings(s, d)
      .select(col("vec_id"), x,
        (array_max(transform(x, v => abs(v.cast("double")))) / 127.0).as("scale"))
    val q = when(col("scale") === 0.0,
      transform(col("embedding"), _ => lit(0L)))
      .otherwise(transform(col("embedding"), v =>
        round(v.cast("double") / col("scale"), 0).cast("long")))
    withScale
      .withColumn("qv", q) // projection boundary: lambda exprs don't CSE
      .withColumn("dq", transform(col("qv"), v => v.cast("double") * col("scale")))
      .select(col("vec_id"), col("scale"),
        aggregate(col("qv"), lit(0L), (a, v) => a + v).as("q_checksum"),
        when(col("scale") === 0.0, lit(true))
          .otherwise(cosine(col("embedding"), col("dq")) >= 0.99).as("cos_ok"))
      .orderBy("vec_id")
  }

  val s06Sql: String =
    """WITH base AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x,
      |    list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v))) / 127.0 AS scale
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, x, scale,
      |    CASE WHEN scale = 0 THEN list_transform(x, v -> CAST(0 AS BIGINT))
      |         ELSE list_transform(x, v -> CAST(round(v / scale, 0) AS BIGINT)) END AS qv
      |  FROM base)
      |SELECT vec_id, scale,
      |  CAST(list_sum(qv) AS BIGINT) AS q_checksum,
      |  CASE WHEN scale = 0 THEN true ELSE
      |    list_cosine_similarity(x, list_transform(qv, v -> v * scale)) >= 0.99
      |  END AS cos_ok
      |FROM q ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- s03
  /** Vector column statistics: per-label mean L2 norm + count — the sanity
    * profile a pipeline runs before indexing an embedding corpus. */
  def s03EmbedNorms(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Det._
    Tables.embeddings(s, d)
      .select(col("label"), norm2(col("embedding")).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(davg(col("nrm"), 10), 6).as("avg_norm"))
      .orderBy("label")
  }

  val s03Sql: String =
    """SELECT label, COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                                            CAST(embedding AS DOUBLE[])))
      |        AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- s11
  /** Per-label embedding centroids — the reduction every clustering /
    * semantic-dedup / class-prototype pipeline runs over the corpus.
    * `posexplode` fans each vector into (dim, value) rows; the (label,
    * dim) hash aggregate has ≤ labels × dims groups, so partial (map-side)
    * aggregation collapses the fan-out before the exchange and the
    * shuffle carries only the tiny group table — the 100 TB shape.
    * Means are decimal-exact sums (s03's discipline: float → double is
    * exact widening, double → DECIMAL(38,10) is the same deterministic
    * truncation in both engines) divided once. */
  def s11LabelCentroids(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Det._
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        round(davg(col("v").cast("double"), 10), 6).as("c"))
      .orderBy("label", "dim")
  }

  val s11Sql: String =
    """WITH e AS (
      |  SELECT label, unnest(range(0, len(embedding))) AS dim,
      |    embedding AS emb
      |  FROM embeddings)
      |SELECT label, CAST(dim AS INT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
      |  ROUND(CAST(SUM(CAST(CAST(emb[CAST(dim + 1 AS BIGINT)] AS DOUBLE)
      |    AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*), 6) AS c
      |FROM e GROUP BY label, dim
      |ORDER BY label, dim""".stripMargin

  // ---------------------------------------------------------------- s15
  /** Radius (range) search — the fixed-threshold complement to top-k:
    * every corpus neighbor with cosine ≥ τ, the primitive behind
    * duplicate-sweep radii and "all sufficiently-similar pairs" joins.
    * Same broadcast-nested-loop shape as s01 (tiny query side broadcast,
    * corpus scanned once, zero data-sized shuffle); the per-query
    * aggregate is 10 groups. At 100 TB the corpus side prunes through
    * the IVF cells first (s07's layout: only cells whose centroid cosine
    * can reach τ are scanned — the triangle-inequality bound); the
    * brute-force form here is the oracle-restatable baseline, same
    * contract as s01 vs s02.
    *
    * τ = 0.2 sits in the far tail of the corpus cosine distribution
    * (99th percentile ≈ 0.29 max ≈ 0.49 — measured), far from any
    * rounded value at 6 decimals, so the threshold compare is
    * engine-stable. */
  def s15RadiusSearch(s: SparkSession, d: String): DataFrame = {
    val (q, n) = split(s, d)
    n.crossJoin(broadcast(q))
      .withColumn("cos_r", round(cosinePre(col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")), 6))
      .where(col("cos_r") >= 0.2)
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(col("n_id")).as("id_checksum"),
        round(max(col("cos_r")), 6).as("max_cos"))
      .orderBy("q_id")
  }

  val s15Sql: String =
    """SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_neighbors,
      |  CAST(SUM(n_id) AS BIGINT) AS id_checksum,
      |  ROUND(MAX(cos_r), 6) AS max_cos
      |FROM (
      |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
      |    ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(n.embedding AS DOUBLE[])), 6)
      |      AS cos_r
      |  FROM embeddings q JOIN embeddings n ON n.vec_id >= 10
      |  WHERE q.vec_id < 10) t
      |WHERE cos_r >= 0.2
      |GROUP BY q_id ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------- s16
  /** MMR (maximal marginal relevance) diversified re-ranking — the
    * post-retrieval stage that trades raw relevance for coverage
    * (Carbonell & Goldstein 1998): greedily select k items maximizing
    * λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s). The contract mirrors s10's
    * re-ranker: the input is a top-C SHORTLIST (C bounded — ANN output),
    * so the inherently sequential greedy runs on the driver over ≤ C
    * rows (a dim-by-contract collect, like the LD map); relevance and
    * the C×C sim matrix come from the distributed retrieval stages.
    *
    * Gate: three planted 4-vector clusters sharing a query direction,
    * cluster A most relevant. Plain top-4 drowns in cluster A (all four
    * picks one cluster); MMR at λ=0.5 provably picks A→B→C then returns
    * to A (every remaining candidate carries the same ~0.99 same-cluster
    * penalty, so the λ·rel term decides) — the oracle restates the
    * derivation as constants. */
  def mmrSelect(shortlist: Array[(Long, Double, Array[Double])],
      k: Int, lambda: Double): Seq[Long] = {
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (dp, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dp / math.sqrt(na * nb)
    }
    while (selected.length < math.min(k, shortlist.length)) {
      val best = shortlist.indices.filterNot(selected.contains).maxBy { i =>
        val pen = if (selected.isEmpty) 0.0
          else selected.map(j => cos(shortlist(i)._3, shortlist(j)._3)).max
        // deterministic: score then lower id wins ties
        (lambda * shortlist(i)._2 - (1 - lambda) * pen, -shortlist(i)._1)
      }
      selected += best
    }
    selected.map(shortlist(_)._1).toSeq
  }

  def s16MmrGate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = 8
    // query = e0; cluster bases: e0·w + orth-axis·sqrt(1-w²), so base↔query
    // cosine is exactly w and cross-cluster cosine is w_i·w_j ≤ 0.86
    val bases = Seq((0, 0.96, 1), (1, 0.90, 2), (2, 0.85, 3))
    val fixture = bases.flatMap { case (c, w, axis) =>
      (0 until 4).map { m =>
        val v = Array.fill(dim)(0.0)
        v(0) = w; v(axis) = math.sqrt(1 - w * w)
        // tiny same-cluster jitter on a spare axis: members stay ~0.999
        // similar, ordering inside a cluster is strict
        v(4 + c) = 1e-3 * (m + 1)
        (c.toLong * 10 + m, v)
      }
    }
    val query = { val v = Array.fill(dim)(0.0); v(0) = 1.0; v }
    val cand = fixture.toDF("cand_id", "emb")
      .withColumn("rel", graft.functions.VectorFns.cosine(col("emb"),
        array(query.map(lit): _*)) )
    // shortlist = ALL candidates here (C = 12); in production this is the
    // ANN top-C
    val shortlist = cand.select(col("cand_id"), col("rel"), col("emb"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Double](2).toArray))
      .sortBy(t => (-t._2, t._1))
    val topk = shortlist.take(4).map(_._1)
    val mmr = mmrSelect(shortlist, 4, 0.5)
    def clusters(ids: Seq[Long]): Long = ids.map(_ / 10).distinct.length
    s.range(1).select(
      lit(clusters(topk.toSeq)).as("topk_clusters"),
      lit(clusters(mmr)).as("mmr_clusters"),
      lit(mmr.head / 10).as("mmr_first_cluster"),
      lit(mmr.take(3).map(_ / 10).sorted == Seq(0L, 1L, 2L))
        .as("one_per_cluster_first"),
      lit(mmr(3) / 10).as("mmr_fourth_cluster"))
  }

  val s16Sql: String =
    """SELECT CAST(1 AS BIGINT) AS topk_clusters,
      |  CAST(3 AS BIGINT) AS mmr_clusters,
      |  CAST(0 AS BIGINT) AS mmr_first_cluster,
      |  true AS one_per_cluster_first,
      |  CAST(0 AS BIGINT) AS mmr_fourth_cluster""".stripMargin

  // ---------------------------------------------------------------- s17
  /** Filtered (metadata-constrained) KNN — production vector search is
    * almost never unconstrained: "top-k among rows where label = X" is
    * the canonical form (per-tenant, per-language, per-license
    * retrieval). PRE-filtering is the correct semantics (filter, then
    * rank): post-filtering a global top-k under-returns whenever the
    * filter is selective. Same broadcast-nested-loop shape as s01 with
    * the label equality folded into the join condition, so corpus rows
    * of other labels are never scored. At 100 TB the label becomes a
    * partition column of the s07 bucketed layout and the filter prunes
    * partitions statically — score only what can match. */
  def s17FilteredKnn(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).withColumn("nrm", norm2(col("embedding")))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val n = e.where(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("label").as("n_label"),
        col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    n.join(broadcast(q), col("n_label") === col("q_label"))
      .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("q_label").as("label"), col("rank"),
        col("n_id"), round(col("cos"), 6).as("cos_r"))
      .orderBy("q_id", "rank")
  }

  val s17Sql: String =
    """SELECT q_id, label, rank, n_id, cos_r FROM (
      |  SELECT q.vec_id AS q_id, q.label AS label, n.vec_id AS n_id,
      |    ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(n.embedding AS DOUBLE[])), 6)
      |      AS cos_r,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                      CAST(n.embedding AS DOUBLE[])) DESC,
      |               n.vec_id ASC) AS rank
      |  FROM embeddings q JOIN embeddings n
      |    ON n.vec_id >= 10 AND n.label = q.label
      |  WHERE q.vec_id < 10) t
      |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- s18
  /** NProbe recall sweep — the cost/recall dial every IVF deployment
    * tunes: the same index probed at nprobe ∈ {1, 2, 4, 8}, recall@5
    * measured against in-engine brute force. The emitted MONOTONICITY is
    * a guaranteed contract, not a statistic: probe sets grow by
    * inclusion (nprobe n ⊂ nprobe n+1 — same ordered centroid ranking,
    * longer prefix), and any candidate displacing a returned top-5
    * member has higher cosine, hence is itself in the global top-5 — so
    * recall@k never decreases as nprobe grows. A violation means the
    * probe ranking, the top-k, or the index is broken. One declarative
    * plan: four probe branches over ONE corpus assignment, hit
    * fractions cross-joined as scalar rows (s05's discipline). */
  def s18NprobeSweep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.embeddings(s, d)
      .withColumn("vec", array_to_vector(col("embedding")))
    val model = ivfModel(e, d)
    val n = model.transform(e.where(col("vec_id") >= 10))
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        norm2(col("embedding")).as("n_nrm"), col("cell"))
    val brute = s01KnnBrute(s, d).select(col("q_id"), col("n_id"))
    def recallAt(np: Int): DataFrame =
      brute.join(
          probeTopK(ivfProbes(s, e, model, np), n)
            .select(col("q_id"), col("n_id")),
          Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as(s"hits_$np"))
    recallAt(1).crossJoin(recallAt(2)).crossJoin(recallAt(4))
      .crossJoin(recallAt(8))
      .select(lit(10L).as("n_queries"),
        (col("hits_1") <= col("hits_2") && col("hits_2") <= col("hits_4") &&
          col("hits_4") <= col("hits_8")).as("monotone_ok"),
        (col("hits_8") >= 25L).as("r8_floor_ok"), // ≥ 0.5 recall (s05 floor)
        (col("hits_8") >= col("hits_1")).as("r8_ge_r1"))
  }

  val s18Sql: String =
    """SELECT CAST(10 AS BIGINT) AS n_queries, true AS monotone_ok,
      |  true AS r8_floor_ok, true AS r8_ge_r1""".stripMargin

  // ---------------------------------------------------------------- s19
  /** k-NN GRAPH construction — the batch primitive under semantic dedup,
    * label propagation, and graph-based ANN indexes (NN-Descent/NSW all
    * start from one): every corpus vector gets edges to its k=3 nearest
    * neighbors. All-pairs is O(n²) and dead at scale; here candidates
    * form only INSIDE the s02 hash-table buckets (symmetric bucketed
    * self-join on (table, bucket) — one skew-free shuffle whose bucket
    * sizes are set by bits-per-table, pair work Σ|bucket|², the same
    * contract as the d03 LSH bands), exact cosine on candidates, top-k
    * per node. The graph half runs on a deterministic half of the corpus
    * (vec_id even) to bound the self-join; the gate checks (a) the
    * bucketed candidate generation actually SUPPLIES the graph — ≥ 90%
    * of nodes reach full degree k and no node is isolated (falsifiable:
    * a bits-per-table or multi-probe regression starves buckets and
    * flips it; a `<= k` bound would be tautological under the top-k
    * rank), (b) on the 1-in-10 sampled nodes, bucketed edges recover
    * ≥ 60% of the true top-3 (brute force priced on the SAMPLE only —
    * O(n·n/10), the verification pattern that survives scale). */
  /** The s19/s21 node set: a deterministic half of the corpus. */
  private[operators] def knnGraphNodes(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .where(col("vec_id") >= 10 && col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("emb"),
        norm2(col("embedding")).as("nrm"))

  /** Bucketed kNN edge construction (the s19 kernel), scored: cosine is
    * computed BEFORE the pair dedup — a candidate pair carries two
    * 64-float arrays, so deduping first would ship ~30× wider rows
    * through the exchange (measured 3 s vs 0.3 s at 1.2M candidates).
    * Scoring per duplicate costs bounded redundant flops (≤ tables ×
    * (1+bits) per pair) map-side, and the shuffle carries only
    * (id, b_id, cos) — the bandwidth-over-flops trade that wins on any
    * real cluster interconnect. cos is deterministic per pair, so
    * deduping after scoring picks the same value. Returns
    * (id, b_id, cos), ≤ k rows per id. */
  private[operators] def bucketedKnnEdges(e: DataFrame, k: Int): DataFrame = {
    // node side probes its bucket plus the Hamming-1 neighbors (s02's
    // recall dial); the indexed side stays single-bucket so the corpus
    // is bucketed once — candidate volume grows (1+bits)×, not (1+bits)²×
    val probes = e.select(col("id"), col("emb"), col("nrm"),
      explode(lshBucketsOf(col("emb"), multiProbe = true)).as("b"))
    val b = e.select(col("id"), col("emb"), col("nrm"),
      explode(lshBucketsOf(col("emb"), multiProbe = false)).as("b"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cos").desc, col("b_id").asc)
    probes
      .join(b.select(col("b"), col("id").as("b_id"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm")), Seq("b"))
      .where(col("id") =!= col("b_id"))
      .withColumn("cos",
        cosinePre(col("emb"), col("b_emb"), col("nrm"), col("b_nrm")))
      .select(col("id"), col("b_id"), col("cos"))
      .dropDuplicates("id", "b_id")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("b_id"), col("cos"))
  }

  /** Exact top-k ground truth on the 1-in-10 node sample (brute force
    * priced on the SAMPLE only — O(n·n/10), the verification pattern
    * that survives scale). */
  private[operators] def sampledKnnTruth(e: DataFrame, k: Int): DataFrame = {
    val sample = e.where(col("id") % 10 === 0)
      .select(col("id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"))
    val wq = Window.partitionBy(col("id"))
      .orderBy(col("cos").desc, col("b_id").asc)
    e.select(col("id").as("b_id"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm"))
      .crossJoin(broadcast(sample))
      .where(col("id") =!= col("b_id"))
      .withColumn("cos",
        cosinePre(col("q_emb"), col("b_emb"), col("q_nrm"), col("b_nrm")))
      .withColumn("rank", row_number().over(wq))
      .where(col("rank") <= k)
      .select(col("id"), col("b_id"))
  }

  /** kNN graph + sampled-truth cache, one per dataset dir: the graph is
    * a deterministic, seeded INDEX artifact (same rationale as
    * [[ivfModels]] — a cached build is identical to a rebuild), reused
    * by s19's audit, s21's refinement round, and every warm bench pass.
    * Persisted n·k-bounded frames, never unpersisted (one small entry
    * per dataset dir for the session's lifetime). */
  private val knnGraphCache =
    scala.collection.concurrent.TrieMap.empty[String, (DataFrame, DataFrame)]

  private def knnGraphFor(s: SparkSession, d: String,
      k: Int): (DataFrame, DataFrame) =
    knnGraphCache.getOrElseUpdate(d, {
      val e = knnGraphNodes(s, d)
      val edges = bucketedKnnEdges(e, k).persist()
      val truth = sampledKnnTruth(e, k).persist()
      edges.count(); truth.count()
      (edges, truth)
    })

  def s19KnnGraphGate(s: SparkSession, d: String): DataFrame = {
    val k = 3
    val e = knnGraphNodes(s, d)
    // the edge list IS the operator's output — n·k bounded rows. Both
    // audit passes (degree histogram, sampled recall) re-read it from
    // the per-dataset cache instead of re-running the banded join +
    // top-k per branch (the crossJoin-assembled one-plan form
    // recomputed the whole edge subtree twice: measured 2× the cost).
    val (edgesC, truthP) = knnGraphFor(s, d, k)
    val edgesP = edgesC.select(col("id"), col("b_id"))
    val nNodes = e.count()
    // degree from the NODE side (left-outer), so isolated nodes count
    // as degree 0 instead of silently vanishing from the edge list
    val degRow = e.select(col("id"))
      .join(edgesP.groupBy(col("id")).agg(count(lit(1)).as("deg")),
        Seq("id"), "left_outer")
      .select(coalesce(col("deg"), lit(0L)).as("deg"))
      .agg(avg((col("deg") === k).cast("double")).as("frac_full"),
        min(col("deg")).as("min_deg"))
      .head()
    val degreeOk = degRow.getDouble(0) >= 0.9 && degRow.getLong(1) >= 1
    val hits = truthP.join(edgesP, Seq("id", "b_id"), "left_semi").count()
    val total = truthP.count()
    val recallOk = hits.toDouble / total >= 0.6
    import s.implicits._
    // gate verdict is one row by contract — assembled driver-side
    Seq((nNodes, degreeOk, recallOk))
      .toDF("n_nodes", "degree_ok", "recall_ok")
  }

  val s19Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  true AS degree_ok, true AS recall_ok
      |FROM embeddings WHERE vec_id >= 10 AND vec_id % 2 = 0""".stripMargin

  // ---------------------------------------------------------------- s21
  /** One NN-DESCENT refinement round over the s19 graph — the iteration
    * every graph-ANN index (NN-Descent, NSW/HNSW construction) runs until
    * convergence: "a neighbor of my neighbor is probably my neighbor".
    * Candidates = 2-hop endpoints over the UNDIRECTED base graph (u–v,
    * v–w ⇒ try (u, w)); score exactly; keep the best k of base ∪ new.
    *
    * Scale shape: per node the candidate set is ≤ (2k)² — linear in the
    * corpus, independent of bucket skew; scoring fetches endpoint
    * embeddings via two uniform id-keyed equi-joins (never a broadcast
    * of the vector corpus), and the exchanges carry narrow (id, id, cos)
    * rows exactly like the base construction.
    *
    * The gate is the round's MONOTONICITY THEOREM, not a tuned
    * threshold: the refined top-k selects from a candidate superset of
    * the base's under the same (cos desc, id asc) order, so any entrant
    * displacing a true-top-k edge ranks above it globally and is itself
    * true-top-k — sampled recall can only rise. `monotone_ok` (recall
    * never drops) and `recall_ok` (the refined graph still clears s19's
    * 0.6 floor) are therefore deterministic; a violation means the
    * candidate expansion, the scoring joins, or the top-k rank broke. */
  def s21NnDescentGate(s: SparkSession, d: String): DataFrame = {
    val k = 3
    val e = knnGraphNodes(s, d)
    val (base, truthP) = knnGraphFor(s, d, k)
    val fwd = base.select(col("id"), col("b_id"))
    val adj = fwd.union(
      fwd.select(col("b_id").as("id"), col("id").as("b_id")))
    val cand = adj.as("uv")
      .join(adj.as("vw"), col("uv.b_id") === col("vw.id"))
      .select(col("uv.id").as("id"), col("vw.b_id").as("b_id"))
      .where(col("id") =!= col("b_id"))
      .dropDuplicates("id", "b_id")
    val en = e.select(col("id"), col("emb"), col("nrm"))
    val scored = cand
      .join(en, Seq("id"))
      .join(en.select(col("id").as("b_id"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm")), Seq("b_id"))
      .withColumn("cos",
        cosinePre(col("emb"), col("b_emb"), col("nrm"), col("b_nrm")))
      .select(col("id"), col("b_id"), col("cos"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cos").desc, col("b_id").asc)
    val refined = base.union(scored)
      .dropDuplicates("id", "b_id")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("b_id"))
      .persist()
    try {
      val nNodes = e.count()
      val total = truthP.count()
      val hitsBefore = truthP.join(base.select(col("id"), col("b_id")),
        Seq("id", "b_id"), "left_semi").count()
      val hitsAfter = truthP.join(refined, Seq("id", "b_id"), "left_semi")
        .count()
      import s.implicits._
      Seq((nNodes, hitsAfter >= hitsBefore,
          hitsAfter.toDouble / total >= 0.6))
        .toDF("n_nodes", "monotone_ok", "recall_ok")
    } finally {
      refined.unpersist(blocking = false)
    }
  }

  val s21Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  true AS monotone_ok, true AS recall_ok
      |FROM embeddings WHERE vec_id >= 10 AND vec_id % 2 = 0""".stripMargin

  // ---------------------------------------------------------------- s22
  /** GRAPH-BASED ANN SEARCH — greedy beam search over the s19 kNN graph,
    * the query-time half of every NSW/HNSW-family index (s19 builds the
    * structure, s21 refines it, this walks it). Each query starts from a
    * fixed seed set, scores the frontier exactly, keeps the best `beam`
    * nodes seen so far, and expands their undirected graph neighbors for
    * `hops` rounds — a BSP loop like d12's pointer doubling, NOT a
    * driver-side walk per query.
    *
    * Scale shape: per hop the candidate volume is ≤ queries × beam × 2k
    * (graph degree bound) — linear in the query set and independent of
    * corpus size; scoring fetches node embeddings via an id-keyed
    * equi-join (the corpus is never broadcast), and the state carried
    * between hops is the narrow (qid, id, cos) beam, ≤ beam rows per
    * query. On a 1000-executor cluster each hop is one shuffle keyed by
    * node id + one keyed by qid, both uniform.
    *
    * Entry points are per-query LSH bucket mates (the coarse-quantizer +
    * graph-refinement hybrid every production graph index runs — DiskANN
    * and HNSW-over-IVF both enter near the query, never from a global
    * root), unioned with a fixed 8-node global seed set so a query whose
    * buckets are empty still starts somewhere.
    *
    * Gates: `monotone_ok` is the beam-search THEOREM (each hop's beam =
    * top-`beam` of previous-beam ∪ newly-scored under (cos desc, id asc),
    * so the per-query best cosine never decreases — a violation means
    * the union, the dedup, or the rank broke), and `recall_ok` prices
    * exact truth on the query SAMPLE only (as s19/s21): the true top-1
    * graph node must land in the final beam for ≥ 60% of queries —
    * falsifiable by a seed/expansion/adjacency regression, and well
    * below the 0.96–1.0 measured at sf0.001/0.01/0.1 so the floor tests
    * the walk, not the data draw. */
  /** The s22 search kernel, exposed for the spec: returns (queries,
    * initial beam from the entry points, final beam after `hops`
    * expansion rounds). Both beams are persisted; the caller unpersists. */
  private[operators] def graphSearchBeams(s: SparkSession, d: String,
      k: Int, beam: Int, hops: Int)
      : (DataFrame, DataFrame, DataFrame, () => Unit) = {
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def cache(df: DataFrame): DataFrame = { cached += df; df.persist() }
    val e = knnGraphNodes(s, d)
    val (edges, _) = knnGraphFor(s, d, k)
    val fwd = edges.select(col("id"), col("b_id"))
    val adj = cache(fwd
      .union(fwd.select(col("b_id").as("id"), col("id").as("b_id")))
      .dropDuplicates("id", "b_id"))
    // queries: a deterministic 1-in-20 slice of the ODD half — disjoint
    // from the graph's node set, so every query is a genuinely unseen
    // vector and truth is the nearest GRAPH node.
    val q = cache(Tables.embeddings(s, d)
      .where(col("vec_id") % 20 === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        norm2(col("embedding")).as("q_nrm")))
    val en = e.select(col("id"), col("emb"), col("nrm"))
    // per-query entry points: nodes sharing an LSH bucket with the query
    // (multi-probe on the query side, single-bucket on the node side —
    // s02's asymmetric candidate contract), plus the 8 smallest node ids
    // as a global fallback so empty buckets never strand a query.
    val qBuckets = q.select(col("qid"),
      explode(lshBucketsOf(col("q_emb"), multiProbe = true)).as("b"))
    val nBuckets = e.select(col("id"),
      explode(lshBucketsOf(col("emb"), multiProbe = false)).as("b"))
    val lshEntries = qBuckets.join(nBuckets, Seq("b"))
      .select(col("qid"), col("id"))
    val globalSeeds = e.select(col("id")).orderBy(col("id")).limit(8)
    val entries = lshEntries
      .union(q.select(col("qid")).crossJoin(globalSeeds))
      .dropDuplicates("qid", "id")
    def score(cand: DataFrame): DataFrame = cand
      .join(en, Seq("id"))
      .join(q, Seq("qid"))
      .withColumn("cos",
        cosinePre(col("q_emb"), col("emb"), col("q_nrm"), col("nrm")))
      .select(col("qid"), col("id"), col("cos"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    def topBeam(scored: DataFrame): DataFrame = scored
      .withColumn("r", row_number().over(wq))
      .where(col("r") <= beam)
      .select(col("qid"), col("id"), col("cos"))
    val init = cache(topBeam(score(entries)))
    var cur = init
    for (_ <- 1 to hops) {
      val expand = cur.select(col("qid"), col("id"))
        .join(adj, Seq("id"))
        .select(col("qid"), col("b_id").as("id"))
        .dropDuplicates("qid", "id")
      // each hop references `cur` twice (carry-over ∪ expansion); the
      // persist makes that a cache reuse WITHIN the consumer's first job
      // — no eager count() per hop, so the whole walk materializes under
      // ONE downstream action instead of one job per hop. At true scale
      // a long walk would add checkpoints; the BSP shape is unchanged.
      cur = cache(topBeam(cur.union(score(expand))
        .dropDuplicates("qid", "id")))
    }
    (q, init, cur,
      () => cached.foreach(_.unpersist(blocking = false)))
  }

  def s22GraphSearchGate(s: SparkSession, d: String): DataFrame = {
    val (q, init, fin, release) =
      graphSearchBeams(s, d, k = 3, beam = 8, hops = 2)
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    try {
      // ONE action computes the whole verdict: per-query entry best,
      // final best (monotonicity), truth membership (recall), and the
      // query count ride a single three-way qid join + global aggregate
      // — the walk's persisted hops materialize inside this job.
      val seedBest = init.groupBy(col("qid")).agg(max(col("cos")).as("c0"))
      val finalBest = fin.groupBy(col("qid")).agg(max(col("cos")).as("c1"))
      val en = knnGraphNodes(s, d).select(col("id"), col("emb"), col("nrm"))
      val truth = en
        .crossJoin(broadcast(q))
        .withColumn("cos",
          cosinePre(col("q_emb"), col("emb"), col("q_nrm"), col("nrm")))
        .withColumn("r", row_number().over(wq))
        .where(col("r") === 1)
        .select(col("qid"), col("id"))
      val hitFlags = truth
        .join(fin.select(col("qid"), col("id")).withColumn("hit", lit(1L)),
          Seq("qid", "id"), "left_outer")
        .select(col("qid"), coalesce(col("hit"), lit(0L)).as("hit"))
      val r = seedBest.join(finalBest, Seq("qid")).join(hitFlags, Seq("qid"))
        .agg(count(lit(1)).as("n"),
          sum((col("c1") < col("c0")).cast("long")).as("viol"),
          sum(col("hit")).as("hits"))
        .head()
      val (nQueries, violations, hits) =
        (r.getLong(0), r.getLong(1), r.getLong(2))
      import s.implicits._
      Seq((nQueries, violations == 0L, hits.toDouble / nQueries >= 0.6))
        .toDF("n_queries", "monotone_ok", "recall_ok")
    } finally release()
  }

  // ---------------------------------------------------------------- s23
  /** FARTHEST-POINT SEEDING (Gonzalez traversal — the deterministic
    * k-means++ variant and a 2-approximation for k-center): the index
    *-lifecycle step BEFORE s20's Lloyd iteration — pick center 0, then
    * repeatedly the point farthest from its nearest chosen center
    * (deterministic: distance DESC, id ASC). Each round is one narrow
    * pass over the corpus against broadcast-literal centers (s13/s20's
    * kernel) ending in a single max(struct) — a driver loop of k−1
    * uniform aggregates, centers collected as the MODEL (k×dim scalars,
    * s20's driver-sized contract).
    *
    * Gates are the traversal's own invariants, not tuned thresholds:
    * the picked distances are NON-INCREASING (adding a center never
    * increases any point's min-distance), and the final coverage radius
    * is bounded by the last pick — violations mean the min-distance
    * pass, the argmax, or the center accumulation broke. 1e-6 relative
    * IEEE allowance, the s20 discipline. */
  /** The s23 kernel over an arbitrary (id, emb) frame: returns the k
    * chosen centers, the picked (squared) distances, and the final
    * coverage radius. Exposed for the hand-fixture spec. */
  private[operators] def farthestSeeds(base: DataFrame,
      k: Int): (List[Array[Double]], Array[Double], Double) = {
    def dist2(emb: Column, c: Column): Column =
      aggregate(zip_with(emb, c,
        (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
        lit(0.0), (a, v) => a + v)
    def centerLit(a: Array[Double]): Column =
      array(a.map(lit).toIndexedSeq: _*)
    val first = base.orderBy(col("id")).limit(1)
      .select(transform(col("emb"), x => x.cast("double")).as("v"))
      .collect()(0).getSeq[Double](0).toArray
    var centers = List(first)
    val picks = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 until k) {
      val cs = array(centers.map(centerLit): _*)
      val r = base
        .select(col("id"), col("emb"),
          array_min(transform(cs, c => dist2(col("emb"), c))).as("md"))
        .agg(max(struct(col("md").as("md"), (lit(0L) - col("id")).as("nid"),
          transform(col("emb"), x => x.cast("double")).as("v"))).as("m"))
        .select(col("m.md"), col("m.v")).collect()(0)
      picks += r.getDouble(0)
      centers = centers :+ r.getSeq[Double](1).toArray
    }
    val csF = array(centers.map(centerLit): _*)
    val radius = base
      .select(array_min(transform(csF, c => dist2(col("emb"), c))).as("md"))
      .agg(max(col("md"))).collect()(0).getDouble(0)
    (centers, picks.toArray, radius)
  }

  def s23FarthestSeedGate(s: SparkSession, d: String): DataFrame = {
    val k = 4
    val base = Tables.embeddings(s, d).where(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding").as("emb"))
      .persist()
    val (_, p, radius) = farthestSeeds(base, k)
    val n = base.count()
    base.unpersist(blocking = false)
    val nonInc = p.zip(p.drop(1)).forall { case (a, b) => b <= a * 1.000001 }
    val bounded = radius <= p.last * 1.000001
    import s.implicits._
    Seq((n, k, nonInc, bounded))
      .toDF("n_points", "k", "picks_nonincreasing", "radius_bounded")
  }

  val s23Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_points, 4 AS k,
      |  true AS picks_nonincreasing, true AS radius_bounded
      |FROM embeddings WHERE vec_id >= 10""".stripMargin

  val s22Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  true AS monotone_ok, true AS recall_ok
      |FROM embeddings WHERE vec_id % 20 = 1""".stripMargin

  // ---------------------------------------------------------------- s20
  /** One Lloyd ITERATION of the shared IVF index, driver-gated on the
    * algorithm's own convergence guarantee — the index-maintenance op a
    * live ANN deployment runs as the corpus drifts (re-center without a
    * full refit). E-step: argmin-assign every vector to the cached model's
    * centers (broadcast-literal centroids, one narrow pass — s13's
    * kernel). M-step: per-(cell, dim) mean via posexplode + map-side
    * partial aggregation (k×dim result rows; the collect is the MODEL
    * update, driver-sized by contract exactly like `KMeansModel` itself;
    * empty cells keep their old center). Gates are Lloyd's two
    * monotonicity lemmas, guaranteed in exact arithmetic and slack-free
    * here beyond a 1e-6 relative IEEE allowance: `mean_step_ok` (per-cell
    * means never raise the cost under the OLD assignment — the mean
    * minimizes summed squared distance), `reassign_step_ok` (re-assigning
    * to the new centers never raises it further — argmin per row). A
    * violation means the assignment kernel, the mean aggregation, or the
    * distance expression broke. */
  def s20LloydStepGate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val model = ivfModel(
      e.withColumn("vec", array_to_vector(col("embedding"))), d)
    val centers = centersLit(model)
    def dist2(emb: Column, c: Column): Column =
      aggregate(zip_with(emb, c,
        (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
        lit(0.0), (a, v) => a + v)
    def argminD(emb: Column, cs: Column): Column =
      element_at(array_sort(transform(cs,
        (c, i) => struct(dist2(emb, c).as("d"), i.as("cell")))), 1)
    val assigned = e
      .select(col("vec_id"), col("embedding"),
        argminD(col("embedding"), centers).as("p"))
      .select(col("vec_id"), col("embedding"),
        col("p.cell").as("cell"), col("p.d").as("d_old"))
    // M-step: (cell, dim) means — partial-aggregated map-side, k×dim
    // result rows re-assembled per cell and collected as the model update
    val cellDimMeans = assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col("cell"), col("i"))
      .agg(avg(col("v").cast("double")).as("m"))
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("i"), col("m")))).as("ms"))
      .select(col("cell"), transform(col("ms"), x => x("m")).as("center"))
      .collect()
    val newByCell = cellDimMeans
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val newCenters = array(model.clusterCenters.indices.map { c =>
      array(newByCell.getOrElse(c, model.clusterCenters(c).toArray)
        .map(lit).toIndexedSeq: _*)
    }: _*)
    assigned
      .select(col("d_old"),
        dist2(col("embedding"), element_at(newCenters, col("cell") + 1))
          .as("d_mean"),
        argminD(col("embedding"), newCenters).getField("d").as("d_new"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("d_old")).as("c_old"),
        sum(col("d_mean")).as("c_mean"), sum(col("d_new")).as("c_new"))
      .select(col("n_vecs"),
        (col("c_mean") <= col("c_old") * 1.000001).as("mean_step_ok"),
        (col("c_new") <= col("c_mean") * 1.000001).as("reassign_step_ok"))
  }

  val s20Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  true AS mean_step_ok, true AS reassign_step_ok
      |FROM embeddings""".stripMargin

  // ---------------------------------------------------------------- s24
  /** TWO-LEVEL (hierarchical) IVF — the index SHAPE a 10⁹–10¹¹-vector
    * corpus actually deploys (FAISS IMI / coarse+fine quantizer;
    * SPANN's balanced tree): a k₁=4 coarse partition, then an
    * independent k₂=4 sub-partition per coarse cell, so a probe touches
    * np₁·np₂/(k₁·k₂) of the corpus while each centroid table stays
    * dictionary-sized — one flat k₁·k₂-cell index needs every centroid
    * in one table, the hierarchy keeps level-2 tables per-cell and the
    * routing decision local. Assignment is (like s07) a build-time
    * cost: per-cell transforms union into the (c1, c2)-keyed corpus a
    * production layout would write `partitionBy(c1, c2)`.
    *
    * Gated on a THEOREM plus a floor: probing EVERY cell (np = k) makes
    * the candidate set the whole corpus, so full-probe top-5 must equal
    * s01's brute force EXACTLY (same scoring, same tie-break — any
    * routing/assignment/dedup bug flips it); the partial probe
    * (np₁ = np₂ = 2 → ¼ of the corpus) must keep recall ≥ 0.5. Seeded
    * and cached per dataset ([[ivfModels]] discipline), so every run is
    * a replay. */
  private val HierK1 = 4
  private val HierK2 = 4
  private val hierModels = scala.collection.concurrent.TrieMap
    .empty[String, (org.apache.spark.ml.clustering.KMeansModel,
      Map[Int, org.apache.spark.ml.clustering.KMeansModel])]

  private def hierModel(e: DataFrame, d: String):
      (org.apache.spark.ml.clustering.KMeansModel,
        Map[Int, org.apache.spark.ml.clustering.KMeansModel]) =
    hierModels.getOrElseUpdate(d, {
      val m1 = new org.apache.spark.ml.clustering.KMeans()
        .setK(HierK1).setSeed(421L)
        .setFeaturesCol("vec").setPredictionCol("c1")
        .fit(e.select("vec"))
      val assigned = m1.transform(e.select(col("vec")))
      val subs = (0 until HierK1).map { c =>
        c -> new org.apache.spark.ml.clustering.KMeans()
          .setK(HierK2).setSeed(421L + c)
          .setFeaturesCol("vec").setPredictionCol("c2")
          .fit(assigned.where(col("c1") === c).select("vec"))
      }.toMap
      (m1, subs)
    })

  def s24HierIvfGate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.embeddings(s, d)
      .withColumn("vec", array_to_vector(col("embedding")))
    val (m1, subs) = hierModel(e, d)
    val a1 = m1.transform(e.where(col("vec_id") >= 10))
    val corpus = subs.map { case (c, m) =>
      m.transform(a1.where(col("c1") === c))
    }.reduce(_.unionByName(_))
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        norm2(col("embedding")).as("n_nrm"), col("c1"), col("c2"))
    val cent1 = s.createDataFrame(
      m1.clusterCenters.zipWithIndex.map { case (v, i) => (i, v.toArray) }
        .toSeq).toDF("c1", "cent1")
    val cent2 = s.createDataFrame(
      subs.toSeq.flatMap { case (c, m) =>
        m.clusterCenters.zipWithIndex.map { case (v, j) =>
          (c, j, v.toArray)
        }
      }).toDF("c1", "c2", "cent2")
    def dist2(emb: Column, cent: Column): Column = aggregate(
      zip_with(emb, cent, (x, c) => (x.cast("double") - c) *
        (x.cast("double") - c)),
      lit(0.0), (acc, v) => acc + v)
    def topk(np1: Int, np2: Int): DataFrame = {
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          norm2(col("embedding")).as("q_nrm"))
      val w1 = Window.partitionBy(col("q_id"))
        .orderBy(col("d1").asc, col("c1").asc)
      val p1 = q.crossJoin(broadcast(cent1))
        .withColumn("d1", dist2(col("q_emb"), col("cent1")))
        .withColumn("pr1", row_number().over(w1))
        .where(col("pr1") <= np1)
        .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c1"))
      val w2 = Window.partitionBy(col("q_id"), col("c1"))
        .orderBy(col("d2").asc, col("c2").asc)
      val p2 = p1.join(broadcast(cent2), Seq("c1"))
        .withColumn("d2", dist2(col("q_emb"), col("cent2")))
        .withColumn("pr2", row_number().over(w2))
        .where(col("pr2") <= np2)
        .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c1"),
          col("c2"))
      val wR = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id").asc)
      p2.hint("broadcast").join(corpus, Seq("c1", "c2"))
        .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
          col("q_nrm"), col("n_nrm")))
        .withColumn("rank", row_number().over(wR))
        .where(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("n_id"),
          round(col("cos"), 6).as("cos_r"))
    }
    val brute = s01KnnBrute(s, d)
      .select(col("q_id"), col("rank"), col("n_id"), col("cos_r"))
    val full = topk(HierK1, HierK2)
    val partial = topk(2, 2)
    val fullMatch = full
      .join(brute, Seq("q_id", "rank", "n_id", "cos_r"), "left_semi")
      .agg(count(lit(1)).as("n_match"))
    val fullN = full.agg(count(lit(1)).as("n_full"))
    val bruteN = brute.agg(count(lit(1)).as("n_brute"))
    val hits = brute.select(col("q_id"), col("n_id"))
      .join(partial.select(col("q_id"), col("n_id")),
        Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    fullMatch.crossJoin(fullN).crossJoin(bruteN).crossJoin(hits)
      .select(lit(10L).as("n_queries"),
        (col("n_match") === col("n_brute") &&
          col("n_full") === col("n_brute")).as("full_probe_exact"),
        (col("hits").cast("double") / col("n_brute") >= 0.5)
          .as("partial_recall_ok"))
  }

  val s24Sql: String =
    """SELECT CAST(10 AS BIGINT) AS n_queries,
      |  true AS full_probe_exact, true AS partial_recall_ok""".stripMargin

  // ---------------------------------------------------------------- s25
  /** MATRYOSHKA TRUNCATION RECALL (Kusupati et al. 2022, the MRL eval
    * every embedding-serving stack runs before shipping prefix-dim
    * indexes): top-5 retrieval with only the first k of 64 dimensions,
    * scored as recall against the full-dimension truth — the curve that
    * decides how many dims the ANN tier can drop (and therefore how
    * much index RAM/IO a 100 TB embedding corpus saves). UNLIKE the
    * ANN gates this is fully ORACLE-CHECKED, not verdict-gated: cosine
    * on a prefix slice is deterministic arithmetic both engines
    * restate (`list_slice` + `list_cosine_similarity` in DuckDB).
    *
    * Each prefix length is the s01 broadcast-query brute pass over
    * sliced columns — map-side nested loop, per-query top-k, zero extra
    * shuffles; the recall join operates on 50-row frames. */
  def s25MatryoshkaRecall(s: SparkSession, d: String): DataFrame = {
    val dims = Seq(8, 16, 32, 64)
    val e = Tables.embeddings(s, d)
    def top5(k: Int): DataFrame = {
      val sliced = e.withColumn("emb", slice(col("embedding"), 1, k))
        .withColumn("nrm", norm2(col("emb")))
      val q = sliced.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
          col("nrm").as("q_nrm"))
      val n = sliced.where(col("vec_id") >= 10)
        .select(col("vec_id").as("n_id"), col("emb").as("n_emb"),
          col("nrm").as("n_nrm"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id").asc)
      n.crossJoin(broadcast(q))
        .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
          col("q_nrm"), col("n_nrm")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("q_id"), col("n_id"))
    }
    val full = top5(64)
    dims.map { k =>
      top5(k).join(full, Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(k.toLong).as("dim_prefix"), col("hits"),
          lit(50L).as("total"),
          expr("(1000 * hits) div 50").as("recall_permille"))
    }.reduce(_.unionByName(_)).orderBy("dim_prefix")
  }

  val s25Sql: String =
    """WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings
      |  WHERE vec_id < 10),
      |n AS (SELECT vec_id AS n_id, embedding FROM embeddings
      |  WHERE vec_id >= 10),
      |ks AS (SELECT unnest([8, 16, 32, 64]) AS k),
      |scored AS (SELECT ks.k, q.q_id, n.n_id,
      |    ROW_NUMBER() OVER (PARTITION BY ks.k, q.q_id
      |      ORDER BY list_cosine_similarity(
      |        CAST(list_slice(q.embedding, 1, ks.k) AS DOUBLE[]),
      |        CAST(list_slice(n.embedding, 1, ks.k) AS DOUBLE[])) DESC,
      |        n.n_id ASC) AS rank
      |  FROM ks, q, n),
      |top AS (SELECT k, q_id, n_id FROM scored WHERE rank <= 5),
      |full_top AS (SELECT q_id, n_id FROM top WHERE k = 64),
      |hits AS (SELECT t.k, COUNT(*) AS hits FROM top t
      |  JOIN full_top f ON t.q_id = f.q_id AND t.n_id = f.n_id
      |  GROUP BY t.k)
      |SELECT CAST(k AS BIGINT) AS dim_prefix, CAST(hits AS BIGINT) AS hits,
      |  CAST(50 AS BIGINT) AS total,
      |  CAST((1000 * hits) // 50 AS BIGINT) AS recall_permille
      |FROM hits ORDER BY dim_prefix""".stripMargin

  // ---------------------------------------------------------------- s26
  /** RETRIEVAL EVALUATION HARNESS (recall@k / MRR@k by labeled
    * relevance) — the measurement layer every ANN/retrieval deployment
    * runs alongside the index ops (s01–s25 build and search; s26 SCORES
    * a search against ground truth): for each labeled query, rank the
    * corpus by exact cosine, take same-label rows as relevant, and emit
    * recall@10, the first-relevant rank, and MRR@10 — all integer
    * (permille / milli), with the double cosine used ONLY inside the
    * rank ordering where both engines evaluate the identical
    * correctly-rounded expression tree (s01's discipline).
    *
    * Scale shape: eval query sets are small by construction — the query
    * side BROADCASTS against a corpus map-side pass (no corpus shuffle);
    * the per-query ranking window partitions by q_id; queries-per-task
    * spread the reduce. For corpus-scale eval the same harness runs over
    * an ANN candidate list instead of the full cross product — swap the
    * crossJoin for s02/s04's candidate join, the scoring tail is
    * unchanged. */
  def s26RetrievalEval(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .withColumn("nrm", norm2(col("embedding")))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("label").as("q_lab"))
    val n = e.where(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"), col("label").as("n_lab"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    n.crossJoin(broadcast(q))
      .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("rel", (col("n_lab") === col("q_lab")).cast("long"))
      .groupBy(col("q_id"))
      .agg(max(col("q_lab")).as("label"),
        sum(col("rel")).as("n_rel"),
        sum(when(col("rank") <= 10, col("rel")).otherwise(0L))
          .as("hits_at_10"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel_rank"))
      .withColumn("recall_permille", expr(
        "CASE WHEN n_rel = 0 THEN NULL" +
          " ELSE (1000 * hits_at_10) div n_rel END"))
      .withColumn("mrr_milli", expr(
        "CASE WHEN first_rel_rank IS NULL OR first_rel_rank > 10 THEN 0" +
          " ELSE 1000 div first_rel_rank END"))
      .orderBy("q_id")
  }

  val s26Sql: String =
    """WITH r AS (
      |  SELECT q.vec_id AS q_id, q.label AS ql, n.label AS nl,
      |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |        CAST(n.embedding AS DOUBLE[])) DESC, n.vec_id ASC) AS rank
      |  FROM embeddings q JOIN embeddings n ON n.vec_id >= 10
      |  WHERE q.vec_id < 10),
      |per AS (SELECT q_id, MAX(ql) AS label,
      |    SUM(CASE WHEN nl = ql THEN 1 ELSE 0 END) AS n_rel,
      |    SUM(CASE WHEN rank <= 10 AND nl = ql THEN 1 ELSE 0 END)
      |      AS hits_at_10,
      |    MIN(CASE WHEN nl = ql THEN rank END) AS first_rel_rank
      |  FROM r GROUP BY q_id)
      |SELECT q_id, label, CAST(n_rel AS BIGINT) AS n_rel,
      |  CAST(hits_at_10 AS BIGINT) AS hits_at_10,
      |  CAST(CASE WHEN n_rel = 0 THEN NULL
      |    ELSE (1000 * hits_at_10) // n_rel END AS BIGINT)
      |    AS recall_permille,
      |  CAST(first_rel_rank AS BIGINT) AS first_rel_rank,
      |  CAST(CASE WHEN first_rel_rank IS NULL OR first_rel_rank > 10
      |    THEN 0 ELSE 1000 // first_rel_rank END AS BIGINT) AS mrr_milli
      |FROM per ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------- s27
  /** PER-DIMENSION EMBEDDING STATISTICS — the profile a retrieval
    * deployment computes before whitening/mean-centering its index
    * (dead or low-variance dimensions are Matryoshka-truncation and PQ
    * codebook candidates; a large mean says cosine and dot diverge).
    * Stats run on the milli-quantized image of each float (an explicit,
    * documented domain — floor(v·1000)): integer sums are
    * partition-order-insensitive by construction, where summing raw
    * floats in double would be order-dependent and engine-divergent.
    * Variance uses the exact integer identity
    * (n·Σv² − (Σv)²) div n² in micro-units.
    *
    * Scale shape: ONE posexplode (narrow, ×dim fan-out) into ONE
    * 64-row hash aggregate with map-side combine — dimension-bounded
    * output at any corpus size. */
  def s27DimStats(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        expr("CAST(floor(v * 1000) AS BIGINT)").as("vm"))
      .groupBy(col("dim"))
      // decimal(38,0) accumulation: Σv² alone clears int64 near 10¹²
      // rows (the t34 overflow class at the stated corpus scale); the
      // outputs themselves are milli/micro-sized and cast back
      .agg(count(lit(1)).as("n"),
        sum(col("vm").cast("decimal(38,0)")).as("sv"),
        sum(col("vm").cast("decimal(38,0)") * col("vm")).as("sv2"),
        min(col("vm")).as("min_milli"), max(col("vm")).as("max_milli"))
      .select(col("dim"), col("n"),
        expr("CAST(sv div n AS BIGINT)").as("mean_milli"),
        expr("CAST((n * sv2 - sv * sv) div (CAST(n AS DECIMAL(38,0)) * n)" +
          " AS BIGINT)").as("var_micro"),
        col("min_milli"), col("max_milli"))
      .orderBy("dim")

  val s27Sql: String =
    """WITH v AS (SELECT g.i - 1 AS dim,
      |    CAST(floor(embedding[g.i] * 1000) AS BIGINT) AS vm
      |  FROM embeddings,
      |    unnest(generate_series(1, len(embedding))) AS g(i)),
      |a AS (SELECT dim, COUNT(*) AS n, SUM(CAST(vm AS HUGEINT)) AS sv,
      |    SUM(CAST(vm AS HUGEINT) * vm) AS sv2, MIN(vm) AS min_milli,
      |    MAX(vm) AS max_milli
      |  FROM v GROUP BY dim)
      |SELECT CAST(dim AS BIGINT) AS dim, n,
      |  CAST(sv // n AS BIGINT) AS mean_milli,
      |  CAST((n * sv2 - sv * sv) // (CAST(n AS HUGEINT) * n) AS BIGINT)
      |    AS var_micro,
      |  CAST(min_milli AS BIGINT) AS min_milli,
      |  CAST(max_milli AS BIGINT) AS max_milli
      |FROM a ORDER BY dim""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_knn_brute"  -> (s01KnnBrute _),
    "s02_ann_lsh"    -> (s02AnnLsh _),
    "s03_embed_norms" -> (s03EmbedNorms _),
    "s04_ann_ivf"    -> (s04AnnIvf _),
    "s05_ann_recall_gate" -> (s05AnnRecallGate _),
    "s06_embed_quantize" -> (s06EmbedQuantize _),
    "s07_ann_ivf_bucketed" -> (s07AnnIvfBucketed _),
    "s08_pq_gate"    -> (s08PqGate _),
    "s09_ivfadc_gate" -> (s09IvfAdcGate _),
    "s10_ivfadc_rerank_gate" -> (s10IvfAdcRerankGate _),
    "s11_label_centroids" -> (s11LabelCentroids _),
    "s12_ivfadc_residual_gate" -> (s12IvfAdcResidualGate _),
    "s13_stream_ann_gate" -> (s13StreamAnnGate _),
    "s14_hard_negatives" -> (s14HardNegatives _),
    "s15_radius_search" -> (s15RadiusSearch _),
    "s16_mmr_gate"   -> (s16MmrGate _),
    "s17_filtered_knn" -> (s17FilteredKnn _),
    "s18_nprobe_sweep" -> (s18NprobeSweep _),
    "s19_knn_graph_gate" -> (s19KnnGraphGate _),
    "s20_lloyd_step_gate" -> (s20LloydStepGate _),
    "s21_nndescent_gate"  -> (s21NnDescentGate _),
    "s22_graph_search_gate" -> (s22GraphSearchGate _),
    "s23_farthest_seed_gate" -> (s23FarthestSeedGate _),
    "s24_hier_ivf_gate" -> (s24HierIvfGate _),
    "s25_matryoshka_recall" -> (s25MatryoshkaRecall _),
    "s26_retrieval_eval" -> (s26RetrievalEval _),
    "s27_dim_stats" -> (s27DimStats _))

  val oracles: Map[String, String] = Map(
    "s01_knn_brute"   -> s01Sql,
    "s03_embed_norms" -> s03Sql,
    "s05_ann_recall_gate" -> s05Sql,
    "s06_embed_quantize" -> s06Sql,
    "s07_ann_ivf_bucketed" -> s07Sql,
    "s08_pq_gate"     -> s08Sql,
    "s09_ivfadc_gate" -> s09Sql,
    "s10_ivfadc_rerank_gate" -> s10Sql,
    "s11_label_centroids" -> s11Sql,
    "s12_ivfadc_residual_gate" -> s12Sql,
    "s13_stream_ann_gate" -> s13Sql,
    "s14_hard_negatives" -> s14Sql,
    "s15_radius_search" -> s15Sql,
    "s16_mmr_gate"    -> s16Sql,
    "s17_filtered_knn" -> s17Sql,
    "s18_nprobe_sweep" -> s18Sql,
    "s19_knn_graph_gate" -> s19Sql,
    "s20_lloyd_step_gate" -> s20Sql,
    "s21_nndescent_gate"  -> s21Sql,
    "s22_graph_search_gate" -> s22Sql,
    "s23_farthest_seed_gate" -> s23Sql,
    "s24_hier_ivf_gate" -> s24Sql,
    "s25_matryoshka_recall" -> s25Sql,
    "s26_retrieval_eval" -> s26Sql,
    "s27_dim_stats" -> s27Sql)
}
