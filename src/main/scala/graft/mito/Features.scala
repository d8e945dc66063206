package graft.mito

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-read feature frames (reference `BamReader.scala` NucReader/MTReader).
  *
  * Everything stays in one declarative plan per frame: scan → pushed
  * validity filter → projection (attribute tags extracted with builtins) →
  * per-read hash aggregate. The reference's RDD→Row→createDataFrame hop
  * (defect D2/B1, SURVEY §4.2) does not exist here, so Catalyst sees the
  * whole pipeline. Column semantics are the *intended* ones (B1 corrected):
  * NTMapQ←MAPQ, NTNumAlignments←NH, NTEditDist←NM, NTScore←NUMT interval
  * overlap.
  */
object Features {

  /** Nuclear-side features (reference `NucReader.DF`, `BamReader.scala:60-118`):
    * per read(+mate): sums of MAPQ / NH / NM / NUMT-overlap score. */
  /** Extract the three consumed tags in one native byte scan
    * ([[graft.functions.SamTagsExpr]]) behind a projection boundary — the
    * generic attrMap chain (regex split → map build → three probes) cost
    * ~2× in this hot path, and lambda-bearing builtins are excluded from
    * subexpression elimination. Defaults (NM→0, NH→1, MD→null) match the
    * reference (`Feature.scala:122-124`). */
  private def withTags(alignments: DataFrame): DataFrame =
    alignments
      .where(Sam.isValid)
      .select(col("readName"), col("mapQ"), col("start"), col("sequence"),
        col("referenceName"),
        graft.functions.SamTagsExpr.samTags(col("attributes")).as("t"))

  def ntFeatures(alignments: DataFrame, numts: Seq[Numt.Interval]): DataFrame =
    withTags(alignments)
      .select(
        col("readName").as("Read"),
        col("mapQ"),
        col("t.nh").as("numAlignments"),
        col("t.nm").as("editDistance"),
        Numt.overlapScore(numts).as("numtScore"))
      .groupBy(col("Read"))
      .agg(
        sum(col("mapQ")).as("NTMapQ"),
        sum(col("numAlignments")).as("NTNumAlignments"),
        sum(col("editDistance")).as("NTEditDist"),
        sum(col("numtScore")).as("NTScore"))

  /** Mito-side per-read rows before LD scoring (reference `MTReader.DF`,
    * `BamReader.scala:120-190`): sums + the collected variant lists of both
    * mates. */
  def mtPerRead(alignments: DataFrame): DataFrame =
    withTags(alignments)
      .select(
        col("readName").as("Read"),
        col("mapQ"),
        col("t.nh").as("numAlignments"),
        col("t.nm").as("editDistance"),
        graft.functions.MdVariantsExpr.mdVariants(col("sequence"),
          col("t.md"),
          col("start")).as("variants"))
      .groupBy(col("Read"))
      .agg(
        sum(col("mapQ")).as("MTMapQ"),
        sum(col("numAlignments")).as("MTNumAlignments"),
        sum(col("editDistance")).as("MTEditDist"),
        // canonical order so downstream scoring is deterministic
        sort_array(flatten(collect_list(col("variants")))).as("variants"))

  /** MT features, faithful LD mode: broadcast map + per-row scoring of the
    * distinct variant pair-multisets (reference `BamReader.scala:147-154`,
    * `combinations(2)` semantics — see Ld's doc). */
  def mtFeaturesBroadcast(alignments: DataFrame,
      ldBc: Broadcast[Map[(String, String), Int]]): DataFrame = {
    val pairScore = udf { vs: Seq[String] => Ld.scorePairs(ldBc.value, vs) }
    mtPerRead(alignments)
      .withColumn("LD", pairScore(col("variants")))
      .drop("variants")
  }

  /** MT features, scalable LD mode: per-row pair generation + broadcast-join
    * + re-agg (SURVEY §7.4) — no driver-resident map required.
    *
    * The per-read aggregate feeds both the feature columns and the pair
    * scoring branch; it is persisted (memory, spilling to disk) so the
    * scan→parse→aggregate pipeline executes ONCE — without it Catalyst
    * prunes the two branches differently and re-evaluates the whole
    * sub-plan per branch (2× the dominant cost at scale). One row per
    * read, so the cached frame is orders of magnitude smaller than the
    * alignment input. */
  def mtFeaturesJoin(alignments: DataFrame, ld: DataFrame): DataFrame = {
    val perRead = mtPerRead(alignments)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persisted.synchronized { persisted += perRead }
    perRead
      .join(Ld.pairScores(perRead.select(col("Read"), col("variants")), ld),
        Seq("Read"), "left")
      .withColumn("LD", coalesce(col("LD"), lit(0)))
      .drop("variants")
  }

  /** The intermediate frames [[mtFeaturesJoin]] persists (Spark's cache
    * manager dedupes identical plans, so repeated calls on the same inputs
    * share one entry — the set only grows across DISTINCT inputs). A
    * long-lived session calls [[releaseCaches]] once the join outputs are
    * materialized; one-shot drivers can rely on context shutdown. */
  private val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def releaseCaches(): Unit = persisted.synchronized {
    persisted.foreach(_.unpersist(blocking = false))
    persisted.clear()
  }

  /** Feature join (reference J1, `MTClassifierModel.scala:83` — inner on
    * Read; the comment said left join, the code was inner; we keep inner as
    * shipped semantics) + constant label (P3). */
  def featureFrame(mt: DataFrame, nt: DataFrame, label: Double): DataFrame =
    mt.join(nt, Seq("Read"), "inner")
      .withColumn("label", lit(label))

  /** Pooled z-normalization of the MapQ columns (reference `NormalizeMapQ`,
    * `MTClassifierModel.scala:119-144`): mean/sd over the union of MTMapQ
    * and NTMapQ, distributed as a broadcast scalar row (no .first() action,
    * no single-partition window). Empty input → typed null columns
    * (reference P5 path).
    *
    * r16: the pooled stats are ONE two-column aggregate over `df`, not an
    * aggregate over a union of two single-column prunings. The union form
    * evaluated the whole upstream pipeline once per arm (scan → synthesis →
    * parse → per-read aggregate → feature join, ×2 on top of the output
    * branch — x02's plan carried three copies of the pipeline and ~24
    * exchanges); the single-pass form leaves exactly two evaluations: the
    * MapQ-pruned stats pass and the full output branch (plan: 2 Exchange
    * fewer, one scan pair eliminated). Numerically: the MapQ sums are
    * integer-valued (sums of int mapQ), so Σx/Σx² through decimal-exact
    * [[graft.functions.Det.dsum]] are EXACT and `mu` is bit-identical to
    * the old pooled avg; `sigma` uses the same exact-sums formulation as
    * [[graft.functions.Det.dstddev]] (vs the old order-dependent central-
    * moment stddev_samp whose ulps varied with partitioning anyway — no
    * declared query exposes sigma directly: x02 drops the normalized
    * columns, the classify gates consume them through wide-margin trees).
    *
    * The input still feeds two plan branches and is deliberately NOT
    * persisted here: Catalyst prunes the stats arm down to the MapQ
    * columns only (the LD/variant subtrees are eliminated), so the
    * "duplicate" branch is far cheaper than materializing the full feature
    * row — measured 25% slower on the corpus-scale pipeline (x02) with a
    * persist. Callers that re-consume the FULL normalized frame
    * (MitoPipeline.run) persist the result instead. */
  def normalizeMapQ(df: DataFrame): DataFrame = {
    import graft.functions.Det.dsum
    val mt = col("MTMapQ").cast(DoubleType)
    val nt = col("NTMapQ").cast(DoubleType)
    // scale 0: the values are integer-valued by construction (sums of int
    // mapQ per read), so the decimal image is exact with no headroom games
    val stats = df.agg(
        (count(mt) + count(nt)).cast(DoubleType).as("n"),
        (coalesce(dsum(mt, 0), lit(0.0)) + coalesce(dsum(nt, 0), lit(0.0)))
          .as("s"),
        (coalesce(dsum(mt * mt, 0), lit(0.0)) +
          coalesce(dsum(nt * nt, 0), lit(0.0))).as("q"))
      .select(
        when(col("n") > 0, col("s") / col("n")).as("mu"),
        // numerator clamped at 0 (ADVICE r16): with ~0 variance (or sums
        // past 2^53 at scale) n·q − s² can round to a tiny negative and
        // sqrt would return NaN where stddev_samp returns 0.0
        when(col("n") > 1,
          sqrt(greatest(lit(0.0), col("n") * col("q") - col("s") * col("s")) /
            (col("n") * (col("n") - lit(1.0))))).as("sigma"))
    df.crossJoin(broadcast(stats))
      .withColumn("MTMapQ", (col("MTMapQ") - col("mu")) / col("sigma"))
      .withColumn("NTMapQ", (col("NTMapQ") - col("mu")) / col("sigma"))
      .drop("mu", "sigma")
  }
}
