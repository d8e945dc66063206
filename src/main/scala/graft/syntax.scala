package graft

import org.apache.spark.sql.DataFrame

/** Fluent DataFrame syntax for the engine's reusable kernels.
  *
  * `import graft.syntax._` gives call-site ergonomics a library user
  * expects — `df.asOfJoin(quotes, ...)`, `docs.nearDedupKeep(0.8)` —
  * without hiding anything: every method is a one-line delegation to the
  * stable object API (`graft.plans.AsOf`, `graft.operators.*`), so plans,
  * semantics, and the 100 TB shapes documented there are identical. Keep
  * this file free of logic; it exists so the operator objects stay the
  * single source of truth.
  */
object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    // ------------------------------------------------------------ joins
    /** As-of join on the custom sort-merge `AsOfJoinExec` (q27/q80).
      * Direction: "backward" (default), "forward", or "nearest";
      * tolerance < 0 means unbounded. */
    def asOfJoin(right: DataFrame, leftKey: String, rightKey: String,
        leftTime: String, rightTime: String,
        direction: String = "backward", tolerance: Long = -1L): DataFrame =
      plans.AsOf.join(df, right, leftKey, rightKey, leftTime, rightTime,
        direction, tolerance)

    // ------------------------------------------------------------ dedup
    /** Banded MinHash near-dup removal over a `(doc_id, text, ...)`
      * frame — candidates from LSH bands, exact-Jaccard verify on
      * collisions only, left-anti keep (d11's wiring). */
    def nearDedupKeep(threshold: Double): DataFrame =
      operators.Dedup.nearDedupKeep(df, threshold)

    /** Near-dup cluster ids via min-label propagation with pointer
      * doubling over the verified pair graph (d12's wiring). */
    def nearDupClusters(threshold: Double): DataFrame =
      operators.Dedup.nearDupClusters(df, threshold)

    // ------------------------------------------------------------ graphs
    /** Single-source BFS hop levels over a `(u, v)` edge frame (q96). */
    def bfsLevels(src: Long, maxIter: Int): DataFrame =
      operators.Relational.bfsLevels(df, src, maxIter)

    /** Exactly-once triangle count over a `(u, v)` pair frame (q92). */
    def triangleCount(): DataFrame =
      operators.Relational.triangleCount(df)

    /** Integer-milli PageRank over a `(src, dst)` edge frame (q79). */
    def pageRankMilli(iters: Int): DataFrame =
      operators.Relational.pageRankMilli(df, iters)

    /** Trimmomatic SLIDINGWINDOW quality trim over a `quality` column —
      * adds `len` and `trimmed_len` via the native one-pass expression
      * (x81, r13). */
    def qualityTrim(window: Int, meanQ: Int): DataFrame =
      operators.Genomics.qualityTrim(df, window, meanQ)

    /** LOCF resample of `(user_id, us, val_milli)` onto the period grid
      * through the as-of join exec (q91/q115). */
    def locfResample(period: Long): DataFrame =
      operators.Relational.locfResample(df, period)

    /** Linear-interpolation resample of `(user_id, us, v)` (q94/q115). */
    def interpResample(period: Long): DataFrame =
      operators.Relational.interpResample(df, period)

    // ------------------------------------------------------------ intervals
    /** Per-base depth → disjoint constant-depth intervals from a
      * `(contig, start, end)` read frame (x18's bucketed sweep). */
    def coverageIntervals(bucketWidth: Long = 1L << 20): DataFrame =
      operators.Genomics.coverageIntervals(df, bucketWidth)

    /** Union of overlapping/adjacent intervals (x29). */
    def intervalMerge(bucketWidth: Long = 1L << 20): DataFrame =
      operators.Genomics.intervalMerge(df, bucketWidth)

    /** Per-a-interval subtraction of the b-interval union (x30). */
    def intervalSubtract(b: DataFrame, binWidth: Int,
        bucketWidth: Long = 1L << 20): DataFrame =
      operators.Genomics.intervalSubtract(df, b, binWidth, bucketWidth)

    /** Radius-bounded nearest b-interval per a-interval (x32). */
    def closestIntervals(b: DataFrame, radius: Long,
        binWidth: Int): DataFrame =
      operators.Genomics.closestIntervals(df, b, radius, binWidth)

    /** Fraction of each target covered at ≥ minDepth (x33). */
    def targetCoverage(targets: DataFrame, minDepth: Long, binWidth: Int,
        bucketWidth: Long = 1L << 20): DataFrame =
      operators.Genomics.targetCoverage(df, targets, minDepth, binWidth,
        bucketWidth)

    // ------------------------------------------------------------ genetics
    /** Per-site Hardy–Weinberg χ² over a `(contig, pos, sample, gt)`
      * genotype frame (x58). */
    def hweStats(): DataFrame = operators.Genomics.hweStats(df)

    /** Per-sample inbreeding F over a genotype frame (x68). */
    def inbreedingF(): DataFrame = operators.Genomics.inbreedingF(df)

    /** TDT transmitted/untransmitted tallies per trio (x64). */
    def tdtTallies(trios: DataFrame): DataFrame =
      operators.Genomics.tdtTallies(df, trios)

    /** plink-style weighted dosage score per sample (x70). */
    def prsScore(weights: DataFrame): DataFrame =
      operators.Genomics.prsScore(df, weights)

    /** X/Y-depth sex inference over a `(sample, contig)` read frame
      * (x65). */
    def sexInfer(): DataFrame = operators.Genomics.sexInfer(df)

    /** Pooled hom-alt ref-read contamination estimate; `df` is the
      * genotype frame, `counts` the per-site allele counts (x66). */
    def contaminationEstimate(counts: DataFrame): DataFrame =
      operators.Genomics.contaminationEstimate(df, counts)

    /** Panel-of-normals depth normalization over a
      * `(sample, contig, bin, n)` coverage frame (x67). */
    def ponNormalize(): DataFrame = operators.Genomics.ponNormalize(df)

    /** TPM expression quantification; `df` is the `(read_id, contig,
      * pos)` read frame, `exons` the annotation (x69). */
    def tpmQuant(exons: DataFrame): DataFrame =
      operators.Genomics.tpmQuant(df, exons)

    /** Allele-balance / strand-bias site QC over pooled het counts
      * (x71). */
    def siteQc(): DataFrame = operators.Genomics.siteQc(df)

    /** N50/assembly-length statistics over a `(sample, len)` frame
      * (x31). */
    def n50Stats(): DataFrame = operators.Genomics.n50Stats(df)
  }
}
