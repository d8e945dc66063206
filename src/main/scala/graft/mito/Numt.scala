package graft.mito

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NUMT (nuclear-mitochondrial segment) reference intervals.
  *
  * Headerless 4-column TSV (chromosome, start, end, score) — reference
  * `src/universal/NUMTs_hg38.txt` loaded driver-side
  * (`MTClassifierModel.scala:157-172`). The reference's "overlap" ignored
  * the interval bounds entirely (defect B7, `BamReader.scala:83-88` summed
  * every score on the chromosome); we implement the intended
  * interval-overlap semantics.
  *
  * Scale design: the dim is 23 rows, so it folds into the scan as a literal
  * scalar expression (zero shuffle, whole-stage codegen) — the Spark-native
  * equivalent of the reference's closure-captured map, minus the closure.
  * For a large interval set the same call sites would switch to a broadcast
  * range join.
  */
object Numt {

  final case class Interval(chromosome: String, start: Int, end: Int, score: Float)

  val schema: StructType = StructType(Seq(
    StructField("chromosome", StringType, nullable = false),
    StructField("nstart", IntegerType, nullable = false),
    StructField("nend", IntegerType, nullable = false),
    StructField("score", FloatType, nullable = false)))

  /** Dim-load counter: the cohort gate (x80) asserts an N-sample run
    * loads the NUMT dim exactly once, not N times. */
  val loadCount = new java.util.concurrent.atomic.AtomicLong(0L)

  def load(spark: SparkSession, path: String): Seq[Interval] = {
    loadCount.incrementAndGet()
    spark.read.option("sep", "\t").schema(schema).csv(path)
      .collect()
      .map(r => Interval(r.getString(0), r.getInt(1), r.getInt(2), r.getFloat(3)))
      .toSeq
  }

  /** Per-alignment NUMT overlap score as a literal expression:
    * Σ score of intervals overlapping [start, start + len(sequence)) on the
    * same chromosome. Columns consumed: referenceName, start, sequence. */
  def overlapScore(numts: Seq[Interval]): Column =
    if (numts.isEmpty) lit(0)
    else numts.map { iv =>
      when(col("referenceName") === iv.chromosome &&
        col("start") <= iv.end &&
        col("start") + length(col("sequence")) - 1 >= iv.start,
        lit(iv.score.toDouble)).otherwise(lit(0.0))
    }.reduce(_ + _).cast(IntegerType)
}
