package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2 plus
  * the beyond-reference extensions (dedup / similarity / text analysis /
  * multimodal / streaming-in-batch). `oracleSql` holds the DuckDB-equivalent
  * ANSI SQL for every SQL-expressible query. The probabilistic ops
  * (MinHash-LSH d03, SimHash d04, bucketed embedding dedup d09, ANN
  * s02/s04) are rows-only themselves but each is paired with a
  * driver-gated contract query (d07/d08/d10 planted-duplicate gates, s05
  * recall gate, t05 winnowing gate) whose oracle IS value-checked.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.Multimodal.queries ++
      operators.MitoQueries.queries ++
      operators.Genomics.queries ++
      operators.Fuzz.queries

  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.TextAnalysis.oracles ++
      operators.Multimodal.oracles ++
      operators.MitoQueries.oracles ++
      operators.Genomics.oracles ++
      operators.Fuzz.oracles
}
