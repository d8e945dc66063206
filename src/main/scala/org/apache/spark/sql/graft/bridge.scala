package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions sql-private
  * (`org.apache.spark.sql.classic.ExpressionUtils`); a library defining
  * native Catalyst expressions needs exactly these two hops, so this is the
  * single sanctioned crossing point (kept in the spark.sql namespace, as
  * Spark ecosystem libraries conventionally do).
  */
object bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Build a DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed plan of a DataFrame (for attribute resolution by name). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap an InternalRow RDD as a DataFrame with FRESH default stats
    * (`internalCreateDataFrame` is private[sql]). The lineage-truncation
    * path needs this instead of `Dataset.localCheckpoint`: Spark 4
    * carries the origin plan's statistics through a Dataset checkpoint
    * (`LogicalRDD.rewriteStatsAndConstraints`), and join stats MULTIPLY --
    * in an iterative loop the carried sizeInBytes BigInt doubles its BIT
    * LENGTH every round, so by round ~20 each checkpoint spends minutes
    * inside BigInteger multiplication (r13 finding, surfaced by the q114
    * connected-components fuzz). A fresh LogicalRDD restarts from the
    * default heuristic each round, keeping stats O(1) across rounds. */
  def internalDf(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
