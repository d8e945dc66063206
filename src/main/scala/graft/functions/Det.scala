package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for oracle-parity aggregates.
  *
  * Floating-point `sum(double)` is order-dependent, and Spark's partial
  * aggregation order differs run-to-run and engine-to-engine. Summing an
  * exact decimal image of the doubles and casting the (exact) total back to
  * double is associative/commutative, so Spark and any ANSI SQL oracle
  * produce bit-identical results regardless of partitioning. The decimal
  * scale must exceed the data's true decimal precision; inputs here derive
  * from 2-decimal money columns so scale 6-10 is exact.
  *
  * Cost note: decimal sum is marginally slower than double sum but stays
  * inside whole-stage codegen and partial aggregation; at 100 TB the shuffle
  * is the bottleneck, not the decimal adds.
  */
object Det {
  /** Order-insensitive sum of a double column, exact through DecimalType. */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(38, scale))).cast(DoubleType)

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def dsumSql(expr: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(38,$scale))) AS DOUBLE)"

  /** Order-insensitive average (exact sum / count). */
  def davg(c: Column, scale: Int = 6): Column =
    dsum(c, scale) / count(c)

  def davgSql(expr: String, scale: Int = 6): String =
    s"(${dsumSql(expr, scale)} / COUNT($expr))"

  /** Order-insensitive sample stddev via exact sums:
    * sqrt((n*Σx² − (Σx)²) / (n*(n−1))). All divisions/multiplies happen in
    * double with an identical expression tree on both engines.
    */
  def dstddev(c: Column, scale: Int = 6): Column = {
    val n  = count(c).cast(DoubleType)
    val s  = dsum(c, scale)
    val s2 = dsum(c * c, 2 * scale min 10)
    sqrt((n * s2 - s * s) / (n * (n - lit(1.0))))
  }

  def dstddevSql(expr: String, scale: Int = 6): String = {
    val s2scale = (2 * scale) min 10
    val n  = s"CAST(COUNT($expr) AS DOUBLE)"
    val s  = dsumSql(expr, scale)
    val s2 = dsumSql(s"($expr) * ($expr)", s2scale)
    s"SQRT(($n * $s2 - $s * $s) / ($n * ($n - 1.0)))"
  }
}
