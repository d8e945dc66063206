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
    *
    * SCALE RULE (applies to every dsum of a derived value): pick the scale
    * that makes the value's true decimal expansion exact AND keeps
    * |value|×10^scale < 2^53. Money columns have 2 decimals, so x² and
    * products of two money columns are exactly 4-decimal — scale 4. An
    * unnecessarily high scale overflows the exact-integer range of double
    * and engines then disagree in the last ulp of the double→decimal cast
    * (observed at sf0.1 with scale 10 on a ~1e9 sum).
    */
  def dstddev(c: Column, scale: Int = 6): Column = {
    val n  = count(c).cast(DoubleType)
    val s  = dsum(c, scale)
    val s2 = dsum(c * c, 4)
    sqrt((n * s2 - s * s) / (n * (n - lit(1.0))))
  }

  def dstddevSql(expr: String, scale: Int = 6): String = {
    val n  = s"CAST(COUNT($expr) AS DOUBLE)"
    val s  = dsumSql(expr, scale)
    val s2 = dsumSql(s"($expr) * ($expr)", 4)
    s"SQRT(($n * $s2 - $s * $s) / ($n * ($n - 1.0)))"
  }
}
