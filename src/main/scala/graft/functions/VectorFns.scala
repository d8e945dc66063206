package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dense-vector kernels over array<float> embedding columns, built from
  * codegen'd higher-order builtins (zip_with / aggregate) — no UDF, no
  * MLlib Vector boxing in the hot path. All arithmetic is promoted to
  * double with a strict left-to-right fold so results are reproducible and
  * match a sequential oracle bit-for-bit.
  */
object VectorFns {

  /** Σ a[i]*b[i] as a sequential double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine with pre-computed norms — use in pairwise joins so each side's
    * norm is computed once per row, not once per pair (3× fewer array
    * folds in an O(n²) stage). */
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
