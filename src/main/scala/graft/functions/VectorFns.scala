package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dense-vector kernels over array<float> embedding columns — no UDF, no
  * MLlib Vector boxing in the hot path. All arithmetic is promoted to
  * double with a strict left-to-right fold so results are reproducible and
  * match a sequential oracle bit-for-bit. The dot product is a native
  * codegen'd expression ([[DotProductExpr]]): the earlier
  * zip_with+aggregate form allocated an intermediate array per call and
  * evaluated interpreted lambdas — measured ~3× slower in the O(pairs)
  * stages (d05/s01/s02).
  */
object VectorFns {

  /** Σ a[i]*b[i] as a sequential double fold (native expression). */
  def dot(a: Column, b: Column): Column =
    DotProductExpr.dotProduct(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine with pre-computed norms — use in pairwise joins so each side's
    * norm is computed once per row, not once per pair (3× fewer array
    * folds in an O(n²) stage). */
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
