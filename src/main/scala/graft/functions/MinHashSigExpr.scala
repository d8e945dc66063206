package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `minhash_sig(hashes, numPerms) -> array<bigint>`: the full MinHash
  * signature in one pass over the shingle-hash array.
  *
  * The builtin formulation (`array(array_min(transform(sh, …)) × P)`)
  * allocates P intermediate arrays per row and walks the input P times;
  * this expression walks it once, updating P running minima in a flat
  * array. Permutation p of hash h is a xorshift-multiply mix seeded by p —
  * deterministic, and pairwise-independent enough for signature estimation
  * (standard MinHash practice).
  */
case class MinHashSig(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType, containsNull = false), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(hashes: Any, numPerms: Any): Any =
    MinHashSigExpr.eval(hashes.asInstanceOf[ArrayData], numPerms.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, p) =>
      s"graft.functions.MinHashSigExpr.eval($h, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinHashSigExpr {

  /** splitmix64-style finalizer over (h ^ seed(p)) — one multiply-shift
    * chain per (element, permutation). */
  def eval(hashes: ArrayData, numPerms: Int): ArrayData = {
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var p = 0
      while (p < numPerms) {
        var z = h + (p.toLong * 0x9e3779b97f4a7c15L)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= (z >>> 31)
        if (z < mins(p)) mins(p) = z
        p += 1
      }
      i += 1
    }
    val out = new Array[Any](numPerms)
    var p = 0
    while (p < numPerms) { out(p) = mins(p); p += 1 }
    new GenericArrayData(out)
  }

  def minhashSig(hashes: Column, numPerms: Int): Column =
    bridge.toColumn(MinHashSig(bridge.toExpression(hashes),
      bridge.toExpression(org.apache.spark.sql.functions.lit(numPerms))))
}
