package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `intersect_count_sorted(a, b) -> int`: |A ∩ B| for two SORTED
  * array<bigint> columns via linear merge — no per-call hash set, no
  * output array allocation. The pairwise stage of blocked near-dup
  * detection calls this O(pairs) times, so constant factors dominate;
  * `array_intersect` (hash-set build + array materialization per call)
  * measured ~2.5× slower at sf0.1. Inputs MUST be sorted ascending
  * ([[ShingleHashes]] emits sorted output).
  */
case class IntersectCountSorted(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType, containsNull = false),
      ArrayType(LongType, containsNull = false))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count_sorted"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountExpr.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.IntersectCountExpr.eval($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCountExpr {

  def eval(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def intersectCountSorted(a: Column, b: Column): Column =
    bridge.toColumn(IntersectCountSorted(
      bridge.toExpression(a), bridge.toExpression(b)))
}
