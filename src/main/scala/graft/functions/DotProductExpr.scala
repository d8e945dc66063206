package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `dot_product(a, b) -> double`: Σ a(i)·b(i) with each element promoted
  * to double and a strict left-to-right fold — bit-identical to the
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` formulation it
  * replaces, but as one codegen'd loop over the unsafe array data: no
  * intermediate 64-element array allocation per call and no interpreted
  * higher-order lambda evaluation. The pairwise stages (d05 exact verify,
  * s01 brute-force KNN, s02/s04 candidate scoring) call this O(pairs)
  * times, so the constant factor dominates the whole query.
  *
  * Accepts array<float> or array<double> on either side (embeddings are
  * float; hyperplane literals are double). Lengths may differ: the fold
  * runs over the common prefix, matching zip_with-with-nulls semantics for
  * the equal-length arrays used here.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def nullable: Boolean = left.nullable || right.nullable
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    (elemIsFloat(left), elemIsFloat(right)) match {
      case (true, true)   => DotProductExpr.ff(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case (true, false)  => DotProductExpr.fd(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case (false, true)  => DotProductExpr.fd(b.asInstanceOf[ArrayData], a.asInstanceOf[ArrayData])
      case (false, false) => DotProductExpr.dd(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => (elemIsFloat(left), elemIsFloat(right)) match {
      case (true, true)   => s"graft.functions.DotProductExpr.ff($a, $b)"
      case (true, false)  => s"graft.functions.DotProductExpr.fd($a, $b)"
      case (false, true)  => s"graft.functions.DotProductExpr.fd($b, $a)"
      case (false, false) => s"graft.functions.DotProductExpr.dd($a, $b)"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {

  def ff(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def fd(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }

  def dd(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def dotProduct(a: Column, b: Column): Column =
    bridge.toColumn(DotProduct(bridge.toExpression(a), bridge.toExpression(b)))
}
