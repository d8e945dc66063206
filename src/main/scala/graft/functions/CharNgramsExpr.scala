package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_ngrams(text, n) -> array<string>`: every length-n character
  * window of the string, in order — the trigram fan-out under the
  * CCNet-family LM kernels (t24 score, t38 buckets).
  *
  * Why native instead of `transform(sequence(1, len-n+1), i ->
  * substr(text, i, n))`: the higher-order lambda evaluates INTERPRETED,
  * and each `substr(i, n)` re-scans the string from the start to resolve
  * the character offset — O(len²) byte work per row plus a boxed lambda
  * call per window. Here the char→byte offset table is built in ONE
  * byte scan and each window is a direct byte-range slice, inside
  * whole-stage codegen.
  *
  * Bit-identical to the HOF form for non-null input (spec-asserted),
  * including multi-byte code points (offsets count characters exactly
  * like `substr`) and the len < n case (empty array). Null input is
  * null (the HOF-with-`when` form yields an empty array instead — both
  * vanish identically under the `explode` every consumer applies). */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "char_ngrams: n must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.sql}")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(s: Any): Any =
    CharNgramsExpr.eval(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNgramsExpr.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgramsExpr {

  def eval(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // one pass: byte offset of every character boundary
    val offs = new Array[Int](len + 1)
    var i = 0
    var c = 0
    while (i < len) {
      offs(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(c) = len
    val m = c - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + n) - offs(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  def charNgrams(col: Column, n: Int): Column =
    bridge.toColumn(CharNgrams(bridge.toExpression(col), n))
}
