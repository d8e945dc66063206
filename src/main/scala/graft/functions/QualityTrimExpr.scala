package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `quality_trim(quality, window, meanQ) -> trimmed_len LONG`: the
  * Trimmomatic `SLIDINGWINDOW:w:q` cut point over a Phred+33 quality
  * string — scan 5'→3' and return the 0-based start of the FIRST
  * length-`window` run whose integer sum of (ascii−33) drops below
  * `window·meanQ` (i.e. mean < q, compared integer-exact), or the full
  * length when no window fails. Reads shorter than one window pass
  * through whole; a read whose first window already fails trims to 0.
  *
  * Why native instead of the builtin-lambda chain (`transform(sequence)`
  * to build the per-base array, then `filter(sequence, i ->
  * aggregate(...))` over windows): Catalyst's project collapse INLINES
  * the array-builder into the aggregate's accumulator lambda — the
  * VERDICT r12 x81 finding, reproduced on the optimized plan — so the
  * full O(len)-element array is rebuilt for every (window, element)
  * pair: O(len³·w) char work per row, measured 102 s at sf0.1 vs the
  * ~1 s family median. Here the rolling window sum updates in O(1) per
  * position — ONE byte pass per row, inside whole-stage codegen — and
  * there is no intermediate array for the optimizer to inline anywhere
  * (the `CigarSumsExpr` precedent). The HOF formulation survives as the
  * spec's equality oracle (QualityTrimExprSpec).
  *
  * Input discipline (decoder-fuzz rule: corrupt input must not read as a
  * shorter valid one): every byte must be printable-ASCII Phred+33
  * (33..126); anything else raises loudly. FASTQ quality is ASCII by
  * spec, so this costs nothing on real data and catches a
  * wrong-column/mojibake wiring mistake at first touch. */
case class QualityTrim(child: Expression, window: Int, meanQ: Int)
    extends UnaryExpression {

  require(window > 0, "quality_trim: window must be positive")
  require(meanQ >= 0, "quality_trim: meanQ must be non-negative")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "quality_trim"

  override def nullSafeEval(q: Any): Any =
    QualityTrimExpr.eval(q.asInstanceOf[UTF8String], window, meanQ)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.QualityTrimExpr.eval($c, $window, $meanQ)")

  override protected def withNewChildInternal(newChild: Expression): QualityTrim =
    copy(child = newChild)
}

object QualityTrimExpr {

  def eval(quality: UTF8String, window: Int, meanQ: Int): Long = {
    val b = quality.getBytes
    val len = b.length
    val thresh = window.toLong * meanQ
    var i = 0
    // validate the whole string up front (a read trimmed to 0 by its
    // first window must STILL reject garbage after the cut — the cut is
    // a quality decision, not a parse boundary)
    while (i < len) {
      if (b(i) < 33 || b(i) > 126)
        throw new IllegalArgumentException(
          s"quality_trim: non-Phred+33 byte ${b(i) & 0xff} at index $i " +
            "(quality must be printable ASCII 33..126)")
      i += 1
    }
    if (len < window) return len.toLong
    var sum = 0L
    i = 0
    while (i < window) { sum += b(i) - 33; i += 1 }
    if (sum < thresh) return 0L
    var s = 1
    val last = len - window
    while (s <= last) {
      sum += (b(s + window - 1) - 33) - (b(s - 1) - 33)
      if (sum < thresh) return s.toLong
      s += 1
    }
    len.toLong
  }

  def qualityTrim(quality: Column, window: Int, meanQ: Int): Column =
    bridge.toColumn(QualityTrim(bridge.toExpression(quality), window, meanQ))
}
