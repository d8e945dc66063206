package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, k) -> array<bigint>`: distinct 64-bit hashes of
  * all character k-grams, in one pass.
  *
  * Why native instead of the pretty builtin composition
  * (`transform(sequence(...), i -> xxhash64(substr(text, i, k)))`):
  * `UTF8String.substringSQL(i, …)` counts codepoints from the string start,
  * so the composition is O(len²) per document — measured 4 s just to
  * shingle 5 000 docs at sf0.1. This expression walks the string once
  * (O(len·k)), dedupes in an open-addressed long set, and stays inside
  * whole-stage codegen via a static call.
  */
case class ShingleHashes(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(text: Any, k: Any): Any =
    ShingleHashesExpr.eval(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.ShingleHashesExpr.eval($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleHashesExpr {

  /** FNV-1a-style 64-bit k-gram hash; one string pass, open-addressed
    * dedupe (no boxing). Deterministic across JVMs.
    *
    * Grams are windows of UNICODE CODEPOINTS, not UTF-16 units — the
    * same character count Spark's `length`/`substr` builtins and
    * DuckDB's `substr` use, so the native kernel and every oracle
    * restatement window identically on astral-plane text (emoji,
    * supplementary CJK), not just ASCII. */
  def eval(text: UTF8String, k: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    // open-addressed set sized to next pow2 >= 2n (load factor <= .5);
    // 0 marks empty (hash output is never 0: we or-in a constant)
    val cap = OpenHash.capacityFor(n)
    val table = new Array[Long](cap)
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      var h = OpenHash.FnvInit
      var j = i
      while (j < i + k) {
        h ^= cps(j)
        h *= OpenHash.FnvPrime
        j += 1
      }
      h |= 1L // never 0
      var slot = (h.toInt & (cap - 1))
      var seen = false
      while (table(slot) != 0L && !seen) {
        if (table(slot) == h) seen = true
        else slot = (slot + 1) & (cap - 1)
      }
      if (!seen) {
        table(slot) = h
        out(m) = h
        m += 1
      }
      i += 1
    }
    val trimmed = java.util.Arrays.copyOf(out, m)
    // sorted output: enables linear merge-intersection downstream
    // (IntersectCountSorted) and makes results order-canonical
    java.util.Arrays.sort(trimmed)
    val res = new Array[Any](m)
    i = 0
    while (i < m) { res(i) = trimmed(i); i += 1 }
    new GenericArrayData(res)
  }

  def shingleHashes(text: Column, k: Int): Column =
    bridge.toColumn(ShingleHashes(bridge.toExpression(text),
      bridge.toExpression(org.apache.spark.sql.functions.lit(k))))
}

/** The FNV-1a/open-addressing kernel constants shared by the native
  * hashing expressions ([[ShingleHashesExpr]], [[TopBigramExpr]]) — one
  * place for the mixing constants and the pow2-capacity formula (load
  * factor ≤ 0.5; `n * 2 - 1` stays in Int because array cardinalities
  * are row-sized). */
private[functions] object OpenHash {
  val FnvInit = 0xcbf29ce484222325L
  val FnvPrime = 0x100000001b3L
  def capacityFor(n: Int): Int =
    Integer.highestOneBit(math.max(4, n * 2 - 1)) << 1
}
