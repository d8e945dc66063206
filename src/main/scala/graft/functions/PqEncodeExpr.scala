package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** `pq_encode(emb, codebook) -> array<int>`: per subspace, the argmin
  * centroid index — the PQ encode kernel (s08) as one codegen'd loop.
  *
  * Why native instead of the builtin HOF composition
  * (`transform(sequence(...), m -> aggregate(...))`): higher-order
  * function lambdas evaluate INTERPRETED — per corpus row the argmin ran
  * 8 subspaces × 16 centroids × two 8-element lambda folds (the
  * no-let-binding double evaluation) ≈ 2 048 boxed lambda calls. This
  * expression is the same arithmetic as one flat loop over the unsafe
  * array data — ~256 fused multiply-adds — inside whole-stage codegen.
  * Bit-identical to the HOF form (spec-asserted): strict `<` keeps the
  * first index on ties, and the per-subspace distance folds
  * left-to-right in the same order.
  *
  * The codebook child must be a FOLDABLE literal
  * (array<array<array<double>>>, [m][k][sub]); it is evaluated once per
  * plan — driver-side at codegen, lazily on executors for interpreted
  * eval — never per row. */
case class PqEncode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def embOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val bookOk = right.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => right.foldable
      case _ => false
    }
    if (embOk(left.dataType) && bookOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<float|double>, foldable array<array<array<double>>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullable: Boolean = left.nullable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val book: Array[Array[Array[Double]]] = {
    val cb = right.eval(null)
    require(cb != null, s"$prettyName: codebook literal is null")
    PqEncodeExpr.toBook(cb.asInstanceOf[ArrayData])
  }

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(emb: Any, cb: Any): Any =
    PqEncodeExpr.eval(emb.asInstanceOf[ArrayData], book, leftIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", book, "double[][][]")
    defineCodeGen(ctx, ev, (e, _) =>
      s"graft.functions.PqEncodeExpr.eval($e, $bookRef, $leftIsFloat)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqEncodeExpr {

  private[functions] def toBook(cb: ArrayData): Array[Array[Array[Double]]] =
    (0 until cb.numElements()).map { m =>
      val cents = cb.getArray(m)
      require(cents != null, s"pq_encode: codebook subspace $m is null")
      (0 until cents.numElements()).map { k =>
        val c = cents.getArray(k)
        require(c != null, s"pq_encode: codebook centroid [$m][$k] is null")
        c.toDoubleArray()
      }.toArray
    }.toArray

  /** Flat argmin loop; subvector m spans elements [off, off + sub). */
  def eval(emb: ArrayData, book: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = book.length
    // loud length check: UnsafeArrayData element reads are NOT bounds-
    // checked, so a short embedding would silently read adjacent row
    // memory and emit garbage codes
    var need = 0
    var bi = 0
    while (bi < m) {
      if (book(bi).length > 0) need += book(bi)(0).length
      bi += 1
    }
    if (emb.numElements() < need)
      throw new IllegalArgumentException(
        s"pq_encode: embedding has ${emb.numElements()} elements, " +
          s"codebook spans $need dimensions")
    // loud null check: unsafe getFloat/getDouble on a null slot returns
    // whatever bits sit there (typically 0.0), which would silently encode
    // a wrong code — fail instead, mirroring the length check above
    var ni = 0
    while (ni < need) {
      if (emb.isNullAt(ni))
        throw new IllegalArgumentException(
          s"pq_encode: embedding element $ni is null — nullable-element " +
            "arrays cannot be PQ-encoded")
      ni += 1
    }
    val out = new Array[Any](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val cents = book(mi)
      val sub = if (cents.length > 0) cents(0).length else 0
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < cents.length) {
        val c = cents(k)
        var d = 0.0
        var j = 0
        while (j < sub) {
          val x = if (isFloat) emb.getFloat(off + j).toDouble
                  else emb.getDouble(off + j)
          val t = x - c(j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(mi) = best
      off += sub
      mi += 1
    }
    new GenericArrayData(out)
  }

  def pqEncode(emb: Column, codebook: Column): Column =
    bridge.toColumn(PqEncode(bridge.toExpression(emb),
      bridge.toExpression(codebook)))
}
