package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `lsh_buckets(emb, planes) -> array<struct<tbl:int, key:int>>`: the
  * random-hyperplane LSH bucket keys of one embedding, all tables in one
  * pass — optionally expanded with each table's Hamming-1 neighbor keys
  * (multi-probe).
  *
  * Why native instead of the `explode(bucketsFromBits(signBits(emb)))`
  * HOF/array composition it replaces: `signBits` is a `transform` over
  * the plane matrix (interpreted lambda), and every `element_at(bits, i)`
  * reference in the key-packing expressions re-evaluates the WHOLE
  * transform — Catalyst's CollapseProject inlines the single-use alias,
  * so packing T×B keys re-ran all T·B hyperplane dot products T·B times
  * (multi-probe worse). Measured: s19's probe projection alone cost
  * ~1.5 s warm on 995 rows. This expression computes each dot product
  * exactly once per row inside one codegen-friendly loop.
  *
  * Bit-identical to the composed form (spec-asserted): per plane the dot
  * product folds left-to-right over the common prefix with float→double
  * promotion exactly like [[DotProductExpr]], the bit is `dot >= 0`, keys
  * pack little-endian (`bit b → 1<<b`), and multi-probe emits the base
  * key first then the `key ^ (1<<b)` flips in ascending-bit order.
  *
  * The planes child must be a FOLDABLE literal array<array<double>> of
  * length tables·bitsPerTable — evaluated once per plan, never per row. */
case class LshBuckets(left: Expression, right: Expression,
    tables: Int, bitsPerTable: Int, multiProbe: Boolean)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def embOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val planesOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => right.foldable
      case _ => false
    }
    if (embOk(left.dataType) && planesOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<float|double>, foldable array<array<double>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullable: Boolean = left.nullable
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tbl", IntegerType, nullable = false),
      StructField("key", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "lsh_buckets"

  @transient private lazy val planes: Array[Array[Double]] = {
    val p = right.eval(null)
    require(p != null, s"$prettyName: planes literal is null")
    val ad = p.asInstanceOf[ArrayData]
    require(ad.numElements() == tables * bitsPerTable,
      s"$prettyName: ${ad.numElements()} planes != $tables tables x " +
        s"$bitsPerTable bits")
    (0 until ad.numElements()).map { i =>
      val row = ad.getArray(i)
      require(row != null, s"$prettyName: plane $i is null")
      row.toDoubleArray()
    }.toArray
  }

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(emb: Any, ps: Any): Any =
    LshBucketsExpr.eval(emb.asInstanceOf[ArrayData], planes,
      tables, bitsPerTable, multiProbe, leftIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, (e, _) =>
      s"graft.functions.LshBucketsExpr.eval($e, $planesRef, " +
        s"$tables, $bitsPerTable, $multiProbe, $leftIsFloat)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LshBucketsExpr {

  /** One pass: T·B dot products, T packed keys, T (or T·(1+B)) structs. */
  def eval(emb: ArrayData, planes: Array[Array[Double]],
      tables: Int, bitsPer: Int, multiProbe: Boolean,
      isFloat: Boolean): ArrayData = {
    val embLen = emb.numElements()
    val keys = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var key = 0
      var b = 0
      while (b < bitsPer) {
        val plane = planes(t * bitsPer + b)
        val n = math.min(embLen, plane.length)
        var s = 0.0
        var i = 0
        if (isFloat) {
          while (i < n) { s += emb.getFloat(i).toDouble * plane(i); i += 1 }
        } else {
          while (i < n) { s += emb.getDouble(i) * plane(i); i += 1 }
        }
        if (s >= 0) key |= 1 << b
        b += 1
      }
      keys(t) = key
      t += 1
    }
    val perTable = if (multiProbe) 1 + bitsPer else 1
    val out = new Array[Any](tables * perTable)
    t = 0
    while (t < tables) {
      val base = t * perTable
      out(base) = new GenericInternalRow(Array[Any](t, keys(t)))
      if (multiProbe) {
        var b = 0
        while (b < bitsPer) {
          out(base + 1 + b) =
            new GenericInternalRow(Array[Any](t, keys(t) ^ (1 << b)))
          b += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  def lshBuckets(emb: Column, planes: Column, tables: Int, bitsPerTable: Int,
      multiProbe: Boolean): Column =
    bridge.toColumn(LshBuckets(bridge.toExpression(emb),
      bridge.toExpression(planes), tables, bitsPerTable, multiProbe))
}
