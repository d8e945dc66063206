package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `info_field(info, key) -> string` / `info_map(info) -> map<string,string>`:
  * one-pass extraction over a VCF INFO blob (`KEY=VALUE;FLAG;...` — VCF
  * 4.x §1.6.1; the payload of the VCF the reference's downstream
  * ecosystem emits, ref README.md:50-52).
  *
  * Replaces per-key `regexp_extract(info, 'AC=(\\d+)', 1)` in the VCF
  * consumers: each regexp re-scans the whole INFO string per row per key
  * (and a naive pattern also matches a key SUFFIX — `AC=` inside
  * `MLEAC=...`). This is a single byte scan honoring key boundaries
  * (start-of-string or after ';'), no regex machinery, inside
  * whole-stage codegen — the [[SamTags]] precedent for the SAM tag blob.
  *
  * Semantics: a `KEY=VALUE` pair yields VALUE; a bare FLAG key yields ''
  * (present-but-valueless, so `info_field(i, 'DB') IS NOT NULL` tests
  * flag presence); an absent key yields NULL; the `.` missing-INFO
  * marker yields NULL for every key and an empty map. */
case class InfoField(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "info_field"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (STRING, STRING) inputs, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(info: Any, key: Any): Any =
    InfoFieldExpr.eval(info.asInstanceOf[UTF8String],
      key.asInstanceOf[UTF8String])

  // defineCodeGen assumes a non-null result for non-null inputs; an
  // absent key IS null, so the generated code re-checks
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (info, key) => s"""
      ${ev.value} = graft.functions.InfoFieldExpr.eval($info, $key);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Whole-INFO map form for generic consumers (flags map to ''). First
  * occurrence wins on a (spec-illegal) duplicate key, matching what a
  * left-to-right reader sees. */
case class InfoMap(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def prettyName: String = "info_map"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(info: Any): Any =
    InfoFieldExpr.evalMap(info.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.InfoFieldExpr.evalMap($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object InfoFieldExpr {

  /** Value of `key` in `info`, honoring whole-key boundaries; '' for a
    * bare flag, null when absent. One byte pass. */
  def eval(info: UTF8String, key: UTF8String): UTF8String = {
    val b = info.getBytes
    val k = key.getBytes
    val n = b.length
    val m = k.length
    if (m == 0) return null
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && b(j) != ';') j += 1
      // token = b[i, j)
      if (j - i >= m && regionEq(b, i, k)) {
        if (j - i == m) return UTF8String.EMPTY_UTF8 // bare flag
        if (b(i + m) == '=')
          return UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(b, i + m + 1, j))
      }
      i = j + 1
    }
    null
  }

  /** All keys of `info` as a map (flags → ''; `.` → empty map; first
    * occurrence wins on duplicates). */
  def evalMap(info: UTF8String): MapData = {
    val b = info.getBytes
    val n = b.length
    val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
    val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (!(n == 1 && b(0) == '.')) {
      var i = 0
      while (i < n) {
        var j = i
        var eq = -1
        while (j < n && b(j) != ';') {
          if (eq < 0 && b(j) == '=') eq = j
          j += 1
        }
        if (j > i) {
          val kEnd = if (eq < 0) j else eq
          val key = UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(b, i, kEnd))
          var dup = false
          var d = 0
          while (!dup && d < keys.length) {
            if (keys(d) == key) dup = true
            d += 1
          }
          if (!dup) {
            keys += key
            vals += (if (eq < 0) UTF8String.EMPTY_UTF8
              else UTF8String.fromBytes(
                java.util.Arrays.copyOfRange(b, eq + 1, j)))
          }
        }
        i = j + 1
      }
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys.toArray),
      new GenericArrayData(vals.toArray))
  }

  private def regionEq(b: Array[Byte], off: Int, k: Array[Byte]): Boolean = {
    var i = 0
    while (i < k.length) {
      if (b(off + i) != k(i)) return false
      i += 1
    }
    true
  }

  def infoField(info: Column, key: String): Column =
    bridge.toColumn(InfoField(bridge.toExpression(info),
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(key), StringType)))

  /** `info_field(info, key)` try-cast to BIGINT — the shape every numeric
    * INFO consumer wants (TRY mode: garbage values null out instead of
    * raising under ANSI, preserving the regexp_extract call sites'
    * lenient semantics). Multi-valued numeric keys (`AC=1,2` — VCF
    * Number=A/R) cast their FIRST element, bcftools' first-allele
    * convention and what the replaced leading-integer regexp returned
    * (ADVICE r14: whole-value TRY-casting nulled them out, and
    * read(strict=true) then raised spec-valid records as malformed). */
  def infoFieldLong(info: Column, key: String): Column =
    bridge.toColumn(org.apache.spark.sql.catalyst.expressions.Cast(
      bridge.toExpression(org.apache.spark.sql.functions
        .substring_index(infoField(info, key), ",", 1)),
      org.apache.spark.sql.types.LongType, None,
      org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))

  def infoMap(info: Column): Column =
    bridge.toColumn(InfoMap(bridge.toExpression(info)))
}
