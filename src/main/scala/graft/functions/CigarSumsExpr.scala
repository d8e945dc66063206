package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `cigar_sums(cigar) -> struct<ref_len, read_len, aligned, clipped,
  * ins, del>` (all LONG): every CIGAR-derived length the QC kernels
  * consume (SAM spec §1.4.6 consumes-reference/consumes-query table),
  * in ONE byte pass with codegen.
  *
  * Replaces the generic composition (regexp token scan → per-token
  * substring/cast → 4-6 predicate-filtered `aggregate` folds): HOF
  * lambdas are interpreted and excluded from whole-stage codegen AND
  * from subexpression elimination, so that chain re-tokenized the
  * string once per requested sum (the SamTagsExpr lesson, x12/x22's
  * hot path). The HOF formulation survives as the spec's equality
  * oracle.
  *
  * `*` (CIGAR unavailable — unmapped reads) returns all zeros; a
  * malformed string raises loudly (decoder-fuzz discipline: corrupt
  * input must not read as a shorter valid one). */
case class CigarSums(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CigarSumsExpr.schema
  override def prettyName: String = "cigar_sums"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING input, got ${child.dataType.sql}")

  override def nullSafeEval(cigar: Any): Any =
    CigarSumsExpr.eval(cigar.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CigarSumsExpr.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CigarSumsExpr {

  val schema: StructType = StructType(Seq(
    StructField("ref_len", LongType, nullable = false),
    StructField("read_len", LongType, nullable = false),
    StructField("aligned", LongType, nullable = false),
    StructField("clipped", LongType, nullable = false),
    StructField("ins", LongType, nullable = false),
    StructField("del", LongType, nullable = false)))

  def eval(cigar: UTF8String): InternalRow = {
    val b = cigar.getBytes
    var ref = 0L; var read = 0L; var aligned = 0L
    var clipped = 0L; var ins = 0L; var del = 0L
    if (b.length == 0)
      throw new IllegalArgumentException(
        "malformed CIGAR: empty string (unavailable CIGAR is '*')")
    if (!(b.length == 1 && b(0) == '*')) {
      var i = 0
      val n = b.length
      while (i < n) {
        var v = 0L
        val d0 = i
        while (i < n && b(i) >= '0' && b(i) <= '9') {
          v = v * 10 + (b(i) - '0'); i += 1
        }
        if (i == d0 || i >= n)
          throw new IllegalArgumentException(
            s"malformed CIGAR (length without op or op without length): $cigar")
        val op = b(i); i += 1
        (op: @annotation.switch) match {
          case 'M' | '=' | 'X' => ref += v; read += v; aligned += v
          case 'I' => read += v; ins += v
          case 'D' => ref += v; del += v
          case 'N' => ref += v
          case 'S' => read += v; clipped += v
          case 'H' => clipped += v
          case 'P' => ()
          case _ =>
            throw new IllegalArgumentException(
              s"malformed CIGAR (unknown op '${op.toChar}'): $cigar")
        }
      }
    }
    new GenericInternalRow(Array[Any](ref, read, aligned, clipped, ins, del))
  }

  def cigarSums(cigar: Column): Column =
    bridge.toColumn(CigarSums(bridge.toExpression(cigar)))
}
