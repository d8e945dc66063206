package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

import graft.mito.MdParser

/** `md_variants(sequence, md, start) -> array<string>` as a native Catalyst
  * expression with real codegen — the Spark-idiomatic replacement for the
  * UDF form of the reference's MD scanner (`MDParser.scala:26-118`): no
  * Scala-function serialization, no Row boxing, and the call stays inside
  * whole-stage codegen (the generated code invokes [[MdVariantsExpr.eval]]
  * directly on UTF8String inputs).
  */
case class MdVariants(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  // return type inferred: Seq[AbstractDataType] is sql-private, so no ascription
  override def inputTypes = Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def prettyName: String = "md_variants"

  override def nullSafeEval(seq: Any, md: Any, start: Any): Any =
    MdVariantsExpr.eval(
      seq.asInstanceOf[UTF8String],
      md.asInstanceOf[UTF8String],
      start.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, m, st) =>
      s"graft.functions.MdVariantsExpr.eval($s, $m, $st)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MdVariantsExpr {

  /** Codegen target: UTF8String in, Catalyst ArrayData out. */
  def eval(seq: UTF8String, md: UTF8String, start: Int): ArrayData =
    new GenericArrayData(
      MdParser.variants(seq.toString, md.toString, start)
        .map(v => UTF8String.fromString(v): Any))

  /** Column-level API. */
  def mdVariants(sequence: Column, md: Column, start: Column): Column =
    bridge.toColumn(MdVariants(
      bridge.toExpression(sequence),
      bridge.toExpression(md),
      bridge.toExpression(start)))

  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md_variants"),
    new ExpressionInfo(classOf[MdVariants].getName, "md_variants"),
    (children: Seq[Expression]) => MdVariants(children(0), children(1), children(2)))
}

/** Session extensions: register graft's native SQL functions and the
  * as-of join strategy.
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions).
  * For an existing session, [[GraftExtensions.register]] installs the
  * functions through the registry (and AsOf.join self-registers its
  * strategy). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  /** Static int parameter of a SQL call (e.g. `char_ngrams(text, 3)`):
    * must fold to an integer at plan time — these parameters size
    * buffers/arrays, so a per-row value is a contract error, reported
    * as one rather than as a ClassCastException from deep in codegen. */
  private def longToInt(v: Long, fn: String): Int = {
    if (v < Int.MinValue || v > Int.MaxValue) throw new IllegalArgumentException(
      s"$fn: parameter $v exceeds Int range — silent wrap would corrupt " +
        "the buffer sizing this parameter controls")
    v.toInt
  }

  private def intArg(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
      longToInt(v, fn)
    case other if other.foldable => other.eval() match {
      case i: Int => i
      case l: Long => longToInt(l, fn)
      case x => throw new IllegalArgumentException(
        s"$fn: parameter must be an integer literal, got $x")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn: parameter must be a literal, got a per-row expression")
  }

  private def boolArg(e: Expression, fn: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other if other.foldable => other.eval() match {
      case b: Boolean => b
      case x => throw new IllegalArgumentException(
        s"$fn: parameter must be a boolean literal, got $x")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn: parameter must be a literal, got a per-row expression")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "md_variants" -> (c => MdVariants(c(0), c(1), c(2))),
    "shingle_hashes" -> (c => ShingleHashes(c(0), c(1))),
    "intersect_count_sorted" -> (c => IntersectCountSorted(c(0), c(1))),
    "minhash_sig" -> (c => MinHashSig(c(0), c(1))),
    "dot_product" -> (c => DotProduct(c(0), c(1))),
    "sam_tags" -> (c => SamTags(c(0))),
    "top_bigram_fraction" -> (c => TopBigramFraction(c(0))),
    "pq_encode" -> (c => PqEncode(c(0), c(1))),
    "char_ngrams" -> (c => CharNgrams(c(0), intArg(c(1), "char_ngrams"))),
    "cigar_sums" -> (c => CigarSums(c(0))),
    "quality_trim" -> (c => QualityTrim(c(0),
      intArg(c(1), "quality_trim"), intArg(c(2), "quality_trim"))),
    "info_field" -> (c => InfoField(c(0), c(1))),
    "info_map" -> (c => InfoMap(c(0))),
    "lsh_buckets" -> (c => LshBuckets(c(0), c(1),
      intArg(c(2), "lsh_buckets"), intArg(c(3), "lsh_buckets"),
      boolArg(c(4), "lsh_buckets"))),
    // aggregates: the registry hands back the AggregateFunction and the
    // analyzer wraps it in an AggregateExpression (Spark's own builtins
    // register the same way)
    "max_k" -> (c => MaxK(c(0), intArg(c(1), "max_k"))),
    "count_min" -> (c => CountMin(c(0), intArg(c(1), "count_min"),
      intArg(c(2), "count_min"))),
    "heavy_hitters" -> (c => HeavyHitters(c(0),
      intArg(c(1), "heavy_hitters"))))

  /** Register every graft SQL function on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
