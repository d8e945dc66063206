package graft.sources

import org.apache.spark.sql.connector.expressions.{Expression, GeneralScalarExpression, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Predicate}

/** V2-predicate pushdown for the sam/bam sources.
  *
  * The pipeline's hot filter is the validity bitmask `(flag & 2315) = 3`
  * (graft.mito.Sam.isValid) — inexpressible in the V1 `sources.Filter`
  * API, but Catalyst's V2ExpressionBuilder translates BitwiseAnd into a
  * GeneralScalarExpression("&"), so SupportsPushDownV2Filters can hand it
  * to the reader. A pushed filter lets the readers drop a record from the
  * 32-byte fixed fields alone: the BAM reader skips the name/cigar/
  * sequence/tag decode entirely (most bytes of a record), the SAM reader
  * skips UTF8String construction — for a dirty WGS BAM where most records
  * fail validity, the scan cost collapses to fixed-field parsing.
  *
  * Supported shapes (everything else stays post-scan, Spark re-applies
  * whatever is not reported back as pushed):
  *   (intField & lit) = lit        — the bitmask test
  *   intField  (= < <= > >=) lit   — flag / mapQ / start
  *   referenceName = lit           — locus pruning
  *   AND of supported shapes
  */
object SamFilters {

  /** Conjunction-evaluable record predicate; fields are the ones decodable
    * before any string materialization. */
  sealed trait Pred extends Serializable {
    def eval(flag: Int, mapQ: Int, start: Int, refName: String): Boolean
  }
  final case class MaskEq(field: String, mask: Long, value: Long) extends Pred {
    override def eval(f: Int, q: Int, s: Int, r: String): Boolean =
      (IntField.sel(field, f, q, s) & mask) == value
    override def toString: String = s"(($field & $mask) = $value)"
  }
  final case class IntCmp(field: String, op: String, value: Long) extends Pred {
    override def eval(f: Int, q: Int, s: Int, r: String): Boolean = {
      val x = IntField.sel(field, f, q, s)
      op match {
        case "="  => x == value
        case "<"  => x < value
        case "<=" => x <= value
        case ">"  => x > value
        case ">=" => x >= value
      }
    }
    override def toString: String = s"($field $op $value)"
  }
  final case class RefNameEq(value: String) extends Pred {
    override def eval(f: Int, q: Int, s: Int, r: String): Boolean = r == value
    override def toString: String = s"(referenceName = '$value')"
  }
  final case class AndP(l: Pred, r: Pred) extends Pred {
    override def eval(f: Int, q: Int, s: Int, rn: String): Boolean =
      l.eval(f, q, s, rn) && r.eval(f, q, s, rn)
    override def toString: String = s"($l AND $r)"
  }
  /** Disjunction of region windows — the MULTI-region `region` read
    * option (samtools view's several-regions form; 1-based inclusive
    * start-position semantics like the single-region preds). Never
    * produced by catalyst pushdown (OR shapes are not converted); only
    * the option channel builds it, and the planners prune it through
    * the sidecar as the union of the windows' member runs. */
  final case class InRegions(rs: Seq[(String, Long, Long)]) extends Pred {
    override def eval(f: Int, q: Int, s: Int, rn: String): Boolean = {
      var i = 0
      while (i < rs.length) {
        val (c, b, e) = rs(i)
        if (rn == c && s >= b && s <= e) return true
        i += 1
      }
      false
    }
    override def toString: String = rs.map { case (c, b, e) =>
      if (e == Long.MaxValue) c else s"$c:$b-$e"
    }.mkString("(region IN [", ", ", "])")
  }

  private object IntField {
    val names = Set("flag", "mapQ", "start")
    def sel(field: String, f: Int, q: Int, s: Int): Long = field match {
      case "flag" => f
      case "mapQ" => q
      case _      => s
    }
  }

  def convert(p: Predicate): Option[Pred] = p match {
    case a: V2And =>
      for { l <- convert(a.left()); r <- convert(a.right()) } yield AndP(l, r)
    case _ =>
      p.name() match {
        case op @ ("=" | "<" | "<=" | ">" | ">=") =>
          val ch = p.children()
          if (ch.length != 2) None
          else cmp(op, ch(0), ch(1)).orElse(cmp(flip(op), ch(1), ch(0)))
        case _ => None
      }
  }

  private def flip(op: String): String = op match {
    case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
    case o => o
  }

  private def cmp(op: String, a: Expression, b: Expression): Option[Pred] =
    (a, b) match {
      // (field & mask) = value
      case (g: GeneralScalarExpression, l: Literal[_])
          if g.name == "&" && op == "=" && g.children.length == 2 =>
        (g.children()(0), g.children()(1)) match {
          case (f: NamedReference, m: Literal[_]) =>
            for {
              fld <- intField(f); mv <- longVal(m); lv <- longVal(l)
            } yield MaskEq(fld, mv, lv)
          case (m: Literal[_], f: NamedReference) =>
            for {
              fld <- intField(f); mv <- longVal(m); lv <- longVal(l)
            } yield MaskEq(fld, mv, lv)
          case _ => None
        }
      case (f: NamedReference, l: Literal[_]) =>
        intField(f) match {
          case Some(fld) => longVal(l).map(IntCmp(fld, op, _))
          case None =>
            if (fieldName(f).contains("referenceName") && op == "=")
              strVal(l).map(RefNameEq)
            else None
        }
      case _ => None
    }

  private def fieldName(f: NamedReference): Option[String] =
    if (f.fieldNames().length == 1) Some(f.fieldNames()(0)) else None

  private def intField(f: NamedReference): Option[String] =
    fieldName(f).filter(IntField.names)

  private def longVal(l: Literal[_]): Option[Long] = l.value() match {
    case i: java.lang.Integer => Some(i.toLong)
    case i: java.lang.Long    => Some(i.longValue())
    case i: java.lang.Short   => Some(i.toLong)
    case i: java.lang.Byte    => Some(i.toLong)
    case _                    => None
  }

  private def strVal(l: Literal[_]): Option[String] = l.value() match {
    case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
    case s: String                                   => Some(s)
    case _                                           => None
  }

  def evalAll(preds: Seq[Pred], flag: Int, mapQ: Int, start: Int,
      refName: String): Boolean = {
    var i = 0
    while (i < preds.length) {
      if (!preds(i).eval(flag, mapQ, start, refName)) return false
      i += 1
    }
    true
  }
}
