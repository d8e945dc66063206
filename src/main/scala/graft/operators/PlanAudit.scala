package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{HigherOrderFunction, Sequence}

/** Optimized-plan audits shared across the operator families — the
  * in-row guard pattern of `requireKeyedWindows` / `requireBoundedLineage`
  * extended to the VERDICT r12 x81 failure class.
  *
  * The x81 pattern: a kernel builds a per-row array in one projection
  * (`transform(sequence(1, len), …)`) and consumes elements of it inside
  * a higher-order-function lambda in the NEXT projection. Catalyst's
  * `CollapseProject` inlines the array-builder into the lambda body —
  * the builder then re-executes once per (row, lambda-invocation) pair
  * instead of once per row, turning an O(len·w) kernel into O(len³·w)
  * (judge-reproduced on the optimized plan; 102 s at sf0.1 vs a ~1 s
  * family median). The row stays hash-green — identical arithmetic —
  * which is exactly why only a plan-level audit can catch it. */
object PlanAudit {

  /** Offending subtrees in the OPTIMIZED plan: a non-foldable `Sequence`
    * (the per-row array BUILDER — `sequence(1, len)` et al.) nested
    * inside any lambda of a `HigherOrderFunction`. A foldable sequence
    * (constant bounds) is a literal after folding and costs nothing; a
    * top-level non-foldable sequence evaluates once per row and is the
    * intended shape — only builder-inside-lambda multiplies per-element. */
  def inlinedArrayBuilders(df: DataFrame): Seq[String] = {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    df.queryExecution.optimizedPlan.foreach { node =>
      node.expressions.foreach { root =>
        root.foreach {
          case h: HigherOrderFunction =>
            h.functions.foreach { f =>
              f.foreach {
                case s: Sequence if !s.foldable =>
                  bad += s"${h.prettyName}(... ${s.sql} ...)"
                case _ => ()
              }
            }
          case _ => ()
        }
      }
    }
    bad.toSeq.distinct
  }

  /** In-row assert for the HOF-heavy kernels: flip CORRECTNESS loudly if
    * a refactor ever re-introduces an array-builder inside a lambda. */
  def requireNoInlinedArrayBuilders(df: DataFrame, who: String): Unit = {
    val bad = inlinedArrayBuilders(df)
    require(bad.isEmpty,
      s"$who: optimized plan embeds a per-row array builder inside a " +
        s"higher-order-function lambda (the x81 O(len^3) collapse): " +
        bad.mkString("; "))
  }
}
