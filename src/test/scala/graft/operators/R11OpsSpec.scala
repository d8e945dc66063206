package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 additions: iterative PageRank and variant QC. */
class R11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("q79 pageRankMilli matches a driver-side reference simulation") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val iters = 3
    val got = Relational.pageRankMilli(edges, iters)
      .as[(Long, Long)].collect().toMap
    // reference: same integer milli arithmetic, plain Scala
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val deg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank = nodes.map(_ -> 1000L).toMap
    for (_ <- 0 until iters) {
      val in = es.groupBy(_._2).map { case (dst, in0) =>
        dst -> in0.map { case (s0, _) => rank(s0) / deg(s0) }.sum
      }
      rank = nodes.map(n => n -> (150L + 850L * in.getOrElse(n, 0L) / 1000L))
        .toMap
    }
    assert(got === rank)
    // a sink-only node (2 receives, forwards to 3) ends below the hub 1
    assert(got(1L) > got(4L), "node with inflow outranks the pure source")
  }

  test("q79 rank vector stays distributed: no collect in the loop plan") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Relational.pageRankMilli(edges, 2)
    // the composed plan must still be a single declarative tree: 2 rounds
    // of join+agg fold into one optimized plan with only Aggregate/Join
    // operators — no LocalRelation materialization of ranks beyond the
    // leaf edges
    val collects = r.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    // only the edge literals themselves may be local
    assert(collects.forall(_.output.length <= 2))
    assert(r.as[(Long, Long)].collect().length === 2)
  }

  test("x39 variantQc: class tallies, TsTv, and tv=0 null") {
    val v = Seq(
      ("c1", "A", "G"),   // ts
      ("c1", "G", "A"),   // ts
      ("c1", "A", "C"),   // tv
      ("c1", "A", "AT"),  // ins
      ("c1", "ATT", "A"), // del
      ("c2", "C", "T"),   // ts only -> tv = 0 -> null ratio
      ("c2", "G", "GGG")) // ins
      .toDF("contig", "ref", "alt")
    val got = Genomics.variantQc(v)
      .as[(String, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    assert(got === Set(
      ("c1", 5L, 3L, 1L, 1L, 2L, 1L, Some(2000L)),
      ("c2", 2L, 1L, 1L, 0L, 1L, 0L, None)))
  }
}
