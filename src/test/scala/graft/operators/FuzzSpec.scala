package graft.operators

import graft.SparkSpec

/** Differential fuzz sweep: the four interval kernels vs a pure-Scala
  * naive model over 100 seeded parameter sets (bin widths crossing
  * boundaries, radius 0, empty B, duplicate identities collapsing). The
  * driver gate (q106) replays the first [[Fuzz.GateSeeds]] seeds against
  * DuckDB; this spec covers the longer tail. */
class FuzzSpec extends SparkSpec {
  import spark.implicits._

  // fixed fixture pairs — the same values feed the Spark side (as a
  // DataFrame) and the naive model (in memory)
  private val pairs: Seq[(Long, Long)] =
    (0 until 48).map(i => ((i * 97L + 13) % 467, (i * 61L + 29) % 379))
  private lazy val base = pairs.toDF("pk", "sk").persist()

  private def synth(nC: Long, m1: Long, m2: Long, modN: Long,
      stride: Long, width: Long, phase: Long, empty: Boolean)
      : Seq[(String, Long, Long)] =
    if (empty) Nil
    else pairs.map { case (pk, sk) =>
      ("c" + ((pk + sk) % nC), phase + ((pk * m1 + sk * m2) % modN) * stride)
    }.distinct.map { case (c, st) => (c, st, st + width) }

  /** The naive model: plain joins and per-base islands — obviously
    * correct, never the kernels' formulations. */
  private def naive(p: Fuzz.P): Seq[Long] = {
    val A = synth(p.nC, p.m1a, p.m2a, p.modA, p.strideA, p.widthA,
      p.phaseA, empty = false)
    val B = synth(p.nC, p.m1b, p.m2b, p.modB, p.strideB, p.widthB,
      p.phaseB, p.emptyB)
    val xs = for {
      a <- A; b <- B
      if a._1 == b._1 && a._2 < b._3 && b._2 < a._3
    } yield (math.max(a._2, b._2), math.min(a._3, b._3))
    val (nx, massx, sx) =
      (xs.size.toLong, xs.map(t => t._2 - t._1).sum, xs.map(_._1).sum)
    val best = A.flatMap { a =>
      val cands = B.filter(_._1 == a._1).map { b =>
        (math.max(0L, math.max(a._2 - b._3, b._2 - a._3)), b._2, b._3)
      }.filter(_._1 <= p.radius)
      if (cands.isEmpty) None else Some(cands.min)
    }
    val (nc, dc, sb) =
      (best.size.toLong, best.map(_._1).sum, best.map(_._2).sum)
    val bases = A.flatMap(a => (a._2 until a._3).map(pos => (a._1, pos)))
      .toSet
    val massm = bases.size.toLong
    val nm = bases.count { case (c, pos) => !bases((c, pos - 1)) }.toLong
    val bb = B.flatMap(b => (b._2 until b._3).map(pos => (b._1, pos)))
      .toSet
    var masss = 0L
    var ns = 0L
    A.foreach { a =>
      val kept = (a._2 until a._3).filter(pos => !bb((a._1, pos)))
      masss += kept.size
      ns += kept.count(pos => !kept.contains(pos - 1))
    }
    Seq(nx, massx, sx, nc, dc, sb, nm, massm, ns, masss)
  }

  test("100-seed differential sweep: every kernel checksum equals the " +
      "naive model's") {
    (0 until 100).foreach { k =>
      val p = Fuzz.params(k)
      val g = Fuzz.runSeed(base, p)
      val got = Seq(g._2, g._3, g._4, g._5, g._6, g._7, g._8, g._9,
        g._10, g._11)
      assert(got === naive(p), s"seed $k diverged; params $p")
    }
  }

  test("q106 gate shape: one row per seed, seeds ascending") {
    val rows = Fuzz.q106FuzzGate(spark, "/root/testdata/sf0.001")
      .select("seed").as[Long].collect().toSeq
    assert(rows === (0L until Fuzz.GateSeeds.toLong))
  }

  test("generated oracle SQL embeds every seed exactly once") {
    val sql = Fuzz.q106Sql
    (0 until Fuzz.GateSeeds).foreach { k =>
      assert(sql.contains(s"CAST($k AS BIGINT) AS seed"), s"seed $k")
    }
  }
}
