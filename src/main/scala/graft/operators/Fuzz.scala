package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** RANDOMIZED DIFFERENTIAL FUZZ of the interval-kernel family — the
  * round-12 lesson (VERDICT r11): the marginal correctness risk is no
  * longer missing operators but inputs the hand-built gates never hit
  * (x32's bin-widening off-by-one survived three rounds of green gates
  * because no fixture put a b-interval at exactly radius distance on a
  * bin boundary). This harness closes that class of gap GENERATIVELY:
  *
  *  - a seeded splitmix64 chain derives, per seed, a full parameter set
  *    (bin width incl. boundary-hostile values like 1/31/33, radius
  *    incl. 0, interval stride/width/phase, contig count, empty-B) —
  *    [[params]] is pure, so Spark, DuckDB, and the in-JVM naive model
  *    all see the SAME fixture;
  *  - the four production kernels ([[Genomics.intervalIntersect]],
  *    [[Genomics.closestIntervals]], [[Genomics.intervalMerge]],
  *    [[Genomics.intervalSubtract]]) run per seed and reduce to
  *    arithmetic checksums (counts, masses, argmin sums);
  *  - the DuckDB oracle replays every seed with the NAIVE formulation
  *    the kernels replace — plain overlap join, ROW_NUMBER argmin,
  *    per-base islands — so any divergence between the optimized
  *    (binned/swept) plans and ground truth flips the row hash;
  *  - FuzzSpec additionally sweeps 100 seeds against a pure-Scala
  *    model, covering seeds beyond the gate's budget.
  *
  * Scale shape: fuzzing is a CORRECTNESS harness, but each seed still
  * exercises the kernels' scale shapes (uniform (contig, bin) shuffles,
  * two-level bucketed sweeps) — the lineitem slice is persisted once and
  * shared by all seeds, so the gate costs one scan plus seed-sized work.
  */
object Fuzz {

  /** Per-seed fixture parameters; every field feeds BOTH the Spark
    * synthesis and the generated oracle SQL as a literal. */
  final case class P(seed: Int, nC: Long, binWidth: Int, radius: Long,
      m1a: Long, m2a: Long, modA: Long, strideA: Long, widthA: Long,
      phaseA: Long,
      m1b: Long, m2b: Long, modB: Long, strideB: Long, widthB: Long,
      phaseB: Long,
      emptyB: Boolean)

  /** splitmix64 — the standard 64-bit mix (public domain, Steele et al.
    * "Fast Splittable Pseudorandom Number Generators"). */
  private def mix(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Boundary-hostile bin widths: 1 (every coordinate a boundary),
    * off-by-one neighbours of powers of two, and the gates' usual 64. */
  private val BinWidths = Array(1, 2, 3, 4, 7, 8, 16, 31, 32, 33, 64)

  def params(seed: Int): P = {
    var state = seed.toLong
    def next(): Long = { state = mix(state); state }
    def in(lo: Long, hi: Long): Long =
      lo + java.lang.Math.floorMod(next(), hi - lo + 1)
    P(seed,
      nC = in(1, 3),
      binWidth = BinWidths(in(0, BinWidths.length - 1).toInt),
      radius = in(0, 70),
      m1a = in(1, 13), m2a = in(1, 13), modA = in(40, 200),
      strideA = in(1, 45), widthA = in(1, 40), phaseA = in(0, 63),
      m1b = in(1, 13), m2b = in(1, 13), modB = in(40, 200),
      strideB = in(1, 45), widthB = in(1, 40), phaseB = in(0, 63),
      emptyB = seed % 7 == 3)
  }

  /** Interval-set synthesis over (pk, sk) pairs: DISTINCT (contig,
    * start) then end = start + width — the oracle SQL restates this
    * verbatim. */
  private[operators] def side(base: DataFrame, nC: Long, m1: Long,
      m2: Long, modN: Long, stride: Long, width: Long, phase: Long,
      empty: Boolean): DataFrame = {
    val src = if (empty) base.where(lit(false)) else base
    src.select(
        concat(lit("c"), (col("pk") + col("sk")) % nC).as("contig"),
        (lit(phase) +
          ((col("pk") * m1 + col("sk") * m2) % modN) * stride)
          .cast("long").as("start"))
      .distinct()
      .withColumn("end", col("start") + lit(width))
  }

  private def sideA(base: DataFrame, p: P): DataFrame =
    side(base, p.nC, p.m1a, p.m2a, p.modA, p.strideA, p.widthA, p.phaseA,
      empty = false)

  private def sideB(base: DataFrame, p: P): DataFrame =
    side(base, p.nC, p.m1b, p.m2b, p.modB, p.strideB, p.widthB, p.phaseB,
      p.emptyB)

  /** One seed through all four kernels → the 11-field checksum row. */
  private[operators] def runSeed(base: DataFrame, p: P)
      : (Long, Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long) = {
    val a = sideA(base, p)
    val b = sideB(base, p)
    val x = Genomics.intervalIntersect(a, b, p.binWidth)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("end_pos") - col("start_pos")), lit(0L)).as("m"),
        coalesce(sum(col("start_pos")), lit(0L)).as("s"))
      .collect()(0)
    val c = Genomics.closestIntervals(a, b, p.radius, p.binWidth)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("distance")), lit(0L)).as("d"),
        coalesce(sum(col("b_start")), lit(0L)).as("s"))
      .collect()(0)
    val m = Genomics.intervalMerge(a, bucketWidth = 512L)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("end_pos") - col("start_pos")), lit(0L)).as("m"))
      .collect()(0)
    val sub = Genomics.intervalSubtract(a, b, p.binWidth,
        bucketWidth = 512L)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("end_pos") - col("start_pos")), lit(0L)).as("m"))
      .collect()(0)
    (p.seed.toLong, x.getLong(0), x.getLong(1), x.getLong(2),
      c.getLong(0), c.getLong(1), c.getLong(2),
      m.getLong(0), m.getLong(1), sub.getLong(0), sub.getLong(1))
  }

  /** Seeds the driver gate replays against DuckDB; FuzzSpec sweeps 100. */
  val GateSeeds = 12

  def q106FuzzGate(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d).where(col("l_orderkey") % 13 === 6)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .persist()
    try {
      base.count() // materialize once; all seeds share the cached slice
      val rows = (0 until GateSeeds).map(k => runSeed(base, params(k)))
      import s.implicits._
      rows.toDF("seed", "n_x", "mass_x", "sx", "n_c", "dist_c", "sb",
        "n_m", "mass_m", "n_s", "mass_s").orderBy("seed")
    } finally base.unpersist(blocking = false)
  }

  /** The naive restatement of one seed: plain overlap join (intersect),
    * ROW_NUMBER argmin with the kernel's exact tie order (closest),
    * per-base islands (merge, subtract). */
  private def seedSql(p: P): String = {
    val bWhere = if (p.emptyB) " WHERE 1 = 0" else ""
    s"""SELECT * FROM (
       |WITH li AS (SELECT l_partkey AS pk, l_suppkey AS sk
       |  FROM lineitem WHERE l_orderkey % 13 = 6),
       |a0 AS (SELECT DISTINCT 'c' || ((pk + sk) % ${p.nC}) AS contig,
       |    ${p.phaseA} + ((pk * ${p.m1a} + sk * ${p.m2a}) % ${p.modA})
       |      * ${p.strideA} AS st
       |  FROM li),
       |a2 AS (SELECT contig, st, st + ${p.widthA} AS en FROM a0),
       |b0 AS (SELECT DISTINCT 'c' || ((pk + sk) % ${p.nC}) AS contig,
       |    ${p.phaseB} + ((pk * ${p.m1b} + sk * ${p.m2b}) % ${p.modB})
       |      * ${p.strideB} AS st
       |  FROM li$bWhere),
       |b2 AS (SELECT contig, st, st + ${p.widthB} AS en FROM b0),
       |x AS (SELECT COUNT(*) AS n_x,
       |    COALESCE(SUM(LEAST(a2.en, b2.en) - GREATEST(a2.st, b2.st)), 0)
       |      AS mass_x,
       |    COALESCE(SUM(GREATEST(a2.st, b2.st)), 0) AS sx
       |  FROM a2 JOIN b2 ON a2.contig = b2.contig
       |    AND a2.st < b2.en AND b2.st < a2.en),
       |cand AS (SELECT a2.contig, a2.st AS ast, a2.en AS aen,
       |    b2.st AS bst, b2.en AS ben,
       |    GREATEST(0, GREATEST(a2.st - b2.en, b2.st - a2.en)) AS d
       |  FROM a2 JOIN b2 ON a2.contig = b2.contig),
       |rk AS (SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY contig, ast, aen ORDER BY d, bst, ben) AS r
       |  FROM cand WHERE d <= ${p.radius}),
       |c AS (SELECT COUNT(*) AS n_c, COALESCE(SUM(d), 0) AS dist_c,
       |    COALESCE(SUM(bst), 0) AS sb
       |  FROM rk WHERE r = 1),
       |pa AS (SELECT DISTINCT contig,
       |    unnest(generate_series(st, en - 1)) AS pos FROM a2),
       |mm AS (SELECT COUNT(*) AS mass_m FROM pa),
       |mr AS (SELECT COUNT(*) AS n_m FROM pa p LEFT JOIN pa q
       |  ON p.contig = q.contig AND q.pos = p.pos - 1
       |  WHERE q.pos IS NULL),
       |ap AS (SELECT contig, st, en,
       |    unnest(generate_series(st, en - 1)) AS pos FROM a2),
       |bp AS (SELECT DISTINCT contig,
       |    unnest(generate_series(st, en - 1)) AS pos FROM b2),
       |keep AS (SELECT ap.contig, ap.st, ap.en, ap.pos FROM ap
       |  LEFT JOIN bp ON ap.contig = bp.contig AND ap.pos = bp.pos
       |  WHERE bp.pos IS NULL),
       |sm AS (SELECT COUNT(*) AS mass_s FROM keep),
       |sr AS (SELECT COUNT(*) AS n_s FROM keep k LEFT JOIN keep q
       |  ON k.contig = q.contig AND k.st = q.st AND k.en = q.en
       |    AND q.pos = k.pos - 1
       |  WHERE q.pos IS NULL)
       |SELECT CAST(${p.seed} AS BIGINT) AS seed,
       |  CAST(x.n_x AS BIGINT) AS n_x, CAST(x.mass_x AS BIGINT) AS mass_x,
       |  CAST(x.sx AS BIGINT) AS sx,
       |  CAST(c.n_c AS BIGINT) AS n_c, CAST(c.dist_c AS BIGINT) AS dist_c,
       |  CAST(c.sb AS BIGINT) AS sb,
       |  CAST(mr.n_m AS BIGINT) AS n_m, CAST(mm.mass_m AS BIGINT) AS mass_m,
       |  CAST(sr.n_s AS BIGINT) AS n_s, CAST(sm.mass_s AS BIGINT) AS mass_s
       |FROM x, c, mm, mr, sm, sr
       |)""".stripMargin
  }

  val q106Sql: String =
    (0 until GateSeeds).map(k => seedSql(params(k)))
      .mkString("", "\nUNION ALL\n", "\nORDER BY seed")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_fuzz_gate" -> (q106FuzzGate _))

  val oracles: Map[String, String] = Map(
    "q106_fuzz_gate" -> q106Sql)
}
