package graft.mito

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Linkage-disequilibrium scoring.
  *
  * The LD table is a headerless 3-column TSV (Variant1, Variant2, R) —
  * reference `src/universal/mitomap.ld`; the reference read it with
  * header=true and silently ate the first row (defect B2, `LD.scala:41-44`).
  * We read it headerless with an explicit schema. R is quantized
  * `(R*100000).toInt` and zero entries dropped (`LD.scala:26,47-49`).
  *
  * Two formulations of per-read pairwise scoring
  * (`BamReader.scala:147-153,198-203` — `variants.flatten.combinations(2)`
  * summed against the broadcast map). `combinations(2)` yields each
  * DISTINCT pair-multiset once: a variant reported by both mates collapses,
  * and a self-pair {v,v} appears (once) iff v occurs at least twice. Both
  * modes implement exactly those semantics (FeaturesSpec pins a
  * duplicate-across-mates fixture):
  *
  *  - faithful: broadcast `Map[(String,String),Int]`, probed symmetrically
  *    in a UDF over the distinct pair-multisets;
  *  - scalable: generate the distinct pair-multisets per row with
  *    higher-order array functions (no extra shuffle, no driver map) →
  *    explode → broadcast-join the canonicalized (least/greatest) LD
  *    table → sum per read. At 100 TB the map may not fit a closure; the
  *    join formulation shuffles only exploded pairs (bounded per read)
  *    and keeps the LD dim broadcast. Both produce identical scores
  *    (FeaturesSpec asserts it).
  */
object Ld {

  val schema: StructType = StructType(Seq(
    StructField("Variant1", StringType, nullable = false),
    StructField("Variant2", StringType, nullable = false),
    StructField("R", DoubleType, nullable = false)))

  /** Dim-load counter: the cohort gate (x80) asserts an N-sample run
    * loads the LD dim exactly once, not N times. */
  val loadCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Headerless LD TSV → (Variant1, Variant2, R_q:int) with zeros dropped. */
  def load(spark: SparkSession, path: String): DataFrame = {
    loadCount.incrementAndGet()
    spark.read.option("sep", "\t").schema(schema).csv(path)
      .select(col("Variant1"), col("Variant2"),
        (col("R") * 100000).cast(IntegerType).as("R_q"))
      .where(col("R_q") =!= 0)
  }

  /** Driver map for the faithful broadcast mode (88k rows ≈ few MB). */
  def toMap(ld: DataFrame): Map[(String, String), Int] =
    ld.collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap

  /** Symmetric probe (reference `LD.scala:59-67`). */
  def lookup(m: Map[(String, String), Int], a: String, b: String): Int =
    m.getOrElse((a, b), m.getOrElse((b, a), 0))

  /** Σ over the distinct pair-multisets of `vs` (the `combinations(2)`
    * semantics — see the object doc). */
  def scorePairs(m: Map[(String, String), Int], vs: Seq[String]): Int = {
    val d = vs.distinct
    var s = 0
    var i = 0
    while (i < d.length) {
      var j = i + 1
      while (j < d.length) { s += lookup(m, d(i), d(j)); j += 1 }
      i += 1
    }
    if (d.length != vs.length) { // some value occurs ≥2 → self-pairs {v,v}
      val seen = new scala.collection.mutable.HashSet[String]
      val dup = new scala.collection.mutable.HashSet[String]
      vs.foreach(v => if (!seen.add(v)) dup.add(v))
      dup.foreach(v => s += lookup(m, v, v))
    }
    s
  }

  /** Faithful mode: per-row UDF over the collected variant lists. */
  def pairScoreUdf(bc: Broadcast[Map[(String, String), Int]]): Column = {
    val f = udf { variantLists: Seq[Seq[String]] =>
      scorePairs(bc.value, variantLists.flatten)
    }
    f(col("variantLists"))
  }

  /** Distinct pair-multisets of a variants array, generated per row with
    * higher-order functions (no shuffle): cross pairs of the distinct
    * values plus a self-pair for every value occurring ≥2 times. Pairs are
    * canonicalized (least, greatest) to match the canonicalized LD dim. */
  private def pairsOfDistinct(variants: Column, d: Column): Column = concat(
    flatten(transform(d, (x, i) =>
      transform(slice(d, i + lit(2), size(d)), y =>
        struct(least(x, y).as("v1"), greatest(x, y).as("v2"))))),
    transform(
      filter(d, x => size(filter(variants, e => e === x)) >= 2),
      x => struct(x.as("v1"), x.as("v2"))))

  /** Scalable mode: input (Read, variants:array<string>) → (Read, LD:int).
    * Emits a row per read even when no pair scores (LD=0), matching the
    * faithful mode. Evaluates its input once per branch — callers that
    * also consume `perRead` elsewhere should persist it (see
    * Features.mtFeaturesJoin). */
  def pairScoreJoin(perRead: DataFrame, ld: DataFrame): DataFrame =
    perRead.select(col("Read"))
      .join(pairScores(perRead, ld), Seq("Read"), "left")
      .select(col("Read"), coalesce(col("LD"), lit(0)).as("LD"))

  /** Like pairScoreJoin but emits only reads with at least one scored pair
    * — callers that already hold the per-read frame left-join this and
    * coalesce, saving one branch over the input. */
  def pairScores(perRead: DataFrame, ld: DataFrame): DataFrame = {
    // materialize array_distinct behind a projection boundary: lambda
    // expressions are excluded from subexpression elimination, so inlining
    // `d` into the pair generator would recompute it per use
    val pairs = perRead
      .select(col("Read"), col("variants"),
        array_distinct(col("variants")).as("d"))
      .select(col("Read"),
        explode(pairsOfDistinct(col("variants"), col("d"))).as("p"))
      .select(col("Read"), col("p.v1").as("v1"), col("p.v2").as("v2"))
    val canonLd = ld.select(
      least(col("Variant1"), col("Variant2")).as("v1"),
      greatest(col("Variant1"), col("Variant2")).as("v2"),
      col("R_q"))
    pairs.join(broadcast(canonLd), Seq("v1", "v2"))
      .groupBy(col("Read"))
      .agg(sum(col("R_q")).cast(IntegerType).as("LD"))
  }
}
