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
  * (`BamReader.scala:147-153,198-203` — `variants.combinations(2)` summed
  * against the broadcast map):
  *
  *  - faithful: broadcast `Map[(String,String),Int]`, probed symmetrically
  *    in a UDF — byte-identical to the reference's dataflow;
  *  - scalable: posexplode the variant array → pair self-join on read with
  *    idx inequality → broadcast-join the canonicalized (least/greatest) LD
  *    table → sum per read. At 100 TB the map may not fit a closure; the
  *    join formulation shuffles only exploded variants (bounded per read)
  *    and keeps the LD dim broadcast. Both produce identical scores
  *    (LdSpec asserts it).
  */
object Ld {

  val schema: StructType = StructType(Seq(
    StructField("Variant1", StringType, nullable = false),
    StructField("Variant2", StringType, nullable = false),
    StructField("R", DoubleType, nullable = false)))

  /** Headerless LD TSV → (Variant1, Variant2, R_q:int) with zeros dropped. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").schema(schema).csv(path)
      .select(col("Variant1"), col("Variant2"),
        (col("R") * 100000).cast(IntegerType).as("R_q"))
      .where(col("R_q") =!= 0)

  /** Driver map for the faithful broadcast mode (88k rows ≈ few MB). */
  def toMap(ld: DataFrame): Map[(String, String), Int] =
    ld.collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap

  /** Symmetric probe (reference `LD.scala:59-67`). */
  def lookup(m: Map[(String, String), Int], a: String, b: String): Int =
    m.getOrElse((a, b), m.getOrElse((b, a), 0))

  /** Faithful mode: per-row UDF over the collected variant lists —
    * Σ over all unordered pairs of the flattened variants. */
  def pairScoreUdf(bc: Broadcast[Map[(String, String), Int]]): Column = {
    val f = udf { variantLists: Seq[Seq[String]] =>
      val vs = variantLists.flatten
      var s = 0
      var i = 0
      while (i < vs.length) {
        var j = i + 1
        while (j < vs.length) { s += lookup(bc.value, vs(i), vs(j)); j += 1 }
        i += 1
      }
      s
    }
    f(col("variantLists"))
  }

  /** Scalable mode: input (Read, variants:array<string>) → (Read, LD:int).
    * Emits a row per read even when no pair scores (LD=0), matching the
    * faithful mode. */
  def pairScoreJoin(perRead: DataFrame, ld: DataFrame): DataFrame = {
    val exploded = perRead
      .select(col("Read"), posexplode(col("variants")).as(Seq("idx", "v")))
    val pairs = exploded.as("a")
      .join(exploded.as("b"), col("a.Read") === col("b.Read") &&
        col("a.idx") < col("b.idx"))
      .select(col("a.Read").as("Read"),
        least(col("a.v"), col("b.v")).as("v1"),
        greatest(col("a.v"), col("b.v")).as("v2"))
    val canonLd = ld.select(
      least(col("Variant1"), col("Variant2")).as("v1"),
      greatest(col("Variant1"), col("Variant2")).as("v2"),
      col("R_q"))
    val scores = pairs.join(broadcast(canonLd), Seq("v1", "v2"))
      .groupBy(col("Read"))
      .agg(sum(col("R_q")).cast(IntegerType).as("LD"))
    perRead.select(col("Read")).distinct()
      .join(scores, Seq("Read"), "left")
      .select(col("Read"), coalesce(col("LD"), lit(0)).as("LD"))
  }
}
