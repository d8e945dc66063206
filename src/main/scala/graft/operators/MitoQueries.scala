package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Det._

/** The reference's distinctive dataflow shapes (SURVEY §2.4 A4, §2.6 X4,
  * §2.3 J3) re-expressed over the driver corpus so the oracle can check
  * them: per-group pairwise combinations scored against a broadcast
  * dimension — the scalable formulation of MitoScape's pairwise-LD scoring
  * (reference BamReader.scala:147-153,198-203). The domain pipeline itself
  * (SAM/MD/LD/RF) runs on fixtures in the test suite (graft.mito).
  */
object MitoQueries {

  // ---------------------------------------------------------------- x01
  /** Pairwise-combination scoring, explode+join+sum formulation: within
    * each order, all unordered supplier pairs (the reference's
    * `variants.combinations(2)`), each pair scored from a broadcast
    * dimension (supplier acctbal stands in for the LD table), summed per
    * order. No driver-side map, no quadratic collect: the pair space is
    * bounded per group and generated distributively by a self-join. */
  def x01PairScore(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")).distinct()
    val a = li.select(col("l_orderkey"), col("l_suppkey").as("s1"))
    val b = li.select(col("l_orderkey"), col("l_suppkey").as("s2"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_acctbal"))
    a.join(b, Seq("l_orderkey")).where(col("s1") < col("s2"))
      .join(broadcast(sup.select(col("s_suppkey").as("s1"), col("s_acctbal").as("bal1"))), Seq("s1"))
      .join(broadcast(sup.select(col("s_suppkey").as("s2"), col("s_acctbal").as("bal2"))), Seq("s2"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_pairs"),
        dsum(col("bal1") + col("bal2")).as("pair_score"))
      .orderBy("l_orderkey")
  }

  val x01Sql: String =
    s"""WITH su AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
       |SELECT a.l_orderkey, COUNT(*) AS n_pairs,
       |  ${dsumSql("s1.s_acctbal + s2.s_acctbal")} AS pair_score
       |FROM su a JOIN su b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
       |JOIN supplier s1 ON a.l_suppkey = s1.s_suppkey
       |JOIN supplier s2 ON b.l_suppkey = s2.s_suppkey
       |GROUP BY a.l_orderkey ORDER BY a.l_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_pair_score" -> (x01PairScore _))

  val oracles: Map[String, String] = Map(
    "x01_pair_score" -> x01Sql)
}
