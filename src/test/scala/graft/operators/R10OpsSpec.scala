package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 contracts: dataset-tagged SQL-text temp views survive
  * concurrent same-query runs on different sf dirs, and the
  * block-quadratic d02 oracle kernel refuses corpus-scale inputs. */
class R10OpsSpec extends SparkSpec {

  private val sfA = "/root/testdata/sf0.001"
  private val sfB = "/root/testdata/sf0.01"

  test("SQL-text queries: concurrent runs on different sf dirs don't race") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // q67 + q62 both register temp views; before dataset tagging, the
    // second registration retargeted the first run's view mid-flight
    def run(d: String): (Long, Long) = {
      val lateral = Relational.q67LateralTopN(spark, d)
        .agg(sum(col("o_orderkey"))).head.getLong(0)
      val nullAware = Relational.q62NullAwareAntiJoin(spark, d)
        .head.getLong(0)
      (lateral, nullAware)
    }
    val expectA = run(sfA)
    val expectB = run(sfB)
    assert(expectA !== expectB, "fixture: the two sf dirs must differ")
    (1 to 3).foreach { _ =>
      val fa = Future(run(sfA))
      val fb = Future(run(sfB))
      assert(Await.result(fa, 120.seconds) === expectA)
      assert(Await.result(fb, 120.seconds) === expectB)
    }
  }

  test("d26 softDedupWeights: 1/size permille weights, singletons keep full weight") {
    import spark.implicits._
    val docs = Seq((1L, "s", 100L), (2L, "s", 100L), (3L, "s", 100L),
      (4L, "s", 100L), (5L, "s", 100L), (6L, "s", 100L))
      .toDF("doc_id", "source", "n_chars")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    val w = Dedup.softDedupWeights(docs, labels)
      .select("doc_id", "w_ppm").as[(Long, Long)].collect().toMap
    assert(w === Map(1L -> 333333L, 2L -> 333333L, 3L -> 333333L,
      4L -> 500000L, 5L -> 500000L, 6L -> 1000000L))
    // a 3-cluster counts (just under) once in expectation, not thrice
    val eff = w.filterKeys(Set(1L, 2L, 3L)).values.sum * 100L
    assert(eff === 99999900L)
  }

  test("x17 markdup: keeps best quality per fragment, orientation splits groups, ties deterministic") {
    import spark.implicits._
    val reads = Seq(
      // one fragment, three PCR copies: keep rB (best mapQ)
      ("rA", 99, "chrM", 100, 30, 600), ("rB", 99, "chrM", 100, 60, 600),
      ("rC", 99, "chrM", 100, 45, 600),
      // same position but REVERSE strand (flag bit 16 set on 83): its own group
      ("rD", 83, "chrM", 100, 20, 600),
      // mapQ tie: smaller readName wins
      ("rE", 99, "chrM", 200, 50, 700), ("rF", 99, "chrM", 200, 50, 700),
      // singleton: never marked
      ("rG", 99, "chrM", 300, 10, 800))
      .toDF("readName", "flag", "referenceName", "start", "mapQ", "pnext")
    val out = MitoQueries.markDuplicates(reads).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert((out("rA") & 1024) != 0 && (out("rC") & 1024) != 0)
    assert((out("rB") & 1024) == 0)
    assert((out("rD") & 1024) == 0, "reverse-strand read is its own fragment")
    assert((out("rE") & 1024) == 0 && (out("rF") & 1024) != 0,
      "tie must break on readName")
    assert((out("rG") & 1024) == 0)
    // non-flag columns and row count untouched
    assert(out.size === 7)
  }

  test("d02 oracle kernel refuses past the scale cap, directing to the banded wiring") {
    spark.conf.set("spark.graft.oracleKernelMaxRows", "10")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.d02NgramJaccard(spark, sfA).collect()
      }
      assert(e.getMessage.contains("nearDedupKeep"))
      assert(e.getMessage.contains("oracleKernelMaxRows"))
    } finally spark.conf.unset("spark.graft.oracleKernelMaxRows")
    // back under the default cap the kernel runs
    assert(Dedup.d02NgramJaccard(spark, sfA).count() >= 0)
  }
}
