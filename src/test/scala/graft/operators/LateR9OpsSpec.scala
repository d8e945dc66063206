package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the late-round-9 operators (x11, t31/t32, s19/s20,
  * q62, m11/m12) that the DuckDB oracle can't see: cross-formulation
  * equalities and structural contracts of the emitted rows. */
class LateR9OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- x11
  test("x11 sweep formulation equals the naive per-base explode") {
    val naive = graft.Tables.lineitem(spark, sf)
      .where(col("l_orderkey") % 3 === 1)
      .select(
        when(col("l_suppkey") % 2 === 0, "chr1").otherwise("chrM")
          .as("contig"),
        ((col("l_partkey") % 500) + 1).cast("long").as("st"))
      .select(col("contig"),
        explode(sequence(col("st"), col("st") + 9)).as("pos"))
      .groupBy(col("contig"), col("pos")).agg(count(lit(1)).as("depth"))
    val sweep = MitoQueries.x11DepthPileup(spark, sf)
    assert(sweep.exceptAll(naive).isEmpty && naive.exceptAll(sweep).isEmpty,
      "sweep and explode formulations disagree")
    // both contigs must actually appear — otherwise the partitioned
    // window is never exercised beyond one key
    assert(sweep.select("contig").distinct().count() === 2)
  }

  // ------------------------------------------------------------- t32
  test("t32 chunks tile every doc: stride arithmetic and coverage") {
    val rows = TextAnalysis.queries("t32_sliding_chunks")(spark, sf)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        min(col("start")).as("first_start"),
        max(col("start") + col("chunk_len")).as("covered_end"),
        sum(col("chunk_len")).as("sum_len"),
        min(col("chunk_len")).as("min_len"))
      .join(graft.Tables.documents(spark, sf)
        .select(col("doc_id"),
          size(split(lower(trim(col("text"))), "\\s+")).as("n")),
        Seq("doc_id"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, first, end, sumLen, minLen, n) = (r.getLong(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getInt(5), r.getInt(6))
      assert(first === 0, s"doc ${r.getLong(0)}: first chunk not at 0")
      assert(end === n, s"doc ${r.getLong(0)}: chunks don't reach doc end")
      // overlap accounting: each chunk past the first re-reads W-S=16 toks
      assert(sumLen === n + 16 * (nc - 1),
        s"doc ${r.getLong(0)}: overlap arithmetic broken")
      assert(minLen >= 1, s"doc ${r.getLong(0)}: empty chunk emitted")
    }
  }

  // ------------------------------------------------------------- t31
  test("t31 keep is exactly the conjunction of the four rule flags") {
    val bad = TextAnalysis.queries("t31_gopher_rules")(spark, sf)
      .where(col("keep") =!= (col("len_ok") && col("wlen_ok") &&
        col("alpha_ok") && col("stop_ok")))
      .count()
    assert(bad === 0)
  }

  // ------------------------------------------------------------- m11
  test("m11 cut bookkeeping: first_cut/-1 and checksum consistency") {
    val r = Multimodal.queries("m11_scene_cuts")(spark, sf)
    assert(r.where(col("n_cuts") === 0 && col("first_cut") =!= -1)
      .count() === 0)
    assert(r.where(col("n_cuts") > 0 &&
      (col("first_cut") < 1 || col("cut_checksum") < col("first_cut")))
      .count() === 0)
    // cuts exist somewhere in the corpus (threshold actually splits)
    assert(r.agg(sum(col("n_cuts"))).collect()(0).getLong(0) > 0)
  }

  // ------------------------------------------------------------- m12
  test("m12 patch mass equals image mass exactly when height tiles") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        greatest(ceil(length(col("text")) / 48.0), lit(1)).cast("int")
          .as("h"))
    val r = Multimodal.queries("m12_image_patchify")(spark, sf)
      .join(docs, Seq("doc_id"))
    assert(r.where(col("patch_sum") > col("total_sum")).count() === 0)
    assert(r.where(col("h") % 4 === 0 &&
      col("patch_sum") =!= col("total_sum")).count() === 0)
    assert(r.where(col("n_patches") =!= floor(col("h") / 4) * 4)
      .count() === 0)
  }

  // ------------------------------------------------------------- q62
  test("q62 one NULL in the value set empties NOT IN, not IN") {
    val r = Relational.queries("q62_null_aware_anti_join")(spark, sf)
      .collect()(0)
    assert(r.getLong(0) > 0, "clean NOT IN should keep rows")
    assert(r.getLong(1) === 0, "polluted NOT IN must be empty")
    assert(r.getLong(2) > 0, "polluted IN keeps genuine matches")
  }

  // ------------------------------------------------------------- d25
  test("d25 planted copies win exactly the groups whose source isn't src0") {
    val expected = graft.Tables.documents(spark, sf)
      .orderBy(col("doc_id")).limit(20)
      .where(col("source") =!= "src0").count()
    val r = Dedup.queries("d25_source_priority_gate")(spark, sf).collect()(0)
    assert(r.getLong(2) === expected, "n_planted_won mismatch")
    assert(r.getLong(1) === 20, "every planted group is multi-member")
  }

  // ------------------------------------------------------------- m13
  test("m13 islands bookkeeping: segments bound active frames") {
    val r = Multimodal.queries("m13_audio_segments")(spark, sf)
    assert(r.where(col("n_segments") > col("n_active")).count() === 0)
    assert(r.where(col("n_active") > col("n_frames")).count() === 0)
    assert(r.where(col("n_segments") === 0 && col("first_active") =!= -1)
      .count() === 0)
    assert(r.where(col("longest_run") > col("n_active")).count() === 0)
  }

  // ------------------------------------------------------------- q69
  test("q69 pipe syntax equals the DataFrame formulation") {
    val pipe = Relational.queries("q69_pipe_syntax")(spark, sf)
    val df = graft.Tables.lineitem(spark, sf)
      .where(col("l_discount") > 0.05)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"))
    assert(pipe.exceptAll(df).isEmpty && df.exceptAll(pipe).isEmpty)
  }

  // ------------------------------------------------------------- s19/s20
  test("s19 gate booleans hold on the small corpus") {
    val r = Similarity.queries("s19_knn_graph_gate")(spark, sf).collect()(0)
    assert(r.getBoolean(1) && r.getBoolean(2))
  }

  test("s20 Lloyd monotonicity holds on the small corpus") {
    val r = Similarity.queries("s20_lloyd_step_gate")(spark, sf).collect()(0)
    assert(r.getBoolean(1) && r.getBoolean(2))
  }
}
