package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-9 tail operators (t33 BM25, x14 flagstat,
  * q73 compaction) beyond what the DuckDB oracle pins: structural
  * contracts and cross-formulation equalities. */
class R9TailOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- t33
  test("t33 BM25: scores positive, descending, term counts bounded") {
    val rows = TextAnalysis.queries("t33_bm25")(spark, sf).collect()
    assert(rows.length === 20, "top-20 under-filled at sf0.001")
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0), "non-positive BM25 score")
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "result not score-descending")
    assert(rows.map(_.getLong(2)).forall(n => n >= 1 && n <= 4),
      "n_terms outside [1, |Q|]")
  }

  test("t33 BM25 ranks the all-terms doc above a no-term doc") {
    // every returned doc must actually contain >=1 query term — join back
    // to the corpus and recount the terms independently of the operator
    val q = Seq("spark", "merge", "window", "vector")
    val recount = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(array_intersect(
          array_distinct(split(lower(trim(col("text"))), "\\s+")),
          array(q.map(lit): _*))).as("n_present"))
    val joined = TextAnalysis.queries("t33_bm25")(spark, sf)
      .join(recount, Seq("doc_id"))
    assert(joined.where(col("n_terms") =!= col("n_present")).count() === 0,
      "operator term count disagrees with an independent recount")
  }

  // ------------------------------------------------------------- x14
  test("x14 flagstat: category partition identities hold") {
    val r = MitoQueries.queries("x14_flagstat")(spark, sf).collect()(0)
    val (total, sec, supp, dup, mapped, proper, primary) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    assert(total > 0)
    // primary/secondary/supplementary need not partition (a record can be
    // both sec and supp under the synthesis), but each bound holds
    assert(sec <= total && supp <= total && dup <= total)
    assert(mapped <= total && proper <= total)
    // inclusion-exclusion: non-primary records carry sec or supp (or both),
    // so primary + sec + supp = total + |sec ∩ supp| >= total
    assert(primary <= total && primary + sec + supp >= total,
      "primary undercounts: a record is neither primary nor sec/supp")
  }

  test("x14 read-back equals the synthesized frame (roundtrip, no oracle)") {
    // recompute the aggregate directly on the synthesis arithmetic and
    // compare to the BAM read-back — a pure-Spark roundtrip equality
    val li = graft.Tables.lineitem(spark, sf)
      .where(col("l_orderkey") % 4 === 3)
    val flag = (lit(1)
      + when(col("l_linenumber") % 2 === 0, 2).otherwise(0)
      + when(col("l_partkey") % 7 === 0, 4).otherwise(0)
      + when(col("l_suppkey") % 5 === 0, 256).otherwise(0)
      + when(col("l_quantity").cast("int") % 11 === 0, 1024).otherwise(0)
      + when(col("l_orderkey") % 13 === 0, 2048).otherwise(0)).cast("int")
    def bit(c: org.apache.spark.sql.Column, b: Int) =
      (c.bitwiseAND(lit(b)) =!= 0).cast("long")
    val direct = li.select(flag.as("flag")).agg(
      count(lit(1)).as("n_total"),
      sum(bit(col("flag"), 256)).as("n_secondary"),
      sum(bit(col("flag"), 2048)).as("n_supplementary"),
      sum(bit(col("flag"), 1024)).as("n_duplicates"),
      sum((col("flag").bitwiseAND(lit(4)) === 0).cast("long"))
        .as("n_mapped"),
      sum(bit(col("flag"), 2)).as("n_proper"),
      sum((col("flag").bitwiseAND(lit(2304)) === 0).cast("long"))
        .as("n_primary")).collect()(0)
    val back = MitoQueries.queries("x14_flagstat")(spark, sf).collect()(0)
    (0 until 7).foreach { i =>
      assert(back.getLong(i) === direct.getLong(i),
        s"flagstat column $i diverges from the synthesis arithmetic")
    }
  }

  // ------------------------------------------------------------- q75
  test("q75 native unpivot equals the manual union-of-scans formulation") {
    val manual = {
      val li = graft.Tables.lineitem(spark, sf)
      val qty = li.select(col("l_orderkey"), lit("qty").as("metric"),
        col("l_quantity").cast("long").as("v"))
      val disc = li.select(col("l_orderkey"), lit("disc_pct").as("metric"),
        round(col("l_discount") * 100).cast("long").as("v"))
      val tax = li.select(col("l_orderkey"), lit("tax_pct").as("metric"),
        round(col("l_tax") * 100).cast("long").as("v"))
      qty.union(disc).union(tax)
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
          sum(col("l_orderkey") * col("v")).as("weighted_checksum"))
        .orderBy("metric")
    }
    val native = Relational.queries("q75_unpivot")(spark, sf)
    assert(native.exceptAll(manual).isEmpty &&
      manual.exceptAll(native).isEmpty,
      "unpivot and union formulations disagree")
  }

  // ------------------------------------------------------------- q76
  test("q76 merge dispositions partition the result; deletes are gone") {
    val r = Relational.queries("q76_merge_upsert")(spark, sf).collect()(0)
    val (n, k, u, i) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(n === k + u + i, "dispositions do not partition the result")
    val base = graft.Tables.orders(spark, sf)
    val nDeleted = base.where(col("o_orderkey") % 10 === 0).count()
    val nBase = base.count()
    assert(n === nBase - nDeleted + i,
      "row accounting: base − deletes + inserts mismatch")
  }

  // ------------------------------------------------------------- q77
  test("q77 SCD2: every key stays current, closed rows = changed keys") {
    val r = Relational.queries("q77_scd2")(spark, sf).collect()(0)
    val cust = graft.Tables.customer(spark, sf)
    val n = cust.count()
    val nChanged = cust.where(col("c_custkey") % 4 === 0).count()
    assert(r.getLong(0) === n + nChanged, "row expansion mismatch")
    assert(r.getLong(1) === n, "a key lost (or gained) its current row")
    assert(r.getLong(2) === nChanged, "closed-row count != changed keys")
  }

  // ------------------------------------------------------------- x15
  test("x15 statuses partition the template space; plants detected") {
    val rows = MitoQueries.queries("x15_mate_check")(spark, sf).collect()
    val byStatus = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet === Set("consistent", "inconsistent", "orphan"),
      "a planted class went undetected at sf0.001")
    val nTemplates = graft.Tables.lineitem(spark, sf)
      .where(col("l_orderkey") % 4 === 0).count()
    assert(byStatus.values.sum === nTemplates,
      "statuses do not partition the synthesized templates")
  }

  // ------------------------------------------------------------- q73
  test("q73 compaction preserves the row set and reduces file count") {
    val r = Relational.queries("q73_compaction_gate")(spark, sf).collect()(0)
    val srcRows = graft.Tables.lineitem(spark, sf).count()
    assert(r.getLong(0) === srcRows, "compaction lost or duplicated rows")
    assert(r.getBoolean(3), "file-count gate failed")
  }
}
