package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query bench budget machinery (VERDICT r12 next-round #2):
  * pure-function tests — the Bench main wires `overBudget` over the warm
  * minimums and emits the `regressions` JSON field + BUDGET-EXCEEDED
  * stderr lines. */
class BenchBudgetSpec extends AnyFunSuite {

  test("a deliberately slowed query trips the budget check") {
    // time a real (slow) computation through wall-clock, the same
    // measurement the bench applies, against a deliberately tight budget
    val t0 = System.nanoTime()
    Thread.sleep(300)
    val slow = (System.nanoTime() - t0) / 1e9
    val warm = Map("planted_slow" -> slow, "fine" -> 0.01)
    assert(Bench.overBudget(warm, _ => 0.1) === Seq("planted_slow"))
  }

  test("failed queries (-1 sentinel) report via `failed`, not `regressions`") {
    assert(Bench.overBudget(Map("broken" -> -1.0), _ => 0.1).isEmpty)
  }

  test("x81 carries the first enforced tight entry; unknown queries get " +
      "the default ceiling") {
    assert(Bench.budgetFor("x81_quality_trim") === 6.0)
    assert(Bench.budgetFor("never_heard_of_it") === Bench.defaultBudget)
    // the fixed kernel at its measured warm time passes with headroom
    assert(Bench.overBudget(Map("x81_quality_trim" -> 1.2)).isEmpty)
    // a regression back toward the r12 102 s plan disaster trips loudly
    assert(Bench.overBudget(Map("x81_quality_trim" -> 7.5))
      === Seq("x81_quality_trim"))
  }

  test("named pipeline budgets stay above their honest warm cost") {
    // x80 in bench gated mode runs 4 of 8 samples ≈ 16 s — budget 28
    assert(Bench.budgetFor("x80_cohort_gate") > 16.0)
    assert(Bench.budgetFor("x08_pipeline_gate") > 9.0)
    // q106 in bench gated mode runs 3 of 12 seeds ≈ 14 s — budget 20
    assert(Bench.budgetFor("q106_fuzz_gate") > 14.0)
  }

  test("row-selection policy (VERDICT r15 #1): default runs time engine " +
      "rows only; GRAFT_BENCH_GATES=1 times everything") {
    val all = Seq("q01_agg", "x85_dist_index_gate", "t19_bm25",
      "q106_fuzz_gate")
    assert(Bench.benchNames(all, gates = false) === Seq("q01_agg", "t19_bm25"))
    assert(Bench.benchNames(all, gates = true) === all)
  }

  test("artifact policy (VERDICT r15 #7): only the full gated unfiltered " +
      "run writes the canonical bench_out.json") {
    assert(Bench.artifactName(gates = true, filtered = false)
      === "bench_out.json")
    assert(Bench.artifactName(gates = false, filtered = false)
      === "bench_out_engine.json")
    // a name-filtered debug run can never clobber either full artifact
    assert(Bench.artifactName(gates = true, filtered = true)
      === "bench_out_partial.json")
    assert(Bench.artifactName(gates = false, filtered = true)
      === "bench_out_partial.json")
  }

  test("budget-violation retry: a violator re-measures once and the " +
      "better sample stands; clean queries never re-measure") {
    var measured = List.empty[String]
    val warm = Map("stalled" -> 9.0, "really_slow" -> 50.0, "fine" -> 0.5)
    val out = Bench.retryViolators(warm, { n =>
      measured ::= n
      if (n == "stalled") 1.0 else 48.0 // the stall clears; the slow stays
    }, _ => 2.0)
    assert(measured.sorted === List("really_slow", "stalled"))
    assert(out === Map("stalled" -> 1.0, "really_slow" -> 48.0))
    // merged view: the genuine regression still exceeds budget
    assert(Bench.overBudget(warm ++ out, _ => 2.0) === Seq("really_slow"))
    // a failed retry (-1) keeps the original sample, never the sentinel
    val kept = Bench.retryViolators(Map("q" -> 9.0), _ => -1.0, _ => 2.0)
    assert(kept === Map("q" -> 9.0))
  }

  test("warm-pass policy: gates run exactly one warm pass, engine rows " +
      "run all three (VERDICT r14 — the rc=124 fix)") {
    val names = Seq("q01_agg", "x85_dist_index_gate", "t19_bm25",
      "x87_cohort_merge_gate")
    // pass 1 measures everything — the single gate warm pass the budgets
    // are enforced on
    assert(Bench.warmPassNames(1, names) === names)
    // passes 2 and 3 skip the near-constant correctness plumbing
    for (p <- 2 to 3)
      assert(Bench.warmPassNames(p, names) === Seq("q01_agg", "t19_bm25"))
    // over the full 3-pass schedule: engine rows 3 warm samples, gates 1
    val counts = (1 to 3).flatMap(p => Bench.warmPassNames(p, names))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(counts === Map("q01_agg" -> 3, "t19_bm25" -> 3,
      "x85_dist_index_gate" -> 1, "x87_cohort_merge_gate" -> 1))
  }
}
