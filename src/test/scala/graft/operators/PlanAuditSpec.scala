package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Registry-wide optimized-plan sweep for the VERDICT r12 x81 failure
  * class: CollapseProject inlining a per-row array builder into a
  * downstream higher-order-function lambda, multiplying the builder per
  * element while staying hash-green. The planted-offender negative test
  * (the verbatim r12 kernel tripping the audit) lives in
  * QualityTrimExprSpec. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no registered query's optimized plan embeds an array builder " +
      "inside a higher-order-function lambda") {
    // parallel plan construction (parSweep): the audit only builds and
    // inspects optimized plans — driver-side planning, thread-safe per
    // query — so the registry-wide sweep overlaps instead of serializing.
    // The eager mito pipeline gates assert/increment the global Ld/Numt
    // load counters during construction (see OperatorsSpec), so they run
    // serially afterwards.
    val dimCounterGates = Set("x80_cohort_gate", "x08_pipeline_gate",
      "x09_compressed_pipeline_gate", "x10_cv_gate")
    val found = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def audit(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) =>
          org.apache.spark.sql.DataFrame): Unit = {
      val hits = PlanAudit.inlinedArrayBuilders(fn(spark, sf))
      if (hits.nonEmpty) found.add(s"$name -> ${hits.mkString("; ")}")
    }
    val (serial, par) = SparkEntry.queries.toSeq.sortBy(_._1)
      .partition(q => dimCounterGates(q._1))
    parSweep(par) { case (name, fn) => audit(name, fn) }
    serial.foreach { case (name, fn) => audit(name, fn) }
    val offenders = found.toArray(Array.empty[String]).toSeq.sorted
    assert(offenders.isEmpty,
      "inlined-builder offenders:\n" + offenders.mkString("\n"))
  }
}
