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
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val hits = PlanAudit.inlinedArrayBuilders(fn(spark, sf))
        if (hits.isEmpty) None else Some(s"$name -> ${hits.mkString("; ")}")
    }
    assert(offenders.isEmpty,
      "inlined-builder offenders:\n" + offenders.mkString("\n"))
  }
}
