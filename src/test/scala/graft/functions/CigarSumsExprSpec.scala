package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CigarSumsExprSpec extends SparkSpec {

  private def sums(cigar: String): (Long, Long, Long, Long, Long, Long) = {
    import spark.implicits._
    Seq(cigar).toDF("c")
      .select(CigarSumsExpr.cigarSums(col("c")).as("s"))
      .select("s.ref_len", "s.read_len", "s.aligned", "s.clipped",
        "s.ins", "s.del")
      .as[(Long, Long, Long, Long, Long, Long)].head()
  }

  test("hand cases cover every op class") {
    // 3S 10M 2I 4D 1N 5=1X 2H: ref 10+4+1+5+1=21, read 3+10+2+5+1=21,
    // aligned 10+5+1=16, clipped 3+2=5, ins 2, del 4
    assert(sums("3S10M2I4D1N5=1X2H") === ((21L, 21L, 16L, 5L, 2L, 4L)))
    assert(sums("10M") === ((10L, 10L, 10L, 0L, 0L, 0L)))
    assert(sums("5P") === ((0L, 0L, 0L, 0L, 0L, 0L))) // padding consumes nothing
    assert(sums("*") === ((0L, 0L, 0L, 0L, 0L, 0L))) // CIGAR unavailable
    assert(sums("100S") === ((0L, 100L, 0L, 100L, 0L, 0L)))
  }

  test("equality with the HOF fold on the x12 corpus") {
    val native = graft.operators.MitoQueries
      .x12CigarKernel(spark, "/root/testdata/sf0.001").collect().toSeq
    val hof = graft.operators.MitoQueries
      .x12CigarKernelHof(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(native.map(_.toString) === hof.map(_.toString))
    assert(native.nonEmpty)
  }

  test("malformed CIGARs raise loudly (decoder-fuzz discipline)") {
    Seq("10", "M", "10M5", "10Q", "1.5M", "").foreach { bad =>
      val e = intercept[Exception](sums(bad))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("malformed CIGAR")),
        s"'$bad' must raise a malformed-CIGAR error, got: $e")
    }
  }
}
