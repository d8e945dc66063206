package graft.mito

import org.scalatest.funsuite.AnyFunSuite

class MdParserSpec extends AnyFunSuite {

  test("pure match run emits no variants") {
    assert(MdParser.variants("========", "8", 1).isEmpty)
  }

  test("substitutions are genome-absolute (start + offset)") {
    // fixture r1/1: start 5, MD 2A3T3, seq ==G===C===
    assert(MdParser.variants("==G===C===", "2A3T3", 5).toSeq === Seq("7G", "11C"))
    // same read at a different start shifts positions (B3 fix)
    assert(MdParser.variants("==G===C===", "2A3T3", 100).toSeq === Seq("102G", "106C"))
  }

  test("deletion advances reference cursor by deleted bases only (B4 fix)") {
    // 2 match, del of ACG, 1 match, sub at refOff 2+3+1=6
    assert(MdParser.variants("==" + "=" + "T", "2^ACG1A0", 1).toSeq === Seq("7T"))
  }

  test("N read bases skipped case-insensitively (B9 fix)") {
    assert(MdParser.variants("N=", "0A1", 1).isEmpty)
    assert(MdParser.variants("n=", "0A1", 1).isEmpty)
    assert(MdParser.variants("G=", "0A1", 1).toSeq === Seq("1G"))
  }

  test("zero-length match runs (0A0 form)") {
    assert(MdParser.variants("GT", "0A0C0", 1).toSeq === Seq("1G", "2T"))
  }

  test("insertions: read bases not counted in match runs are stepped over") {
    // calmd -e: 3 matched '=', 2 inserted bases (real chars), 2 more matches,
    // then a substitution. MD sees only reference-aligned bases: 5 match + sub.
    assert(MdParser.variants("===AC==G", "5T0", 10).toSeq === Seq("15G"))
  }

  test("fixture r2: leading sub (N, skipped), deletion, then sub") {
    assert(MdParser.variants("N====A=", "0A2^ACG2T1", 1).toSeq === Seq("9A"))
  }

  test("malformed MD throws (reference Feature.scala:107 contract)") {
    intercept[IllegalArgumentException](MdParser.variants("==", "2X", 1))
    intercept[IllegalArgumentException](MdParser.variants("==", "5", 1)) // seq too short
    intercept[IllegalArgumentException](MdParser.variants("=", "^", 1))  // empty deletion
  }

  test("property: variant positions are non-decreasing and >= start (500 random MDs)") {
    val rnd = new scala.util.Random(42)
    val bases = "ACGT"
    (1 to 500).foreach { _ =>
      // MD grammar: number ((subst | deletion) number)*
      val md = new StringBuilder
      val seq = new StringBuilder
      def run(): Unit = {
        val n = rnd.nextInt(9)
        md.append(n); seq.append("=" * n)
      }
      run()
      (1 to rnd.nextInt(6)).foreach { _ =>
        if (rnd.nextBoolean()) { // substitution
          md.append(bases(rnd.nextInt(4)))
          seq.append(bases(rnd.nextInt(4)))
        } else {                 // deletion
          md.append("^").append("C" * (1 + rnd.nextInt(3)))
        }
        run()
      }
      val start = 1 + rnd.nextInt(1000)
      val vs = MdParser.variants(seq.toString, md.toString, start)
      val positions = vs.map(_.init.toInt).toSeq
      assert(positions === positions.sorted, s"md=$md seq=$seq")
      assert(positions.forall(_ >= start), s"md=$md seq=$seq")
    }
  }
}
