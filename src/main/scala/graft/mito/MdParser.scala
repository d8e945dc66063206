package graft.mito

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import scala.collection.mutable.ArrayBuffer

/** SAM MD-tag → substitution variants.
  *
  * Hand-rolled scanner with the *intended* semantics of the reference's
  * parser-combinator grammar (`MDParser.scala:26-118`, invoked
  * `Feature.scala:101-109`), with the documented defects corrected
  * (SURVEY §2.11):
  *  - B3: positions are genome-absolute — `alignmentStart + refOffset` —
  *    not read-relative (reference started every read at 0);
  *  - B4: a deletion advances the reference cursor by the number of
  *    deleted bases (reference also counted the '^');
  *  - B9: 'N' read bases are skipped case-insensitively.
  *
  * Input convention matches the reference's pipeline (`samtools calmd -e`):
  * matching read bases are encoded '=', mismatches/insertions keep the
  * read base. A match run of length n therefore advances the read cursor
  * past n '=' characters, stepping over any interleaved inserted bases
  * (the reference's `=`-counting rule, `MDParser.scala` match production).
  *
  * Malformed MD strings throw (reference `Feature.scala:107`,
  * `MDParser.scala:59`) — call after the validity filter.
  */
object MdParser {

  def variants(sequence: String, md: String, alignmentStart: Int): Array[String] = {
    if (md == null || md.isEmpty) return Array.empty
    val seq = if (sequence == null) "" else sequence
    val out = new ArrayBuffer[String](4)
    var refOff = 0  // 0-based offset from alignmentStart
    var read = 0    // cursor into seq
    var i = 0
    val n = md.length

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed MD '$md' at $i: $msg")

    while (i < n) {
      val c = md.charAt(i)
      if (c >= '0' && c <= '9') {
        var run = 0
        while (i < n && md.charAt(i) >= '0' && md.charAt(i) <= '9') {
          run = run * 10 + (md.charAt(i) - '0'); i += 1
        }
        // advance read past `run` matched ('=') bases, stepping over
        // inserted (non-'=') bases
        var seen = 0
        while (seen < run) {
          if (read >= seq.length) fail(s"sequence exhausted in match run of $run")
          if (seq.charAt(read) == '=') seen += 1
          read += 1
        }
        refOff += run
      } else if (c == '^') {
        i += 1
        val delStart = i
        while (i < n && isBase(md.charAt(i))) i += 1
        if (i == delStart) fail("empty deletion")
        refOff += i - delStart  // B4 fix: only the deleted bases
        // deletion consumes no read bases
      } else if (isBase(c)) {
        // substitution: reference base is c; read base sits at the cursor
        // (skip inserted bases: with calmd -e the substituted read base is
        // the next non-'=' base)
        while (read < seq.length && seq.charAt(read) == '=') read += 1
        if (read >= seq.length) fail("sequence exhausted at substitution")
        val rb = seq.charAt(read)
        if (rb != 'N' && rb != 'n')  // B9 fix: case-insensitive skip
          out += s"${alignmentStart + refOff}$rb"
        read += 1
        refOff += 1
        i += 1
      } else fail(s"unexpected character '$c'")
    }
    out.toArray
  }

  private def isBase(c: Char): Boolean = c match {
    case 'A' | 'C' | 'G' | 'T' | 'N' | 'a' | 'c' | 'g' | 't' | 'n' => true
    case _ => false
  }

  /** Column form: md_variants(sequence, md, start) -> array<string>. */
  val mdVariantsUdf: UserDefinedFunction =
    udf((seq: String, md: String, start: Int) => variants(seq, md, start))

  def mdVariants(sequence: Column, md: Column, start: Column): Column =
    mdVariantsUdf(sequence, md, start)
}
