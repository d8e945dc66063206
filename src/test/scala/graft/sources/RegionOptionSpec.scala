package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** The samtools-style `region` read-option grammar (pure parser tests —
  * ADVICE r15: contig names may legally contain ':', so range parsing
  * must fall back to a whole-contig query instead of refusing, and the
  * `{contig}` brace escape must express such names unambiguously). */
class RegionOptionSpec extends AnyFunSuite {

  private def parse(v: String): Seq[(String, Long, Long)] =
    SamDataSource.regionsOption(
      new CaseInsensitiveStringMap(Map("region" -> v).asJava))

  test("plain forms: contig, contig:beg-end, comma list") {
    assert(parse("chr1") === Seq(("chr1", 1L, Long.MaxValue)))
    assert(parse("chr1:100-200") === Seq(("chr1", 100L, 200L)))
    assert(parse("chr1:100-200,chr2") ===
      Seq(("chr1", 100L, 200L), ("chr2", 1L, Long.MaxValue)))
  }

  test("a ':'-bearing contig name falls back to a whole-contig query " +
      "when the tail is not a numeric range") {
    assert(parse("HLA-A*01:01") === Seq(("HLA-A*01:01", 1L, Long.MaxValue)))
    assert(parse("HLA-DRB1*13:01:01") ===
      Seq(("HLA-DRB1*13:01:01", 1L, Long.MaxValue)))
    // half-open / non-numeric tails are contig characters, not ranges
    assert(parse("c0:9-") === Seq(("c0:9-", 1L, Long.MaxValue)))
    assert(parse("c0:a-b") === Seq(("c0:a-b", 1L, Long.MaxValue)))
  }

  test("{contig} escape: bare and ranged") {
    assert(parse("{HLA-A*01:01}") ===
      Seq(("HLA-A*01:01", 1L, Long.MaxValue)))
    assert(parse("{HLA-A*01:01}:100-200") ===
      Seq(("HLA-A*01:01", 100L, 200L)))
    // a numeric-looking suffix PARSES as a range on the unbraced form,
    // so the escape is the only way to name such a contig whole
    assert(parse("{c1:5-9}") === Seq(("c1:5-9", 1L, Long.MaxValue)))
    assert(parse("c1:5-9") === Seq(("c1", 5L, 9L)))
  }

  test("loud refusals survive the fallback: bad bounds, empty elements, " +
      "broken escapes, overflow") {
    for (bad <- Seq("c0:20-10", "c0:0-5", "a,,b", "", "{c0",
        "{c0}:x-y", "{c0}100-200", "c0:99999999999999999999-9" +
        "9999999999999999999"))
      intercept[IllegalArgumentException](parse(bad))
  }
}
