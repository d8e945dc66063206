package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BedSpec extends SparkSpec {
  import spark.implicits._

  test("bed write sorts, read skips headers/comments and parses leniently") {
    val ivs = Seq(
      ("chrM", 30L, 40L, "b"), ("chr1", 10L, 20L, "a"),
      ("chr1", 5L, 9L, "c"))
      .toDF("contig", "start", "end", "name")
    val dir = java.nio.file.Files.createTempDirectory("bed").toString
    val out = s"$dir/t.bed"
    Bed.write(ivs, out, header = Seq("track name=test", "# a comment"),
      numPartitions = 2)
    val lines = scala.io.Source.fromFile(out).getLines().toSeq
    assert(lines === Seq("track name=test", "# a comment",
      "chr1\t5\t9\tc", "chr1\t10\t20\ta", "chrM\t30\t40\tb"),
      "records sorted by (contig, start), header first")
    val back = Bed.read(spark, out)
      .as[(String, Long, Long, String)].collect().toSet
    assert(back === Set(("chr1", 5L, 9L, "c"), ("chr1", 10L, 20L, "a"),
      ("chrM", 30L, 40L, "b")))
  }

  test("bed read: 3-column files give null name, malformed coords go null") {
    val dir = java.nio.file.Files.createTempDirectory("bed2")
    val p = dir.resolve("m.bed")
    java.nio.file.Files.writeString(p,
      "browser position chr1\nchr1\t1\t5\n\nchr2\tXX\t9\nchr3\t2\t8\tgene1\n")
    val back = Bed.read(spark, p.toString, strict = false)
      .as[(String, Option[Long], Option[Long], Option[String])]
      .collect().toSet
    assert(back === Set(
      ("chr1", Some(1L), Some(5L), None),
      ("chr2", None, Some(9L), None), // lenient: bad field -> null, row kept
      ("chr3", Some(2L), Some(8L), Some("gene1"))))
    // strict (the default): the same damaged line raises loudly
    val e = intercept[Throwable] {
      Bed.read(spark, p.toString).collect()
    }
    var root: Throwable = e
    while (root.getCause != null) root = root.getCause
    assert(root.getMessage.contains("malformed BED line"), root.toString)
  }
}
