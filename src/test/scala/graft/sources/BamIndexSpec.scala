package graft.sources

import graft.SparkSpec
import graft.mito.Sam
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class BamIndexSpec extends SparkSpec {

  /** Copy a fixture into a temp dir (so the .gai sidecar lands outside the
    * source tree) and build its index. */
  private def indexed(fixture: String): String = {
    val dir = Files.createTempDirectory("gai")
    val name = Paths.get(fixture).getFileName
    val dst = dir.resolve(name)
    Files.copy(Paths.get(resource(fixture).stripPrefix("file:")), dst)
    val n = BamIndex.build(dst.toString)
    assert(n > 1, "fixture should span several BGZF members")
    dst.toString
  }

  test("distributed index build == sequential, byte-for-byte, all split sizes") {
    for (fixture <- Seq("mito/sample_split.bam", "mito/sample_sorted.bam")) {
      val bam = indexed(fixture) // sequential sidecar
      val seqBytes = Files.readAllBytes(Paths.get(bam + ".gai"))
      // range sizes forcing many tasks (some mid-member, some mid-header)
      for (split <- Seq(32768L, 7001L)) {
        Files.delete(Paths.get(bam + ".gai"))
        val n = BamIndex.buildDistributed(spark, bam, split)
        assert(n > 1)
        val distBytes = Files.readAllBytes(Paths.get(bam + ".gai"))
        assert(java.util.Arrays.equals(distBytes, seqBytes),
          s"$fixture @ split=$split: distributed sidecar differs")
      }
    }
  }

  test("index positions splits exactly: indexed scan == unindexed, all split sizes") {
    val bam = indexed("mito/sample_split.bam")
    val plain = spark.read.format("bam")
      .load(resource("mito/sample_split.bam")) // no sidecar -> guesser path
    for (split <- Seq(32768, 4096)) {
      val viaIdx = spark.read.format("bam").option("splitsize", split).load(bam)
      assert(viaIdx.count() === 3000)
      val a = viaIdx.select("line")
      val b = plain.select("line")
      assert(a.except(b).isEmpty && b.except(a).isEmpty, s"splitsize=$split")
    }
  }

  test("pruned scan returns exactly the filtered records (sorted bam)") {
    val bam = indexed("mito/sample_sorted.bam")
    val full = Sam.read(spark, resource("mito/sample_sorted.sam"))
    for (pred <- Seq(
        col("referenceName") === "MT",
        col("referenceName") === "chr1" && col("start") >= 50000,
        col("start") < 300)) {
      val viaIdx = spark.read.format("bam").option("splitsize", 16384)
        .load(bam).where(pred).select("readName", "start", "referenceName")
      val expected = full.where(pred).select("readName", "start", "referenceName")
      assert(viaIdx.except(expected).isEmpty && expected.except(viaIdx).isEmpty,
        pred.toString)
      assert(viaIdx.count() === expected.count())
    }
  }

  test("index prunes members a sorted-scan predicate cannot match") {
    val bam = indexed("mito/sample_sorted.bam")
    val stats = BamIndex.read(bam)
    val refNames = Array("MT", "chr1")
    // members carrying records: MT block is ~1/3 of the file
    val withRecords = stats.filter(_.firstRecUoffset >= 0)
    val mtOnly = Seq(SamFilters.RefNameEq("MT"))
    val kept = withRecords.count(m => BamIndex.mayMatch(m, mtOnly, refNames))
    assert(kept < withRecords.length / 2,
      s"MT filter kept $kept of ${withRecords.length} members — no pruning?")
    val runs = BamIndex.selectRuns(stats, mtOnly, refNames, 0L, Long.MaxValue)
    assert(runs.nonEmpty && runs.length < withRecords.length / 4,
      s"expected few consecutive runs, got ${runs.length}")
    // a start-range predicate on the sorted coordinate also prunes
    val tail = Seq(SamFilters.RefNameEq("chr1"),
      SamFilters.IntCmp("start", ">=", 100000L))
    val keptTail = withRecords.count(m => BamIndex.mayMatch(m, tail, refNames))
    assert(keptTail < withRecords.length / 2)
  }

  test("unsorted bam: scattered keep/skip members stress the run machinery") {
    // sample_split.bam alternates MT/chr1 per record, so a refname filter
    // keeps and skips members in an interleaved pattern — many runs per
    // split, jumps landing mid-file, records straddling pruned members
    val bam = indexed("mito/sample_split.bam")
    val full = Sam.read(spark, resource("mito/sample_split.sam"))
    for {
      split <- Seq(1000, 7777, 32768)
      (name, pred) <- Seq(
        "mt" -> (col("referenceName") === "MT"),
        "mapq" -> (col("mapQ") >= 30),
        "both" -> (col("referenceName") === "chr1" && col("start") >= 8000))
    } {
      val viaIdx = spark.read.format("bam").option("splitsize", split)
        .load(bam).where(pred)
        .select("readName", "flag", "referenceName", "start")
      val expected = full.where(pred)
        .select("readName", "flag", "referenceName", "start")
      assert(viaIdx.count() === expected.count(), s"$name @ $split")
      assert(viaIdx.except(expected).isEmpty && expected.except(viaIdx).isEmpty,
        s"$name @ $split")
    }
  }

  test("referenceName='*' (unmapped, refId -1) prunes by range, not to zero") {
    val refNames = Array("MT", "chr1")
    val unmappedOnly = BamIndex.MemberStat(0L, 0, -1, -1, -1, -1)
    val mapped = BamIndex.MemberStat(100L, 0, 0, 1, 10, 20)
    val star = Seq(SamFilters.RefNameEq("*"))
    assert(BamIndex.mayMatch(unmappedOnly, star, refNames))
    assert(!BamIndex.mayMatch(mapped, star, refNames))
    assert(!BamIndex.mayMatch(mapped, Seq(SamFilters.RefNameEq("chrZ")), refNames))
  }

  test("a stale sidecar is ignored (falls back to the guesser, still exact)") {
    val bam = indexed("mito/sample_split.bam")
    assert(BamIndex.exists(bam))
    // rewrite the BAM after indexing -> index must be considered unusable
    val bytes = Files.readAllBytes(Paths.get(bam))
    Thread.sleep(1100) // mtime resolution
    Files.write(Paths.get(bam), bytes)
    assert(!BamIndex.exists(bam))
    val df = spark.read.format("bam").option("splitsize", 32768).load(bam)
    assert(df.count() === 3000) // guesser path still exact
  }

  test("record-less header members are never selected") {
    val bam = indexed("mito/sample_sorted.bam")
    val stats = BamIndex.read(bam)
    assert(stats.head.offset === 0L)
    // every selected run starts at a member with a real first-record offset
    val runs = BamIndex.selectRuns(stats, Nil, Array("MT", "chr1"), 0L, Long.MaxValue)
    runs.foreach { case (off, u, _) =>
      val m = stats.find(_.offset == off).get
      assert(u === m.firstRecUoffset && u >= 0)
    }
  }
}
