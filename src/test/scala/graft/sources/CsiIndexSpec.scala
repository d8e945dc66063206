package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class CsiIndexSpec extends SparkSpec {

  /** Copy a fixture into a temp dir and build ONLY a `.csi` for it. */
  private def csiIndexed(fixture: String, minShift: Int = 14,
      depth: Int = 5): String = {
    val dir = Files.createTempDirectory("csi")
    val name = Paths.get(fixture).getFileName
    val dst = dir.resolve(name)
    Files.copy(Paths.get(resource(fixture).stripPrefix("file:")), dst)
    val n = CsiIndex.build(dst.toString, HadoopIO.driverConf(),
      minShift = minShift, depth = depth)
    assert(n === 3000)
    dst.toString
  }

  test("generalized binning at (14,5) reproduces BAI's bin numbers") {
    // anchors from the BAI table, via the parameterized formulas
    assert(CsiIndex.reg2bin(0L, 1L, 14, 5) === 4681)
    assert(CsiIndex.reg2bin(16384L, 16385L, 14, 5) === 4682)
    assert(CsiIndex.reg2bin(0L, 16385L, 14, 5) === 585)
    assert(CsiIndex.reg2bin(0L, 1L << 29, 14, 5) === 0)
    assert(CsiIndex.reg2bins(0L, 16384L, 14, 5).toSet ===
      BaiIndex.reg2bins(0, 16384).toSet)
    // a fuzz sweep: every (beg,end) agrees with BAI's fixed-scheme math
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val beg = rnd.nextInt(1 << 29)
      val end = beg + 1 + rnd.nextInt(1 << 20)
      assert(CsiIndex.reg2bin(beg.toLong, end.toLong, 14, 5) ===
        BaiIndex.reg2bin(beg, math.min(end, 1 << 29)))
      assert(CsiIndex.reg2bins(beg.toLong, end.toLong, 14, 5).toSet ===
        BaiIndex.reg2bins(beg, end).toSet)
    }
    // deeper schemes address longer contigs
    assert(CsiIndex.maxPos(14, 6) === Int.MaxValue) // 2^32 clamps to int32
    assert(CsiIndex.maxPos(12, 5) === (1 << 27))
  }

  test("default-parameter CSI plans the same member runs as the BAI") {
    val bam = csiIndexed("mito/sample_sorted.bam")
    BaiIndex.build(bam, HadoopIO.driverConf())
    val csi = CsiIndex.read(bam)
    assert(csi.minShift === 14 && csi.depth === 5 && csi.noCoor === 0L)
    val bai = BaiIndex.read(bam)
    for ((refId, beg, end) <- Seq((0, 0, 16569), (1, 49999, 90000),
        (1, 60000, 60001), (0, 100, 300))) {
      val viaCsi = BaiIndex.memberRuns(CsiIndex.chunks(csi, refId, beg, end))
      val viaBai = BaiIndex.memberRuns(BaiIndex.chunks(bai, refId, beg, end))
      assert(viaCsi === viaBai, s"region $refId:[$beg,$end)")
    }
  }

  test("csi-pruned scan returns exactly the filtered records, all split sizes") {
    for (params <- Seq((14, 5), (12, 6))) { // default + a nonstandard scheme
      val bam = csiIndexed("mito/sample_sorted.bam", params._1, params._2)
      val full = spark.read.format("bam").load(resource("mito/sample_sorted.bam"))
        .select("readName", "start", "referenceName")
      for (pred <- Seq(
          col("referenceName") === "MT",
          col("referenceName") === "chr1" && col("start") >= 50000,
          col("referenceName") === "chr1" &&
            col("start") >= 60000 && col("start") < 90000))
        for (split <- Seq(1 << 20, 4096)) {
          val viaCsi = spark.read.format("bam").option("splitsize", split)
            .load(bam).where(pred).select("readName", "start", "referenceName")
          val expected = full.where(pred)
          assert(viaCsi.except(expected).isEmpty &&
            expected.except(viaCsi).isEmpty, s"$params $pred @ split=$split")
          assert(viaCsi.count() === expected.count(),
            s"$params $pred @ split=$split")
        }
    }
  }

  test("csi region runs span a minority of the file for a one-ref query") {
    val bam = csiIndexed("mito/sample_sorted.bam")
    val csi = CsiIndex.read(bam)
    val fileLen = Files.size(Paths.get(bam))
    val runs = BaiIndex.memberRuns(
      CsiIndex.chunks(csi, 0, 0, CsiIndex.maxPos(14, 5)))
    assert(runs.nonEmpty)
    val kept = runs.map { case (b, _, e) => math.min(e, fileLen) - b }.sum
    assert(kept * 2 < fileLen, s"MT runs span $kept of $fileLen bytes")
  }

  test("index precedence: .bai before .csi, .gai before both") {
    val bam = csiIndexed("mito/sample_sorted.bam")
    // with only the .csi present, the region scan must already work
    val q = spark.read.format("bam").load(bam)
      .where(col("referenceName") === "MT")
    assert(q.count() === 1000)
    assert(!BaiIndex.exists(bam, HadoopIO.driverConf()))
    assert(CsiIndex.exists(bam, HadoopIO.driverConf()))
  }

  test("x07 gate: .csi-only non-default scheme matches lineitem arithmetic") {
    import graft.operators.MitoQueries
    val sf = "/root/testdata/sf0.001"
    val r = MitoQueries.x07CsiRegionGate(spark, sf).head()
    assert(r.getAs[Boolean]("pruned_ok"),
      ".csi region runs spanned half the sorted file or more")
    val expected = graft.Tables.lineitem(spark, sf)
      .where(col("l_orderkey") % 4 === 1 &&
        ((col("l_partkey") * 613) % 160000 + 1).between(100001, 130000))
      .agg(count(lit(1)), sum(col("l_quantity").cast("int"))).head()
    assert(r.getLong(0) === expected.getLong(0))
    assert(r.getLong(1) === expected.getLong(1))
    // neither a .gai nor a .bai may exist — the gate must have planned
    // through the generalized-scheme CSI alone
    val out = s"${HadoopIO.scratchDir(spark)}/graft_x07_" +
      sf.replaceAll("[^A-Za-z0-9]", "_") + ".bam"
    assert(!BamIndex.exists(out, HadoopIO.driverConf()))
    assert(!BaiIndex.exists(out, HadoopIO.driverConf()))
    assert(CsiIndex.exists(out, HadoopIO.driverConf()))
  }

  test("distributed csi build == sequential, byte-for-byte, both " +
      "default and non-default schemes") {
    for ((ms, dp) <- Seq((14, 5), (12, 6))) {
      val bam = csiIndexed("mito/sample_sorted.bam", ms, dp)
      val seqBytes = Files.readAllBytes(Paths.get(bam + ".csi"))
      for (split <- Seq(32768L, 7001L)) {
        Files.delete(Paths.get(bam + ".csi"))
        val n = CsiIndex.buildDistributed(spark, bam, split, ms, dp)
        assert(n === 3000, s"record count at split $split scheme ($ms,$dp)")
        assert(java.util.Arrays.equals(
          Files.readAllBytes(Paths.get(bam + ".csi")), seqBytes),
          s"distributed .csi differs at split $split scheme ($ms,$dp)")
      }
      // and the distributed sidecar still drives a correct pruned scan:
      // indexed region count == the same query with the sidecar removed
      def regionCount() = spark.read.format("bam").option("splitsize", 7001)
        .load(bam).where(col("referenceName") === "MT" &&
          col("start") >= 2000 && col("start") < 9000).count()
      val indexed = regionCount()
      Files.delete(Paths.get(bam + ".csi"))
      assert(indexed === regionCount(),
        s"indexed region scan diverged from the unindexed scan ($ms,$dp)")
    }
  }

  test("build refuses an unsorted BAM and an overflowing scheme loudly") {
    val dir = Files.createTempDirectory("csi")
    val dst = dir.resolve("sample_split.bam")
    Files.copy(
      Paths.get(resource("mito/sample_split.bam").stripPrefix("file:")), dst)
    val e = intercept[IllegalArgumentException](
      CsiIndex.build(dst.toString, HadoopIO.driverConf()))
    assert(e.getMessage.contains("not coordinate-sorted"))
    // chr1 positions (~50k-106k) overflow a (12,1) scheme's 2^15 cap
    val dst2 = dir.resolve("sample_sorted.bam")
    Files.copy(
      Paths.get(resource("mito/sample_sorted.bam").stripPrefix("file:")), dst2)
    val e2 = intercept[IllegalArgumentException](
      CsiIndex.build(dst2.toString, HadoopIO.driverConf(),
        minShift = 12, depth = 1))
    assert(e2.getMessage.contains("cap"))
  }
}
