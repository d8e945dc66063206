package graft.mito

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {

  lazy val numts = Numt.load(spark, resource("mito/numts.tsv"))
  lazy val ld = Ld.load(spark, resource("mito/ld.tsv"))
  lazy val nt = Features.ntFeatures(Sam.read(spark, resource("mito/sample_NT.sam")), numts)
  lazy val mtAlign = Sam.read(spark, resource("mito/sample_MT_MD.sam"))

  test("LD load: headerless (B2 fix), quantized, zeros dropped") {
    val rows = ld.collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(rows.size === 3) // two ~0 rows quantize to 0 and drop
    assert(rows(("7G", "11C")) === 50000)
    assert(rows(("105T", "7G")) === -20000)
    assert(rows(("5C", "6T")) === 30000) // first line NOT eaten as header
  }

  test("LD symmetric lookup") {
    val m = Ld.toMap(ld)
    assert(Ld.lookup(m, "7G", "11C") === 50000)
    assert(Ld.lookup(m, "11C", "7G") === 50000)
    assert(Ld.lookup(m, "7G", "105T") === -20000)
    assert(Ld.lookup(m, "7G", "999Z") === 0)
  }

  test("NUMT interval overlap (B7 fix: bounds respected)") {
    val iv = numts
    import spark.implicits._
    val reads = Seq(
      ("chr1", 120, "ACGTACGTAC"), // overlaps [100,200] only -> 10
      ("chr1", 160, "ACGTACGTAC"), // overlaps both chr1 intervals -> 15
      ("chr1", 350, "ACGTACGTAC"), // past both -> 0
      ("chr2", 550, "ACGTACGTAC"), // chr2 interval -> 7
      ("chr3", 550, "ACGTACGTAC")  // wrong chromosome -> 0
    ).toDF("referenceName", "start", "sequence")
    val got = reads.select(col("start"), col("referenceName"),
      Numt.overlapScore(iv).as("s")).collect()
      .map(r => (r.getString(1), r.getInt(0)) -> r.getInt(2)).toMap
    assert(got(("chr1", 120)) === 10)
    assert(got(("chr1", 160)) === 15)
    assert(got(("chr1", 350)) === 0)
    assert(got(("chr2", 550)) === 7)
    assert(got(("chr3", 550)) === 0)
  }

  test("NT features: intended column mapping (B1 fix), per-read sums") {
    val rows = nt.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // r1: mapQ 60+40, NH 2+1, NM 1+0, numt 10+15
    assert(rows("r1") === ((100L, 3L, 1L, 25L)))
    // r2: mapQ 35+5, NH 1+1, NM 2+0, numt 0+7
    assert(rows("r2") === ((40L, 2L, 2L, 7L)))
    // r6 valid in NT -> present here, dropped later by the inner feature join
    assert(rows.contains("r6"))
  }

  test("MT per-read aggregation: sums + sorted flattened variants") {
    val rows = Features.mtPerRead(mtAlign).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getSeq[String](4))).toMap
    assert(rows("r1")._1 === 50L) // 30+20
    assert(rows("r1")._2 === 3L)  // NH 1+2
    assert(rows("r1")._3 === 3L)  // NM 2+1
    assert(rows("r1")._4 === Seq("105T", "11C", "7G")) // sorted
    assert(rows("r2")._1 === 50L)
    assert(rows("r2")._4 === Seq("9A"))
    assert(!rows.contains("r3") && !rows.contains("r4") && !rows.contains("r5"))
  }

  test("LD pair scoring: broadcast (faithful) == join (scalable) == hand value") {
    val bc = spark.sparkContext.broadcast(Ld.toMap(ld))
    val viaBroadcast = Features.mtFeaturesBroadcast(mtAlign, bc)
      .select("Read", "LD").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val viaJoin = Features.mtFeaturesJoin(mtAlign, ld)
      .select("Read", "LD").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // r1 pairs: (7G,11C)=50000, (7G,105T)=-20000 sym, (11C,105T)=0 -> 30000
    assert(viaBroadcast("r1") === 30000)
    assert(viaBroadcast("r2") === 0) // single variant, no pairs
    assert(viaBroadcast === viaJoin)
  }

  test("combinations(2) semantics: duplicate variants across mates collapse") {
    // both mates of rD report 7G (an overlapping read pair sharing a SNP);
    // reference computeR uses variants.flatten.combinations(2), which
    // yields DISTINCT pair-multisets: {7G,11C} once (not twice), plus the
    // self-pair {7G,7G} (absent from the LD table -> 0)
    import spark.implicits._
    val lines = Seq(
      // MD 2A7: read base G at start+2 -> variant (start+2)G = 7G for start 5
      "rD\t99\tchrM\t5\t30\t10M\t=\t0\t0\t==G=======\t*\tNM:i:1\tNH:i:1\tMD:Z:2A7",
      // mate: same variant 7G (start 5, MD 2A7) AND 11C (via MD 6T3 at start 5 -> pos 11, base C)
      "rD\t147\tchrM\t5\t20\t10M\t=\t0\t0\t==G===C===\t*\tNM:i:2\tNH:i:1\tMD:Z:2A3T3"
    ).toDF("value")
    val align = Sam.parse(lines.select(col("value")))
    val perRead = Features.mtPerRead(align)
    val vs = perRead.head().getSeq[String](4)
    assert(vs.sorted === Seq("11C", "7G", "7G")) // duplicate preserved in the list
    // LD table: (7G,11C)=50000. Old i<j-with-multiplicity would give
    // 2*50000; combinations(2) gives 50000.
    val bc = spark.sparkContext.broadcast(Ld.toMap(ld))
    val viaBroadcast = Features.mtFeaturesBroadcast(align, bc)
      .select("Read", "LD").head().getInt(1)
    val viaJoin = Features.mtFeaturesJoin(align, ld)
      .select("Read", "LD").head().getInt(1)
    assert(viaBroadcast === 50000)
    assert(viaJoin === 50000)
  }

  test("mtFeaturesJoin evaluates the per-read aggregation once (cached)") {
    val out = Features.mtFeaturesJoin(mtAlign, ld)
    out.count() // materialize (populates the cache)
    val plan = out.queryExecution.executedPlan.toString
    // both branches must read the per-read aggregate from the cache, not
    // re-run scan->parse->aggregate
    assert(plan.contains("InMemoryTableScan"), plan.take(2000))
  }

  test("feature join is inner (reads missing on either side drop) + label") {
    val bc = spark.sparkContext.broadcast(Ld.toMap(ld))
    val mt = Features.mtFeaturesBroadcast(mtAlign, bc)
    val ff = Features.featureFrame(mt, nt, label = 0.5)
    val reads = ff.select("Read").collect().map(_.getString(0)).sorted
    assert(reads.toSeq === Seq("r1", "r2")) // r6 (NT-only) dropped
    assert(ff.select("label").distinct().head().getDouble(0) === 0.5)
    assert(ff.columns.sorted.toSeq === Seq("LD", "MTEditDist", "MTMapQ",
      "MTNumAlignments", "NTEditDist", "NTMapQ", "NTNumAlignments",
      "NTScore", "Read", "label"))
  }

  test("normalizeMapQ: pooled z-transform over both MapQ columns") {
    val bc = spark.sparkContext.broadcast(Ld.toMap(ld))
    val ff = Features.featureFrame(
      Features.mtFeaturesBroadcast(mtAlign, bc), nt, 0.5)
    val norm = Features.normalizeMapQ(ff)
    // pooled values: MT 50,50; NT 100,40 -> mean 60, sd sample
    val pooled = Seq(50.0, 50.0, 100.0, 40.0)
    val mu = pooled.sum / 4
    val sd = math.sqrt(pooled.map(x => (x - mu) * (x - mu)).sum / 3)
    val got = norm.where(col("Read") === "r1")
      .select("MTMapQ", "NTMapQ").head()
    assert(math.abs(got.getDouble(0) - (50 - mu) / sd) < 1e-12)
    assert(math.abs(got.getDouble(1) - (100 - mu) / sd) < 1e-12)
  }
}
