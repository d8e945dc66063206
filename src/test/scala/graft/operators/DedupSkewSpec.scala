package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** d11's 100 TB claim is about the physical shuffles, which neither the
  * oracle nor the gate row can see: candidate generation must spread over
  * uniform band keys and the keep join over uniform doc_id hashes — no
  * hot reducer anywhere in the wired pipeline (q34 technique). */
class DedupSkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Reducer partition sizes with AQE coalescing off and a partition count
    * small enough that per-partition means are statistically stable at
    * this corpus size (at real scale partitions sit far above the advisory
    * size and coalescing never engages). */
  private def partitionSizes(mkDf: => org.apache.spark.sql.DataFrame): Array[Long] = {
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val prevCoalesce = spark.conf.get(coalesceKey)
    val prevParts = spark.conf.get(partsKey)
    spark.conf.set(coalesceKey, "false")
    spark.conf.set(partsKey, "8")
    try mkDf.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect()
    finally {
      spark.conf.set(coalesceKey, prevCoalesce)
      spark.conf.set(partsKey, prevParts)
    }
  }

  private def assertBalanced(what: String, sizes: Array[Long]): Unit = {
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.max <= 2 * mean,
      s"$what unbalanced: max ${sizes.max} vs mean $mean (${sizes.mkString(",")})")
  }

  test("d11 kept output: no reducer partition exceeds 2x the mean") {
    assertBalanced("d11 keep join", partitionSizes(
      Dedup.nearDedupKeep(graft.Tables.documents(spark, sf), 0.8)))
  }

  test("d03 band-key candidate shuffle: no reducer partition exceeds 2x the mean") {
    // the skew-prone stage of the wired pipeline — candidates come out of
    // the band-bucket self-join, so a hot band key would surface here
    assertBalanced("band-key candidates", partitionSizes(
      Dedup.d03MinhashLsh(spark, sf)))
  }

  test("99%-one-language corpus: bands stay balanced where (lang, source) blocking degenerates") {
    import spark.implicits._
    // the adversarial shape for METADATA blocking (d02's oracle kernel):
    // one (lang, source) group holds 99% of the corpus, so the blocked
    // self-join funnels ~n²/2 pairs through the reducer owning that one
    // key. Band keys hash CONTENT, not metadata — d11's candidate stage
    // keeps its uniform spread on the same corpus. Docs come in
    // near-duplicate pairs (seeded text, partner differs by a suffix
    // token) so the band join produces real candidates, not a vacuously
    // empty frame.
    val n = 1000
    val rows = (0 until n).map { i =>
      val rnd = new scala.util.Random((i / 2) * 9973L + 17)
      val base = Seq.fill(40)(rnd.alphanumeric.take(6).mkString).mkString(" ")
      val text = if (i % 2 == 1) base + " zz" else base
      val lang = if (i < 990) "xx" else s"l${i % 5}"
      (i.toLong, text, lang, "s0", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("d11skew").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the metadata-blocked pair frame (d02's join shape) degenerates:
    // virtually every pair lands in the one ("xx","s0") reducer
    val docs = graft.Tables.documents(spark, dir)
    val a = docs.select(col("lang"), col("source"), col("doc_id").as("a_id"))
    val b = docs.select(col("lang"), col("source"), col("doc_id").as("b_id"))
    // the merge hint forces the shuffle-by-key plan d02 has at real scale
    // (tiny test frames would otherwise broadcast and hide the funnel)
    val blockedSizes = partitionSizes(
      a.hint("merge").join(b, Seq("lang", "source"))
        .where(col("a_id") < col("b_id")))
    val blockedMean = blockedSizes.sum.toDouble / blockedSizes.length
    assert(blockedSizes.max > 2 * blockedMean,
      s"expected the metadata-blocked join to degenerate, " +
        s"got ${blockedSizes.mkString(",")}")
    // the band-keyed candidate stage and the wired keep join stay flat
    val cands = Dedup.d03MinhashLsh(spark, dir)
    assert(cands.count() >= (n / 2) * 9 / 10,
      "planted near-dup pairs must produce real candidates")
    assertBalanced("band-key candidates (skewed corpus)",
      partitionSizes(cands))
    assertBalanced("d11 keep join (skewed corpus)",
      partitionSizes(Dedup.nearDedupKeep(docs, 0.8)))
  }
}
