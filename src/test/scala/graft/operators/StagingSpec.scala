package graft.operators

import graft.SparkSpec
import graft.sources.HadoopIO

/** Freshness contracts of the scratch-staged layouts (ADVICE r3 #3/#4):
  * build-once artifacts (s07's cell-bucketed corpus, q35's streamed
  * events copy) must be reused while the source is unchanged and REBUILT
  * the moment the source dataset is regenerated — a stale layout answers
  * with the previous corpus and flips driver gates for the wrong reason. */
class StagingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def conf = spark.sparkContext.hadoopConfiguration

  test("s07 bucketed corpus: reused while fresh, rebuilt on regeneration, dropped by rebuildIvfIndex") {
    val tmp = java.nio.file.Files.createTempDirectory("s07re").toString
    HadoopIO.copy(s"$sf/embeddings.parquet", s"$tmp/embeddings.parquet", conf)
    val r1 = Similarity.ivfBucketedTopK(spark, tmp).collect()
    assert(r1.nonEmpty)
    val success = s"${HadoopIO.scratchDir(spark)}/graft_ivf_" +
      tmp.replaceAll("[^A-Za-z0-9]", "_") + "/_SUCCESS"
    val t1 = HadoopIO.lenAndMtime(success, conf).get._2
    // unchanged source -> the committed layout is reused, not rewritten
    Similarity.ivfBucketedTopK(spark, tmp).collect()
    assert(HadoopIO.lenAndMtime(success, conf).get._2 === t1)
    // regenerated source (newer mtime) -> layout rebuilt
    Thread.sleep(1100)
    HadoopIO.copy(s"$sf/embeddings.parquet", s"$tmp/embeddings.parquet", conf)
    val r2 = Similarity.ivfBucketedTopK(spark, tmp).collect()
    assert(r2.map(_.toString).sorted === r1.map(_.toString).sorted)
    val t2 = HadoopIO.lenAndMtime(success, conf).get._2
    assert(t2 > t1, "bucketed corpus was not rebuilt after source regeneration")
    // explicit index invalidation drops the physical layout with the model
    Similarity.rebuildIvfIndex(spark, tmp)
    assert(HadoopIO.lenAndMtime(success, conf).isEmpty)
  }

  test("q36 staging: restaged through the Hadoop FS when the source moves") {
    val tmp = java.nio.file.Files.createTempDirectory("q36re").toString
    HadoopIO.copy(s"$sf/documents.parquet", s"$tmp/documents.parquet", conf)
    val r1 = Relational.q36StreamDedupGate(spark, tmp).head()
    assert(r1.getAs[Boolean]("clean"))
    val staged = s"${HadoopIO.scratchDir(spark)}/graft_q36_" +
      tmp.replaceAll("[^A-Za-z0-9]", "_") + "/documents.parquet"
    val t1 = HadoopIO.lenAndMtime(staged, conf).get._2
    // a SAME-LENGTH rewrite one mtime tick later must restage (ADVICE r6:
    // the old `staged.mtime >= src.mtime` check replayed the stale copy)
    Thread.sleep(20)
    HadoopIO.copy(s"$sf/documents.parquet", s"$tmp/documents.parquet", conf)
    val r2 = Relational.q36StreamDedupGate(spark, tmp).head()
    assert(r2.getAs[Boolean]("clean"))
    assert(r2.getLong(0) === r1.getLong(0))
    val t2 = HadoopIO.lenAndMtime(staged, conf).get._2
    assert(t2 > t1, "staged documents copy was not refreshed after regeneration")
  }

  test("q35 staging: restaged through the Hadoop FS when the source moves") {
    val tmp = java.nio.file.Files.createTempDirectory("q35re").toString
    HadoopIO.copy(s"$sf/events.parquet", s"$tmp/events.parquet", conf)
    val r1 = Relational.q35StreamBatchGate(spark, tmp).head()
    assert(r1.getAs[Boolean]("all_match"))
    val staged = s"${HadoopIO.scratchDir(spark)}/graft_q35_" +
      tmp.replaceAll("[^A-Za-z0-9]", "_") + "/events.parquet"
    val t1 = HadoopIO.lenAndMtime(staged, conf).get._2
    // regenerate the source (same length, mtime one tick later); the gate
    // must replay the NEW copy, not the first-staged inode
    Thread.sleep(20)
    HadoopIO.copy(s"$sf/events.parquet", s"$tmp/events.parquet", conf)
    val r2 = Relational.q35StreamBatchGate(spark, tmp).head()
    assert(r2.getAs[Boolean]("all_match"))
    val t2 = HadoopIO.lenAndMtime(staged, conf).get._2
    assert(t2 > t1, "staged events copy was not refreshed after regeneration")
  }

  test("stageFile: copies once per source version, restages on any recorded-pair move") {
    val dir = java.nio.file.Files.createTempDirectory("stagef")
    val src = dir.resolve("src.bin").toString
    val dst = dir.resolve("scratch").resolve("staged.bin").toString
    def write(content: String): Unit = {
      val out = HadoopIO.create(src, conf)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    write("version-one")
    assert(HadoopIO.stageFile(src, dst, conf), "first call must copy")
    assert(!HadoopIO.stageFile(src, dst, conf), "unchanged source must be reused")
    Thread.sleep(20)
    write("version-two") // same length, later mtime
    assert(HadoopIO.stageFile(src, dst, conf),
      "same-length rewrite with a moved mtime must restage")
    val in = HadoopIO.open(dst, conf)
    val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(got === "version-two")
    // the dot-prefixed sidecar must be invisible to scan-target listings
    val listed = HadoopIO.listScanTargets(
      dir.resolve("scratch").toString, conf).map(_._1)
    assert(listed.size === 1 && listed.head.endsWith("staged.bin"))
  }
}
