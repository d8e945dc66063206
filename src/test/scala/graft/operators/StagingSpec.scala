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

  /** Move a local file's mtime forward EXPLICITLY: sleeping and re-writing
    * assumes sub-second mtime resolution and flakes on filesystems with a
    * coarse (1 s) tick — setting the time is deterministic on any
    * resolution (ADVICE r7). */
  private def bumpMtime(path: String, deltaMs: Long = 2000): Unit = {
    val p = java.nio.file.Paths.get(path)
    val cur = java.nio.file.Files.getLastModifiedTime(p).toMillis
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(cur + deltaMs))
  }

  test("s07 bucketed corpus: reused while fresh, rebuilt on regeneration, dropped by rebuildIvfIndex") {
    val tmp = java.nio.file.Files.createTempDirectory("s07re").toString
    HadoopIO.copy(s"$sf/embeddings.parquet", s"$tmp/embeddings.parquet", conf)
    val r1 = Similarity.ivfBucketedTopK(spark, tmp).collect()
    assert(r1.nonEmpty)
    val ivfDir = s"${HadoopIO.scratchDir(spark)}/graft_ivf_" +
      tmp.replaceAll("[^A-Za-z0-9]", "_")
    val success = s"$ivfDir/_SUCCESS"
    val marker = s"$ivfDir/.embeddings.src"
    val rec1 = HadoopIO.readMarker(marker, conf)
    assert(rec1 === HadoopIO.lenAndMtime(s"$tmp/embeddings.parquet", conf),
      "layout sidecar must record the built-from source version")
    val t1 = HadoopIO.lenAndMtime(success, conf).get._2
    // unchanged source -> the committed layout is reused, not rewritten
    Similarity.ivfBucketedTopK(spark, tmp).collect()
    assert(HadoopIO.lenAndMtime(success, conf).get._2 === t1)
    assert(HadoopIO.readMarker(marker, conf) === rec1)
    // regenerated source (same length, moved mtime) -> layout rebuilt;
    // the recorded pair, not any staged-file mtime, proves the rebuild
    HadoopIO.copy(s"$sf/embeddings.parquet", s"$tmp/embeddings.parquet", conf)
    bumpMtime(s"$tmp/embeddings.parquet")
    val r2 = Similarity.ivfBucketedTopK(spark, tmp).collect()
    assert(r2.map(_.toString).sorted === r1.map(_.toString).sorted)
    val rec2 = HadoopIO.readMarker(marker, conf)
    assert(rec2 !== rec1, "bucketed corpus was not rebuilt after source regeneration")
    assert(rec2 === HadoopIO.lenAndMtime(s"$tmp/embeddings.parquet", conf))
    // explicit index invalidation drops the physical layout with the model
    Similarity.rebuildIvfIndex(spark, tmp)
    assert(HadoopIO.lenAndMtime(success, conf).isEmpty)
  }

  test("s07 publish race: rename-if-absent refuses an existing layout, loser adopts") {
    // the concurrent-writer seam (VERDICT r8 #7): a second writer that
    // finishes its private build after another already published must NOT
    // clobber or nest into the committed dir — renameIfAbsent refuses,
    // the loser deletes its build, and the winner's layout is untouched
    val scratch = java.nio.file.Files.createTempDirectory("s07race").toString
    val winner = s"$scratch/layout"
    val loserTmp = s"$scratch/layout.build-loser"
    def mk(dir: String, tag: String): Unit = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val out = HadoopIO.create(s"$dir/_SUCCESS", conf)
      try out.write(tag.getBytes("UTF-8")) finally out.close()
    }
    mk(winner, "winner")
    mk(loserTmp, "loser")
    assert(!HadoopIO.renameIfAbsent(loserTmp, winner, conf),
      "publish onto an existing committed layout must be refused")
    // winner's content untouched — FileSystem.rename would instead have
    // MOVED the loser's build inside the winner's directory
    val in = HadoopIO.open(s"$winner/_SUCCESS", conf)
    val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(got === "winner")
    assert(!new java.io.File(winner, "layout.build-loser").exists(),
      "loser's build must not nest inside the published layout")
    // loser path still present for the caller to delete (adopt step)
    HadoopIO.delete(loserTmp, conf)
    // and a publish onto an ABSENT destination succeeds atomically
    mk(loserTmp, "second")
    assert(HadoopIO.renameIfAbsent(loserTmp, s"$scratch/layout2", conf))
    assert(HadoopIO.exists(s"$scratch/layout2/_SUCCESS", conf))
  }

  test("q36 staging: restaged through the Hadoop FS when the source moves") {
    val tmp = java.nio.file.Files.createTempDirectory("q36re").toString
    HadoopIO.copy(s"$sf/documents.parquet", s"$tmp/documents.parquet", conf)
    val r1 = Relational.q36StreamDedupGate(spark, tmp).head()
    assert(r1.getAs[Boolean]("clean"))
    val stageDir = s"${HadoopIO.scratchDir(spark)}/graft_q36_" +
      tmp.replaceAll("[^A-Za-z0-9]", "_")
    val marker = s"$stageDir/.documents.parquet.src"
    val rec1 = HadoopIO.readMarker(marker, conf)
    assert(rec1.nonEmpty)
    // a SAME-LENGTH rewrite one (explicit) mtime tick later must restage
    // (ADVICE r6: the old `staged.mtime >= src.mtime` check replayed the
    // stale copy); the recorded pair proves the refresh without assuming
    // anything about the filesystem's mtime resolution
    HadoopIO.copy(s"$sf/documents.parquet", s"$tmp/documents.parquet", conf)
    bumpMtime(s"$tmp/documents.parquet")
    val r2 = Relational.q36StreamDedupGate(spark, tmp).head()
    assert(r2.getAs[Boolean]("clean"))
    assert(r2.getLong(0) === r1.getLong(0))
    val rec2 = HadoopIO.readMarker(marker, conf)
    assert(rec2 !== rec1, "staged documents copy was not refreshed after regeneration")
    assert(rec2 === HadoopIO.lenAndMtime(s"$tmp/documents.parquet", conf))
  }

  test("q35 staging: restaged through the Hadoop FS when the source moves") {
    val tmp = java.nio.file.Files.createTempDirectory("q35re").toString
    HadoopIO.copy(s"$sf/events.parquet", s"$tmp/events.parquet", conf)
    val r1 = Relational.q35StreamBatchGate(spark, tmp).head()
    assert(r1.getAs[Boolean]("all_match"))
    val stageDir = s"${HadoopIO.scratchDir(spark)}/graft_q35_" +
      tmp.replaceAll("[^A-Za-z0-9]", "_")
    val marker = s"$stageDir/.events.parquet.src"
    val rec1 = HadoopIO.readMarker(marker, conf)
    assert(rec1.nonEmpty)
    // regenerate the source (same length, explicit mtime bump); the gate
    // must replay the NEW copy, not the first-staged inode
    HadoopIO.copy(s"$sf/events.parquet", s"$tmp/events.parquet", conf)
    bumpMtime(s"$tmp/events.parquet")
    val r2 = Relational.q35StreamBatchGate(spark, tmp).head()
    assert(r2.getAs[Boolean]("all_match"))
    val rec2 = HadoopIO.readMarker(marker, conf)
    assert(rec2 !== rec1, "staged events copy was not refreshed after regeneration")
    assert(rec2 === HadoopIO.lenAndMtime(s"$tmp/events.parquet", conf))
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
    write("version-two") // same length...
    bumpMtime(src)       // ...explicitly later mtime (resolution-proof)
    assert(HadoopIO.stageFile(src, dst, conf),
      "same-length rewrite with a moved mtime must restage")
    // a corrupted sidecar must read as stale (forced restage), not crash
    val mk = dir.resolve("scratch").resolve(".staged.bin.src").toString
    val out = HadoopIO.create(mk, conf)
    try out.write("garbage:not-a-long".getBytes("UTF-8")) finally out.close()
    assert(HadoopIO.stageFile(src, dst, conf),
      "unparseable marker must force a restage")
    val in = HadoopIO.open(dst, conf)
    val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(got === "version-two")
    // the dot-prefixed sidecar must be invisible to scan-target listings
    val listed = HadoopIO.listScanTargets(
      dir.resolve("scratch").toString, conf).map(_._1)
    assert(listed.size === 1 && listed.head.endsWith("staged.bin"))
  }
}
