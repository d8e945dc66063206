package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col

/** Distributed single-file TEXT sink — the generic form of the commit
  * shape [[BamWriter]] established for binary BAM: every task streams its
  * partition's lines straight to an attempt-suffixed part file through the
  * Hadoop FileSystem (bounded memory, retry/speculation-safe — a task
  * re-attempt writes a fresh part name and only the successful attempt's
  * path reaches the driver), and the driver concatenates header + part
  * BYTES in partition order into one file. Line order in the output is
  * exactly the frame's partition-major order, so a range-partitioned +
  * sorted-within-partitions frame lands as one globally sorted text file.
  *
  * An `out` ending `.gz`/`.bgz` deflates each partition as a run of
  * self-contained BGZF members (the bgzip framing SAM/VCF tooling expects:
  * concatenation-safe, tabix/intra-file-split friendly) and finishes with
  * the spec EOF marker; plain extensions write raw bytes. Either way the
  * only driver-side work is metadata-sized: (partition, path) pairs and a
  * byte copy through the FS — no `coalesce(1)` collapsing upstream
  * compute to one task, which is what a naive single-file text write
  * costs at scale.
  */
object TextSink {

  /** Per-task index-accumulation hook for index-on-write over the BGZF
    * text form: `add` observes every written line with its PART-LOCAL
    * write-side virtual positions (member byte offset << 16 |
    * intra-member offset, [[BgzfOutputStream.virtualPos]]); `blob`
    * returns the task's serialized accumulation (KB-sized — bins and
    * window minima, never record bytes) for the driver's shift-merge,
    * `tailV` being the part's final virtual position so part-tail chunk
    * ends can be rewritten to the read side's member-boundary rounding.
    * The BamWriter `.bai`-on-write machinery, generalized to any
    * line-rendered format with a sidecar index. */
  trait LineIndexer {
    def add(line: String, vBeg: Long, vEnd: Long): Unit
    def blob(tailV: Long): Array[Byte]
  }

  /** Write `lines` (single string column `line`) as one text file at
    * `out`, prefixed by `header` lines. Returns the line count. */
  def write(header: Seq[String], lines: DataFrame, out: String): Long =
    writeIndexed(header, lines, out, null)._1

  /** [[write]] plus index-on-write plumbing: `indexerF` (may be null)
    * builds one [[LineIndexer]] per task, fed every line as it streams
    * through the part's [[BgzfOutputStream]]. Returns (line count,
    * per-part (index blob, part byte length) in partition order, header
    * byte length, total file byte length) — everything a sidecar
    * finisher needs to shift part-local virtual offsets to the
    * concatenated file's layout. */
  def writeIndexed(header: Seq[String], lines: DataFrame, out: String,
      indexerF: () => LineIndexer)
      : (Long, Seq[(Array[Byte], Long)], Long, Long) = {
    val gz = out.endsWith(".gz") || out.endsWith(".bgz")
    require(indexerF == null || gz,
      s"TextSink: index-on-write needs the BGZF form — '$out' is plain " +
        "text (virtual offsets only exist inside bgzip members)")
    val confBox = HadoopIO.capture()
    val partsDir = out + ".parts"
    val parts = lines.select(col("line"))
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val path = f"$partsDir/part-$pid%05d-a${tc.attemptNumber()}"
          val os = new java.io.BufferedOutputStream(
            HadoopIO.create(path, confBox.conf), 1 << 16)
          var n = 0L
          var blob = Array.emptyByteArray
          try {
            val sink: java.io.OutputStream =
              if (gz) new BgzfOutputStream(os) else os
            val indexer = if (indexerF == null) null else indexerF()
            val bz = sink match {
              case b: BgzfOutputStream => b
              case _ => null
            }
            def vpos(): Long = {
              val (m, u) = bz.virtualPos
              (m << 16) | u
            }
            while (rows.hasNext) {
              val line = rows.next().getString(0)
              if (indexer == null)
                sink.write((line + "\n").getBytes("UTF-8"))
              else {
                val v0 = vpos()
                sink.write((line + "\n").getBytes("UTF-8"))
                indexer.add(line, v0, vpos())
              }
              n += 1
            }
            if (indexer != null) blob = indexer.blob(vpos())
            sink match {
              case bzo: BgzfOutputStream => bzo.flushBlock() // EOF is file-level
              case _ => sink.flush()
            }
          } finally os.close()
          Iterator((pid, path, n, blob))
        }
      }(Encoders.tuple(Encoders.scalaInt, Encoders.STRING,
        Encoders.scalaLong, Encoders.BINARY))
      .collect() // task METADATA only (+ KB-sized index accumulations)
      .sortBy(_._1)
    val conf = HadoopIO.driverConf()
    val fs = new Path(out).getFileSystem(conf)
    val os = fs.create(new Path(out), true)
    var headerLen = 0L
    var fileLen = 0L
    val partLens = new Array[Long](parts.length)
    try {
      // per-line suffix, not mkString's unconditional one: an empty header
      // must contribute zero bytes, not a lone newline
      val headerBytes = header.map(_ + "\n").mkString.getBytes("UTF-8")
      if (gz) {
        val bz = new BgzfOutputStream(os)
        bz.write(headerBytes)
        bz.flushBlock() // header as its own member run (zero bytes → none)
      } else os.write(headerBytes)
      headerLen = os.getPos
      parts.zipWithIndex.foreach { case ((_, p, _, _), i) =>
        val in = fs.open(new Path(p))
        try partLens(i) = in.transferTo(os) finally in.close()
      }
      if (gz) os.write(BgzfOutputStream.EofMarker)
      fileLen = os.getPos
    } finally {
      os.close()
      fs.delete(new Path(partsDir), true)
    }
    (parts.map(_._3).sum,
      parts.map(_._4).zip(partLens.toSeq), headerLen, fileLen)
  }
}
