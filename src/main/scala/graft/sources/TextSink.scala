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

  /** Write `lines` (single string column `line`) as one text file at
    * `out`, prefixed by `header` lines. Returns the line count. */
  def write(header: Seq[String], lines: DataFrame, out: String): Long = {
    val gz = out.endsWith(".gz") || out.endsWith(".bgz")
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
          try {
            val sink: java.io.OutputStream =
              if (gz) new BgzfOutputStream(os) else os
            while (rows.hasNext) {
              sink.write((rows.next().getString(0) + "\n").getBytes("UTF-8"))
              n += 1
            }
            sink match {
              case bz: BgzfOutputStream => bz.flushBlock() // EOF is file-level
              case _ => sink.flush()
            }
          } finally os.close()
          Iterator((pid, path, n))
        }
      }(Encoders.tuple(Encoders.scalaInt, Encoders.STRING, Encoders.scalaLong))
      .collect() // task METADATA only: (partition, path, count)
      .sortBy(_._1)
    val conf = HadoopIO.driverConf()
    val fs = new Path(out).getFileSystem(conf)
    val os = fs.create(new Path(out), true)
    try {
      // per-line suffix, not mkString's unconditional one: an empty header
      // must contribute zero bytes, not a lone newline
      val headerBytes = header.map(_ + "\n").mkString.getBytes("UTF-8")
      if (gz) {
        val bz = new BgzfOutputStream(os)
        bz.write(headerBytes)
        bz.flushBlock() // header as its own member run (zero bytes → none)
      } else os.write(headerBytes)
      parts.foreach { case (_, p, _) =>
        val in = fs.open(new Path(p))
        try in.transferTo(os) finally in.close()
      }
      if (gz) os.write(BgzfOutputStream.EofMarker)
    } finally {
      os.close()
      fs.delete(new Path(partsDir), true)
    }
    parts.map(_._3).sum
  }
}
