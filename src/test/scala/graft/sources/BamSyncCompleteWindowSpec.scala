package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Regression: the r15 multi-region fixture surfaced a LATENT
  * [[BamSync.validChain]] false accept present in every plain grid
  * split — a mis-aligned guess whose byte-shifted block_size read as
  * ~4 MB "validated" on its header alone (the prefix-off-window
  * leniency, meant for the 1 MB cap, also fired when the window
  * already reached the file end, where the claimed bytes cannot
  * exist), and the reader then decoded garbage to EOF. The fix rejects
  * off-window extents when the window is file-complete; this spec pins
  * the exact adversarial fixture (8000 uniform 77-byte records per
  * file, two range partitions, member boundary at a poisoned offset). */
class BamSyncCompleteWindowSpec extends SparkSpec {

  test("plain grid splits of the adversarial uniform-record fixture " +
      "sync to true record boundaries (no phantom giant record)") {
    val dir = s"/tmp/graft_bamsync_${java.util.UUID.randomUUID().toString.take(8)}"
    (0 to 1).foreach { i =>
      val recs = spark.range(8000).select(
        concat(lit("r"), col("id"), lit("_"), lit(i)).as("readName"),
        lit(0).as("flag"),
        concat(lit("k"), col("id") % 2).cast("string")
          .as("referenceName"),
        (col("id") * 40 + 1 + i).cast("int").as("start"),
        lit(60).as("mapQ"), lit("8M").as("cigar"), lit("*").as("rnext"),
        lit(0).as("pnext"), lit(0).as("tlen"),
        lit("ACGTACGT").as("sequence"), lit("*").as("qual"),
        lit("NM:i:0").as("attributes"))
      BamWriter.sortAndWrite(recs, "@HD\tVN:1.6\tSO:coordinate\n" +
        "@SQ\tSN:k0\tLN:1000000\n@SQ\tSN:k1\tLN:1000000\n",
        Seq("k0" -> 1000000, "k1" -> 1000000),
        f"$dir/part-$i%05d.bam", numPartitions = 2, index = true)
    }
    // exact exactly-once record count across many grid splits (the
    // pre-fix false accept threw "truncated BAM record mid-decode")
    val n = spark.read.format("bam").option("splitsize", 4096).load(dir)
      .count()
    assert(n === 16000L)
    // and the record SET matches a whole-file scan (no dupes, no drops)
    val grid = spark.read.format("bam").option("splitsize", 4096)
      .load(dir).select("readName").collect().map(_.getString(0)).sorted
    val whole = spark.read.format("bam")
      .option("splitsize", Int.MaxValue).load(dir)
      .select("readName").collect().map(_.getString(0)).sorted
    assert(grid.toSeq === whole.toSeq)
    // the sync itself: a file-complete window rejects a candidate whose
    // claimed extent runs past the end, and finds the true boundary
    val conf = HadoopIO.driverConf()
    val p1 = s"$dir/part-00001.bam"
    val ch = new SeekableFile(p1, conf)
    try {
      val from = Bgzf.nextMemberStart(ch, 4096L, ch.size)
      val s = BamSync.syncToRecord(ch, from, Long.MaxValue, 2, p1)
      assert(s.isDefined)
      val in = new java.io.DataInputStream(s.get)
      def le32(): Int = {
        val a = in.read(); val b = in.read(); val c = in.read(); val d = in.read()
        a | (b << 8) | (c << 16) | (d << 24)
      }
      val bs = le32()
      // a true fixture record is tens of bytes, never megabytes
      assert(bs > 32 && bs < 200, s"synced to a phantom record: bs=$bs")
      s.get.close()
    } finally ch.close()
  }

  test("validChain: file-complete windows reject off-window extents, " +
      "capped windows keep the prefix leniency, exact-end chains pass") {
    // minimal synthetic record: bs=40, refId=0, pos=5, lName=4 ("abc\0"),
    // mapq, bin, nCigar=0, flag, lSeq=0, nextRefId=-1, nextPos=-1, tlen=0
    def rec(bs: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + 40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(bs) // block_size
      b.putInt(0) // refId
      b.putInt(5) // pos
      b.put(4.toByte) // l_read_name
      b.put(60.toByte) // mapq
      b.putShort(0) // bin
      b.putShort(0) // n_cigar
      b.putShort(0) // flag
      b.putInt(0) // l_seq
      b.putInt(-1); b.putInt(-1); b.putInt(0)
      b.put("abc".getBytes("US-ASCII")); b.put(0.toByte)
      while (b.position() < 44) b.put(0.toByte)
      b.array()
    }
    val one = rec(40)
    // chain of three ending exactly at the window end: valid either way
    val three = one ++ one ++ one
    assert(BamSync.validChain(three, 0, 1, complete = true))
    assert(BamSync.validChain(three, 0, 1, complete = false))
    // one record whose claimed bs extends past a COMPLETE window: the
    // pre-fix code accepted it ("prefix ran off"); now impossible
    val phantom = rec(4128768).take(44)
    assert(!BamSync.validChain(phantom, 0, 1, complete = true))
    // the same bytes under a CAPPED window stay plausibly acceptable
    // (long records legitimately outgrow the 1 MB validation cap)
    assert(BamSync.validChain(phantom, 0, 1, complete = false))
  }
}
