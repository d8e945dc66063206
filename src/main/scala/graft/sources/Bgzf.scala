package graft.sources

import java.io.{EOFException, IOException, InputStream}
import java.util.zip.Inflater

/** BGZF block-level access, written from the SAM/BAM spec v1.6 §4.1.
  *
  * BGZF is a sequence of independent gzip members, each carrying a `BC`
  * extra subfield whose BSIZE value gives the total compressed size of the
  * member minus one. Because members are self-delimiting and independently
  * inflatable, a reader can start at ANY member boundary — this is what
  * makes byte-range splits of a single BAM file possible (the reference
  * got the same capability from hadoop-bam's BAMInputFormat;
  * /root/reference/src/main/scala/MitoScape/BamReader.scala:172-174).
  *
  * All file access goes through [[SeekableFile]] (Hadoop FileSystem
  * positional reads), so the same splitter works on local disk, HDFS, or
  * S3A.
  *
  * Split protocol (hadoop-style): a partition owns raw byte range
  * [start, end); it reads from the first member boundary at-or-after
  * `start` and emits every record that STARTS in a member whose file
  * offset is < `end` (running past `end` to finish a straddling record).
  * Neighbouring partitions therefore partition the record stream exactly.
  */
object Bgzf {

  /** BGZF caps a member's uncompressed payload at 64 KiB (BSIZE/ISIZE are
    * uint16-derived); anything larger in the trailer is corruption. */
  val MaxIsize: Int = 1 << 16

  /** Total length (header+cdata+trailer) of the BGZF member starting at
    * `buf(off)`, or -1 if the bytes there are not a valid member header.
    * Needs 18 bytes available at `off`. */
  def memberLength(buf: Array[Byte], off: Int, avail: Int): Int = {
    if (avail < 18) return -1
    if ((buf(off) & 0xff) != 0x1f || (buf(off + 1) & 0xff) != 0x8b ||
        buf(off + 2) != 8 || (buf(off + 3) & 4) != 4) return -1
    val xlen = (buf(off + 10) & 0xff) | ((buf(off + 11) & 0xff) << 8)
    if (12 + xlen > avail) return -1
    // scan the extra field for the BC subfield (SI1='B', SI2='C', SLEN=2)
    var p = off + 12
    val endExtra = off + 12 + xlen
    while (p + 4 <= endExtra) {
      val slen = (buf(p + 2) & 0xff) | ((buf(p + 3) & 0xff) << 8)
      if (buf(p) == 'B' && buf(p + 1) == 'C' && slen == 2) {
        if (p + 6 > endExtra) return -1
        val bsize = (buf(p + 4) & 0xff) | ((buf(p + 5) & 0xff) << 8)
        val total = bsize + 1
        // a valid member is at least header(12+xlen) + trailer(8) bytes
        return if (total >= 12 + xlen + 8) total else -1
      }
      p += 4 + slen
    }
    -1
  }

  /** Last member boundary strictly BEFORE `at` (`at` must itself be a
    * member boundary, or EOF). A member's total compressed size is at most
    * 65536 (BSIZE is uint16), so the previous boundary lives within one
    * 64 KiB(+1) window behind `at`: scan forward from there and walk the
    * member chain up to `at`. Used by the compressed-text reader's
    * newline sync (the split protocol's seek(start-1) equivalent). */
  def prevMemberStart(f: SeekableFile, at: Long, fileLen: Long): Long = {
    require(at > 0, s"no BGZF member precedes offset $at")
    var cur = nextMemberStart(f, math.max(0L, at - 65537), fileLen)
    if (cur >= at) throw new IOException(
      s"no BGZF member boundary found before offset $at")
    val hdr = new Array[Byte](18)
    while (true) {
      val n = f.readAtFully(cur, hdr)
      val len = memberLength(hdr, 0, n)
      if (len <= 0) throw new IOException(
        s"corrupt BGZF member chain at $cur walking to $at")
      if (cur + len == at) return cur
      if (cur + len > at) throw new IOException(
        s"BGZF member at $cur spans $at — not a member boundary")
      cur += len
    }
    0L // unreachable
  }

  /** A [[BgzfInputStream]] positioned at the first LINE START owned by
    * the member at `mStart` (a member boundary): walk back one member at
    * a time until some payload byte exists, read through to `mStart`
    * tracking the last byte, and if it wasn't a newline skip through the
    * first '\n' — that partial line's first byte lives in an earlier
    * member and belongs to whoever owns THAT member. This is the
    * compressed-text seam protocol FastqBgzfLines has always used,
    * shared so byte-range index builders position identically. */
  def openAtLineStart(f: SeekableFile, mStart: Long, fileLen: Long): BgzfInputStream = {
    if (mStart == 0) return new BgzfInputStream(f, 0L)
    var prev = prevMemberStart(f, mStart, fileLen)
    var last: Int = -1
    var s: BgzfInputStream = null
    val scratch = new Array[Byte](MaxIsize)
    while (s == null) {
      val cand = new BgzfInputStream(f, prev)
      while (cand.memberStart < mStart && cand.memberRemaining > 0) {
        val k = cand.read(scratch, 0,
          math.min(cand.memberRemaining, scratch.length))
        if (k > 0) last = scratch(k - 1) & 0xff
      }
      if (last >= 0 || prev == 0) s = cand
      else {
        cand.close()
        prev = prevMemberStart(f, prev, fileLen)
      }
    }
    if (last != '\n' && last != -1) {
      var b = s.read()
      while (b != -1 && b != '\n') b = s.read()
    }
    s
  }

  /** First BGZF member boundary at-or-after `from`, found by scanning the
    * compressed bytes for a header whose BSIZE chains to another valid
    * header (or to end-of-file). Returns `fileLen` if none. O(distance to
    * the next boundary + one member) — safe to call once per split. */
  def nextMemberStart(f: SeekableFile, from: Long, fileLen: Long): Long = {
    if (from >= fileLen) return fileLen
    val window = 1 << 16 // max member size is 65536, so a boundary occurs within it
    val buf = new Array[Byte](window + 18)
    var base = from
    while (base < fileLen) {
      val n = f.readAtFully(base, buf)
      var i = 0
      while (i < n) {
        val len = memberLength(buf, i, n - i)
        if (len > 0) {
          val nxt = base + i + len
          if (nxt == fileLen) return base + i
          // chain check: the implied next member must also look valid
          val hdr = new Array[Byte](18)
          val m = f.readAtFully(nxt, hdr)
          if (nxt < fileLen && memberLength(hdr, 0, m) > 0) return base + i
        }
        i += 1
      }
      base += window
    }
    fileLen
  }
}

/** Streams the inflated payload of consecutive BGZF members starting at
  * `startOffset` (which must be a member boundary). Tracks, for every byte
  * served, the file offset of the member it came from — `memberStart` is
  * the virtual-offset high part for the NEXT unread byte, which is what
  * the split ownership test needs. Empty members (the EOF marker) are
  * skipped transparently. Does not close the file handle. */
class BgzfInputStream(f: SeekableFile, startOffset: Long) extends InputStream {
  private val fileLen = f.size
  private val inflater = new Inflater(true) // raw deflate, per gzip framing
  private val crc = new java.util.zip.CRC32
  private var data = Array.emptyByteArray
  private var len = 0
  private var pos = 0
  private var curMember = startOffset  // member the current buffer came from
  private var nextMember = startOffset // where the next member header lives

  /** File offset of the BGZF member containing the next unread byte
    * (== file length at end-of-stream). */
  def memberStart: Long = { ensure(); if (pos < len) curMember else nextMember }

  /** (memberStart, offset-in-member) of the next unread byte. */
  def virtualPos: (Long, Int) = { ensure(); if (pos < len) (curMember, pos) else (nextMember, 0) }

  /** Unserved payload bytes of the member containing the next unread byte
    * (0 only at end-of-stream — [[ensure]] auto-loads across boundaries and
    * skips empty members). */
  def memberRemaining: Int = { ensure(); len - pos }

  private def ensure(): Unit =
    while (pos >= len && nextMember < fileLen) loadMember()

  private def loadMember(): Unit = {
    val hdr = new Array[Byte](18)
    readFullyAt(nextMember, hdr, hdr.length)
    val total = Bgzf.memberLength(hdr, 0, 18)
    if (total < 0) throw new IOException(
      s"not a BGZF member boundary at offset $nextMember")
    val xlen = (hdr(10) & 0xff) | ((hdr(11) & 0xff) << 8)
    val cdataLen = total - 12 - xlen - 8
    val cdata = new Array[Byte](cdataLen)
    readFullyAt(nextMember + 12 + xlen, cdata, cdataLen)
    val tr = new Array[Byte](8)
    readFullyAt(nextMember + total - 8, tr, 8)
    val isize = (tr(4) & 0xff) | ((tr(5) & 0xff) << 8) |
      ((tr(6) & 0xff) << 16) | ((tr(7) & 0xff) << 24)
    // the trailer is untrusted input: a corrupt ISIZE must neither size an
    // unbounded allocation nor spin the inflate loop (ADVICE r2)
    if (isize < 0 || isize > Bgzf.MaxIsize) throw new IOException(
      s"corrupt BGZF trailer at $nextMember: ISIZE=$isize exceeds ${Bgzf.MaxIsize}")
    if (data.length < isize) data = new Array[Byte](math.max(isize, 1 << 16))
    inflater.reset()
    inflater.setInput(cdata)
    var o = 0
    while (o < isize && !inflater.finished()) {
      val r = inflater.inflate(data, o, isize - o)
      if (r == 0 && !inflater.finished()) throw new IOException(
        s"corrupt BGZF cdata at $nextMember: inflate stalled at $o/$isize bytes")
      o += r
    }
    if (o != isize) throw new IOException(
      s"corrupt BGZF member at $nextMember: payload ended at $o of " +
        s"ISIZE=$isize bytes")
    // CRC32 of the inflated payload vs trailer bytes 0–3 (gzip §2.3.1):
    // a bit-flipped cdata stream can still inflate to ISIZE bytes of
    // garbage, and on a 100 TB corpus on commodity storage silent
    // mid-stream corruption is a real integrity hole (VERDICT r11) —
    // htslib and java's GZIPInputStream both validate this; so do we.
    crc.reset()
    crc.update(data, 0, isize)
    val wantCrc = (tr(0) & 0xffL) | ((tr(1) & 0xffL) << 8) |
      ((tr(2) & 0xffL) << 16) | ((tr(3) & 0xffL) << 24)
    if (crc.getValue != wantCrc) throw new IOException(
      f"corrupt BGZF member at $nextMember: payload CRC32 " +
        f"0x${crc.getValue}%08x != trailer 0x$wantCrc%08x")
    curMember = nextMember
    nextMember += total
    len = isize
    pos = 0
  }

  private def readFullyAt(at: Long, buf: Array[Byte], n: Int): Unit = {
    var got = 0
    while (got < n) {
      val r = f.readAt(at + got, buf, got, n - got)
      if (r < 0) throw new EOFException(s"truncated BGZF member at $at")
      got += r
    }
  }

  override def read(): Int = {
    ensure()
    if (pos >= len) -1
    else { val b = data(pos) & 0xff; pos += 1; b }
  }

  override def read(b: Array[Byte], off: Int, n: Int): Int = {
    ensure()
    if (pos >= len) return -1
    val k = math.min(n, len - pos)
    System.arraycopy(data, pos, b, off, k)
    pos += k
    k
  }

  override def close(): Unit = inflater.end()
}
