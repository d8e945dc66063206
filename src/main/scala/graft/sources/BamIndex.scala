package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}

import org.apache.hadoop.conf.Configuration

/** Linear member index for BAM files (sidecar `<file>.gai`), the
  * graft-native analogue of a BAI linear index (SAM spec §5.2): one entry
  * per BGZF member recording where its first record starts and the
  * coordinate range of the records starting in it.
  *
  * Two wins for the reader:
  *  - positioning: a split seeks to its first member's `firstRecUoffset`
  *    directly — no record-boundary guessing;
  *  - pruning: with a pushed `referenceName`/`start` filter and a
  *    coordinate-sorted BAM, members whose [minRef..maxRef] ×
  *    [minPos..maxPos] cannot satisfy the predicate are skipped WITHOUT
  *    decompressing them. The reference's own workload — extracting the
  *    chrM records from a whole-genome BAM (MTClassify.scala:200) — reads
  *    ~0.1% of the members of a sorted WGS BAM this way.
  *
  * Like samtools index, building costs one sequential scan. Entries are
  * fixed-width (28 bytes/member ≈ 0.04% of the data), so a reader of a
  * huge file can range-seek the sidecar; here it is loaded whole.
  */
object BamIndex {

  final case class MemberStat(offset: Long, firstRecUoffset: Int,
    minRef: Int, maxRef: Int, minPos: Int, maxPos: Int)

  private val Magic = 0x47414931 // "GAI1"

  def sidecarPath(bam: String): String = bam + ".gai"

  /** CLI: `runMain graft.sources.BamIndex [--distributed] <file.bam> ...`
    * builds sidecars (the samtools-index analogue). `--distributed` fans
    * the byte-range scan out over a Spark job ([[buildDistributed]]) —
    * the form that indexes a corpus-sized BAM in one cluster pass. */
  def main(args: Array[String]): Unit = {
    val (flags, paths) = args.partition(_.startsWith("--"))
    require(paths.nonEmpty,
      "usage: BamIndex [--distributed] <file.bam> [more.bam ...]")
    val dist = flags.contains("--distributed")
    val spark = if (dist) Some(org.apache.spark.sql.SparkSession.builder()
      .appName("graft-gai").getOrCreate()) else None
    try paths.foreach { p =>
      val n = spark.map(buildDistributed(_, p)).getOrElse(build(p))
      println(s"[gai] indexed $p: $n members -> ${sidecarPath(p)}")
    } finally spark.foreach(_.stop())
  }

  /** A usable sidecar exists: present AND at least as new as the BAM —
    * a stale index (file rewritten after indexing) would silently misread,
    * so it is ignored and the reader falls back to boundary guessing. */
  def exists(bam: String, conf: Configuration = new Configuration()): Boolean = {
    val side = sidecarPath(bam)
    HadoopIO.exists(side, conf) && HadoopIO.exists(bam, conf) &&
      HadoopIO.modTime(side, conf) >= HadoopIO.modTime(bam, conf)
  }

  /** One sequential pass over the BAM: per member, the intra-member offset
    * of the first record starting there (-1 if none) and the min/max
    * (refId, pos) over records starting there. [[buildDistributed]] is the
    * executor-parallel form (byte-range splits + the [[BamSync]] guesser);
    * this sequential pass is the no-session CLI/fixture path. */
  def build(bam: String, conf: Configuration = new Configuration()): Int = {
    val ch = new SeekableFile(bam, conf)
    try {
      val fileLen = ch.size
      val in = new BgzfInputStream(ch, 0L)
      val din = new DataInputStream(in)
      def i32(): Int = {
        val b0 = din.read(); val b1 = din.read(); val b2 = din.read(); val b3 = din.read()
        if ((b0 | b1 | b2 | b3) < 0) throw new EOFException()
        b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
      }
      def skipFully(n: Int): Unit = {
        var left = n
        while (left > 0) {
          val k = din.skipBytes(left)
          if (k > 0) left -= k
          else { if (din.read() < 0) throw new EOFException(); left -= 1 }
        }
      }
      // header + ref dictionary
      val magic = new Array[Byte](4); din.readFully(magic)
      require(magic.sameElements(Array[Byte]('B', 'A', 'M', 1)), s"not BAM: $bam")
      skipFully(i32()) // header text
      val nRef = i32()
      var r = 0
      while (r < nRef) { skipFully(i32()); i32(); r += 1 }

      val stats = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Int]]
      def statFor(off: Long): Array[Int] =
        stats.getOrElseUpdate(off, Array(-1, Int.MaxValue, Int.MinValue,
          Int.MaxValue, Int.MinValue)) // firstU, minRef, maxRef, minPos, maxPos
      var done = false
      while (!done) {
        val (mOff, uOff) = in.virtualPos
        if (mOff >= fileLen) done = true
        else {
          try {
            val blockSize = i32()
            val refId = i32()
            val pos = i32()
            skipFully(blockSize - 8)
            val st = statFor(mOff)
            if (st(0) < 0) st(0) = uOff
            st(1) = math.min(st(1), refId); st(2) = math.max(st(2), refId)
            st(3) = math.min(st(3), pos); st(4) = math.max(st(4), pos)
          } catch { case _: EOFException => done = true }
        }
      }
      // enumerate ALL members (including record-less ones) so the reader
      // can treat the index as a complete member list
      val out = new DataOutputStream(new java.io.BufferedOutputStream(
        HadoopIO.create(sidecarPath(bam), conf)))
      try {
        var n = 0
        var mOff = 0L
        val hdr = new Array[Byte](18)
        val entries = scala.collection.mutable.ArrayBuffer.empty[MemberStat]
        while (mOff < fileLen) {
          val got = ch.readAtFully(mOff, hdr)
          val total = Bgzf.memberLength(hdr, 0, got)
          if (total <= 0) mOff = fileLen
          else {
            val st = stats.get(mOff)
            entries += (st match {
              case Some(a) => MemberStat(mOff, a(0), a(1), a(2), a(3), a(4))
              case None    => MemberStat(mOff, -1, Int.MaxValue, Int.MinValue,
                Int.MaxValue, Int.MinValue)
            })
            mOff += total
          }
        }
        out.writeInt(Magic)
        out.writeInt(entries.length)
        entries.foreach { e =>
          out.writeLong(e.offset); out.writeInt(e.firstRecUoffset)
          out.writeInt(e.minRef); out.writeInt(e.maxRef)
          out.writeInt(e.minPos); out.writeInt(e.maxPos)
          n += 1
        }
        n
      } finally out.close()
    } finally ch.close()
  }

  /** Executor-parallel index build over byte-range splits — the form a
    * 100 TB corpus actually gets indexed with ([[build]]'s sequential scan
    * is the fixture/CLI path). Each task owns a raw range [start, end):
    * it enumerates the member boundaries in it (BSIZE hops from the first
    * validated boundary), re-synchronizes to a record start with the same
    * [[BamSync]] guesser the un-indexed reader uses (or the exact header
    * end, driver-supplied, when the range contains it), and accumulates
    * the per-member stats of the records STARTING in its members — the
    * identical attribution rule to the reader's split protocol, so task
    * outputs are disjoint by construction. The driver merges the tiny
    * per-member rows and writes a sidecar byte-identical to [[build]]'s
    * (BamIndexSpec asserts exactly that). */
  def buildDistributed(s: org.apache.spark.sql.SparkSession, bam: String,
      splitSize: Long = 16L * 1024 * 1024): Int = {
    val confBox = HadoopIO.capture()
    // driver-side header parse: nRef for the guesser's refId validation +
    // the exact virtual position where records begin
    val (fileLen, nRef, hdrMember, hdrU) = {
      val ch = new SeekableFile(bam, confBox.conf)
      try {
        val in = new BgzfInputStream(ch, 0L)
        val din = new DataInputStream(in)
        def i32(): Int = {
          val b0 = din.read(); val b1 = din.read(); val b2 = din.read(); val b3 = din.read()
          if ((b0 | b1 | b2 | b3) < 0) throw new EOFException()
          b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        }
        val magic = new Array[Byte](4); din.readFully(magic)
        require(magic.sameElements(Array[Byte]('B', 'A', 'M', 1)), s"not BAM: $bam")
        HadoopIO.skipFully(din, i32().toLong, s"$bam header text")
        val n = i32()
        var r = 0
        while (r < n) { HadoopIO.skipFully(din, i32().toLong, s"$bam ref dict"); i32(); r += 1 }
        val (m, u) = in.virtualPos
        (ch.size, n, m, u)
      } finally ch.close()
    }
    val ranges = (0L until fileLen by splitSize)
      .map(st => (st, math.min(st + splitSize, fileLen)))
    // cluster-side merge: pair each boundary with its member's stats inside
    // the owning task, dedup range-edge boundaries, sort by offset — the
    // driver then STREAMS the sorted entries one partition at a time
    // (toLocalIterator) into the sidecar, so its memory is bounded by one
    // range's entries, not the whole file's (a 1 TB BAM is ~450 MB of
    // entries; per-range it's ~0.5 MB)
    val entries = s.sparkContext
      .parallelize(ranges, ranges.size)
      .map { case (start, end) =>
        scanRange(bam, confBox, start, end, fileLen, nRef, hdrMember, hdrU)
      }
      .flatMap { case (bounds, sts) =>
        val byOff = sts.iterator.map(st => st.offset -> st).toMap
        bounds.iterator.map(off => (off, byOff.get(off)))
      }
      .reduceByKey((a, b) => a.orElse(b))
      .sortByKey()
    // count() materializes the shuffle map side (the one BAM scan); the
    // per-partition toLocalIterator jobs below skip straight to the sorted
    // reduce output, so the file is scanned exactly once
    val n = entries.count()
    require(n <= Int.MaxValue, s"$bam: $n members overflow the sidecar count")
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      HadoopIO.create(sidecarPath(bam), confBox.conf)))
    try {
      out.writeInt(Magic)
      out.writeInt(n.toInt)
      entries.toLocalIterator.foreach { case (off, stOpt) =>
        val e = stOpt.getOrElse(MemberStat(off, -1, Int.MaxValue,
          Int.MinValue, Int.MaxValue, Int.MinValue))
        out.writeLong(e.offset); out.writeInt(e.firstRecUoffset)
        out.writeInt(e.minRef); out.writeInt(e.maxRef)
        out.writeInt(e.minPos); out.writeInt(e.maxPos)
      }
      n.toInt
    } finally out.close()
  }

  /** One task's contribution: (member boundaries in [start,end), stats of
    * records starting in those members). Runs on an executor. */
  private def scanRange(bam: String, confBox: HadoopIO.ConfBox, start: Long,
      end: Long, fileLen: Long, nRef: Int, hdrMember: Long, hdrU: Int)
      : (Seq[Long], Seq[MemberStat]) = {
    val ch = new SeekableFile(bam, confBox.conf)
    try {
      val firstMember =
        if (start == 0) 0L else Bgzf.nextMemberStart(ch, start, fileLen)
      if (firstMember >= end || firstMember >= fileLen) return (Nil, Nil)
      // enumerate boundaries by BSIZE hops (18-byte positioned reads)
      val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
      val hdr = new Array[Byte](18)
      var off = firstMember
      var ok = true
      while (ok && off < end) {
        val got = ch.readAtFully(off, hdr)
        val total = Bgzf.memberLength(hdr, 0, got)
        if (total <= 0) ok = false
        else { offsets += off; off += total }
      }
      // position at the first owned record: exact header end if this range
      // holds it, validated guessing otherwise
      val streamOpt: Option[BgzfInputStream] =
        if (firstMember <= hdrMember) {
          if (hdrMember >= end) None
          else {
            val st = new BgzfInputStream(ch, hdrMember)
            HadoopIO.skipFully(st, hdrU.toLong, s"$bam header end")
            Some(st)
          }
        } else BamSync.syncToRecord(ch, firstMember, end, nRef, bam)
      val stats = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Int]]
      streamOpt.foreach { in =>
        val din = new DataInputStream(in)
        def i32(): Int = {
          val b0 = din.read(); val b1 = din.read(); val b2 = din.read(); val b3 = din.read()
          if ((b0 | b1 | b2 | b3) < 0) throw new EOFException()
          b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        }
        var done = false
        while (!done) {
          val (mOff, uOff) = in.virtualPos
          if (mOff >= end || mOff >= fileLen) done = true
          else {
            try {
              val blockSize = i32()
              val refId = i32()
              val pos = i32()
              HadoopIO.skipFully(din, (blockSize - 8).toLong, s"$bam record at $mOff+$uOff")
              val st = stats.getOrElseUpdate(mOff, Array(-1, Int.MaxValue,
                Int.MinValue, Int.MaxValue, Int.MinValue))
              if (st(0) < 0) st(0) = uOff
              st(1) = math.min(st(1), refId); st(2) = math.max(st(2), refId)
              st(3) = math.min(st(3), pos); st(4) = math.max(st(4), pos)
            } catch { case _: EOFException => done = true }
          }
        }
        in.close()
      }
      (offsets.toSeq,
        stats.toSeq.map { case (o, a) => MemberStat(o, a(0), a(1), a(2), a(3), a(4)) })
    } finally ch.close()
  }

  def read(bam: String, conf: Configuration = new Configuration()): Array[MemberStat] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      HadoopIO.open(sidecarPath(bam), conf)))
    try {
      require(in.readInt() == Magic, s"bad .gai sidecar for $bam")
      val n = in.readInt()
      // a corrupt negative count must not silently read as an empty index
      // (Array.fill(-n) returns empty) — the reader would prune everything
      require(n >= 0 && n <= (1 << 26), s"corrupt .gai for $bam: count $n")
      Array.fill(n)(MemberStat(in.readLong(), in.readInt(), in.readInt(),
        in.readInt(), in.readInt(), in.readInt()))
    } finally in.close()
  }

  /** Can any record starting in this member satisfy the pushed predicates?
    * Conservative: only referenceName equality and `start` comparisons
    * prune; everything else keeps the member. `pos` in the index is
    * 0-based (BAM), `start` predicates are 1-based (SAM). */
  def mayMatch(m: MemberStat, preds: Seq[SamFilters.Pred],
      refNames: Array[String]): Boolean = {
    if (m.firstRecUoffset < 0) return false // no record starts here
    preds.forall {
      case SamFilters.RefNameEq(v) =>
        // '*' is the text form of refId -1 (unmapped); an unknown name
        // matches no record at all
        val id = if (v == "*") -1 else refNames.indexOf(v)
        if (id < 0 && v != "*") false else m.minRef <= id && id <= m.maxRef
      case SamFilters.IntCmp("start", op, value) =>
        val lo = m.minPos + 1L
        val hi = m.maxPos + 1L
        op match {
          case "="  => lo <= value && value <= hi
          case "<"  => lo < value
          case "<=" => lo <= value
          case ">"  => hi > value
          case ">=" => hi >= value
        }
      case SamFilters.AndP(l, r) =>
        mayMatch(m, Seq(l), refNames) && mayMatch(m, Seq(r), refNames)
      case _ => true // flag masks etc: not indexed
    }
  }

  /** Runs of consecutive keepable members within [from, until):
    * (runStartOffset, firstRecUoffset of the run's first member,
    * endOffset = offset of the first non-kept member after the run —
    * where the reader stops decoding and jumps to the next run;
    * Long.MaxValue when the run reaches the range end, the reader's
    * ownership check bounds it there). */
  def selectRuns(stats: Array[MemberStat], preds: Seq[SamFilters.Pred],
      refNames: Array[String], from: Long, until: Long): Seq[(Long, Int, Long)] = {
    val inRange = stats.filter(m => m.offset >= from && m.offset < until)
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    var open = -1 // index into runs of the currently-open run
    inRange.foreach { m =>
      val keep = mayMatch(m, preds, refNames)
      if (keep && open < 0) { runs += ((m.offset, m.firstRecUoffset, Long.MaxValue)); open = runs.length - 1 }
      else if (!keep && open >= 0) {
        val (o, u, _) = runs(open); runs(open) = (o, u, m.offset); open = -1
      }
    }
    runs.toSeq
  }
}
