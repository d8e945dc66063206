package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}

import org.apache.hadoop.conf.Configuration

/** Reader/writer for the standard BAI index format (SAM spec §5.2-5.3) —
  * compatibility with samtools-indexed BAMs.
  *
  * The reference's published workflow assumes `samtools index`ed input
  * (/root/reference/README.md:23,32 and scripts/mitoscape.sh:39-46): a
  * user switching to this library already HAS `.bai` sidecars next to
  * every sorted BAM. The graft-native `.gai` (BamIndex) stays the richer
  * index — per-member coordinate stats prune arbitrary predicate shapes
  * and position every split exactly — but when only a `.bai` exists, a
  * region-shaped pushed predicate (referenceName equality + `start`
  * bounds) prunes through it instead of falling back to a full scan.
  *
  * Format (all little-endian): magic "BAI\1", n_ref; per reference a
  * binned index (6-level R-tree over [0, 2^29), bin numbers per the
  * spec's reg2bin) of chunks — (beg, end) BGZF VIRTUAL offsets, i.e.
  * `(memberFileOffset << 16) | uncompressedOffsetInMember` — plus a
  * linear index of 16 kb windows → lowest voffset of a record whose span
  * touches the window; then an optional count of unplaced reads.
  * `BgzfInputStream.virtualPos` returns exactly the (member, offset)
  * pair a voffset packs, so positioning by chunk start needs no guessing.
  *
  * Pruning model: chunks for a region are a SUPERSET of the records whose
  * span overlaps it (bin granularity), and the reader widens them further
  * to whole BGZF members ([[memberRuns]]) to fit the member-granularity
  * run protocol it shares with the `.gai` path. Every widened-in record
  * is still filtered by the per-record pushed predicate evaluation, so
  * the index only ever SKIPS work, never changes results (BaiIndexSpec
  * pins indexed ≡ unindexed on both single- and multi-split scans).
  */
object BaiIndex {

  /** One contiguous run of records in virtual-offset space. */
  final case class Chunk(beg: Long, end: Long)
  /** One reference's index: bin → chunks, plus the 16 kb linear index. */
  final case class RefIndex(bins: Map[Int, Array[Chunk]], linear: Array[Long])
  final case class Bai(refs: Array[RefIndex], noCoor: Long)

  /** Per-reference record statistics carried by the htslib PSEUDO-BIN
    * (SAM spec §5.2, bin 37450 for BAI; the scheme's max bin + 2 for
    * CSI): virtual offsets of the reference's first/last record and its
    * mapped/unmapped (FLAG 0x4, coordinate-placed) segment counts.
    * Emitting it makes graft sidecars `samtools idxstats`-readable and
    * powers the metadata-only [[Idxstats]] surface; reading it serves
    * stats from samtools-built indexes too. */
  final case class RefStat(offBeg: Long, offEnd: Long, nMapped: Long,
      nUnmapped: Long)

  /** Pseudo-bin number for a scheme of the given depth: the bin count
    * `((1 << 3(depth+1)) - 1) / 7` plus one — 37450 at BAI's depth 5,
    * matching the spec's constant. */
  def metaBin(depth: Int): Int = ((1 << (3 * (depth + 1))) - 1) / 7 + 1

  /** Max coordinate the 6-level binning scheme addresses. */
  val MaxPos: Int = 1 << 29

  def sidecarPath(bam: String): String = bam + ".bai"

  /** CLI: `runMain graft.sources.BaiIndex [--distributed] <file.bam> ...`
    * builds standard `.bai` sidecars (the samtools-index equivalent, for
    * handing graft-written BAMs back to a samtools-based pipeline).
    * `--distributed` fans the record scan out over a Spark job
    * ([[buildDistributed]]) — the form that indexes a WGS-scale BAM in
    * one cluster pass. */
  def main(args: Array[String]): Unit = {
    val (flags, paths) = args.partition(_.startsWith("--"))
    require(paths.nonEmpty,
      "usage: BaiIndex [--distributed] <file.bam> [more.bam ...]")
    val dist = flags.contains("--distributed")
    val spark = if (dist) Some(org.apache.spark.sql.SparkSession.builder()
      .appName("graft-bai").getOrCreate()) else None
    try paths.foreach { p =>
      val n = spark.map(buildDistributed(_, p)).getOrElse(build(p))
      println(s"[bai] indexed $p: $n records -> ${sidecarPath(p)}")
    } finally spark.foreach(_.stop())
  }

  /** A usable sidecar exists: present AND at least as new as the BAM
    * (same staleness rule as BamIndex — a stale index silently misreads). */
  def exists(bam: String, conf: Configuration = new Configuration()): Boolean = {
    val side = sidecarPath(bam)
    HadoopIO.exists(side, conf) && HadoopIO.exists(bam, conf) &&
      HadoopIO.modTime(side, conf) >= HadoopIO.modTime(bam, conf)
  }

  // ---- binning arithmetic (SAM spec §5.3, 0-based half-open [beg, end))

  /** The SMALLEST bin fully containing [beg, end). */
  def reg2bin(beg: Int, end0: Int): Int = {
    val end = end0 - 1
    if (beg >> 14 == end >> 14) ((1 << 15) - 1) / 7 + (beg >> 14)
    else if (beg >> 17 == end >> 17) ((1 << 12) - 1) / 7 + (beg >> 17)
    else if (beg >> 20 == end >> 20) ((1 << 9) - 1) / 7 + (beg >> 20)
    else if (beg >> 23 == end >> 23) ((1 << 6) - 1) / 7 + (beg >> 23)
    else if (beg >> 26 == end >> 26) ((1 << 3) - 1) / 7 + (beg >> 26)
    else 0
  }

  /** Every bin that can hold a record overlapping [beg, end). */
  def reg2bins(beg0: Int, end0: Int): Array[Int] = {
    val beg = math.max(0, beg0)
    val end = math.min(MaxPos, end0) - 1
    if (end < beg) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer(0)
    var k = 1 + (beg >> 26); while (k <= 1 + (end >> 26)) { out += k; k += 1 }
    k = 9 + (beg >> 23); while (k <= 9 + (end >> 23)) { out += k; k += 1 }
    k = 73 + (beg >> 20); while (k <= 73 + (end >> 20)) { out += k; k += 1 }
    k = 585 + (beg >> 17); while (k <= 585 + (end >> 17)) { out += k; k += 1 }
    k = 4681 + (beg >> 14); while (k <= 4681 + (end >> 14)) { out += k; k += 1 }
    out.toArray
  }

  // ---- build (the samtools-index analogue, for fixtures and for BAMs
  // written by BamWriter that a downstream samtools user will region-scan)

  /** One sequential pass over a coordinate-sorted BAM → a standard `.bai`.
    * Spans come from POS + the reference length of the CIGAR (M/D/N/=/X,
    * zero-span reads widened to 1 base), exactly the spec's rule; unplaced
    * reads (refId < 0) only count into `n_no_coor`. Refuses unsorted input
    * loudly — a BAI over an unsorted file would silently drop records from
    * every region query. */
  def build(bam: String, conf: Configuration = new Configuration()): Int = {
    val ch = new SeekableFile(bam, conf)
    try {
      val fileLen = ch.size
      val in = new BgzfInputStream(ch, 0L)
      val din = new DataInputStream(in)
      def u8(): Int = {
        val b = din.read(); if (b < 0) throw new EOFException(); b
      }
      def i16(): Int = u8() | (u8() << 8)
      def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
      val magic = new Array[Byte](4); din.readFully(magic)
      require(magic.sameElements(Array[Byte]('B', 'A', 'M', 1)), s"not BAM: $bam")
      HadoopIO.skipFully(din, i32().toLong, s"$bam header text")
      val nRef = i32()
      var r = 0
      while (r < nRef) { HadoopIO.skipFully(din, i32().toLong, s"$bam ref dict"); i32(); r += 1 }

      // per-ref accumulators; a bin's chunks merge when the new record
      // starts in the same member its last chunk ended in (htslib's rule —
      // chunk boundaries inside one member buy no seek granularity)
      val bins = Array.fill(nRef)(scala.collection.mutable.LinkedHashMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[Chunk]])
      val linear = Array.fill(nRef)(
        scala.collection.mutable.ArrayBuffer.empty[Long])
      val stats = Array.fill[RefStat](nRef)(null)
      var noCoor = 0L
      var n = 0
      var lastRef = -1
      var lastPos = -1
      var done = false
      while (!done) {
        val (mBeg, uBeg) = in.virtualPos
        if (mBeg >= fileLen) done = true
        else {
          try {
            val blockSize = i32()
            val refId = i32()
            val pos = i32()
            val lReadName = u8()
            u8() // mapq
            i16() // bin (recomputed below — never trusted)
            val nCigar = i16()
            val flag = i16()
            i32() // l_seq
            HadoopIO.skipFully(din, 12L, s"$bam mate fields") // next_refID/next_pos/tlen
            HadoopIO.skipFully(din, lReadName.toLong, s"$bam read name")
            var refLen = 0
            var c = 0
            while (c < nCigar) {
              val v = i32()
              (v & 0xf) match {
                case 0 | 2 | 3 | 7 | 8 => refLen += (v >>> 4) // M D N = X
                case _                 => ()
              }
              c += 1
            }
            HadoopIO.skipFully(din,
              (blockSize - 32 - lReadName - 4 * nCigar).toLong, s"$bam record tail")
            val vBeg = (mBeg << 16) | uBeg
            val (mEnd, uEnd) = in.virtualPos
            val vEnd = (mEnd << 16) | uEnd
            if (refId < 0 || pos < 0) {
              noCoor += 1
            } else {
              require(refId < nRef, s"$bam: refId $refId out of range")
              require(refId > lastRef || (refId == lastRef && pos >= lastPos),
                s"$bam is not coordinate-sorted at record $n " +
                  s"(ref $refId pos $pos after ref $lastRef pos $lastPos) — " +
                  "a BAI over an unsorted file silently drops region records")
              lastRef = refId; lastPos = pos
              val end = pos + math.max(1, refLen)
              require(end <= MaxPos,
                s"$bam: record end $end exceeds BAI's 2^29 cap — " +
                  "index this long-contig file with a .csi instead " +
                  "(CsiIndex.build / buildDistributed)")
              stats(refId) = {
                val prev = stats(refId)
                val unm = if ((flag & 4) != 0) 1L else 0L
                if (prev == null) RefStat(vBeg, vEnd, 1L - unm, unm)
                else RefStat(prev.offBeg, vEnd, prev.nMapped + 1L - unm,
                  prev.nUnmapped + unm)
              }
              val bin = reg2bin(pos, end)
              val bcs = bins(refId).getOrElseUpdate(bin,
                scala.collection.mutable.ArrayBuffer.empty[Chunk])
              if (bcs.nonEmpty && (bcs.last.end >>> 16) == mBeg)
                bcs(bcs.length - 1) = Chunk(bcs.last.beg, vEnd)
              else bcs += Chunk(vBeg, vEnd)
              val lin = linear(refId)
              var w = pos >> 14
              val wEnd = (end - 1) >> 14
              while (w <= wEnd) {
                while (lin.length <= w) lin += 0L
                if (lin(w) == 0L) lin(w) = vBeg
                w += 1
              }
            }
            n += 1
          } catch { case _: EOFException => done = true }
        }
      }
      writeBai(bam, conf, bins, linear, noCoor, stats)
      n
    } finally ch.close()
  }

  /** Shared `.bai` encoder — the sequential, distributed, and
    * index-on-write paths accumulate the SAME structures, so one encoder
    * is what makes their sidecars provably byte-identical. */
  private[sources] def writeBai(bam: String, conf: Configuration,
      bins: Array[scala.collection.mutable.LinkedHashMap[Int,
        scala.collection.mutable.ArrayBuffer[Chunk]]],
      linear: Array[scala.collection.mutable.ArrayBuffer[Long]],
      noCoor: Long, stats: Array[RefStat]): Unit = {
    val nRef = bins.length
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      HadoopIO.create(sidecarPath(bam), conf)))
    try {
      def le32(v: Int): Unit = out.writeInt(Integer.reverseBytes(v))
      def le64(v: Long): Unit = out.writeLong(java.lang.Long.reverseBytes(v))
      out.write(Array[Byte]('B', 'A', 'I', 1))
      le32(nRef)
      var ri = 0
      while (ri < nRef) {
        val bm = bins(ri)
        val st = stats(ri)
        le32(bm.size + (if (st == null) 0 else 1))
        bm.foreach { case (bin, cs) =>
          le32(bin); le32(cs.length)
          cs.foreach { ck => le64(ck.beg); le64(ck.end) }
        }
        if (st != null) {
          // htslib pseudo-bin (bin 37450): first "chunk" = the ref's
          // record span in virtual offsets, second = its mapped/unmapped
          // counts — what `samtools idxstats` serves without a scan
          le32(metaBin(5)); le32(2)
          le64(st.offBeg); le64(st.offEnd)
          le64(st.nMapped); le64(st.nUnmapped)
        }
        val lin = linear(ri)
        le32(lin.length)
        lin.foreach(le64)
        ri += 1
      }
      le64(noCoor)
    } finally out.close()
  }

  /** One task's pre-aggregated contribution to a distributed BAI/CSI
    * build: per-(refId, bin) chunk runs already merged WITHIN the task,
    * per-window linear minima, the task's first/last mapped (refId, pos)
    * for the cross-task sortedness check, and its record/unplaced
    * counts. Sized by bins touched, not records — a task over 16 MB of a
    * WGS BAM carries a few KB back to the driver. */
  private[sources] final case class TaskBai(
      bins: Seq[((Int, Int), Seq[Chunk])], // in-task DISCOVERY order — the
      // driver replays it so bin insertion order matches the sequential
      // builder's record-order discovery (byte-identical sidecars)
      linear: Map[(Int, Int), Long],
      firstKey: Option[(Int, Int)], lastKey: Option[(Int, Int)],
      noCoor: Long, n: Long,
      stats: Map[Int, RefStat] = Map.empty) // per-ref pseudo-bin stats

  /** Executor-parallel `.bai` build over byte-range splits — the form a
    * WGS-scale sorted BAM gets samtools-compatible indexing with (the
    * sequential [[build]] is the fixture/CLI path). Same split protocol as
    * `BamIndex.buildDistributed`: each task owns the members starting in
    * its range, syncs to its first record by validated guessing (or the
    * driver-supplied exact header end), and walks records accumulating
    * bin chunks/linear minima locally. The driver concatenates task
    * results in file order, applies the same same-member chunk-merge rule
    * across task seams, and verifies sortedness across them — the sidecar
    * is byte-identical to [[build]]'s (BaiIndexSpec asserts exactly that). */
  def buildDistributed(s: org.apache.spark.sql.SparkSession, bam: String,
      splitSize: Long = 16L * 1024 * 1024): Int = {
    val confBox = HadoopIO.capture()
    val (fileLen, nRef, hdrMember, hdrU) = parseHeader(bam, confBox)
    val ranges = (0L until fileLen by splitSize)
      .map(st => (st, math.min(st + splitSize, fileLen)))
    val parts = s.sparkContext
      .parallelize(ranges, ranges.size)
      .map { case (start, end) =>
        scanRangeBam(bam, confBox, start, end, fileLen, nRef, hdrMember,
          hdrU, reg2bin, 14, MaxPos)
      }
      .collect() // partition order == byte order == record order (sorted BAM)
    val (bins, linear, noCoor, n, stats) = mergeTasks(parts, nRef, bam)
    writeBai(bam, confBox.conf, bins, linear, noCoor, stats)
    n.toInt
  }

  /** Driver-side header parse: nRef for record validation + the exact
    * virtual position where records begin. */
  private[sources] def parseHeader(bam: String, confBox: HadoopIO.ConfBox)
      : (Long, Int, Long, Int) = {
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

  /** Driver-side merge of task accumulations in file order: cross-task
    * sortedness check, deterministic record-order bin discovery (the
    * sequential builders' exact insertion order), same-member chunk
    * merge across seams, unsigned-min linear merge. Shared by the BAI
    * and BAM-CSI distributed builds. */
  private[sources] def mergeTasks(parts: Array[TaskBai], nRef: Int,
      bam: String)
      : (Array[scala.collection.mutable.LinkedHashMap[Int,
          scala.collection.mutable.ArrayBuffer[Chunk]]],
        Array[scala.collection.mutable.ArrayBuffer[Long]], Long, Long,
        Array[RefStat]) = {
    // cross-task sortedness: task i's last mapped key must not exceed
    // task i+1's first (within-task order was checked on the executor)
    val keyed = parts.filter(p => p.firstKey.isDefined)
    keyed.sliding(2).foreach {
      case Array(a, b) =>
        val (lr, lp) = a.lastKey.get
        val (fr, fp) = b.firstKey.get
        require(fr > lr || (fr == lr && fp >= lp),
          s"$bam is not coordinate-sorted across split seams " +
            s"(ref $fr pos $fp after ref $lr pos $lp) — " +
            "an index over an unsorted file silently drops region records")
      case _ => ()
    }
    val bins = Array.fill(nRef)(scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Chunk]])
    val linear = Array.fill(nRef)(
      scala.collection.mutable.ArrayBuffer.empty[Long])
    val stats = Array.fill[RefStat](nRef)(null)
    var noCoor = 0L
    var n = 0L
    // deterministic bin insertion order: the sequential builder discovers
    // bins in record order; replaying tasks in file order with ordered
    // within-task maps reproduces it exactly
    parts.foreach { p =>
      // pseudo-bin stats: parts replay in file order, so the first task
      // seeing a ref owns offBeg and the last seen vEnd wins offEnd
      p.stats.foreach { case (refId, st) =>
        val prev = stats(refId)
        stats(refId) =
          if (prev == null) st
          else RefStat(prev.offBeg, st.offEnd,
            prev.nMapped + st.nMapped, prev.nUnmapped + st.nUnmapped)
      }
      p.bins.foreach { case ((refId, bin), cs) =>
        val bcs = bins(refId).getOrElseUpdate(bin,
          scala.collection.mutable.ArrayBuffer.empty[Chunk])
        cs.foreach { c =>
          if (bcs.nonEmpty && (bcs.last.end >>> 16) == (c.beg >>> 16))
            bcs(bcs.length - 1) = Chunk(bcs.last.beg, c.end)
          else bcs += c
        }
      }
      p.linear.foreach { case ((refId, w), v) =>
        val lin = linear(refId)
        while (lin.length <= w) lin += 0L
        if (lin(w) == 0L ||
            java.lang.Long.compareUnsigned(v, lin(w)) < 0) lin(w) = v
      }
      noCoor += p.noCoor
      n += p.n
    }
    require(n <= Int.MaxValue, s"$bam: $n records overflow the record count")
    (bins, linear, noCoor, n, stats)
  }

  /** Shift every virtual offset in a task accumulation by `byteShift`
    * raw file bytes — how a PART-LOCAL accumulation (offsets relative to
    * a task's own part file) relocates to the concatenated single file
    * (BGZF members concatenate verbatim, so member offsets translate by
    * the preceding bytes and intra-member offsets are unchanged;
    * voffset = (member << 16) | u, so the shift is `byteShift << 16`).
    * Keys (refId, pos) and counts are position-independent. */
  private[sources] def shiftTask(p: TaskBai, byteShift: Long): TaskBai = {
    val d = byteShift << 16
    TaskBai(
      p.bins.map { case (k, cs) =>
        (k, cs.map(c => Chunk(c.beg + d, c.end + d)))
      },
      p.linear.map { case (k, v) => (k, v + d) },
      p.firstKey, p.lastKey, p.noCoor, p.n,
      p.stats.map { case (k, st) =>
        (k, st.copy(offBeg = st.offBeg + d, offEnd = st.offEnd + d))
      })
  }

  /** One task's record walk: own the members starting in [start, end),
    * sync to the first record (exact header end when this range holds it),
    * accumulate bin chunks merged within the stream plus linear minima.
    * `binOf`/`linShift` parameterize the binning scheme (BAI: reg2bin/14;
    * BAM-CSI: the generalized scheme at min_shift granularity). Runs on
    * an executor. */
  private[sources] def scanRangeBam(bam: String, confBox: HadoopIO.ConfBox,
      start: Long, end: Long, fileLen: Long, nRef: Int,
      hdrMember: Long, hdrU: Int, binOf: (Int, Int) => Int,
      linShift: Int, maxPosCap: Int = Int.MaxValue): TaskBai = {
    val ch = new SeekableFile(bam, confBox.conf)
    try {
      val firstMember =
        if (start == 0) 0L else Bgzf.nextMemberStart(ch, start, fileLen)
      if (firstMember >= end || firstMember >= fileLen)
        return TaskBai(Nil, Map.empty, None, None, 0L, 0L)
      val streamOpt: Option[BgzfInputStream] =
        if (firstMember <= hdrMember) {
          if (hdrMember >= end) None
          else {
            val st = new BgzfInputStream(ch, hdrMember)
            HadoopIO.skipFully(st, hdrU.toLong, s"$bam header end")
            Some(st)
          }
        } else BamSync.syncToRecord(ch, firstMember, end, nRef, bam)
      val bins = scala.collection.mutable.LinkedHashMap
        .empty[(Int, Int), scala.collection.mutable.ArrayBuffer[Chunk]]
      val linear = scala.collection.mutable.LinkedHashMap.empty[(Int, Int), Long]
      val stats = scala.collection.mutable.LinkedHashMap.empty[Int, RefStat]
      var firstKey: Option[(Int, Int)] = None
      var lastRef = -1
      var lastPos = -1
      var noCoor = 0L
      var n = 0L
      streamOpt.foreach { in =>
        val din = new DataInputStream(in)
        def u8(): Int = {
          val b = din.read(); if (b < 0) throw new EOFException(); b
        }
        def i16(): Int = u8() | (u8() << 8)
        def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
        var done = false
        while (!done) {
          val (mBeg, uBeg) = in.virtualPos
          if (mBeg >= end || mBeg >= fileLen) done = true
          else {
            try {
              val blockSize = i32()
              val refId = i32()
              val pos = i32()
              val lReadName = u8()
              u8(); i16() // mapq, stored bin (recomputed — never trusted)
              val nCigar = i16()
              val flag = i16()
              i32() // l_seq
              HadoopIO.skipFully(din, 12L, s"$bam mate fields")
              HadoopIO.skipFully(din, lReadName.toLong, s"$bam read name")
              var refLen = 0
              var c = 0
              while (c < nCigar) {
                val v = i32()
                (v & 0xf) match {
                  case 0 | 2 | 3 | 7 | 8 => refLen += (v >>> 4)
                  case _                 => ()
                }
                c += 1
              }
              HadoopIO.skipFully(din,
                (blockSize - 32 - lReadName - 4 * nCigar).toLong,
                s"$bam record tail")
              val vBeg = (mBeg << 16) | uBeg
              val (mEnd, uEnd) = in.virtualPos
              val vEnd = (mEnd << 16) | uEnd
              if (refId < 0 || pos < 0) noCoor += 1
              else {
                require(refId < nRef, s"$bam: refId $refId out of range")
                require(refId > lastRef || (refId == lastRef && pos >= lastPos),
                  s"$bam is not coordinate-sorted " +
                    s"(ref $refId pos $pos after ref $lastRef pos $lastPos)")
                lastRef = refId; lastPos = pos
                if (firstKey.isEmpty) firstKey = Some((refId, pos))
                val unm = if ((flag & 4) != 0) 1L else 0L
                stats(refId) = stats.get(refId) match {
                  case None => RefStat(vBeg, vEnd, 1L - unm, unm)
                  case Some(prev) => RefStat(prev.offBeg, vEnd,
                    prev.nMapped + 1L - unm, prev.nUnmapped + unm)
                }
                val bamEnd = pos + math.max(1, refLen)
                require(bamEnd <= maxPosCap,
                  s"$bam: record end $bamEnd exceeds the binning " +
                    s"scheme's $maxPosCap cap")
                val bin = binOf(pos, bamEnd)
                val bcs = bins.getOrElseUpdate((refId, bin),
                  scala.collection.mutable.ArrayBuffer.empty[Chunk])
                if (bcs.nonEmpty && (bcs.last.end >>> 16) == mBeg)
                  bcs(bcs.length - 1) = Chunk(bcs.last.beg, vEnd)
                else bcs += Chunk(vBeg, vEnd)
                var w = pos >> linShift
                val wEnd = (bamEnd - 1) >> linShift
                while (w <= wEnd) {
                  val k = (refId, w)
                  val cur = linear.getOrElse(k, 0L)
                  if (cur == 0L ||
                      java.lang.Long.compareUnsigned(vBeg, cur) < 0)
                    linear(k) = vBeg
                  w += 1
                }
              }
              n += 1
            } catch { case _: EOFException => done = true }
          }
        }
        in.close()
      }
      TaskBai(
        bins.toSeq.map { case (k, v) => (k, v.toSeq) },
        linear.toMap,
        firstKey,
        if (lastRef >= 0) Some((lastRef, lastPos)) else None,
        noCoor, n, stats.toMap)
    } finally ch.close()
  }

  def read(bam: String, conf: Configuration = new Configuration()): Bai = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      HadoopIO.open(sidecarPath(bam), conf)))
    try {
      def le32(): Int = Integer.reverseBytes(in.readInt())
      def le64(): Long = java.lang.Long.reverseBytes(in.readLong())
      val magic = new Array[Byte](4); in.readFully(magic)
      require(magic.sameElements(Array[Byte]('B', 'A', 'I', 1)),
        s"bad .bai sidecar for $bam")
      // count guards: Array.fill/(0 until n) silently treat a corrupt
      // NEGATIVE count as zero — a truncated-with-garbage sidecar would
      // then read as an empty index and the scan would silently prune
      // EVERYTHING; bound above too, so a corrupt count can't size an
      // absurd allocation either
      def counted(what: String): Int = {
        val n = le32()
        require(n >= 0 && n <= (1 << 26), s"corrupt .bai for $bam: $what $n")
        n
      }
      val refs = Array.fill(counted("n_ref")) {
        val bins = (0 until counted("n_bin")).map { _ =>
          val bin = le32()
          val chunks = Array.fill(counted("n_chunk"))(Chunk(le64(), le64()))
          bin -> chunks
        }.toMap
        val lin = Array.fill(counted("n_intv"))(le64())
        RefIndex(bins, lin)
      }
      // trailing n_no_coor is optional in the spec
      val noCoor = try le64() catch { case _: EOFException => 0L }
      Bai(refs, noCoor)
    } finally in.close()
  }

  /** Merged chunks whose records may overlap region [beg, end) of refId:
    * the union of the region's bins, floored by the linear index (chunks
    * ending before the window's first overlapping record can't contribute),
    * merged at member granularity. */
  def chunks(bai: Bai, refId: Int, beg: Int, end: Int): Seq[Chunk] = {
    if (refId < 0 || refId >= bai.refs.length || beg >= end) return Nil
    val ri = bai.refs(refId)
    val w = math.max(0, beg) >> 14
    val minOff =
      if (w < ri.linear.length && ri.linear(w) != 0L) ri.linear(w) else 0L
    val cs = reg2bins(beg, end)
      .flatMap(b => ri.bins.getOrElse(b, Array.empty[Chunk]))
      .filter(c => java.lang.Long.compareUnsigned(c.end, minOff) > 0)
      .sortBy(_.beg)
    val merged = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    cs.foreach { c =>
      if (merged.nonEmpty && (c.beg >>> 16) <= (merged.last.end >>> 16))
        merged(merged.length - 1) =
          Chunk(merged.last.beg, math.max(merged.last.end, c.end))
      else merged += c
    }
    merged.toSeq
  }

  /** The region a pushed predicate set constrains, or None when a binned
    * index cannot prune it (no referenceName equality, `*`/unknown name —
    * those scans fall back to the full-file path and stay correct).
    * 0-based half-open; `start` predicates are 1-based SAM. Contradictory
    * bounds yield an empty region → zero runs → the scan reads nothing.
    * `maxPos` is the index scheme's coordinate cap (BAI: 2^29; CSI:
    * whatever its (min_shift, depth) addresses) — clamping an unbounded
    * upper predicate to it keeps tail records inside the region. */
  def region(preds: Seq[SamFilters.Pred], refNames: Array[String],
      maxPos: Int = MaxPos): Option[(Int, Int, Int)] = {
    val flat = scala.collection.mutable.ArrayBuffer.empty[SamFilters.Pred]
    def walk(p: SamFilters.Pred): Unit = p match {
      case SamFilters.AndP(l, r) => walk(l); walk(r)
      case other                 => flat += other
    }
    preds.foreach(walk)
    val refIds = flat.collect { case SamFilters.RefNameEq(v) =>
      if (v == "*") -1 else refNames.indexOf(v)
    }.distinct
    if (refIds.length != 1 || refIds.head < 0) return None
    def clamp(v: Long): Int =
      math.min(maxPos.toLong, math.max(0L, v)).toInt
    var beg = 0
    var end = maxPos
    flat.foreach {
      case SamFilters.IntCmp("start", op, v) => op match {
        // 1-based start s → 0-based pos p = s-1
        case ">=" => beg = math.max(beg, clamp(v - 1))
        case ">"  => beg = math.max(beg, clamp(v))
        case "<=" => end = math.min(end, clamp(v))
        case "<"  => end = math.min(end, clamp(v - 1))
        case "="  => beg = math.max(beg, clamp(v - 1)); end = math.min(end, clamp(v))
      }
      case _ => ()
    }
    Some((refIds.head, beg, math.max(beg, end)))
  }

  /** Chunks → the reader's member-granularity run protocol
    * (startMemberOffset, startUoffset, stopMemberOffset): decode from the
    * chunk's first record, stop at the first member past its records. A
    * chunk end with a nonzero intra-member offset means records extend
    * INTO that member, so the stop bound is one past it (+1 is below the
    * ≥28-byte minimum member length, so it cannot overshoot a boundary);
    * runs whose member spans touch merge — decoding a member twice would
    * duplicate records. */
  def memberRuns(cs: Seq[Chunk]): Seq[(Long, Int, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    cs.sortBy(_.beg).foreach { c =>
      val mBeg = c.beg >>> 16
      val u = (c.beg & 0xffff).toInt
      val stop = (c.end >>> 16) + (if ((c.end & 0xffff) != 0) 1L else 0L)
      val bound = math.max(stop, mBeg + 1)
      if (out.nonEmpty && mBeg <= out.last._3) {
        val (o0, u0, b0) = out.last
        out(out.length - 1) = (o0, u0, math.max(b0, bound))
      } else out += ((mBeg, u, bound))
    }
    out.toSeq
  }
}
