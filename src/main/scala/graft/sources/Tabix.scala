package graft.sources

import java.io.{DataInputStream, EOFException}

import org.apache.hadoop.conf.Configuration

/** Tabix indexing for bgzip'd VCF — the `.tbi` sidecar `tabix -p vcf`
  * emits (written from the tabix paper, Li 2011, and the format section
  * of the htslib tabix manpage / SAM spec appendix) plus a `.csi`
  * variant for long contigs. These are what make a cohort VCF a
  * random-access artifact: region queries decode only the BGZF members
  * whose records can overlap, exactly like `.bai`/`.csi` for BAM.
  *
  * `.tbi` structure (itself BGZF-compressed, little-endian): magic
  * `TBI\1`; n_ref; the six config ints (format, col_seq, col_beg,
  * col_end, meta, skip); l_nm + NUL-terminated contig names (defining
  * refId order); per ref a BAI-shaped binned index (bin → chunks of
  * virtual offsets) plus the 16 kb linear index; optional n_no_coor.
  * Binning is EXACTLY BAI's six-level 2^29 scheme, so region queries
  * reuse [[BaiIndex.chunks]] verbatim via a [[BaiIndex.Bai]] view.
  *
  * `.csi` variant: the same accumulation written in [[CsiIndex]]'s
  * encoding with the tabix config + names as the aux blob (the layout
  * htslib stores for `tabix -C`), so contigs past 2^29 index correctly;
  * [[CsiIndex.read]] parses it back and [[names]] recovers the contig
  * order from aux.
  *
  * VCF coordinate rule (format=2): beg = POS−1 (0-based), end = beg +
  * max(1, len(REF)) — the reference-footprint interval; both indexes
  * only ever SKIP members, never filter records, so a widened-in record
  * is re-filtered by the reader's predicate and correctness never
  * depends on the index. Build REQUIRES coordinate-sorted input and
  * raises loudly otherwise (an index over an unsorted file silently
  * drops region records — the CsiIndex.build rule). */
object Tabix {

  import BaiIndex.{Chunk, RefIndex}

  /** The tabix preset for VCF: sequence col 1, begin col 2, end col 0
    * (= derive from REF length), meta '#', skip 0. */
  val VcfFormat = 2
  private val LinearShift = 14

  def sidecarPath(vcf: String): String = vcf + ".tbi"

  def exists(vcf: String, conf: Configuration = new Configuration()): Boolean = {
    val side = sidecarPath(vcf)
    HadoopIO.exists(side, conf) && HadoopIO.exists(vcf, conf) &&
      HadoopIO.modTime(side, conf) >= HadoopIO.modTime(vcf, conf)
  }

  final case class Tbi(names: Array[String], bai: BaiIndex.Bai)

  // ---- shared accumulation over one sorted pass of the bgzip'd VCF

  private final class Acc {
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val nameId = scala.collection.mutable.HashMap.empty[String, Int]
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.LinkedHashMap[Int,
        scala.collection.mutable.ArrayBuffer[Chunk]]]
    val lidx = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[Long]]
    var n = 0
  }

  /** One pass over the bgzip'd VCF: per record, its (refId, beg, end,
    * vBeg, vEnd); sortedness enforced. `binOf` maps the interval to a
    * bin in the target scheme. */
  private def collect(vcf: String, conf: Configuration,
      binOf: (Long, Long) => Int, maxPos: Long): Acc = {
    val file = new SeekableFile(vcf, conf)
    try {
      val fileLen = file.size
      val in = new BgzfInputStream(file, 0L)
      val acc = new Acc
      val lb = new FastqLineBuf
      var lastRef = -1
      var lastBeg = -1L
      var done = false
      while (!done) {
        val (m0, u0) = in.virtualPos
        if (m0 >= fileLen) done = true
        else {
          lb.reset()
          var b = in.read()
          if (b == -1) done = true
          else {
            while (b != -1 && b != '\n') { lb.append(b); b = in.read() }
            val line = lb.toLine
            if (line.nonEmpty && line.charAt(0) != '#') {
              val f = line.split("\t", 5)
              require(f.length >= 4,
                s"malformed VCF record in $vcf at member $m0: " +
                  s"'${line.take(40)}' has ${f.length} fields")
              val contig = f(0)
              val pos1 =
                try f(1).toLong
                catch { case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"malformed VCF POS '${f(1)}' in $vcf at member $m0")
                }
              val beg = pos1 - 1
              val end = beg + math.max(1L, f(3).length.toLong)
              require(beg >= 0 && end <= maxPos,
                s"$vcf: record [$beg, $end) outside the index scheme's " +
                  s"$maxPos cap")
              val refId = acc.nameId.getOrElseUpdate(contig, {
                acc.names += contig
                acc.bins += scala.collection.mutable.LinkedHashMap.empty
                acc.lidx += scala.collection.mutable.ArrayBuffer.empty[Long]
                acc.names.length - 1
              })
              require(refId > lastRef ||
                  (refId == lastRef && beg >= lastBeg),
                s"$vcf is not coordinate-sorted at record ${acc.n} " +
                  s"($contig:$pos1 after refId $lastRef beg $lastBeg) — " +
                  "a tabix index over an unsorted file silently drops " +
                  "region records")
              require(refId >= lastRef,
                s"$vcf: contig $contig reappears after a later contig — " +
                  "tabix requires contiguous contig blocks")
              lastRef = refId; lastBeg = beg
              val vBeg = (m0 << 16) | u0
              val (m1, u1) = in.virtualPos
              val vEnd = (m1 << 16) | u1
              val bin = binOf(beg, end)
              val bcs = acc.bins(refId).getOrElseUpdate(bin,
                scala.collection.mutable.ArrayBuffer.empty[Chunk])
              if (bcs.nonEmpty && (bcs.last.end >>> 16) == m0)
                bcs(bcs.length - 1) = Chunk(bcs.last.beg, vEnd)
              else bcs += Chunk(vBeg, vEnd)
              val lin = acc.lidx(refId)
              var w = (beg >> LinearShift).toInt
              val wEnd = ((end - 1) >> LinearShift).toInt
              while (w <= wEnd) {
                while (lin.length <= w) lin += 0L
                if (lin(w) == 0L) lin(w) = vBeg
                w += 1
              }
              acc.n += 1
            }
          }
        }
      }
      // fill linear holes with the previous window's value (htslib rule)
      acc.lidx.foreach { lin =>
        var w = 1
        while (w < lin.length) {
          if (lin(w) == 0L) lin(w) = lin(w - 1)
          w += 1
        }
      }
      acc
    } finally file.close()
  }

  /** Build `<vcf>.tbi` (BGZF-compressed, the interoperable sidecar).
    * Returns the record count. */
  def build(vcf: String, conf: Configuration = new Configuration()): Int = {
    val acc = collect(vcf, conf,
      (b, e) => BaiIndex.reg2bin(b.toInt, e.toInt), BaiIndex.MaxPos.toLong)
    val raw = HadoopIO.create(sidecarPath(vcf), conf)
    try {
      val out = new BgzfOutputStream(raw)
      def le32(v: Int): Unit = out.writeLe32(v)
      def le64(v: Long): Unit = {
        le32((v & 0xffffffffL).toInt); le32((v >>> 32).toInt)
      }
      out.write(Array[Byte]('T', 'B', 'I', 1))
      le32(acc.names.length)
      le32(VcfFormat); le32(1); le32(2); le32(0) // col_seq/col_beg/col_end
      le32('#'.toInt); le32(0) // meta, skip
      val nm = acc.names.map(_ + "\u0000").mkString.getBytes("US-ASCII")
      le32(nm.length); out.write(nm)
      acc.bins.indices.foreach { ri =>
        val bm = acc.bins(ri)
        le32(bm.size)
        bm.foreach { case (bin, cs) =>
          le32(bin); le32(cs.length)
          cs.foreach { c => le64(c.beg); le64(c.end) }
        }
        val lin = acc.lidx(ri)
        le32(lin.length)
        lin.foreach(le64)
      }
      le64(0L) // n_no_coor
      out.flushBlock()
      raw.write(BgzfOutputStream.EofMarker)
      acc.n
    } finally raw.close()
  }

  /** Build `<vcf>.csi` with the tabix aux payload (the `tabix -C` form;
    * for contigs past BAI's 2^29 cap). Encoding matches [[CsiIndex.read]]. */
  def buildCsi(vcf: String, conf: Configuration = new Configuration(),
      minShift: Int = 14, depth: Int = 5): Int = {
    val maxPos = 1L << (minShift + 3 * depth)
    val acc = collect(vcf, conf,
      (b, e) => CsiIndex.reg2bin(b, e, minShift, depth), maxPos)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      HadoopIO.create(vcf + ".csi", conf)))
    try {
      def le32(v: Int): Unit = out.writeInt(Integer.reverseBytes(v))
      def le64(v: Long): Unit = out.writeLong(java.lang.Long.reverseBytes(v))
      out.write(Array[Byte]('C', 'S', 'I', 1))
      le32(minShift); le32(depth)
      val nm = acc.names.map(_ + "\u0000").mkString.getBytes("US-ASCII")
      le32(28 + nm.length) // l_aux: 7 config ints + names
      le32(VcfFormat); le32(1); le32(2); le32(0)
      le32('#'.toInt); le32(0); le32(nm.length)
      out.write(nm)
      le32(acc.names.length)
      // derive per-bin loffset from the linear index (htslib rule), as
      // CsiIndex.build does for BAM
      acc.bins.indices.foreach { ri =>
        val lin = acc.lidx(ri)
        def loff(bin: Int): Long = {
          // walk to the bin's level to find its interval start
          var l = 0
          while (l < depth && (((1 << (3 * (l + 1))) - 1) / 7) <= bin) l += 1
          val first = ((1 << (3 * l)) - 1) / 7
          val start = (bin - first).toLong << (minShift + 3 * (depth - l))
          val w0 = (start >> LinearShift).toInt
          if (w0 < lin.length) lin(w0)
          else if (lin.nonEmpty) lin.last else 0L
        }
        val bm = acc.bins(ri)
        le32(bm.size)
        bm.foreach { case (bin, cs) =>
          le32(bin); le64(loff(bin)); le32(cs.length)
          cs.foreach { c => le64(c.beg); le64(c.end) }
        }
      }
      le64(0L)
      acc.n
    } finally out.close()
  }

  def read(vcf: String, conf: Configuration = new Configuration()): Tbi = {
    val file = new SeekableFile(sidecarPath(vcf), conf)
    try {
      val in = new DataInputStream(new java.io.BufferedInputStream(
        new BgzfInputStream(file, 0L), 1 << 16))
      def le32(): Int = Integer.reverseBytes(in.readInt())
      def le64(): Long = java.lang.Long.reverseBytes(in.readLong())
      def counted(what: String): Int = {
        val n = le32()
        require(n >= 0 && n <= (1 << 26),
          s"corrupt .tbi for $vcf: $what $n")
        n
      }
      val magic = new Array[Byte](4); in.readFully(magic)
      require(magic.sameElements(Array[Byte]('T', 'B', 'I', 1)),
        s"bad .tbi sidecar for $vcf")
      val nRef = counted("n_ref")
      le32(); le32(); le32(); le32(); le32(); le32() // config ints
      val lNm = counted("l_nm")
      val nm = new Array[Byte](lNm); in.readFully(nm)
      val names = new String(nm, "US-ASCII").split("\u0000").filter(_.nonEmpty)
      require(names.length == nRef,
        s"corrupt .tbi for $vcf: ${names.length} names for $nRef refs")
      val refs = Array.fill(nRef) {
        val bins = (0 until counted("n_bin")).map { _ =>
          val bin = le32()
          bin -> Array.fill(counted("n_chunk"))(Chunk(le64(), le64()))
        }.toMap
        val linear = Array.fill(counted("n_intv"))(le64())
        RefIndex(bins, linear)
      }
      val noCoor = try le64() catch { case _: EOFException => 0L }
      Tbi(names, BaiIndex.Bai(refs, noCoor))
    } finally file.close()
  }

  /** CLI parity with `tabix -p vcf` / `tabix -C` (and the BamIndex main):
    * `runMain graft.sources.Tabix [--csi] file.vcf.gz [more ...]`. */
  def main(args: Array[String]): Unit = {
    val (flags, paths) = args.partition(_.startsWith("--"))
    require(paths.nonEmpty,
      "usage: Tabix [--csi] <file.vcf.gz> [more.vcf.gz ...]")
    val csi = flags.contains("--csi")
    paths.foreach { p =>
      val n = if (csi) buildCsi(p) else build(p)
      val side = if (csi) p + ".csi" else sidecarPath(p)
      println(s"[tabix] indexed $p: $n records -> $side")
    }
  }

  /** Contig names out of a tabix-flavoured CSI aux blob. */
  def csiNames(aux: Array[Byte]): Array[String] = {
    require(aux.length >= 28, s"CSI aux too short for tabix config: ${aux.length}")
    def le32(o: Int): Int =
      (aux(o) & 0xff) | ((aux(o + 1) & 0xff) << 8) |
        ((aux(o + 2) & 0xff) << 16) | ((aux(o + 3) & 0xff) << 24)
    val lNm = le32(24)
    require(lNm >= 0 && 28 + lNm <= aux.length,
      s"corrupt tabix CSI aux: l_nm $lNm of ${aux.length}")
    new String(aux, 28, lNm, "US-ASCII").split("\u0000").filter(_.nonEmpty)
  }
}
