package graft.sources

import java.io.{DataInputStream, EOFException}
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 connector for binary BAM:
  * `spark.read.format("bam").load(path)` — same output schema as the
  * `sam` source, so everything downstream (flag expansion, validity,
  * features) is format-agnostic.
  *
  * Decoding is implemented from the public SAM/BAM spec v1.6:
  *  - BGZF framing and INTRA-FILE byte-range splits live in
  *    `graft.sources.Bgzf`: each partition owns a raw byte range, seeks to
  *    the first BGZF member boundary in it, re-synchronizes to a record
  *    boundary by validated guessing (the hadoop-bam technique the
  *    reference inherited via ADAM,
  *    /root/reference/src/main/scala/MitoScape/BamReader.scala:172-174),
  *    and emits the records that start in its range. A single WGS-scale
  *    BAM therefore scans with full cluster parallelism.
  *  - The payload is `BAM\1`, SAM-text header, reference dictionary, then
  *    length-prefixed alignment records (little-endian) with 4-bit packed
  *    sequence ("=ACMGRSVTWYHKDBN") and typed optional tags.
  *
  * Validated against fixtures generated independently from the spec by
  * scripts/make_bam_fixture.py (BamDataSourceSpec asserts record-level
  * equality with the SAM-text fixtures, in both single- and multi-split
  * configurations).
  */
class BamDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "bam"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SamDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BamTable(properties.asScala.toMap)
}

/** Driver-side BAM header probe (one small member inflate). */
object BamHeader {
  def refNames(path: String,
      conf: org.apache.hadoop.conf.Configuration): Array[String] = {
    val ch = new SeekableFile(path, conf)
    try {
      val in = new DataInputStream(new BgzfInputStream(ch, 0L))
      def i32(): Int = {
        val b0 = in.read(); val b1 = in.read(); val b2 = in.read(); val b3 = in.read()
        if ((b0 | b1 | b2 | b3) < 0) throw new EOFException()
        b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
      }
      val magic = new Array[Byte](4); in.readFully(magic)
      require(magic.sameElements(Array[Byte]('B', 'A', 'M', 1)),
        s"not a BAM file: $path")
      HadoopIO.skipFully(in, i32().toLong, s"$path header text")
      Array.fill(i32()) {
        val l = i32()
        val a = new Array[Byte](l); in.readFully(a)
        i32() // l_ref
        new String(a, 0, l - 1, "US-ASCII")
      }
    } finally ch.close()
  }
}

class BamTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"bam(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = SamDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // parsed once (ADVICE r15); `region` option → the same preds a
    // pushed .where() produces (START-position semantics; several
    // windows → an OR the pushdown algebra can't express, so a
    // dedicated disjunction pred); the channel that reaches STREAMING
    // scans, where Spark performs no predicate pushdown
    val regions = SamDataSource.regionsOption(options)
    val regionPreds = regions match {
      case Nil => Nil
      case Seq((c, b, e)) =>
        SamFilters.RefNameEq(c) +:
          (Seq(SamFilters.IntCmp("start", ">=", b)) ++
            (if (e == Long.MaxValue) Nil
             else Seq(SamFilters.IntCmp("start", "<=", e))))
      case many => Seq(SamFilters.InRegions(many))
    }
    new BamScanBuilder(SamDataSource.resolvePaths(options),
      SamDataSource.splitSize(options),
      Option(options.get("baiplan")).getOrElse("driver"),
      regionPreds, regions)
  }
}

class BamScanBuilder(paths: Seq[String], splitSize: Long,
    baiPlanMode: String = "driver",
    regionPreds: Seq[SamFilters.Pred] = Nil,
    regions: Seq[(String, Long, Long)] = Nil) extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownV2Filters {
  private var required: StructType = SamDataSource.schema
  private var pushed: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = Array.empty
  private var preds: Seq[SamFilters.Pred] = Nil
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Predicate pushdown (see SamFilters): a rejected record is skipped
    * from its 32 fixed bytes — name/cigar/sequence/tags never decode. */
  override def pushPredicates(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = {
    val (ok, rest) = predicates.partition(p => SamFilters.convert(p).isDefined)
    pushed = ok
    preds = ok.toSeq.flatMap(p => SamFilters.convert(p))
    rest
  }
  override def pushedPredicates(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    pushed
  override def build(): Scan =
    new BamScan(paths, splitSize, required, regionPreds ++ preds,
      baiPlanMode, regions)
}

object BamScan {
  /** Driver-planned `.bai` run lists above this size fall back to
    * executor-side planning: a sorted file's region runs merge to a
    * handful of entries, but an adversarial chunk layout could make the
    * list rival the data — per-task closure bytes must stay bounded. */
  val MaxShippedRuns = 65536

  /** Per-file planner (r15): with a region-constraining predicate set
    * (pushed batch predicates or the `region` read option) and a
    * `.bai`/`.csi` sidecar, a file plans only the region's member
    * runs, chopped at `splitSize` — default byte-range splits otherwise
    * (incl. the `.gai`-only case, whose per-member stats the reader
    * consults split-locally). Shared by the BATCH scan and the
    * landing-dir stream: before r15 the batch scan planned every split
    * and pruned reader-side (tasks scheduled, opened the index, and
    * exited) — at estate scale a region query over a 100 TB BAM
    * directory scheduled millions of no-op tasks. The reader
    * re-filters per record, so pruning only ever skips bytes no region
    * record can live in. */
  private[sources] def streamPlanFile(preds: Seq[SamFilters.Pred],
      splitSize: Long, regions: Seq[(String, Long, Long)] = Nil)(
      p: String, size: Long,
      conf: org.apache.hadoop.conf.Configuration): Seq[InputPartition] = {
    def plain(): Seq[InputPartition] = {
      val codec = SamDataSource.fileCodec(p, conf)
      if (codec == "gzip" || size <= splitSize)
        Seq(SamInputPartition(p, 0L, Long.MaxValue, codec))
      else (0L until size by splitSize).map(s =>
        SamInputPartition(p, s, math.min(s + splitSize, size), codec))
    }
    if (preds.isEmpty) return plain()
    // index resolution: (refNames, maxPos, chunks lookup), or None when
    // only `.gai` exists (its per-member stats are reader-side)
    val idx: Option[(Array[String], Int, (Int, Int, Int) => Seq[BaiIndex.Chunk])] =
      if (BamIndex.exists(p, conf)) None // .gai wins reader-side
      else if (BaiIndex.exists(p, conf)) {
        val bai = BaiIndex.read(p, conf)
        Some((BamHeader.refNames(p, conf), BaiIndex.MaxPos,
          (r, b, e) => BaiIndex.chunks(bai, r, b, e)))
      } else if (CsiIndex.exists(p, conf)) {
        val csi = CsiIndex.read(p, conf)
        Some((BamHeader.refNames(p, conf),
          CsiIndex.maxPos(csi.minShift, csi.depth),
          (r, b, e) => CsiIndex.chunks(csi, r, b, e)))
      } else None
    def runParts(rs: Seq[(Long, Int, Long)]): Seq[InputPartition] =
      rs.flatMap { case (m0, _, m1) =>
        val cuts = (m0 until m1 by math.max(splitSize, 1L)) :+ m1
        cuts.sliding(2).map { case Seq(a, b) =>
          SamInputPartition(p, a, b, "bgzf")
        }.toSeq
      }
    idx match {
      case None => plain()
      case Some((names, maxPos, chunksOf)) =>
        if (regions.size >= 2) {
          // multi-region: union of the windows' chunks (memberRuns
          // merges touching spans — exactly-once); unknown contigs
          // contribute nothing; zero windows → zero partitions
          val chunks = regions.flatMap { case (c, b1, e1) =>
            val refId = names.indexOf(c)
            if (refId < 0) Nil
            else chunksOf(refId,
              math.max(0L, b1 - 1).min(maxPos.toLong).toInt,
              math.min(maxPos.toLong,
                if (e1 == Long.MaxValue) maxPos.toLong else e1).toInt)
          }
          runParts(BaiIndex.memberRuns(chunks))
        } else if (regions.size == 1 && regions.head._1 != "*" &&
            names.indexOf(regions.head._1) < 0) {
          // option-named contig absent from this file's header: plan
          // nothing, like the multi-region arm — before r15's ADVICE
          // this degraded to a FULL unpruned scan whose reader filtered
          // every record out ("*" still scans: unmapped records aren't
          // in the index's coordinate bins)
          Nil
        } else BaiIndex.region(preds, names, maxPos) match {
          case None => plain()
          case Some((refId, beg, end)) =>
            runParts(BaiIndex.memberRuns(chunksOf(refId, beg, end)))
        }
    }
  }
}

class BamScan(paths: Seq[String], splitSize: Long, required: StructType,
    preds: Seq[SamFilters.Pred], baiPlanMode: String = "driver",
    regions: Seq[(String, Long, Long)] = Nil)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"bam PushedFilters: [${preds.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    if (preds.isEmpty) SamDataSource.planSplits(paths, splitSize)
    else {
      // planning-time region pruning (r15): region-constraining preds +
      // a `.bai`/`.csi` sidecar plan only member runs — the VCF source's
      // r13 design, so pruned members never even schedule a task
      val conf = HadoopIO.driverConf()
      paths.flatMap(p => HadoopIO.listScanTargets(p, conf))
        .filterNot { case (p, _) =>
          p.endsWith(".gai") || p.endsWith(".bai") || p.endsWith(".csi") }
        .flatMap { case (p, size) =>
          BamScan.streamPlanFile(preds, splitSize, regions)(p, size, conf)
        }.toArray
    }
  override def createReaderFactory(): PartitionReaderFactory = {
    val confBox = HadoopIO.capture()
    // Plan `.bai` region runs ONCE on the driver and ship them in the
    // factory: at cluster scale the alternative is every task re-reading
    // and re-planning the whole sidecar (an O(tasks × index-size) read
    // storm against one file). The graft `.gai` path keeps per-task reads
    // (its per-member stats are consulted split-locally); `.bai` chunks
    // for a sorted region merge to a few runs, so shipping is ~free.
    val baiPlans: Map[String, Seq[(Long, Int, Long)]] =
      if (preds.isEmpty || baiPlanMode != "driver") Map.empty
      else paths.flatMap(p => HadoopIO.listScanTargets(p, confBox.conf))
        .map(_._1)
        .filterNot(p =>
          p.endsWith(".gai") || p.endsWith(".bai") || p.endsWith(".csi"))
        .flatMap { p =>
          val runs: Option[Seq[(Long, Int, Long)]] =
            if (BamIndex.exists(p, confBox.conf)) None // .gai wins reader-side
            else if (BaiIndex.exists(p, confBox.conf))
              BaiIndex.region(preds, BamHeader.refNames(p, confBox.conf))
                .map { case (refId, beg, end) =>
                  BaiIndex.memberRuns(BaiIndex.chunks(
                    BaiIndex.read(p, confBox.conf), refId, beg, end))
                }
            else if (CsiIndex.exists(p, confBox.conf)) {
              val csi = CsiIndex.read(p, confBox.conf)
              BaiIndex.region(preds, BamHeader.refNames(p, confBox.conf),
                  CsiIndex.maxPos(csi.minShift, csi.depth))
                .map { case (refId, beg, end) =>
                  BaiIndex.memberRuns(CsiIndex.chunks(csi, refId, beg, end))
                }
            } else None
          runs.filter(_.length <= BamScan.MaxShippedRuns).map(p -> _)
        }.toMap
    new BamReaderFactory(required.fieldNames, preds, confBox, baiPlans)
  }
  /** Landing-dir micro-batch streaming (r14): per-sample BAMs land in a
    * directory (the other instrument/pipeline drop format next to
    * `fastq`'s); the shared prefix-offset model plans each batch's
    * byte-range splits, and predicates stay per-record reader-side.
    * r15: a `region`-option predicate set additionally PRUNES each
    * landed file's splits at batch planning through its `.bai`/`.csi`
    * sidecar ([[BamScan.streamPlanFile]]) — a region-filtered stream no
    * longer schedules tasks over members the index excludes. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val fields = required.fieldNames
    val ps = preds
    new LandingDirMicroBatchStream(paths, splitSize, "bam",
      () => new BamReaderFactory(fields, ps, HadoopIO.capture()),
      planFile = if (ps.isEmpty) null
        else BamScan.streamPlanFile(ps, splitSize, regions))
  }
}

class BamReaderFactory(fields: Array[String], preds: Seq[SamFilters.Pred],
    conf: HadoopIO.ConfBox,
    baiPlans: Map[String, Seq[(Long, Int, Long)]] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SamInputPartition]
    new BamPartitionReader(p.path, p.start, p.end, fields, preds, conf,
      baiPlans.get(p.path))
  }
}

class BamPartitionReader(path: String, rangeStart: Long, rangeEnd: Long,
    fields: Array[String], preds: Seq[SamFilters.Pred], conf: HadoopIO.ConfBox,
    shippedBaiRuns: Option[Seq[(Long, Int, Long)]] = None)
    extends PartitionReader[InternalRow] {

  private val needSeq = fields.contains("sequence") || fields.contains("line")
  private val needQual = fields.contains("qual") || fields.contains("line")
  private val needAttrs = fields.contains("attributes") || fields.contains("line")

  private val ch = new SeekableFile(path, conf.conf)
  private val fileLen = ch.size

  // --- header + reference dictionary (always parsed from offset 0 —
  // KB-sized, one member inflate; every split needs the ref dictionary)
  private var bgzf: BgzfInputStream = new BgzfInputStream(ch, 0L)
  private var in = new DataInputStream(bgzf)

  private val refNames: Array[String] = {
    val magic = bytes(4)
    require(magic.sameElements(Array[Byte]('B', 'A', 'M', 1)),
      s"not a BAM file: $path")
    val lText = i32()
    require(lText >= 0, s"corrupt BAM header in $path: negative l_text $lText")
    bytes(lText) // SAM header text (not needed for the record schema)
    val nRef = i32()
    // Array.fill(negative) silently returns empty — a corrupt count must
    // fail loudly, not degrade into a refless dictionary
    require(nRef >= 0, s"corrupt BAM header in $path: negative n_ref $nRef")
    Array.fill(nRef) {
      val lName = i32()
      require(lName >= 1, s"corrupt BAM header in $path: l_name $lName")
      val name = cstr(lName)
      i32() // l_ref
      name
    }
  }

  /** True once this split's range is exhausted (or it owns no records). */
  private var done = false
  /** Decode stops at this member offset and jumps to the next index run
    * (Long.MaxValue when no index / final run — ownership bounds it). */
  private var runEnd: Long = Long.MaxValue
  private var runs: Iterator[(Long, Int, Long)] = Iterator.empty

  private def advanceRun(): Boolean =
    if (!runs.hasNext) false
    else {
      val (off, u, end) = runs.next()
      bgzf.close()
      if (u >= 0) {
        bgzf = new BgzfInputStream(ch, off)
        HadoopIO.skipFully(bgzf, u.toLong, s"$path index run at $off")
        in = new DataInputStream(bgzf)
        runEnd = end
        true
      } else {
        // u = -1: a run clipped at this split's boundary — the exact
        // first-record offset in the clipped-to member isn't in the index,
        // so re-synchronize by validated guessing (the same machinery the
        // un-indexed path uses)
        BamSync.syncToRecord(ch, off, math.min(end, rangeEnd),
            refNames.length, path) match {
          case Some(s) =>
            bgzf = s; in = new DataInputStream(bgzf); runEnd = end; true
          case None => advanceRun() // no record in this run's clip → next run
        }
      }
    }

  // Position the stream at this split's first record (see Bgzf's split
  // protocol). With a `.gai` sidecar (BamIndex) the index supplies exact
  // first-record offsets per member — no guessing — and members that
  // cannot satisfy the pushed referenceName/start predicates are skipped
  // without decompression. With only a samtools `.bai` (BaiIndex) and a
  // region-shaped predicate, the binned index supplies chunk runs instead
  // (member-widened; runs clipped at this split's boundary guess-sync).
  // Without either: the split owning the member where records begin
  // continues straight from the header; later splits guess-sync at their
  // first member boundary.
  locally {
    if (BamIndex.exists(path, conf.conf)) {
      val stats = BamIndex.read(path, conf.conf)
      val firstMember =
        if (rangeStart == 0) 0L
        else stats.find(_.offset >= rangeStart).map(_.offset).getOrElse(fileLen)
      runs = BamIndex.selectRuns(stats, preds, refNames,
        firstMember, math.min(rangeEnd, fileLen)).iterator
      if (!advanceRun()) done = true
    } else {
      // driver-planned runs arrive in the factory (the scale path: one
      // sidecar read per QUERY, not per task); the executor-side re-plan
      // remains for oversized run lists and direct reader construction —
      // `.bai` preferred, `.csi` (long-contig binning) after it
      val planned: Option[Seq[(Long, Int, Long)]] = shippedBaiRuns.orElse {
        if (BaiIndex.exists(path, conf.conf))
          BaiIndex.region(preds, refNames).map { case (refId, beg, end) =>
            BaiIndex.memberRuns(BaiIndex.chunks(
              BaiIndex.read(path, conf.conf), refId, beg, end))
          }
        else if (CsiIndex.exists(path, conf.conf)) {
          val csi = CsiIndex.read(path, conf.conf)
          BaiIndex.region(preds, refNames,
              CsiIndex.maxPos(csi.minShift, csi.depth))
            .map { case (refId, beg, end) =>
              BaiIndex.memberRuns(CsiIndex.chunks(csi, refId, beg, end))
            }
        } else None
      }
      planned match {
        case Some(global) =>
          val firstMember =
            if (rangeStart == 0) 0L
            else Bgzf.nextMemberStart(ch, rangeStart, fileLen)
          val until = math.min(rangeEnd, fileLen)
          runs = global.iterator
            .filter { case (off, _, rend) => rend > firstMember && off < until }
            .map { case (off, u, rend) =>
              if (off >= firstMember) (off, u, rend) else (firstMember, -1, rend)
            }
          if (!advanceRun()) done = true
        case None =>
          val (hdrMember, _) = bgzf.virtualPos // records begin exactly here
          val firstMember =
            if (rangeStart == 0) 0L
            else Bgzf.nextMemberStart(ch, rangeStart, fileLen)
          if (firstMember <= hdrMember) {
            if (hdrMember >= rangeEnd) done = true // range ends inside the header
            // else: keep the header stream — it is already at the first record
          } else if (firstMember >= fileLen || firstMember >= rangeEnd) {
            done = true
          } else {
            bgzf.close()
            syncToRecord(firstMember) match {
              case Some(s) => bgzf = s; in = new DataInputStream(bgzf)
              case None    => done = true
            }
          }
      }
    }
  }

  // --- little-endian primitives over the decompressed stream
  private def u8(): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException()
    b
  }
  private def i16(): Int = u8() | (u8() << 8)
  private def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
  private def bytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n); in.readFully(a); a
  }
  private def cstr(n: Int): String = {
    val a = bytes(n); new String(a, 0, n - 1, "US-ASCII") // drop trailing \0
  }

  private val SeqCodes = "=ACMGRSVTWYHKDBN".toCharArray
  private val CigarOps = "MIDNSHP=X".toCharArray
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    while (true) {
      // split ownership: emit only records STARTING in a member before
      // rangeEnd (memberStart is a member boundary, so `>= rangeEnd` is
      // exactly `>= first boundary at-or-after rangeEnd`)
      if (bgzf.memberStart >= rangeEnd) { done = true; current = null; return false }
      // end of the current index run: jump over pruned members
      if (bgzf.memberStart >= runEnd) {
        if (!advanceRun()) { done = true; current = null; return false }
      } else {
        // clean end-of-stream is ONLY an EOF before the record's first
        // byte; an EOF anywhere inside a record is a truncated file and
        // must fail loudly, never read as a shorter-but-valid BAM
        val first = in.read()
        if (first < 0) { done = true; current = null; return false }
        val r =
          try decodeRecord(first) // null: pushed filter rejected the record
          catch {
            case e: EOFException => throw new java.io.IOException(
              s"truncated BAM record mid-decode in $path " +
                s"(member at ${bgzf.memberStart})", e)
          }
        if (r != null) { current = r; return true }
      }
    }
    false
  }

  /** Find the first record boundary at-or-after member `from` — shared
    * validated-guessing machinery in [[BamSync]]. */
  private def syncToRecord(from: Long): Option[BgzfInputStream] =
    BamSync.syncToRecord(ch, from, rangeEnd, refNames.length, path)

  /** Decodes one record, or returns null if a pushed filter rejects it —
    * rejected records skip straight over the name/cigar/sequence/tag bytes
    * without decoding them (the bulk of a record). */
  private def corrupt(msg: String): Nothing = throw new java.io.IOException(
    s"corrupt BAM record in $path (member at ${bgzf.memberStart}): $msg")

  private def decodeRecord(firstByte: Int): InternalRow = {
    val blockSize = firstByte | (u8() << 8) | (u8() << 16) | (u8() << 24)
    // geometry guards BEFORE any length-driven allocation or skip: a
    // corrupt block_size / l_seq must raise a clear corruption error, not
    // a negative-size allocation, an absurd one, or a silent mis-decode
    if (blockSize < 32) corrupt(s"block_size $blockSize < 32")
    if (blockSize > (1 << 28)) corrupt(s"implausible block_size $blockSize")
    val refId = i32()
    val pos = i32()
    val lReadName = u8()
    val mapq = u8()
    i16() // bin
    val nCigar = i16()
    val flag = i16()
    val lSeq = i32()
    val nextRefId = i32()
    val nextPos = i32()
    val tlen = i32()
    if (lReadName < 1) corrupt("l_read_name 0 (must include the NUL)")
    if (lSeq < 0) corrupt(s"negative l_seq $lSeq")
    val geom = 32L + lReadName + 4L * nCigar + (lSeq + 1L) / 2 + lSeq
    if (geom > blockSize) corrupt(
      s"record geometry ($geom bytes) overflows block_size $blockSize")
    val rname0 = if (refId >= 0 && refId < refNames.length) refNames(refId) else "*"
    if (preds.nonEmpty &&
        !SamFilters.evalAll(preds, flag, mapq, pos + 1, rname0)) {
      var left = blockSize - 32 // fixed fields after block_size are 32 bytes
      while (left > 0) {
        val s = in.skipBytes(left)
        if (s > 0) left -= s else { u8(); left -= 1 } // u8 throws at EOF
      }
      return null
    }
    val readName = cstr(lReadName)
    val cigar = if (nCigar == 0) "*" else {
      val sb = new StringBuilder
      var i = 0
      while (i < nCigar) {
        val v = i32()
        sb.append(v >>> 4).append(CigarOps(v & 0xf))
        i += 1
      }
      sb.toString
    }
    val packed = bytes((lSeq + 1) / 2) // must consume regardless of pruning
    val seq = if (!needSeq) "" else {
      val sb = new StringBuilder(lSeq)
      var i = 0
      while (i < lSeq) {
        val b = packed(i / 2) & 0xff
        sb.append(SeqCodes(if (i % 2 == 0) b >>> 4 else b & 0xf))
        i += 1
      }
      sb.toString
    }
    val qualBytes = bytes(lSeq)
    // per spec: 0xff-filled qual means "unavailable" (SAM text '*');
    // otherwise text is phred+33
    val qual = if (!needQual) "" else {
      var allMissing = true
      var i = 0
      while (allMissing && i < lSeq) {
        if (qualBytes(i) != -1) allMissing = false
        i += 1
      }
      if (lSeq == 0 || allMissing) "*"
      else {
        val sb = new StringBuilder(lSeq)
        var j = 0
        while (j < lSeq) { sb.append((qualBytes(j) + 33).toChar); j += 1 }
        sb.toString
      }
    }
    val tagBytes = bytes((blockSize - geom).toInt) // consume the record tail
    val attrs = if (needAttrs) decodeTags(tagBytes) else ""
    val rname = rname0
    val start = pos + 1
    // RNEXT text form: '*' unavailable, '=' same reference, else the name
    val rnext =
      if (nextRefId == -1) "*"
      else if (nextRefId == refId) "="
      else if (nextRefId >= 0 && nextRefId < refNames.length) refNames(nextRefId)
      else "*"
    val pnext = nextPos + 1
    lazy val line =
      s"$readName\t$flag\t$rname\t$start\t$mapq\t$cigar\t$rnext\t$pnext\t$tlen\t$seq\t$qual" +
        (if (attrs.isEmpty) "" else "\t" + attrs.replace(' ', '\t'))
    InternalRow.fromSeq(fields.map {
      case "line"          => UTF8String.fromString(line)
      case "readName"      => UTF8String.fromString(readName)
      case "flag"          => flag
      case "referenceName" => UTF8String.fromString(rname)
      case "start"         => start
      case "mapQ"          => mapq
      case "cigar"         => UTF8String.fromString(cigar)
      case "rnext"         => UTF8String.fromString(rnext)
      case "pnext"         => pnext
      case "tlen"          => tlen
      case "sequence"      => UTF8String.fromString(seq)
      case "qual"          => UTF8String.fromString(qual)
      case "attributes"    => UTF8String.fromString(attrs)
    }.toIndexedSeq)
  }

  /** Typed optional tags → the SAM text form "TAG:TYPE:VALUE ..."
    * (whitespace-joined — the attribute convention the feature pipeline's
    * attrMap consumes; all integer widths normalize to SAM type `i`). */
  private def decodeTags(raw: Array[Byte]): String = {
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new StringBuilder
    while (bb.remaining() > 0) {
      val tag = "" + bb.get().toChar + bb.get().toChar
      val typ = bb.get().toChar
      if (out.nonEmpty) out.append(' ')
      typ match {
        case 'A' => out.append(s"$tag:A:${bb.get().toChar}")
        case 'c' => out.append(s"$tag:i:${bb.get()}")
        case 'C' => out.append(s"$tag:i:${bb.get() & 0xff}")
        case 's' => out.append(s"$tag:i:${bb.getShort()}")
        case 'S' => out.append(s"$tag:i:${bb.getShort() & 0xffff}")
        case 'i' => out.append(s"$tag:i:${bb.getInt()}")
        case 'I' => out.append(s"$tag:i:${bb.getInt() & 0xffffffffL}")
        case 'f' => out.append(s"$tag:f:${bb.getFloat()}")
        case 'Z' | 'H' =>
          val sb = new StringBuilder
          var c = bb.get()
          while (c != 0) { sb.append(c.toChar); c = bb.get() }
          out.append(s"$tag:$typ:$sb")
        case 'B' =>
          val sub = bb.get().toChar
          val n = bb.getInt()
          val vals = (0 until n).map { _ =>
            sub match {
              case 'c' => bb.get().toString
              case 'C' => (bb.get() & 0xff).toString
              case 's' => bb.getShort().toString
              case 'S' => (bb.getShort() & 0xffff).toString
              case 'i' => bb.getInt().toString
              case 'I' => (bb.getInt() & 0xffffffffL).toString
              case 'f' => bb.getFloat().toString
            }
          }
          out.append(s"$tag:B:$sub,${vals.mkString(",")}")
      }
    }
    out.toString
  }

  override def get(): InternalRow = current
  override def close(): Unit = { bgzf.close(); ch.close() }
}
