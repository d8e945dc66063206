package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.util
import java.util.zip.GZIPInputStream

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
  *  - BGZF is a sequence of gzip members with a BC extra subfield; Java's
  *    GZIPInputStream handles concatenated members, so a whole-file
  *    stream decompresses the payload (per-file partitions; BGZF virtual
  *    offsets would enable intra-file splits later — the BSIZE field
  *    exists precisely for that).
  *  - The payload is `BAM\1`, SAM-text header, reference dictionary, then
  *    length-prefixed alignment records (little-endian) with 4-bit packed
  *    sequence ("=ACMGRSVTWYHKDBN") and typed optional tags.
  *
  * Validated against fixtures generated independently from the spec by
  * scripts/make_bam_fixture.py (BamDataSourceSpec asserts record-level
  * equality with the SAM-text fixtures).
  */
class BamDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "bam"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SamDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BamTable(properties.asScala.toMap)
}

class BamTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"bam(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = SamDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq
      .flatMap(_.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")))
    val paths = (single ++ multi).filter(_.nonEmpty)
    new BamScanBuilder(paths)
  }
}

class BamScanBuilder(paths: Seq[String]) extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = SamDataSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new BamScan(paths, required)
}

class BamScan(paths: Seq[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => SamInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new BamReaderFactory(required.fieldNames)
}

class BamReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BamPartitionReader(partition.asInstanceOf[SamInputPartition].path, fields)
}

class BamPartitionReader(path: String, fields: Array[String])
    extends PartitionReader[InternalRow] {

  private val needSeq = fields.contains("sequence") || fields.contains("line")
  private val needAttrs = fields.contains("attributes") || fields.contains("line")

  private val in = new DataInputStream(new BufferedInputStream(
    new GZIPInputStream(new BufferedInputStream(
      java.nio.file.Files.newInputStream(
        java.nio.file.Paths.get(path.stripPrefix("file:"))), 1 << 16), 1 << 16)))

  // --- little-endian primitives over the decompressed stream
  private def u8(): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException()
    b
  }
  private def i16(): Int = u8() | (u8() << 8)
  private def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
  private def f32(): Float = java.lang.Float.intBitsToFloat(i32())
  private def bytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n); in.readFully(a); a
  }
  private def cstr(n: Int): String = {
    val a = bytes(n); new String(a, 0, n - 1, "US-ASCII") // drop trailing \0
  }

  // --- header + reference dictionary
  private val refNames: Array[String] = {
    val magic = bytes(4)
    require(magic.sameElements(Array[Byte]('B', 'A', 'M', 1)),
      s"not a BAM file: $path")
    val lText = i32()
    bytes(lText) // SAM header text (not needed for the record schema)
    val nRef = i32()
    Array.fill(nRef) {
      val name = cstr(i32())
      i32() // l_ref
      name
    }
  }

  private val SeqCodes = "=ACMGRSVTWYHKDBN".toCharArray
  private val CigarOps = "MIDNSHP=X".toCharArray
  private var current: InternalRow = _

  override def next(): Boolean =
    try { current = decodeRecord(); true }
    catch { case _: EOFException => current = null; false }

  private def decodeRecord(): InternalRow = {
    val blockSize = i32()
    val refId = i32()
    val pos = i32()
    val lReadName = u8()
    val mapq = u8()
    i16() // bin
    val nCigar = i16()
    val flag = i16()
    val lSeq = i32()
    i32(); i32(); i32() // next_refID, next_pos, tlen
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
    bytes(lSeq) // qual (unused by the feature pipeline)
    val fixed = 32 + lReadName + 4 * nCigar + (lSeq + 1) / 2 + lSeq
    val tagBytes = bytes(blockSize - fixed) // consume the record tail
    val attrs = if (needAttrs) decodeTags(tagBytes) else ""
    val rname = if (refId >= 0 && refId < refNames.length) refNames(refId) else "*"
    val start = pos + 1
    lazy val line =
      s"$readName\t$flag\t$rname\t$start\t$mapq\t$cigar\t=\t0\t0\t$seq\t*" +
        (if (attrs.isEmpty) "" else "\t" + attrs.replace(' ', '\t'))
    InternalRow.fromSeq(fields.map {
      case "line"          => UTF8String.fromString(line)
      case "readName"      => UTF8String.fromString(readName)
      case "flag"          => flag
      case "referenceName" => UTF8String.fromString(rname)
      case "start"         => start
      case "mapQ"          => mapq
      case "cigar"         => UTF8String.fromString(cigar)
      case "sequence"      => UTF8String.fromString(seq)
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
  override def close(): Unit = in.close()
}
