package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 connector for SAM alignment text:
  * `spark.read.format("sam").load(path)` (registered short name via
  * META-INF/services). One InputPartition per file; within a partition the
  * reader streams lines, skips the header, and decodes the eleven fixed
  * columns + attribute blob into InternalRows directly — no intermediate
  * string-split DataFrame stage.
  *
  * Scale notes: SAM files in the wild are per-sample (the reference
  * processes one sample per run, `MTClassify.scala:200`), so
  * file-granularity splits parallelize across samples; byte-range
  * splitting within a file (hadoop-style line splits) is the natural
  * extension and slots into `planInputPartitions`. Column pruning happens
  * via the projected schema Spark applies above this scan; predicate
  * pushdown is not implemented (filters on flags are cheap post-scan).
  *
  * This complements `graft.mito.Sam.parse` (expression-based decoding of
  * an existing line DataFrame); both produce the same schema
  * (SamSourceSpec asserts agreement).
  */
class SamDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "sam"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SamDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SamTable(properties.asScala.toMap)
}

object SamDataSource {
  val schema: StructType = StructType(Seq(
    StructField("line", StringType, nullable = false),
    StructField("readName", StringType, nullable = false),
    StructField("flag", IntegerType, nullable = false),
    StructField("referenceName", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("mapQ", IntegerType, nullable = false),
    StructField("cigar", StringType, nullable = false),
    StructField("sequence", StringType, nullable = false),
    StructField("attributes", StringType, nullable = false)))
}

class SamTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"sam(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = SamDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SamScanBuilder(resolvePaths(options))

  private def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq
      .flatMap(_.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")))
    (single ++ multi).filter(_.nonEmpty)
  }
}

class SamScanBuilder(paths: Seq[String]) extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = SamDataSource.schema
  /** Column pruning: the reader decodes only requested fields — pruned
    * scans skip building the `line`/`attributes` strings entirely. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SamScan(paths, required)
}

class SamScan(paths: Seq[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => SamInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new SamReaderFactory(required.fieldNames)
}

case class SamInputPartition(path: String) extends InputPartition

class SamReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SamPartitionReader(partition.asInstanceOf[SamInputPartition].path, fields)
}

class SamPartitionReader(path: String, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val reader = java.nio.file.Files.newBufferedReader(
    java.nio.file.Paths.get(path.stripPrefix("file:")))
  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null && (line.startsWith("@") || line.trim.isEmpty))
      line = reader.readLine()
    if (line == null) { current = null; false }
    else { current = decode(line); true }
  }

  private def decode(line: String): InternalRow = {
    val f = line.split("\t", 12)
    require(f.length >= 11, s"malformed SAM record (${f.length} fields): $line")
    InternalRow.fromSeq(fields.map {
      case "line"          => UTF8String.fromString(line)
      case "readName"      => UTF8String.fromString(f(0))
      case "flag"          => f(1).toInt
      case "referenceName" => UTF8String.fromString(f(2))
      case "start"         => f(3).toInt
      case "mapQ"          => f(4).toInt
      case "cigar"         => UTF8String.fromString(f(5))
      case "sequence"      => UTF8String.fromString(f(9))
      case "attributes"    => UTF8String.fromString(
        if (f.length > 11) f(11).replace('\t', ' ') else "")
    }.toIndexedSeq)
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
