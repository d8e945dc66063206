package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BED source/sink — the interval interchange format the genomics
  * ecosystem's region arithmetic speaks (bedtools, UCSC tracks, capture
  * kits; the coordinate convention — 0-based, half-open — is exactly the
  * (start, end-exclusive) convention every interval operator here
  * already uses, so no shifting on either side). Reading is a plain
  * SPLITTABLE text scan: BED is line-per-record with no wrapped state,
  * so unlike FASTA no record-separator trick is needed — only the
  * header/comment discipline (`track`, `browser`, `#` lines skip, as do
  * blanks). Numeric fields parse with `try_cast`; by default a
  * malformed row — including a file truncated mid-line — RAISES
  * (decoder-fuzz discipline), with `strict = false` available for
  * salvage scans where null coordinates and the caller's validity
  * filter are preferred to aborting.
  *
  * Scale shape: write = the [[TextSink]] contract ((contig, start)
  * range partition → per-task streamed parts → driver byte concat);
  * read = one narrow splittable scan, no shuffle. */
object Bed {

  /** Write intervals as one BED file at `out`, sorted by (contig,
    * start, end) — the order `bedtools` and tabix indexing expect.
    * All of the frame's columns emit tab-separated in their current
    * order, so optional BED columns (name, score, strand) ride along
    * untouched. `header` lines (e.g. `track name=...`) prefix the file.
    * Returns the record count. */
  def write(intervals: DataFrame, out: String, header: Seq[String] = Nil,
      numPartitions: Int = 0): Long = {
    val s = intervals.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else s.conf.get("spark.sql.shuffle.partitions").toInt
    val cols = intervals.columns.map(col).toSeq
    val lines = intervals
      .repartitionByRange(n, col("contig"), col("start"))
      .sortWithinPartitions(col("contig"), col("start"), col("end"))
      .select(concat_ws("\t", cols: _*).as("line"))
    TextSink.write(header, lines, out)
  }

  /** Scan a BED file into `(contig, start, end, name)` — `name` null
    * when the file is 3-column; track/browser/comment/blank lines
    * skip; CRLF files parse identically (the trailing '\r' is stripped
    * before fields split). `strict = true` (default): a line whose
    * start/end fields are missing or non-numeric — including a file
    * truncated mid-line — RAISES instead of reading as a silently
    * nulled row (decoder-fuzz discipline; the guard is a Filter so
    * column pruning cannot drop it, the VcfWriter lesson). `strict =
    * false` keeps the lenient try_cast behavior for salvage scans. */
  def read(s: SparkSession, path: String,
      strict: Boolean = true): DataFrame = {
    val rows = s.read.text(path)
      .select(regexp_replace(col("value"), "\r$", "").as("value"))
      .where(length(trim(col("value"))) > 0 &&
        !col("value").startsWith("#") &&
        !col("value").startsWith("track") &&
        !col("value").startsWith("browser"))
      .select(col("value"), split(col("value"), "\t").as("f"))
      .select(col("value"),
        col("f").getItem(0).as("contig"),
        expr("try_cast(f[1] AS BIGINT)").as("start"),
        expr("try_cast(f[2] AS BIGINT)").as("end"),
        expr("try_element_at(f, 4)").as("name"))
    val out =
      if (!strict) rows
      else rows.where(coalesce(
        when(col("start").isNull || col("end").isNull,
          raise_error(concat(lit("malformed BED line: "), col("value")))
            .cast("boolean")),
        lit(true)))
    out.drop("value")
  }
}
