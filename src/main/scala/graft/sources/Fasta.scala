package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTA source/sink — the reference-sequence interchange format the
  * reference's own inputs arrive in (the rCRS mitochondrial reference,
  * NUMT sequence sets; reference README.md's alignment step consumes
  * FASTA references). The format is header-delimited (`>name desc` then
  * wrapped sequence lines), which makes naive line-by-line parsing
  * stateful — the classic excuse for a single-reader scan. The
  * distributed read instead sets the text source's record separator to
  * `"\n>"`, so EVERY record is one row and the scan stays SPLITTABLE:
  * Hadoop's line reader already handles records straddling split
  * boundaries (a split starts mid-record → the partial head is consumed
  * by the previous split's reader), so a multi-gigabyte FASTA fans out
  * across executors with zero custom input format. `>` cannot occur
  * inside sequence lines (IUPAC codes only), so the delimiter is
  * unambiguous.
  *
  * Scale shape: read = one narrow splittable text scan + per-row string
  * kernels (no shuffle at all); write = the [[TextSink]] contract (range
  * partition on name, per-task streamed parts, driver byte concat). */
object Fasta {

  /** Write `(name, seq)` rows as one FASTA file at `out`, sequences
    * wrapped at `width` columns, records sorted by name. Returns the
    * record count. */
  def write(seqs: DataFrame, out: String, width: Int = 60,
      numPartitions: Int = 0): Long = {
    val s = seqs.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else s.conf.get("spark.sql.shuffle.partitions").toInt
    val w = width
    val lines = seqs
      .repartitionByRange(n, col("name"))
      .sortWithinPartitions(col("name"))
      .select(concat(lit(">"), col("name"), lit("\n"),
        concat_ws("\n", transform(
          // `div`, not `/`: the SQL slash on integers is DOUBLE division
          expr(s"sequence(0, CAST((length(seq) - 1) div $w AS INT))"),
          i => col("seq").substr(i * w + 1, lit(w))))).as("line"))
    TextSink.write(Seq.empty, lines, out)
  }

  /** Scan a FASTA file into `(name, desc, seq)` — splittable via the
    * `\n>` record separator (see object doc). `name` is the header up
    * to the first whitespace, `desc` the rest (null when absent), `seq`
    * the concatenated sequence with wrapping newlines removed. */
  def read(s: SparkSession, path: String): DataFrame =
    s.read.option("lineSep", "\n>").text(path)
      // only the file's first record keeps its leading '>' (later ones
      // surrender it to the separator); blank trailing records drop out
      .select(regexp_replace(col("value"), "^>", "").as("v"))
      .where(length(trim(col("v"))) > 0)
      .select(substring_index(col("v"), "\n", 1).as("hdr"),
        // header-only record (no newline): empty body, not the header
        expr("CASE WHEN instr(v, '\n') = 0 THEN ''" +
          " ELSE substr(v, instr(v, '\n') + 1) END").as("body"))
      .select(
        substring_index(col("hdr"), " ", 1).as("name"),
        when(col("hdr").contains(" "),
          expr("substr(hdr, instr(hdr, ' ') + 1)")).as("desc"),
        regexp_replace(col("body"), "\n", "").as("seq"))
}
