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

  /** Write the `.fai` (samtools faidx) index for a FASTA that [[write]]
    * produced with the same `width`/`numPartitions`: per record
    * `name, length, offset-of-first-sequence-byte, linebases, linewidth`
    * — the five columns every region-serving tool consumes. Offsets are
    * computed WITHOUT scanning the file: [[write]]'s layout is
    * closed-form (`">" name "\n"` + ⌈len/width⌉ sequence lines + one
    * trailing newline per record, records in name order), so each
    * record's byte size is arithmetic. The prefix sum over records runs
    * two-level: a per-partition running sum inside `mapPartitions`
    * (genuine per-partition imperative logic — the one place RDD-style
    * code is the right tool) over the SAME range partitioning the
    * writer used, then partition base offsets fold on the driver from
    * one metadata-sized total per partition. No corpus-global window,
    * no single reducer. */
  def writeFai(seqs: DataFrame, faiOut: String, width: Int,
      numPartitions: Int = 0): Long = {
    val s = seqs.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else s.conf.get("spark.sql.shuffle.partitions").toInt
    val w = width
    import s.implicits._
    val local = seqs.select(col("name"), length(col("seq")).as("len"))
      .repartitionByRange(n, col("name"))
      .sortWithinPartitions(col("name"))
      .as[(String, Int)]
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.get().partitionId()
        var off = 0L
        rows.map { case (name, len) =>
          require(len > 0, s"writeFai: empty sequence '$name' — faidx " +
            "offset math assumes at least one sequence line per record")
          val nLines = (len + w - 1) / w
          val seqOff = off + name.length + 2 // past ">name\n"
          val recBytes = name.length + len + nLines + 2
          off += recBytes
          (pid, name, len.toLong, seqOff, recBytes.toLong)
        }
      }.toDF("pid", "name", "len", "seq_off", "rec_bytes")
      // one computation feeds both the totals fold and the final rows
      .localCheckpoint()
    val bases = local.groupBy(col("pid"))
      .agg(sum(col("rec_bytes")).as("tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
      .scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) => (pid, acc + tot) }
    val baseOf = bases.sliding(2).collect {
      case Array((_, acc), (pid, _)) => (pid, acc)
    }.toMap // partition-count-sized
    val baseDf = s.createDataFrame(baseOf.toSeq).toDF("pid", "base")
    val fai = local.join(broadcast(baseDf), Seq("pid"))
      .select(col("name"), col("len"),
        (col("base") + col("seq_off")).as("offset"),
        lit(w).as("linebases"), lit(w + 1).as("linewidth"))
      .repartitionByRange(n, col("name"))
      .sortWithinPartitions(col("name"))
      .select(concat_ws("\t", col("name"), col("len"), col("offset"),
        col("linebases"), col("linewidth")).as("line"))
    TextSink.write(Seq.empty, fai, faiOut)
  }

  /** Serve `(name, start, end)` regions (1-based, inclusive — the
    * samtools convention) from an indexed FASTA by POSITIONED BYTE
    * READS: the `.fai` is a dimension (broadcast), each region resolves
    * to one `[byte(start), byte(end)]` range via the faidx formula
    * `offset + (pos−1) + (pos−1) div linebases`, and each task reads
    * only its regions' bytes — the whole file is never scanned, the
    * x05/x16 pruning discipline applied to the second sequence format.
    * Regions outside `[1, len]` drop (the tool's behavior for
    * out-of-range queries). */
  def fetchRegions(s: SparkSession, fastaPath: String, faiPath: String,
      regions: DataFrame): DataFrame = {
    import s.implicits._
    val fai = s.read.option("sep", "\t")
      .schema("name STRING, len BIGINT, offset BIGINT, " +
        "linebases INT, linewidth INT")
      .csv(faiPath)
    val confBox = HadoopIO.capture()
    regions.join(broadcast(fai), Seq("name"))
      .where(col("start") >= 1 && col("end") <= col("len") &&
        col("start") <= col("end"))
      .select(col("name"), col("start").cast("long"), col("end").cast("long"),
        col("offset"), col("linebases").cast("long"))
      .as[(String, Long, Long, Long, Long)]
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val in = HadoopIO.open(fastaPath, confBox.conf)
          try {
            rows.map { case (name, st, en, off, lb) =>
              val b0 = off + (st - 1) + (st - 1) / lb
              val b1 = off + (en - 1) + (en - 1) / lb
              val buf = new Array[Byte]((b1 - b0 + 1).toInt)
              in.readFully(b0, buf)
              val sb = new java.lang.StringBuilder(buf.length)
              buf.foreach(b => if (b != '\n') sb.append(b.toChar))
              (name, st, en, sb.toString)
            }.toArray.iterator // materialize before the stream closes
          } finally in.close()
        }
      }.toDF("name", "start", "end", "seq")
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
      // tolerate CRLF files: the '\r' a Windows-authored FASTA leaves at
      // each line end must reach neither the header fields nor the bases
      .select(regexp_replace(substring_index(col("v"), "\n", 1), "\r$", "")
          .as("hdr"),
        // header-only record (no newline): empty body, not the header
        expr("CASE WHEN instr(v, '\n') = 0 THEN ''" +
          " ELSE substr(v, instr(v, '\n') + 1) END").as("body"))
      .select(
        substring_index(col("hdr"), " ", 1).as("name"),
        when(col("hdr").contains(" "),
          expr("substr(hdr, instr(hdr, ' ') + 1)")).as("desc"),
        regexp_replace(col("body"), "[\n\r]", "").as("seq"))
}
