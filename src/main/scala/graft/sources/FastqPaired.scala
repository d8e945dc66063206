package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paired-end FASTQ: the R1/R2 two-file layout every Illumina instrument
  * emits and the reference's own preprocessing starts from (paired FASTQ
  * → uBAM; /root/reference/README.md:30). Mates live at the same ordinal
  * position in two parallel files, but a DISTRIBUTED reader cannot rely
  * on file ordinals across byte-range splits — pairing here is by the
  * read NAME STEM, the only mate key that survives both naming
  * conventions:
  *
  *   - legacy Illumina: `@frag_17/1` in R1, `@frag_17/2` in R2 — the
  *     trailing `/1`/`/2` mate suffix is stripped to form the stem;
  *   - CASAVA ≥ 1.8: both mates share the bare name and the mate index
  *     leads the comment (`1:N:0:ACGT` / `2:N:0:ACGT`) — the name IS
  *     the stem.
  *
  * Scale shape: two independent `fastq` DSv2 scans (full intra-file
  * split parallelism, including bgzip'd `.fastq.gz`) and ONE name-keyed
  * shuffle join — the stem is a high-cardinality uniform key, so a
  * 300 GB R1/R2 pair reads and pairs with full cluster parallelism and
  * no skew. Strict mode additionally pins per-file stem UNIQUENESS with
  * a window keyed by the same stem (no extra shuffle key), because an
  * equi-join on duplicated names would silently cross-pair reads.
  */
object FastqPaired {

  private def stemOf(name: Column): Column =
    regexp_replace(name, "/[12]$", "")

  /** Read R1/R2 as one mate-paired row per stem: `name` (the stem),
    * then `comment_i, seq_i, qual_i, len_i` for i in 1, 2.
    *
    * `strict = true` (the instrument-output contract): any read whose
    * mate is missing, and any stem appearing more than once within one
    * file, RAISES — as a Filter, not a prunable column wrapper, so the
    * guard survives any downstream column pruning. `strict = false`
    * (the post-trimming reality, where a filter may have dropped one
    * mate): unpaired reads are silently dropped and duplicate stems
    * pair like any equi-join. */
  def read(spark: SparkSession, r1Path: String, r2Path: String,
      strict: Boolean = true, splitSize: Long = 0L): DataFrame = {
    def side(p: String, i: Int): DataFrame = {
      val rd = spark.read.format("fastq")
      val withOpt = if (splitSize > 0) rd.option("splitsize", splitSize)
        else rd
      val base = withOpt.load(p).select(
        stemOf(col("name")).as("name"),
        col("comment").as(s"comment_$i"),
        col("sequence").as(s"seq_$i"),
        col("quality").as(s"qual_$i"),
        col("length").as(s"len_$i"))
      if (!strict) base
      else base.withColumn(s"n_dup_$i",
        count(lit(1)).over(Window.partitionBy(col("name"))))
    }
    val j = side(r1Path, 1).join(side(r2Path, 2), Seq("name"), "full")
    if (strict) {
      j.where(coalesce(
          when(col("len_1").isNull || col("len_2").isNull,
            raise_error(concat(lit("unpaired read '"), col("name"),
              lit("': present only in "),
              when(col("len_1").isNotNull, lit("R1")).otherwise(lit("R2"))))
              .cast("boolean"))
            .when(col("n_dup_1") > 1 || col("n_dup_2") > 1,
              raise_error(concat(lit("duplicate read name '"), col("name"),
                lit("' within one file — refusing to cross-pair")))
                .cast("boolean")),
          lit(true)))
        .drop("n_dup_1", "n_dup_2")
    } else {
      j.where(col("len_1").isNotNull && col("len_2").isNotNull)
    }
  }
}
