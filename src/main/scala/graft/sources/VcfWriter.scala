package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-file VCF sink — the downstream artifact of the reference's
  * workflow: MitoScape's classified BAM exists to feed mitochondrial
  * variant calling (reference README.md:50-52 — "Variant Calling …
  * any variant caller will do", tested on Mutect2), whose interchange
  * format is VCF; a variant table is useless to that ecosystem until it is
  * a coordinate-sorted VCF. The writer takes a site-level variant frame
  * `(contig, pos, ref, alt, ac, dp)`, range-partitions it by
  * (reference-dictionary ordinal, pos) — the same total order
  * [[BamWriter.sortAndWrite]] uses, so header dictionary order governs,
  * not lexicographic contig names — sorts within partitions, renders VCF
  * 4.2 records, and commits through [[TextSink]]: every task streams its
  * own partition to a part file, the driver concatenates header + part
  * bytes in partition order, and the range partitioning makes the
  * concatenation globally sorted. An `out` ending `.vcf.gz`/`.bgz` lands
  * as BGZF members — the bgzip framing `tabix`/`bcftools` require — via
  * TextSink's compressed mode.
  *
  * Scale shape: one range exchange on (ordinal, pos) — uniform keys,
  * genomic positions — then a narrow render; nothing corpus-sized touches
  * the driver (part paths only, same commit contract as the BAM sink).
  */
object VcfWriter {

  /** Write `variants` (columns contig, pos, ref, alt, ac, dp) as one
    * coordinate-sorted VCF at `out`. Returns the record count. */
  def write(variants: DataFrame, refs: Seq[(String, Int)], out: String,
      numPartitions: Int = 0): Long = {
    val s = variants.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else s.conf.get("spark.sql.shuffle.partitions").toInt
    val ordMap = typedLit(refs.map(_._1).zipWithIndex.toMap)
    val lines = variants
      .withColumn("__ord",
        coalesce(try_element_at(ordMap, col("contig")), lit(Int.MaxValue)))
      .repartitionByRange(n, col("__ord"), col("pos"))
      .sortWithinPartitions(col("__ord"), col("pos"))
      .select(concat_ws("\t",
        col("contig"), col("pos"), lit("."), col("ref"), col("alt"),
        lit("."), lit("PASS"),
        concat(lit("AC="), col("ac"), lit(";DP="), col("dp"))).as("line"))
    val header = Seq("##fileformat=VCFv4.2") ++
      refs.map { case (c, l) => s"##contig=<ID=$c,length=$l>" } ++
      Seq("##INFO=<ID=AC,Number=A,Type=Integer,Description=\"Allele count\">",
        "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Site depth\">",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO")
    TextSink.write(header, lines, out)
  }

  /** Scan a VCF written by [[write]] (or any site-level VCF with AC/DP
    * INFO keys) back into the canonical variant frame. Plain text only —
    * splittable via the ordinary text source. `strict = true` applies
    * the decoder-fuzz discipline the binary sources follow: a record
    * whose POS/AC/DP fields don't parse RAISES naming the offending
    * line, instead of silently becoming nulls that vanish from
    * aggregates (the failure mode that makes a truncated or corrupted
    * artifact read as a smaller valid one). */
  def read(s: org.apache.spark.sql.SparkSession, path: String,
      strict: Boolean = false): DataFrame = {
    // try_cast, not cast: under ANSI (the Spark 4 default) a malformed
    // field would ABORT the lenient scan with CAST_INVALID_INPUT before
    // the strict/lenient choice could apply; try_cast gives the null the
    // strict branch then inspects
    val parsed = s.read.text(path)
      .where(!col("value").startsWith("#"))
      .select(col("value"), split(col("value"), "\t").as("f"))
      .select(col("value"),
        col("f").getItem(0).as("contig"),
        expr("try_cast(f[1] AS BIGINT)").as("pos"),
        col("f").getItem(3).as("ref"),
        col("f").getItem(4).as("alt"),
        expr("try_cast(regexp_extract(f[7], 'AC=(\\\\d+)', 1) AS BIGINT)")
          .as("ac"),
        expr("try_cast(regexp_extract(f[7], 'DP=(\\\\d+)', 1) AS BIGINT)")
          .as("dp"))
    // The guard is a FILTER, not a column wrapper: a when(...raise_error)
    // attached to one output column dies with that column under Catalyst
    // pruning (read(...,strict=true).agg(sum("ac")) would never evaluate a
    // guard living on pos), whereas a Filter node survives regardless of
    // which columns the caller consumes — the optimizer cannot remove a
    // predicate it cannot prove true, and raise_error is non-foldable.
    // The condition coalesces to TRUE for well-formed rows (the when has
    // no otherwise, so its else-branch is null) and raises before ever
    // yielding a row for malformed ones.
    val out =
      if (!strict) parsed
      else parsed.where(coalesce(
        when(col("pos").isNull || col("ac").isNull || col("dp").isNull ||
          col("contig").isNull,
          raise_error(concat(lit("malformed VCF record: "), col("value")))
            .cast("boolean")),
        lit(true)))
    out.drop("value")
  }
}
