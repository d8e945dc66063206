package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Cohort BAM merge — the `samtools merge` analogue and [[VcfMerge]]'s
  * sibling at the alignment layer: N per-sample BAMs (the reference
  * workflow's per-sample classifier outputs, ref README.md:30-50)
  * become ONE coordinate-sorted single-file BAM with merged headers.
  *
  * Semantics: the output's reference dictionary must be IDENTICAL
  * across inputs (merging across dictionaries reorders coordinates
  * silently — refused loudly, the [[VcfMerge]] rule); `@RG` read-group
  * lines carry over in input order with ID collisions refused loudly
  * (samtools rewrites colliding IDs with random suffixes — silently
  * renaming a sample's read group corrupts every downstream
  * sample-attribution join, so this engine refuses instead); records
  * are the inputs' union. The header is rebuilt deterministically:
  * `@HD SO:coordinate`, the dictionary's `@SQ` lines, the merged `@RG`
  * lines.
  *
  * Scale shape: N split-parallel `bam` DSv2 scans (each input reads
  * with intra-file BGZF parallelism) → union → ONE range exchange on
  * (dictionary ordinal, start) + per-task spillable sorts
  * ([[BamWriter.sortAndWrite]] — samtools sort's merge shape,
  * distributed), streamed part files, driver byte concat. With
  * `index = true` the sidecar rides the write itself (index-on-write;
  * `.bai`, or `.csi` when any dictionary contig exceeds 2^29 — the
  * [[BamWriter.write]] auto-selection), so the merged cohort is
  * region-queryable with no post-write re-read. Inputs need NOT be pre-sorted — the range exchange sorts
  * globally either way (a distributed merge gets no discount from
  * pre-sorted inputs, unlike samtools' single-threaded heap merge). */
object BamMerge {

  private val RecordCols = Seq("readName", "flag", "referenceName",
    "start", "mapQ", "cigar", "rnext", "pnext", "tlen", "sequence",
    "qual", "attributes")

  /** Merge `inputs` into one coordinate-sorted BAM at `out`. Returns
    * the merged record count. */
  def merge(s: SparkSession, inputs: Seq[String], out: String,
      numPartitions: Int = 0, index: Boolean = false): Long = {
    require(inputs.nonEmpty, "BamMerge.merge: no inputs")
    // headers are driver-side KB reads; records never touch the driver
    val headers = inputs.map(p => p -> BamWriter.readHeader(p))
    val refs = headers.head._2._2
    require(refs.nonEmpty,
      s"BamMerge.merge: ${inputs.head} carries no reference dictionary")
    headers.tail.foreach { case (p, (_, r)) =>
      require(r == refs,
        s"BamMerge.merge: reference dictionary of $p " +
          s"(${r.map(_._1).mkString(",")}) differs from ${inputs.head} " +
          s"(${refs.map(_._1).mkString(",")}) — merging across " +
          "dictionaries reorders coordinates silently")
    }
    val rgLines = headers.flatMap { case (p, (text, _)) =>
      text.split("\n").filter(_.startsWith("@RG")).map(p -> _)
    }
    val rgIds = rgLines.map { case (p, l) =>
      l.split("\t").find(_.startsWith("ID:")).map(_.substring(3))
        .getOrElse(throw new IllegalArgumentException(
          s"BamMerge.merge: @RG line without an ID tag in $p: " +
            s"'${l.take(60)}'"))
    }
    val dupRg = rgIds.groupBy(identity).collect {
      case (id, vs) if vs.length > 1 => id
    }
    require(dupRg.isEmpty,
      s"BamMerge.merge: @RG ID collision across inputs: " +
        s"${dupRg.mkString(", ")} — samtools would silently rewrite " +
        "them; rename the read groups and re-run instead")
    val headerText = "@HD\tVN:1.6\tSO:coordinate\n" +
      refs.map { case (n, l) => s"@SQ\tSN:$n\tLN:$l\n" }.mkString +
      rgLines.map(_._2 + "\n").mkString
    val recs = inputs.map(p => s.read.format("bam").load(p)
      .select(RecordCols.map(col): _*)).reduce(_ union _)
    BamWriter.sortAndWrite(recs, headerText, refs, out, numPartitions,
      index)
  }

  /** CLI parity with `samtools merge` (and the Tabix/BamIndex mains):
    * `runMain graft.sources.BamMerge [--index] out.bam in1.bam in2.bam
    * [more ...]`. `--index` emits the `.bai` during the write. */
  def main(args: Array[String]): Unit = {
    val (flags, paths) = args.partition(_.startsWith("--"))
    require(paths.length >= 2,
      "usage: BamMerge [--index] <out.bam> <in1.bam> [in2.bam ...]")
    val spark = SparkSession.builder()
      .appName("graft-bam-merge").getOrCreate()
    try {
      val n = merge(spark, paths.tail.toSeq, paths.head,
        index = flags.contains("--index"))
      println(s"[bam-merge] merged ${paths.length - 1} inputs: " +
        s"$n records -> ${paths.head}")
    } finally spark.stop()
  }
}
