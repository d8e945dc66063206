package graft.sources

import org.apache.spark.sql.SparkSession

/** Cohort VCF merge — the `bcftools merge` analogue: N single-(or few-)
  * sample VCFs become ONE multi-sample VCF, the most common operation
  * downstream of per-sample variant calling (the reference's published
  * workflow hands its classified BAM to a per-sample caller,
  * /root/reference/README.md:50-52; cohort analysis starts by merging
  * those calls).
  *
  * Semantics: the output's sample columns are the inputs' header samples
  * in input order (duplicate names refused loudly — silently suffixing
  * them corrupts downstream sample joins); the site set is the UNION of
  * the inputs' sites; a sample without a call at a site renders `./.:.`
  * (missing genotype, missing depth). Contig dictionaries must agree
  * across inputs and carry into the output header.
  *
  * Scale shape: N split-parallel `vcf`-source scans (each input reads
  * with intra-file parallelism) → union → [[VcfWriter.writeGenotypes]]'s
  * one site-keyed groupBy (per-key state bounded by the SAMPLE count,
  * map-side combinable) + one range exchange on (dictionary ordinal,
  * pos). Nothing corpus-sized touches the driver — headers only. */
object VcfMerge {

  /** Merge `inputs` into one multi-sample VCF at `out` (bgzip'd when the
    * name ends `.vcf.gz`/`.bgz`). `index`/`csi` emit the `.tbi`/`.csi`
    * sidecar during the write itself (index-on-write — the merged
    * cohort is exactly the artifact whose first consumer is a region
    * query). Returns the merged record (site) count. */
  def merge(s: SparkSession, inputs: Seq[String], out: String,
      numPartitions: Int = 0, index: Boolean = false,
      csi: Boolean = false): Long = {
    require(inputs.nonEmpty, "VcfMerge.merge: no inputs")
    val conf = HadoopIO.driverConf()
    val perInput = inputs.map(p => p -> VcfDataSource.headerSamples(p, conf))
    perInput.collect { case (p, Nil) => p } match {
      case Nil => ()
      case bad => throw new IllegalArgumentException(
        s"VcfMerge.merge: no sample columns in ${bad.mkString(", ")} — " +
          "site-only VCFs have no genotypes to merge")
    }
    val samples = perInput.flatMap(_._2)
    val dups = samples.groupBy(identity).collect {
      case (n, vs) if vs.length > 1 => n
    }
    require(dups.isEmpty,
      s"VcfMerge.merge: duplicate sample names across inputs: " +
        s"${dups.mkString(", ")} — merging them would silently conflate " +
        "two samples' calls")
    val refs = VcfDataSource.headerContigs(inputs.head, conf)
    require(refs.nonEmpty,
      s"VcfMerge.merge: ${inputs.head} carries no ##contig header lines")
    inputs.tail.foreach { p =>
      val r = VcfDataSource.headerContigs(p, conf)
      require(r == refs,
        s"VcfMerge.merge: contig dictionary of $p (${r.mkString(",")}) " +
          s"differs from ${inputs.head} (${refs.mkString(",")}) — merging " +
          "across dictionaries reorders coordinates silently")
    }
    // strict scan (ADVICE r14): a malformed input record — unparseable
    // POS, sample field lacking GT — must raise naming the line, not
    // silently render `./.:.` (or a shifted record) in the merged cohort
    val gt = inputs.map(p => VcfWriter.readGenotypes(s, p, strict = true))
      .reduce(_ unionAll _)
    VcfWriter.writeGenotypes(gt, refs, samples, out, numPartitions,
      index = index, csi = csi)
  }

  /** CLI parity with `bcftools merge` (and the BamMerge/Tabix mains):
    * `runMain graft.sources.VcfMerge [--index] [--csi] out.vcf.gz
    * in1.vcf.gz in2.vcf.gz [more ...]`. `--index`/`--csi` emit the
    * `.tbi`/`.csi` during the write (index-on-write). */
  def main(args: Array[String]): Unit = {
    val (flags, paths) = args.partition(_.startsWith("--"))
    require(paths.length >= 2,
      "usage: VcfMerge [--index] [--csi] <out.vcf.gz> <in1.vcf.gz> " +
        "[in2.vcf.gz ...]")
    val spark = SparkSession.builder()
      .appName("graft-vcf-merge").getOrCreate()
    try {
      val n = merge(spark, paths.tail.toSeq, paths.head,
        index = flags.contains("--index"), csi = flags.contains("--csi"))
      println(s"[vcf-merge] merged ${paths.length - 1} inputs: " +
        s"$n sites -> ${paths.head}")
    } finally spark.stop()
  }
}
