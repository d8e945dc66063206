package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `samtools idxstats` analogue (r16, VERDICT r15 #5): per-contig
  * mapped/unmapped record counts served from the `.bai`/`.csi` sidecar
  * ALONE — the htslib pseudo-bin ([[BaiIndex.RefStat]]) every graft
  * index now carries and every samtools-built index already carries.
  * ZERO record decode, zero Spark tasks: the header and the sidecar are
  * KB-sized driver reads, so a cohort's stats cost one metadata
  * round-trip per file regardless of BAM size — the metadata-only
  * consumer surface of the indexes the engine builds everywhere
  * (index-on-write, distributed builds, merge).
  *
  * Sidecar precedence mirrors the scan planner's count-capable subset:
  * `.bai` then `.csi`. A `.gai` carries per-member coordinate ranges
  * but no record counts, and a pre-pseudo-bin sidecar carries bins but
  * no stats — both refuse loudly (silently returning zeros is how
  * idxstats lies), pointing at a rebuild. */
object Idxstats {

  /** One output row; the final row is `("*", 0, 0, n_no_coor)` — the
    * unplaced-read slot, samtools' convention. */
  final case class ContigStat(contig: String, length: Long,
      nMapped: Long, nUnmapped: Long)

  /** Stats for one BAM from its header + sidecar (driver-side, KB
    * reads, no Spark job). */
  def rows(bam: String, conf: Configuration): Seq[ContigStat] = {
    val (_, refs) = BamWriter.readHeader(bam)
    val (perRef, noCoor): (Array[Option[BaiIndex.RefStat]], Long) =
      if (BaiIndex.exists(bam, conf)) {
        val bai = BaiIndex.read(bam, conf)
        (bai.refs.map(r => statOf(bam, ".bai",
          r.bins.get(BaiIndex.metaBin(5)).map(two(bam, _)),
          r.bins.nonEmpty)), bai.noCoor)
      } else if (CsiIndex.exists(bam, conf)) {
        val csi = CsiIndex.read(bam, conf)
        (csi.refs.map(r => statOf(bam, ".csi",
          r.bins.get(BaiIndex.metaBin(csi.depth))
            .map { case (_, cs) => two(bam, cs) }, r.bins.nonEmpty)),
          csi.noCoor)
      } else throw new IllegalArgumentException(
        s"idxstats: no .bai/.csi sidecar for $bam — metadata-only stats " +
          "need a count-capable index (BaiIndex/CsiIndex build it, or " +
          "write with index = true); a .gai carries no record counts")
    require(perRef.length == refs.length,
      s"idxstats: sidecar indexes ${perRef.length} references but the " +
        s"header dictionary has ${refs.length} — stale or foreign sidecar")
    refs.zip(perRef).map { case ((name, len), st) =>
      st match {
        case Some(s) => ContigStat(name, len.toLong, s.nMapped, s.nUnmapped)
        case None    => ContigStat(name, len.toLong, 0L, 0L)
      }
    } :+ ContigStat("*", 0L, 0L, noCoor)
  }

  private def two(bam: String, cs: Array[BaiIndex.Chunk])
      : (BaiIndex.Chunk, BaiIndex.Chunk) = {
    require(cs.length == 2,
      s"idxstats: corrupt pseudo-bin in sidecar for $bam — " +
        s"${cs.length} chunks, expected 2 (span + counts)")
    (cs(0), cs(1))
  }

  /** Pseudo-bin → stats; a ref with real bins but NO pseudo-bin is a
    * pre-stats sidecar — refuse rather than report zeros. */
  private def statOf(bam: String, kind: String,
      meta: Option[(BaiIndex.Chunk, BaiIndex.Chunk)],
      hasBins: Boolean): Option[BaiIndex.RefStat] = meta match {
    case Some((span, counts)) =>
      Some(BaiIndex.RefStat(span.beg, span.end, counts.beg, counts.end))
    case None if hasBins => throw new IllegalArgumentException(
      s"idxstats: $kind sidecar for $bam carries bins but no pseudo-bin " +
        "record counts (pre-stats index) — rebuild it " +
        "(BaiIndex/CsiIndex build, or rewrite with index = true)")
    case None => None
  }

  /** The stats as a (driver-local, rows = contigs + 1) DataFrame —
    * joinable metadata, never a data scan. */
  def toDF(s: SparkSession, bam: String): DataFrame = {
    import s.implicits._
    rows(bam, s.sparkContext.hadoopConfiguration)
      .map(c => (c.contig, c.length, c.nMapped, c.nUnmapped))
      .toDF("contig", "length", "n_mapped", "n_unmapped")
  }

  /** CLI parity with `samtools idxstats`: one TSV line per contig plus
    * the `*` slot. No SparkSession — pure sidecar reads. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Idxstats <file.bam> [more.bam ...]")
    val conf = new Configuration()
    args.foreach { p =>
      if (args.length > 1) println(s"# $p")
      rows(p, conf).foreach(c =>
        println(s"${c.contig}\t${c.length}\t${c.nMapped}\t${c.nUnmapped}"))
    }
  }
}
