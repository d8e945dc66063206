package graft.mito

import graft.SparkSpec
import graft.sources.FastqDataSource
import org.apache.spark.sql.functions._

/** [[MitoPipeline.fastqToUbam]] (r14): the picard FastqToSam analogue as
  * a user surface — paired FASTQ in, queryname-grouped uBAM out, read
  * group applied, values round-tripped through the `bam` source. */
class FastqToUbamSpec extends SparkSpec {
  import spark.implicits._

  private val root =
    s"/tmp/graft_ubam_${java.util.UUID.randomUUID().toString.take(8)}"

  test("paired FASTQ composes to a uBAM: flags, RG, bases round-trip") {
    val pairs = (0 until 40).map { i =>
      (f"read$i%03d", "ACGT" * (2 + i % 3), "IIII" * (2 + i % 3),
        "TTGCA" * (1 + i % 4), "#IIII" * (1 + i % 4))
    }
    FastqDataSource.write(
      pairs.map(p => (p._1, p._2, p._3)).toDF("name", "sequence", "quality"),
      s"$root/R1.fastq.gz")
    FastqDataSource.write(
      pairs.map(p => (p._1, p._4, p._5)).toDF("name", "sequence", "quality"),
      s"$root/R2.fastq.gz")
    val out = s"$root/unmapped.bam"
    val n = MitoPipeline.fastqToUbam(spark, s"$root/R1.fastq.gz",
      s"$root/R2.fastq.gz", out, readGroup = "rgA", sample = "smB",
      splitSize = 2048)
    assert(n === 80L)
    val back = spark.read.format("bam").load(out)
    assert(back.count() === 80L)
    assert(back.where(col("flag") === 77).count() === 40L)
    assert(back.where(col("flag") === 141).count() === 40L)
    assert(back.where(col("referenceName") === "*" && col("start") === 0 &&
      col("cigar") === "*" && col("attributes") === "RG:Z:rgA")
      .count() === 80L)
    // per-read bases/quals survive exactly (spot the mates of read007)
    val r7 = back.where(col("readName") === "read007")
      .select("flag", "sequence", "qual").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(r7.toSeq === Seq((77, pairs(7)._2, pairs(7)._3),
      (141, pairs(7)._4, pairs(7)._5)))
    // header carries the RG/SM the caller named
    val (hdr, _) = graft.sources.BamWriter.readHeader(out)
    assert(hdr.contains("@RG\tID:rgA\tSM:smB"))
  }

  test("mismatched mate names raise loudly (strict paired read)") {
    FastqDataSource.write(Seq(("a", "ACGT", "IIII"))
      .toDF("name", "sequence", "quality"), s"$root/M1.fastq.gz")
    FastqDataSource.write(Seq(("b", "ACGT", "IIII"))
      .toDF("name", "sequence", "quality"), s"$root/M2.fastq.gz")
    val e = intercept[Exception](MitoPipeline.fastqToUbam(spark,
      s"$root/M1.fastq.gz", s"$root/M2.fastq.gz", s"$root/m.bam"))
    assert(e != null)
  }
}
