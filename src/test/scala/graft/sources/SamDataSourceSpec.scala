package graft.sources

import graft.SparkSpec
import graft.mito.Sam
import org.apache.spark.sql.functions._

class SamDataSourceSpec extends SparkSpec {

  private lazy val path = resource("mito/sample_MT_MD.sam")

  test("format(\"sam\") loads records with the declared schema") {
    val df = spark.read.format("sam").load(path)
    assert(df.count() === 7)
    assert(df.schema.fieldNames.toSeq === SamDataSource.schema.fieldNames.toSeq)
    val r1 = df.where(col("readName") === "r1" && col("flag") === 99).head()
    assert(r1.getAs[String]("referenceName") === "chrM")
    assert(r1.getAs[Int]("start") === 5)
    assert(r1.getAs[String]("sequence") === "==G===C===")
    assert(r1.getAs[String]("attributes").contains("MD:Z:2A3T3"))
  }

  test("DSv2 scan agrees with the expression-based parser on every column") {
    val v2 = spark.read.format("sam").load(path)
    val v1 = Sam.read(spark, path).select(v2.columns.map(col): _*)
    assert(v1.except(v2).isEmpty && v2.except(v1).isEmpty)
  }

  test("flag expansion + validity compose on top of the DSv2 scan") {
    val valid = Sam.withFlags(spark.read.format("sam").load(path))
      .where(Sam.isValid)
      .select("readName").collect().map(_.getString(0)).sorted
    assert(valid.toSeq === Seq("r1", "r1", "r2", "r2"))
  }

  test("column pruning reaches the scan (ReadSchema shrinks)") {
    val pruned = spark.read.format("sam").load(path)
      .select("readName", "flag")
    val plan = pruned.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints its (pruned) output column list
    assert("BatchScan sam\\(.*\\)\\[readName#\\d+, flag#\\d+\\]".r
      .findFirstIn(plan).isDefined, plan.take(1200))
    assert(pruned.collect().length === 7)
    val prunedBam = spark.read.format("bam")
      .load(resource("mito/sample_MT_MD.bam")).select("readName", "start")
    val bplan = prunedBam.queryExecution.executedPlan.toString
    assert("BatchScan bam\\(.*\\)\\[readName#\\d+, start#\\d+\\]".r
      .findFirstIn(bplan).isDefined, bplan.take(1200))
    assert(prunedBam.collect().length === 7)
  }

  test("multiple paths scan in parallel partitions") {
    val df = spark.read.format("sam")
      .load(path, resource("mito/sample_NT.sam"))
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 12) // 7 + 5 records
  }

  test("directory paths expand to their files") {
    val dir = java.nio.file.Files.createTempDirectory("samdir")
    for (f <- Seq("mito/sample_MT_MD.sam", "mito/sample_NT.sam"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(resource(f).stripPrefix("file:")),
        dir.resolve(java.nio.file.Paths.get(f).getFileName))
    val df = spark.read.format("sam").load(dir.toString)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 12)
  }

  test("sam landing-dir micro-batch stream: streamed count == batch count") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("samstream")
    for ((f, i) <- Seq("mito/sample_MT_MD.sam", "mito/sample_NT.sam").zipWithIndex)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(resource(f).stripPrefix("file:")),
        dir.resolve(f"part-$i%05d.sam"))
    val s2 = spark.newSession()
    val q = s2.readStream.format("sam").load(dir.toString)
      .groupBy().agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("samstream_spec")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    assert(s2.table("samstream_spec").head.getLong(0) ===
      spark.read.format("sam").load(dir.toString).count())
  }

  test("byte-range splits: one sam file scans as many partitions, line-exact") {
    val split = resource("mito/sample_split.sam")
    val whole = spark.read.format("sam").load(split)
    val parts = spark.read.format("sam").option("splitsize", 65536).load(split)
    assert(parts.rdd.getNumPartitions === 6) // ~381 KB / 64 KB
    assert(parts.count() === 3000)
    val a = whole.select("line")
    val b = parts.select("line")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(b.distinct().count() === 3000) // exactly-once, no straddle dupes
  }

  test("validity bitmask pushes down to the scan (V2 predicate)") {
    val df = Sam.withFlags(spark.read.format("sam").load(path))
      .where(Sam.isValid)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [((flag & 2315) = 3)]"), plan.take(1500))
    // pushed scan returns exactly the records the un-pushed filter keeps
    assert(df.select("readName").collect().map(_.getString(0)).sorted.toSeq
      === Seq("r1", "r1", "r2", "r2"))

    val bam = Sam.withFlags(
        spark.read.format("bam").load(resource("mito/sample_MT_MD.bam")))
      .where(Sam.isValid)
    val bplan = bam.queryExecution.executedPlan.toString
    assert(bplan.contains("PushedFilters: [((flag & 2315) = 3)]"), bplan.take(1500))
    assert(bam.count() === 4)
  }

  test("comparison + refname filters push down and agree with post-scan") {
    val split = resource("mito/sample_split.bam")
    val base = spark.read.format("bam").option("splitsize", 32768).load(split)
    val pushedDf = base.where(col("referenceName") === "MT" && col("mapQ") >= 30)
    val plan = pushedDf.queryExecution.executedPlan.toString
    assert(plan.contains("(referenceName = 'MT')") && plan.contains("(mapQ >= 30)"),
      plan.take(1500))
    // same rows as filtering a scan with pushdown defeated by a UDF guard
    val opaque = udf((s: String) => s)
    val unpushed = base.where(opaque(col("referenceName")) === "MT" && col("mapQ") >= 30)
    assert(pushedDf.count() === unpushed.count())
    assert(pushedDf.count() > 0)
  }

  test("split boundaries falling on newlines keep line ownership exact") {
    // many tiny ranges → boundaries land on every byte class, including
    // exactly-on-\n (the start-1 probe case)
    val tiny = spark.read.format("sam").option("splitsize", 1000)
      .load(resource("mito/sample_split.sam"))
    assert(tiny.rdd.getNumPartitions > 300)
    assert(tiny.count() === 3000)
  }
}
