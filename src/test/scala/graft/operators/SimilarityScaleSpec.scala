package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** s07's 100 TB claim is PHYSICAL partition pruning on the bucketed
  * layout. The plan spec (OperatorsSpec) proves the PartitionFilters are
  * present at sf0.001; this spec proves the MEASURED bytes at the bench
  * scale factor: the probe's post-pruning scan size must equal the probed
  * cells' stored bytes — and a single-cell probe must touch ~1/k of the
  * corpus, the number the 100 TB claim actually rests on. */
class SimilarityScaleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.1"

  /** Data-file bytes under `path` — skipping Hadoop's hidden `.crc`
    * sidecars and `_SUCCESS` markers, which the scan metric never reads. */
  private def dirBytes(path: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(path)) 0L
    else {
      val s = java.nio.file.Files.walk(path)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .filter(p => { val n = p.getFileName.toString
          !n.startsWith(".") && !n.startsWith("_") })
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  private def bucketedScanBytes(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("graft_ivf_")) => f
    }
    assert(scans.nonEmpty, "no bucketed-corpus scan in the plan")
    scans.map(_.metrics("filesSize").value).sum
  }

  test("s07 probe scan bytes == probed cells' stored bytes (measured pruning)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probedBytes = bucketedScanBytes(Similarity.ivfBucketedTopK(spark, sf))
      val dir = java.nio.file.Paths.get(Similarity.ivfBucketedDir(spark, sf))
      val totalBytes = dirBytes(dir)
      assert(totalBytes > 0)
      // the scan must read strictly less than the stored corpus, and
      // exactly the probed cells' bytes: recompute the probed-cell byte
      // sum from the directory layout and require equality
      val cellDirs = java.nio.file.Files.list(dir).iterator()
      var cellSizes = Map.empty[String, Long]
      while (cellDirs.hasNext) {
        val p = cellDirs.next()
        if (java.nio.file.Files.isDirectory(p))
          cellSizes += p.getFileName.toString -> dirBytes(p)
      }
      // which cells did the probe read? exactly those whose per-cell byte
      // sums add up to the scan's filesSize — assert some subset matches
      // and that at least one cell was pruned
      assert(probedBytes < totalBytes,
        s"no pruning: probe read $probedBytes of $totalBytes")
      // subset-sum over ≤16 cells is cheap and exact: the scan's size must
      // be explainable as a union of whole cell directories
      def subsetSums(xs: List[Long]): Set[Long] = xs match {
        case Nil => Set(0L)
        case h :: t => val rest = subsetSums(t); rest ++ rest.map(_ + h)
      }
      assert(subsetSums(cellSizes.values.toList).contains(probedBytes),
        s"probe bytes $probedBytes not a cell-subset sum of $cellSizes")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("native lsh_buckets is bit-identical to the composed signBits form") {
    // the native kernel replaced the HOF composition in every production
    // site; the composed helpers remain exactly to pin this equivalence
    val e = graft.Tables.embeddings(spark, sf).limit(200)
    for (multiProbe <- Seq(false, true)) {
      val composed = e.select(col("vec_id"),
        (if (multiProbe) Similarity.bucketsMultiProbe(Similarity.signBits(col("embedding")))
         else Similarity.bucketsFromBits(Similarity.signBits(col("embedding")))).as("bs"))
      val native = e.select(col("vec_id"),
        Similarity.lshBucketsOf(col("embedding"), multiProbe).as("bs"))
      val c = composed.selectExpr("vec_id", "to_json(bs) AS j")
        .orderBy("vec_id").collect().toSeq
      val n = native.selectExpr("vec_id", "to_json(bs) AS j")
        .orderBy("vec_id").collect().toSeq
      assert(c === n, s"multiProbe=$multiProbe diverged")
    }
  }

  test("s07 single-cell scan touches ~1/k of the stored corpus bytes") {
    // the per-query cost model at 100 TB: each probed cell costs ~1/k of
    // the stored bytes; verify on the physical layout, not by assumption
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // ensure the bucketed layout exists and is fresh
      Similarity.ivfBucketedTopK(spark, sf).collect()
      val dirPath = Similarity.ivfBucketedDir(spark, sf)
      val total = dirBytes(java.nio.file.Paths.get(dirPath))
      val one = spark.read.parquet(dirPath).where(col("cell") === 0)
      one.collect()
      val scan = one.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scan.nonEmpty)
      val oneCellBytes = scan.map(_.metrics("filesSize").value).sum
      assert(oneCellBytes > 0 && oneCellBytes < total / 4,
        s"single cell read $oneCellBytes of $total — pruning not physical")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
