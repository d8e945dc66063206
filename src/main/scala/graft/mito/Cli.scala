package graft.mito

import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.sql.SparkSession

/** CLI entry point — reference `MTClassify.main` parity
  * (`MTClassify.scala:37-44,54-127`): same options, same validation, same
  * defaults. Usage:
  *
  *   graft.mito.Cli --prefix S1 --out out.sam --ld mitomap.ld
  *     --numt NUMTs.txt --model <dir> [--prob 0.5] [--threads 4]
  *     [--ld-mode join|broadcast]
  */
object Cli {

  private[mito] def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case key :: value :: rest if key.startsWith("--") =>
        parse(rest, acc + (key.drop(2) -> value))
      case other :: _ =>
        sys.error(s"unexpected argument: $other")
    }

  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    def req(k: String): String =
      opts.getOrElse(k, sys.error(s"missing required option --$k"))
    val prob = opts.getOrElse("prob", "0.5").toDouble
    require(prob >= 0.0 && prob <= 1.0, s"--prob must be in [0,1], got $prob")
    val threads = opts.getOrElse("threads", "4").toInt
    require(threads > 0, s"--threads must be positive, got $threads")

    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-mito-classify")
      .config("spark.sql.shuffle.partitions", threads.toString)
      // ObjectHashAggregate (collect_list/typed aggs) falls back to
      // SORT-based aggregation after 128 keys by default — a silent 2x on
      // every collect_list aggregation; per-key state here is tiny
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 20)
      // default 100-entry codegen class cache thrashes across a 50+-query
      // session: every pass re-runs janino compilation and executes cold
      // classes (static conf — must be set before session creation)
      .config("spark.sql.codegen.cache.maxEntries", 10000)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val cfg = MitoPipeline.Config(
        prefix = req("prefix"), out = req("out"),
        ldFile = req("ld"), numtFile = req("numt"),
        prob = prob, ldMode = opts.getOrElse("ld-mode", "join"))
      val model = RandomForestClassificationModel.load(req("model"))
      val kept = MitoPipeline.run(spark, cfg, model).count()
      println(s"wrote $kept alignments to ${cfg.out}")
    } finally spark.stop()
  }
}

/** Paired FASTQ → unmapped BAM CLI (picard `FastqToSam` analogue; the
  * reference's preprocessing entry, ref README.md:30). Usage:
  *
  *   graft.mito.FastqToUbamCli --r1 R1.fastq.gz --r2 R2.fastq.gz
  *     --out unmapped.bam [--rg sample1] [--sample <SM>] [--threads 4]
  */
object FastqToUbamCli {
  def main(args: Array[String]): Unit = {
    val opts = Cli.parse(args.toList, Map.empty)
    def req(k: String): String =
      opts.getOrElse(k, sys.error(s"missing required option --$k"))
    val threads = opts.getOrElse("threads", "4").toInt
    require(threads > 0, s"--threads must be positive, got $threads")
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft-fastq-to-ubam")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val rg = opts.getOrElse("rg", "sample1")
      val n = MitoPipeline.fastqToUbam(spark, req("r1"), req("r2"),
        req("out"), readGroup = rg, sample = opts.getOrElse("sample", rg))
      println(s"wrote $n unaligned records to ${req("out")}")
    } finally spark.stop()
  }
}
