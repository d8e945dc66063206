package graft.mito

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end classification pipeline — `MTClassify.main` parity
  * (reference `MTClassify.scala:54-213`, lifecycle SURVEY §3.1), wired from
  * the composable stages in Sam/Features/Ld/Numt/Classify.
  *
  * Inputs per sample prefix (SAM text in place of BAM, §7.2):
  *   <prefix>_MT_MD.sam  — mito-aligned, calmd -e'd (MD tags)
  *   <prefix>_NT.sam     — nuclear-aligned
  *   <prefix>_MT.sam     — mito-aligned, the records to filter & write
  */
object MitoPipeline {

  final case class Config(
    prefix: String,
    out: String,
    ldFile: String,
    numtFile: String,
    prob: Double = 0.5,
    ldMode: String = "join") // "join" (scalable) | "broadcast" (faithful)

  /** Feature frame for one sample (reference `MTClassifierModel.DF`,
    * `MTClassifierModel.scala:71-87`). Inputs resolve `<prefix>_X.bam`
    * first, then `<prefix>_X.sam` (Sam.readAuto). */
  def features(spark: SparkSession, cfg: Config, label: Double): DataFrame = {
    val numts = Numt.load(spark, cfg.numtFile)
    val nt = Features.ntFeatures(Sam.readAuto(spark, cfg.prefix + "_NT"), numts)
    val mtAlign = Sam.readAuto(spark, cfg.prefix + "_MT_MD")
    val mt = cfg.ldMode match {
      case "broadcast" =>
        val bc = spark.sparkContext.broadcast(Ld.toMap(Ld.load(spark, cfg.ldFile)))
        Features.mtFeaturesBroadcast(mtAlign, bc)
      case _ =>
        Features.mtFeaturesJoin(mtAlign, Ld.load(spark, cfg.ldFile))
    }
    Features.normalizeMapQ(Features.featureFrame(mt, nt, label))
  }

  /** Classify `<prefix>_MT.sam` with a trained model and write the filtered
    * single SAM (reference steps 6-10, `MTClassify.scala:159-204`). Returns
    * the filtered alignment DataFrame (pre-sink) for inspection. */
  def run(spark: SparkSession, cfg: Config,
      model: org.apache.spark.ml.classification.RandomForestClassificationModel)
      : DataFrame = {
    // persist the feature frame: the empty guard (isEmpty) and the scoring
    // pass both consume it — without the cache the guard alone executes the
    // whole scan→agg→join→normalize DAG, then scoring runs it again (the
    // reference had this same double evaluation, F5)
    val feat = features(spark, cfg, label = 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val filtered = classifyAndWrite(spark, feat, cfg.prefix, cfg.out,
      cfg.prob, model)
    feat.unpersist(blocking = false) // sink written; release the cache
    Features.releaseCaches() // incl. mtFeaturesJoin's per-read aggregate
    filtered
  }

  /** Steps 6-10 shared by [[run]] and [[runCohort]]: score the persisted
    * feature frame, filter `<prefix>_MT`, write the single-file sink. */
  private def classifyAndWrite(spark: SparkSession, feat: DataFrame,
      prefix: String, out: String, prob: Double,
      model: org.apache.spark.ml.classification.RandomForestClassificationModel)
      : DataFrame = {
    val srcBase = prefix + "_MT"
    val srcBam = srcBase + ".bam"
    val srcIsBam = graft.sources.HadoopIO.exists(srcBam,
      graft.sources.HadoopIO.driverConf())
    val toWrite = Sam.readAuto(spark, srcBase)
    // empty-input / prob=0 pass-through guards (reference
    // MTClassify.scala:159-161,194-197)
    val filtered =
      if (prob <= 0.0 || feat.isEmpty) toWrite
      else {
        val keys = Classify.mtReadKeys(Classify.score(model, feat), prob)
        Classify.filterAlignments(toWrite, keys)
      }
    val (headerText, refs) =
      if (srcIsBam) graft.sources.BamWriter.readHeader(srcBam)
      else Sam.headerFromSam(spark, Sam.resolveSamText(srcBase))
    if (out.endsWith(".bam"))
      graft.sources.BamWriter.write(filtered, headerText, refs, out)
    else
      Sam.writeSingleSamWithHeader(
        headerText.split("\n").filter(_.nonEmpty), filtered, out)
    filtered
  }

  /** Paired FASTQ → unmapped BAM (the picard `FastqToSam` analogue) —
    * the reference's documented preprocessing entry (ref README.md:30
    * reverts inputs to uBAM before alignment), promoted from x82's gate
    * plumbing to a user surface. Strict paired read ([[FastqPaired]]:
    * name-stem agreement enforced split-parallel), picard-flag 77/141
    * unaligned records, one read group, written through [[graft.sources
    * .BamWriter]] against an empty reference dictionary. Returns the
    * record count (2 × pairs).
    *
    * Scale shape: two split-parallel FASTQ scans zipped by position, a
    * narrow explode, and the BAM sink's streamed per-task part files —
    * no record bytes on the driver. */
  def fastqToUbam(spark: SparkSession, r1: String, r2: String, out: String,
      readGroup: String = "sample1", sample: String = null,
      splitSize: Long = 8L * 1024 * 1024): Long = {
    val sm = Option(sample).getOrElse(readGroup)
    val pairs = graft.sources.FastqPaired.read(spark, r1, r2,
      strict = true, splitSize = splitSize)
    val recs = pairs.select(col("name"), explode(array(
        struct(lit(77).as("flag"), col("seq_1").as("sequence"),
          col("qual_1").as("qual")),
        struct(lit(141).as("flag"), col("seq_2").as("sequence"),
          col("qual_2").as("qual")))).as("m"))
      .select(col("name").as("readName"), col("m.flag").as("flag"),
        lit("*").as("referenceName"), lit(0).as("start"), lit(0).as("mapQ"),
        lit("*").as("cigar"), lit("*").as("rnext"), lit(0).as("pnext"),
        lit(0).as("tlen"), col("m.sequence").as("sequence"),
        col("m.qual").as("qual"),
        lit(s"RG:Z:$readGroup").as("attributes"))
    val header = s"@HD\tVN:1.6\tSO:queryname\n@RG\tID:$readGroup\tSM:$sm\n"
    graft.sources.BamWriter.write(recs, header, Seq.empty, out)
  }

  /** COHORT mode — N samples, ONE session, SHARED dims: the reference is
    * one-sample-per-JVM (`MTClassify.main` takes a single prefix), so a
    * cohort pays N dim loads and N JVM spins. Here the LD table is loaded,
    * collected, and `sparkContext.broadcast` ONCE, the NUMT dim loaded
    * once, and every sample's feature build closes over the SAME broadcast
    * handle — N samples cost one dim load plus N sample-sized pipelines.
    * [[graft.mito.Ld.loadCount]] / [[graft.mito.Numt.loadCount]] make the
    * once-not-N contract observable (the x80 gate asserts the deltas are
    * exactly 1 across an 8-sample cohort).
    *
    * `samples` maps each input prefix to its output path. Uses the
    * faithful broadcast LD mode — the cohort contract is a driver-sized
    * LD dim; a corpus-sized dim would switch to the join mode per sample
    * with the LD frame persisted once instead. */
  def runCohort(spark: SparkSession, samples: Seq[(String, String)],
      ldFile: String, numtFile: String, prob: Double,
      model: org.apache.spark.ml.classification.RandomForestClassificationModel)
      : Unit = {
    val numts = Numt.load(spark, numtFile)
    val ldBc = spark.sparkContext.broadcast(Ld.toMap(Ld.load(spark, ldFile)))
    try samples.foreach { case (prefix, out) =>
      val nt = Features.ntFeatures(Sam.readAuto(spark, prefix + "_NT"), numts)
      val mt = Features.mtFeaturesBroadcast(
        Sam.readAuto(spark, prefix + "_MT_MD"), ldBc)
      val feat = Features
        .normalizeMapQ(Features.featureFrame(mt, nt, label = 0.5))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      classifyAndWrite(spark, feat, prefix, out, prob, model)
      feat.unpersist(blocking = false)
    } finally {
      ldBc.unpersist(blocking = false)
      Features.releaseCaches()
    }
  }
}
