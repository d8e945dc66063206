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
    val srcBase = cfg.prefix + "_MT"
    val srcBam = srcBase + ".bam"
    val srcIsBam = graft.sources.HadoopIO.exists(srcBam,
      graft.sources.HadoopIO.driverConf())
    val toWrite = Sam.readAuto(spark, srcBase)
    // empty-input / prob=0 pass-through guards (reference
    // MTClassify.scala:159-161,194-197)
    val filtered =
      if (cfg.prob <= 0.0 || feat.isEmpty) toWrite
      else {
        val keys = Classify.mtReadKeys(Classify.score(model, feat), cfg.prob)
        Classify.filterAlignments(toWrite, keys)
      }
    val (headerText, refs) =
      if (srcIsBam) graft.sources.BamWriter.readHeader(srcBam)
      else Sam.headerFromSam(spark, Sam.resolveSamText(srcBase))
    if (cfg.out.endsWith(".bam"))
      graft.sources.BamWriter.write(filtered, headerText, refs, cfg.out)
    else
      Sam.writeSingleSamWithHeader(
        headerText.split("\n").filter(_.nonEmpty), filtered, cfg.out)
    feat.unpersist(blocking = false) // sink written; release the cache
    Features.releaseCaches() // incl. mtFeaturesJoin's per-read aggregate
    filtered
  }
}
