package graft.mito

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{GBTClassifier, RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.RFormula
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training / scoring / filtering (reference `MTClassifierModel.scala` +
  * `MTClassify.scala`), on stock MLlib.
  *
  * MT_LABEL = 0.0 (genuine mtDNA), NUMT label = 1.0
  * (`MTClassifierModel.scala:36-37`). Formula = the shipped 6-feature
  * R-formula (`MTClassifierModel.scala:52`, matches saved model metadata
  * numFeatures:6).
  */
object Classify {

  val MtLabel = 0.0
  val Formula =
    "label ~ MTEditDist + LD + NTEditDist + NTScore + MTNumAlignments + NTNumAlignments"

  def rformula: RFormula = new RFormula()
    .setFormula(Formula).setFeaturesCol("features").setLabelCol("label")

  /** Train an RF (reference `trainRF`, `MTClassifierModel.scala:265-281`:
    * 128 trees, library defaults otherwise — gini, maxDepth 5, maxBins 32
    * per saved metadata). Seeded for reproducibility. */
  def trainRF(df: DataFrame, numTrees: Int = 128, seed: Long = 42L)
      : RandomForestClassificationModel = {
    val prepared = rformula.fit(df).transform(df)
    val m = new RandomForestClassifier()
      .setNumTrees(numTrees).setSeed(seed)
      .fit(prepared)
    // strip the training summary: it pins the TRAINING SparkSession into
    // the model object, and scoring ships the model inside task closures
    // (ProbabilisticClassificationModel's UDF captures it) — a session
    // whose state is ever non-serializable (e.g. a registered Observation
    // lives in its ObservationManager) would fail EVERY later scoring
    // job with "Task not serializable". copy() transfers params + trees,
    // not the summary, and shrinks the shipped closure besides.
    m.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setParent(m.parent).asInstanceOf[RandomForestClassificationModel]
  }

  /** Experimental GBT path (reference `testGBModel`,
    * `MTClassifierModel.scala:237-246`: maxDepth 8, maxIter 50). */
  def trainGBT(df: DataFrame, maxIter: Int = 50, seed: Long = 42L) = {
    val prepared = rformula.fit(df).transform(df)
    new GBTClassifier()
      .setMaxDepth(8).setMaxIter(maxIter).setSeed(seed)
      .fit(prepared)
  }

  /** Score + MaxProb extraction (reference `getMaxProb`,
    * `MTClassifierModel.scala:95-109`) — columnar `array_max ∘
    * vector_to_array` instead of the reference's typed map (X5/T3), so it
    * stays in the plan. */
  def score(model: RandomForestClassificationModel, df: DataFrame): DataFrame = {
    val prepared = rformula.fit(df).transform(df)
    model.transform(prepared)
      .withColumn("MaxProb", array_max(vector_to_array(col("probability"))))
  }

  /** Post-score filters (reference `MTClassify.scala:170-178`): confidence
    * gate F1 + prediction filter F2 + key projection P1. */
  def mtReadKeys(scored: DataFrame, maxProb: Double): DataFrame =
    scored
      .where(col("MaxProb") >= maxProb)
      .where(col("prediction") === MtLabel)
      .select(col("Read"))

  /** Output pass (reference `MTClassify.scala:181-193`): left-semi the
    * alignment records against the predicted-MT keys on readName (J2). */
  def filterAlignments(alignments: DataFrame, keys: DataFrame): DataFrame =
    alignments.join(keys,
      alignments("readName") === keys("Read"), "left_semi")

  /** Holdout metric (reference `testRFModel` accuracy,
    * `MTClassifierModel.scala:187-222`; `testGBModel` evaluated
    * MulticlassClassificationEvaluator("precision"),
    * `MTClassifierModel.scala:252-256` — a metric name Spark 3 removed
    * because it equaled accuracy for the multiclass evaluator, as the
    * reference's own comment admits). Default accuracy; pass
    * "weightedPrecision"/"f1"/... for the other evaluator metrics. */
  def evaluate(scored: DataFrame, metric: String = "accuracy"): Double =
    new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName(metric)
      .evaluate(scored)

  /** The reference testGBModel's reported metric, modern spelling. */
  def evaluatePrecision(scored: DataFrame): Double =
    evaluate(scored, "weightedPrecision")
}
