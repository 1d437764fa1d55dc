package graft.ml

import org.apache.spark.ml.classification.{LinearSVC, LogisticRegression, NaiveBayes}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.fpm.FPGrowth
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame

/** reference: ddf_library/functions/ml/{classification,clustering,
  * regression,fpm,evaluation}.py — estimators mapped onto spark.ml
  * (SURVEY.md §2.9). The reference's distributed-SGD loops (driver
  * iteration + per-fragment gradient tasks + tree reduce) are the same
  * fit shape spark.ml runs internally over cached DataFrames.
  */
object Models {

  /** reference: clustering.py :: KMeans (random / k-means|| init) */
  def kmeans(df: DataFrame, featuresCol: String, k: Int,
             maxIter: Int = 20, seed: Long = 42L) =
    new KMeans().setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol(featuresCol).fit(df)

  /** reference: classification.py :: GaussianNB */
  def gaussianNB(df: DataFrame, featuresCol: String, labelCol: String) =
    new NaiveBayes().setModelType("gaussian")
      .setFeaturesCol(featuresCol).setLabelCol(labelCol).fit(df)

  /** reference: classification.py :: LogisticRegression (SGD → LBFGS) */
  def logisticRegression(df: DataFrame, featuresCol: String,
                         labelCol: String, maxIter: Int = 100,
                         regParam: Double = 0.0) =
    new LogisticRegression().setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol(featuresCol).setLabelCol(labelCol).fit(df)

  /** reference: classification.py :: SVM (linear, hinge) */
  def linearSVC(df: DataFrame, featuresCol: String, labelCol: String,
                maxIter: Int = 100, regParam: Double = 0.01) =
    new LinearSVC().setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol(featuresCol).setLabelCol(labelCol).fit(df)

  /** reference: regression.py :: LinearRegression */
  def linearRegression(df: DataFrame, featuresCol: String,
                       labelCol: String, maxIter: Int = 100,
                       regParam: Double = 0.0) =
    new LinearRegression().setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol(featuresCol).setLabelCol(labelCol).fit(df)

  /** reference: fpm.py :: FPGrowth + AssociationRules */
  def fpGrowth(df: DataFrame, itemsCol: String, minSupport: Double,
               minConfidence: Double) =
    new FPGrowth().setItemsCol(itemsCol).setMinSupport(minSupport)
      .setMinConfidence(minConfidence).fit(df)

  // ---- reference: evaluation.py ----------------------------------------

  def accuracy(pred: DataFrame, labelCol: String = "label",
               predictionCol: String = "prediction"): Double =
    new MulticlassClassificationEvaluator().setMetricName("accuracy")
      .setLabelCol(labelCol).setPredictionCol(predictionCol).evaluate(pred)

  def f1(pred: DataFrame, labelCol: String = "label",
         predictionCol: String = "prediction"): Double =
    new MulticlassClassificationEvaluator().setMetricName("f1")
      .setLabelCol(labelCol).setPredictionCol(predictionCol).evaluate(pred)

  def areaUnderROC(pred: DataFrame, labelCol: String = "label",
                   rawPredictionCol: String = "rawPrediction"): Double =
    new BinaryClassificationEvaluator().setMetricName("areaUnderROC")
      .setLabelCol(labelCol).setRawPredictionCol(rawPredictionCol)
      .evaluate(pred)

  def rmse(pred: DataFrame, labelCol: String = "label",
           predictionCol: String = "prediction"): Double =
    new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol(labelCol).setPredictionCol(predictionCol).evaluate(pred)

  def r2(pred: DataFrame, labelCol: String = "label",
         predictionCol: String = "prediction"): Double =
    new RegressionEvaluator().setMetricName("r2")
      .setLabelCol(labelCol).setPredictionCol(predictionCol).evaluate(pred)

  /** confusion matrix as a DataFrame (label, prediction, n) */
  def confusionMatrix(pred: DataFrame, labelCol: String = "label",
                      predictionCol: String = "prediction"): DataFrame = {
    import org.apache.spark.sql.functions._
    pred.groupBy(col(labelCol), col(predictionCol))
      .agg(count(lit(1)).as("n"))
      .orderBy(col(labelCol), col(predictionCol))
  }

  // ---- reference: ddf.py :: save_model / load_model --------------------
  // The reference pickles the fitted model object; the Spark-native
  // equivalent is the spark.ml persistence format (metadata JSON +
  // parquet params), which is cluster-readable and version-tagged.

  /** Persist any fitted spark.ml model (all Models.* results are
    * MLWritable). Overwrites like the reference's pickle dump. */
  def saveModel(model: org.apache.spark.ml.util.MLWritable,
                path: String): Unit =
    model.write.overwrite().save(path)

  /** Load a model saved by [[saveModel]] WITHOUT knowing its type —
    * reference `load_model` semantics (pickle records the class; the
    * spark.ml metadata JSON records `class`, which we dispatch on via
    * the companion object's `load`). Cast at the call site, as with
    * any unpickle. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): AnyRef = {
    val meta = spark.sparkContext.textFile(s"$path/metadata", 1).first()
    val className = "\"class\":\"([^\"]+)\"".r
      .findFirstMatchIn(meta)
      .getOrElse(sys.error(s"no class in $path/metadata"))
      .group(1)
    val companion = Class.forName(className + "$")
    val module = companion.getField("MODULE$").get(null)
    companion.getMethod("load", classOf[String]).invoke(module, path)
  }
}
