package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** reference: ddf_library/functions/ml/classification.py ::
  * KNearestNeighbors — brute-force k-NN classifier. The reference
  * replicates the (small) test set against every training fragment and
  * merges per-fragment top-k; here the same plan is the broadcast
  * cross-score + window top-k of Similarity.bruteForceTopK, followed
  * by a majority vote (arg-max count, ties to the smallest label).
  * For corpus-scale query sets switch to Similarity.ivfTopK — same
  * vote, LSH/IVF-pruned candidate generation.
  */
object KNN {

  def classify(train: DataFrame, test: DataFrame, idCol: String,
               vecCol: String, labelCol: String, k: Int): DataFrame = {
    val neighbors = Similarity.bruteForceTopK(
      train, test, idCol, vecCol, k, excludeSelf = false)
    val labeled = neighbors.join(
      train.select(col(idCol).as("neighbor_id"), col(labelCol).as("__lbl")),
      Seq("neighbor_id"))
    val votes = labeled.groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("__votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__votes").desc, col("__lbl").asc)
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id").as(idCol), col("__lbl").as("prediction"))
  }
}
