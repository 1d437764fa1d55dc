package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Linear text-classifier scoring (DRIVER-EXT, SURVEY.md §2.12) — the
  * model-based quality/domain filter stage of a training-data
  * pipeline (the fastText-shaped "score every document with a linear
  * model over token features" pass; CCNet and friends run exactly
  * this between the heuristic gates and the LM-perplexity gate).
  * TRAINING the weights is [[graft.ml.Models]]' LogisticRegression
  * job; this operator SERVES any (token, weight) table at corpus
  * scale: score = sigmoid(bias + Σ w(token) / |tokens|), OOV tokens
  * contributing 0 — a bag-of-words mean, the serving form of a
  * fastText linear head.
  *
  * Shape at 100 TB: the weights table is vocabulary-sized and
  * broadcasts into a left join on the exploded token stream (hot
  * tokens are broadcast-lookup keys, never skewed shuffle keys); the
  * per-doc mean is one partial-aggregated groupBy on the doc id; the
  * input re-joins by id to keep every column and every row —
  * zero-token documents never enter the explode and score
  * sigmoid(bias). Tokenization is [[TextFunctions.tokens]], so the
  * feature space matches vocabulary() output — a weights table
  * derived from the corpus vocabulary serves unchanged.
  */
object Classifier {

  /** Adds `out` = sigmoid(bias + mean token weight) to every row of
    * `df`. `weights` must have columns (`token`, `weight`). */
  def linearTextScore(df: DataFrame, idCol: String, textCol: String,
                      weights: DataFrame, bias: Double = 0.0,
                      out: String = "score"): DataFrame = {
    val w = weights.select(col("token").as("__tok"),
      col("weight").cast("double").as("__w"))
    val raw = df
      .select(col(idCol).as("__id"),
        explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .join(broadcast(w), Seq("__tok"), "left")
      .groupBy(col("__id"))
      .agg((sum(coalesce(col("__w"), lit(0.0))) / count(lit(1)))
        .as("__raw"))
    df.join(raw.select(col("__id").as(idCol), col("__raw")),
        Seq(idCol), "left")
      .withColumn(out,
        lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("__raw"), lit(0.0)) + lit(bias)))))
      .drop("__raw")
  }
}
