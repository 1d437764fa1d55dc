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

  /** ROC-AUC, exactly, via the rank identity AUC = (R⁺ −
    * n⁺(n⁺+1)/2) / (n⁺·n⁻) with R⁺ the midrank sum of the positive
    * class — AUC IS the Mann–Whitney U statistic rescaled, so this
    * reuses that machinery's exact tie handling (tied scores
    * contribute 1/2, the trapezoid convention) instead of binning or
    * sampling. Null/NaN scores and null labels are dropped. Returns
    * one row (n_pos, n_neg, auc; auc null when either class is
    * empty).
    *
    * Shape at scale: NO global-sort window. The per-class tie census
    * (one row per distinct score, map-side combined) feeds
    * [[Midrank.withMidranks]]'s range-partitioned prefix sum, so the
    * rank sum R⁺ = Σ t⁺·midrank is a distributed aggregate over
    * distinct scores — a corpus-sized scorer ranks in parallel. */
  def rocAuc(df: DataFrame, scoreCol: String,
             labelCol: String): DataFrame = {
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val clean = df.filter(s.isNotNull && !isnan(s) && y.isNotNull)
      .select(s.as("__s"), y.as("__y"))
    val census = clean.groupBy(col("__s")).agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("__tp"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__tn"))
      .withColumn("__t", col("__tp") + col("__tn"))
    val ranked = Midrank.withMidranks(census, "__s", "__t")
    ranked.agg(
        sum(col("__tp")).as("n_pos"),
        sum(col("__tn")).as("n_neg"),
        sum(col("__tp") * col("__mid")).as("__rp"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("__rp") - col("n_pos") * (col("n_pos") + 1) / 2.0)
            / (col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** CALIBRATION curve (reliability diagram) over equal-width score
    * bins in [0, 1]: per bin, row count, mean predicted score, and
    * observed positive rate — "when the model says 0.8, is it right
    * 80% of the time". Scores outside [0, 1] are refused (calibration
    * is defined on probabilities; silently clamping would fake the
    * diagram's x-axis). Empty bins are omitted (no prediction mass —
    * nothing to calibrate; the spine join that histogram() uses
    * would chart 0/0). The expected-calibration-error summary is
    * Σ (n_b / n) · |acc_b − conf_b| over these rows — one more
    * partial agg for the caller or the oracle.
    *
    * One scan, one partial-agg groupBy, ONE JOB: the out-of-range
    * refusal is fused into the same aggregation (the Expect.check
    * pattern) — an out-of-range score bins to NULL, so the refusal
    * census rides the bin census instead of a separate limit-probe
    * scan. The diagram is ≤ `bins` rows, so collecting it to refuse
    * (or return) is driver-bounded at any corpus size; EAGER as a
    * consequence. */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = df.sparkSession
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val clean = df.filter(s.isNotNull && !isnan(s) && y.isNotNull)
    val census = clean
      .withColumn("bin",
        when(s >= 0.0 && s <= 1.0,
          least(lit(bins - 1), floor(s * bins)).cast("int")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        avg(s).as("mean_score"),
        avg(when(y, 1.0).otherwise(0.0)).as("frac_pos"))
    val rows = census.collect()
    val bad = rows.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    require(bad == 0,
      s"calibration: $scoreCol has $bad values outside [0,1] — it " +
        "is not a probability; fix the scorer rather than clamping " +
        "the axis")
    spark.createDataFrame(
      java.util.Arrays.asList(rows.sortBy(_.getInt(0)): _*),
      census.schema)
  }
}
