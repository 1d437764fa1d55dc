package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget selection for training-data mixing (DRIVER-EXT,
  * SURVEY.md §2.12): per-stratum (language / source / domain) greedy
  * selection of the highest-scoring documents until each stratum's
  * token budget is filled — the standard data-mixing primitive that
  * turns "filter then hope" into explicit per-language quotas.
  *
  * Exact variant: per-stratum cumulative sum over a (score desc, id
  * asc) window — deterministic tie-break, one shuffle keyed on the
  * stratum. Window parallelism equals the stratum count, which is
  * fine for language/source strata (tens). For extreme per-stratum
  * volumes, the scalable pattern is threshold-based: estimate the
  * score cutoff with approxQuantile on a sample, filter by it (fully
  * parallel), then exact-trim only the boundary score group through
  * the window — same selection, no giant window partition.
  */
object Budget {

  /** keep, per value of `strataCol`, the prefix of rows ordered by
    * (`scoreCol` desc, `idCol` asc) whose running `tokenCol` sum stays
    * within `budget`. */
  def tokenBudgetSelect(df: DataFrame, strataCol: String, idCol: String,
                        scoreCol: String, tokenCol: String,
                        budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Scalable variant of [[tokenBudgetSelect]] — provably the SAME
    * selection, without putting an entire stratum through one window
    * partition. Shape:
    *
    *  1. strata whose total tokens fit the budget are kept whole —
    *     a fully parallel semi-join, no window at all (at 100 TB most
    *     strata are either tiny or over-budget; only over-budget ones
    *     need ordering work);
    *  2. for each over-budget stratum, a per-stratum score cutoff is
    *     estimated FROM A SAMPLE (a window over the sample is cheap:
    *     `sampleFraction` × stratum rows), placed conservatively at
    *     `margin` × budget of estimated cumulative tokens so the
    *     candidate prefix {score ≥ cutoff} almost surely covers the
    *     true selection;
    *  3. the exact cumulative-sum window runs on the CANDIDATE rows
    *     only (≈ margin × budget tokens per stratum, not the full
    *     stratum);
    *  4. correctness is CHECKED, not assumed: a candidate prefix that
    *     (a) reaches the budget in total tokens, or (b) is the whole
    *     stratum, provably contains the exact selection (the exact
    *     selection is the shortest order-prefix reaching the budget,
    *     and the candidate set is an order-prefix). Strata failing
    *     the check (sampling fluke: cutoff landed too high) fall back
    *     to the exact window on their full rows — still correct,
    *     merely slower for that stratum.
    *
    * Deterministic given `seed`; result set equality with the exact
    * variant is pinned in OperatorsSpec. */
  def tokenBudgetSelectThreshold(df: DataFrame, strataCol: String,
                                 idCol: String, scoreCol: String,
                                 tokenCol: String, budget: Long,
                                 sampleFraction: Double = 0.1,
                                 margin: Double = 2.0,
                                 seed: Long = 42L): DataFrame = {
    // the operator runs several passes (totals, sample, candidates,
    // safety stats, final window) — cache the input so an expensive
    // upstream (score/token computation over raw text) evaluates once,
    // not once per pass; released before returning
    val in = df.cache()
    val totals = in.groupBy(col(strataCol))
      .agg(sum(col(tokenCol)).as("__tot"), count(lit(1)).as("__cnt"))
      .cache()
    val under = totals.filter(col("__tot") <= budget).select(col(strataCol))
    val keptWhole = in.join(broadcast(under), Seq(strataCol), "left_semi")

    val over = in.join(broadcast(totals.filter(col("__tot") > budget)
      .select(col(strataCol))), Seq(strataCol), "left_semi")

    // per-stratum cutoff from a sample: scaled cumulative tokens over
    // the sample's (score desc, id asc) window; the cutoff is the
    // LOWEST score whose scaled cumsum stays under margin*budget —
    // i.e. everything above it is (estimated) within the margin.
    val sw = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val cutoffs = over.sample(withReplacement = false, sampleFraction, seed)
      .withColumn("__scum",
        sum(col(tokenCol)).over(sw) / lit(sampleFraction))
      .filter(col("__scum") <= budget * margin)
      .groupBy(col(strataCol))
      .agg(min(col(scoreCol)).as("__cutoff"))

    // candidate prefix = all rows at-or-above the cutoff (score ties
    // included, so candidates form an order-prefix); a stratum whose
    // sample produced no cutoff rows keeps all rows as candidates
    val cand = over.join(broadcast(cutoffs), Seq(strataCol), "left")
      .filter(col("__cutoff").isNull || col(scoreCol) >= col("__cutoff"))
      .drop("__cutoff")

    // safety check: candidate prefix must reach the budget or be the
    // whole stratum, else the true boundary may lie below the cutoff
    val candStats = cand.groupBy(col(strataCol))
      .agg(sum(col(tokenCol)).as("__ctot"), count(lit(1)).as("__ccnt"))
    val ok = candStats.join(totals, Seq(strataCol))
      .filter(col("__ctot") >= budget || col("__ccnt") === col("__cnt"))
      .select(col(strataCol)).cache()
    val okCand = cand.join(broadcast(ok), Seq(strataCol), "left_semi")
    val fallback = over.join(broadcast(ok), Seq(strataCol), "left_anti")

    val trimmed = tokenBudgetSelect(okCand.unionByName(fallback),
      strataCol, idCol, scoreCol, tokenCol, budget)
    val out = keptWhole.unionByName(trimmed).localCheckpoint(true)
    Seq(totals, ok, in).foreach(_.unpersist(false))
    out
  }
}
