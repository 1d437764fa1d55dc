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
}
