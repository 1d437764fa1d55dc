package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-proportion z-test for experiment readouts (DRIVER-EXT,
  * SURVEY.md §2.7 statistics sibling): given per-unit (variant,
  * converted) rows, the pooled-proportion z statistic
  * `z = (p_a − p_b) / sqrt(p(1−p)(1/n_a + 1/n_b))` and the
  * two-sided α=0.05 verdict (|z| ≥ 1.959964, the 97.5th normal
  * quantile — the CONSTANT is baked in rather than a CDF evaluation,
  * which keeps every emitted value pure arithmetic the DuckDB oracle
  * replays term for term; p-value-curve consumers can apply Φ to the
  * emitted z themselves, e.g. [[KolmogorovSmirnov]]'s normalCdf).
  *
  * Shape at any scale: one partial-aggregated groupBy over the
  * variant column (two output rows), collapsed to a single result
  * row by a second trivial aggregation — the corpus is scanned once,
  * nothing but counts ever moves. */
object AbTest {

  /** One-row readout: counts, rates (6 dp), z (6 dp), and the α=0.05
    * two-sided verdict for `groupA` vs `groupB` (rows of other
    * groups are ignored). `successCol` must be boolean. Degenerate
    * inputs (an empty arm, or pooled rate 0/1 ⇒ zero variance)
    * yield null z and false significance rather than NaN. */
  def twoProportionZ(df: DataFrame, groupCol: String, successCol: String,
                     groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "groupA and groupB must differ")
    val perArm = df.filter(col(groupCol).isin(groupA, groupB))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(successCol), 1L).otherwise(0L)).as("__x"))
    val row = perArm.agg(
      min(when(col(groupCol) === groupA, col("__n"))).as("n_a"),
      min(when(col(groupCol) === groupA, col("__x"))).as("x_a"),
      min(when(col(groupCol) === groupB, col("__n"))).as("n_b"),
      min(when(col(groupCol) === groupB, col("__x"))).as("x_b"))
    val pA = col("x_a") / col("n_a")
    val pB = col("x_b") / col("n_b")
    val pooled = (col("x_a") + col("x_b")) / (col("n_a") + col("n_b"))
    val se = sqrt(pooled * (lit(1.0) - pooled)
      * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    val z = when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
      round((pA - pB) / se, 6))
    row.select(col("n_a"), col("x_a"), round(pA, 6).as("rate_a"),
      col("n_b"), col("x_b"), round(pB, 6).as("rate_b"),
      z.as("z"),
      coalesce(abs(z) >= 1.959964, lit(false)).as("significant"))
  }
}
