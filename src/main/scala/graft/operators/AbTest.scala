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

  /** First-significant-digit census against Benford's law — the
    * classic fabricated-data / broken-generator screen (a synthetic
    * column whose leading digits run uniform instead of
    * logarithmic is machine-made or truncated; an ETL bug that
    * clamps or re-scales a natural column shows up the same way).
    * Returns one row per digit 1–9: (digit, n_obs, p_obs,
    * p_benford, chi2_term), the χ² contribution being
    * (obs − n·p)² / (n·p); Σ chi2_term vs χ²₈ is the test.
    *
    * Digit extraction is a LOG-FREE threshold ladder
    * (`when(v ≥ 10^m, floor(v / 10^m))` from the largest magnitude
    * down) — `floor(v / 10^floor(log10 v))` would hinge on log10
    * ulps at decade boundaries, where two engines legitimately
    * disagree; plain division + floor is IEEE-identical everywhere,
    * which is what lets the DuckDB oracle replay the census bit for
    * bit. Rows with null, non-finite, or |v| < 1 values are skipped
    * (sub-1 magnitudes would need the same ladder downward; callers
    * can pre-scale). One partial-agg groupBy over one scan; the
    * 9-row census then joins the 1-row total — nothing but counts
    * moves. */
  def benford(df: DataFrame, colName: String,
              maxMagnitude: Int = 15): DataFrame = {
    require(maxMagnitude >= 1 && maxMagnitude <= 15,
      s"maxMagnitude must be in [1,15], got $maxMagnitude")
    val v = abs(col(colName).cast("double"))
    val ladder = (0 to maxMagnitude).foldLeft(
      lit(null).cast("long")) { (acc, m) =>
      // ascending fold ⇒ the LARGEST magnitude ends up outermost, so
      // evaluation tests decades top-down (a bottom-up order would
      // send every big value through the v ≥ 1 branch)
      when(v >= math.pow(10.0, m), floor(v / math.pow(10.0, m)))
        .otherwise(acc)
    }
    val digits = df
      .filter(col(colName).isNotNull && !isnan(v) && v >= 1.0
        && v < math.pow(10.0, maxMagnitude + 1))
      .select(ladder.cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val spark = df.sparkSession
    import spark.implicits._
    val expected = (1 to 9)
      .map(d => (d, math.log10(1.0 + 1.0 / d)))
      .toDF("digit", "__p")
    val total = digits.agg(sum(col("n_obs")).as("__n"))
    expected.join(digits, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs") / col("__n"), 6).as("p_obs"),
        round(col("__p"), 6).as("p_benford"),
        round(pow(col("n_obs") - col("__n") * col("__p"), 2)
          / (col("__n") * col("__p")), 4).as("chi2_term"))
  }
}
