package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling TIME-SERIES statistics over keyed, ordered rows — the
  * monitoring layer for metric streams (per-user spend, per-source
  * ingest volume, per-host latency): trailing mean/stddev with a
  * z-score against them, the robust median/MAD sibling for
  * heavy-tailed metrics, and a bounded-window EWMA. Every window is
  * TRAILING-EXCLUSIVE (the current row is scored against its past,
  * never against itself — scoring a spike against a window that
  * contains the spike mutes exactly the anomaly being hunted).
  *
  * DRIVER-EXT (reference `/root/reference/` is empty; no file:line
  * citation possible — SURVEY.md §0 protocol).
  *
  * Scale shape: one hash partitioning on the keys, rows-bounded
  * frames (never whole-group), everything codegen window aggregates
  * over that single exchange. The frame bound `window` is the only
  * per-row cost multiplier — MAD/EWMA materialize a frame-sized
  * array per row, so keep it O(100), which is also the statistically
  * honest trailing-baseline size. Ordering must be made DETERMINISTIC
  * by the caller's orderCols (include a tiebreaker id; a tie-broken
  * differently on reshuffle silently changes every trailing stat
  * downstream of the tie). */
object TimeSeries {

  private def frame(keys: Seq[String], orderCols: Seq[String],
                    window: Int) =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-window, -1)

  /** Trailing mean/stddev + z-score: z = (v − mean) / std over the
    * previous `window` rows. Rows with fewer than `minPeriods` prior
    * rows, or a zero/degenerate std, get null z (no evidence, not
    * "not anomalous" — downstream filters on `abs(z) > t` naturally
    * skip nulls). Appends roll_n, roll_mean, roll_std, z. */
  def rollingZscore(df: DataFrame, keys: Seq[String],
                    orderCols: Seq[String], valCol: String,
                    window: Int, minPeriods: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minPeriods >= 2,
      s"minPeriods must be >= 2 (a 1-point std is undefined), " +
        s"got $minPeriods")
    val w = frame(keys, orderCols, window)
    val v = col(valCol).cast("double")
    // all three aggregates in ONE projection: chained withColumns
    // interleave Projects between the Window nodes, which blocks
    // Spark's CollapseWindow rule — three passes over every frame
    // instead of one (caught by the r11 ExplainR11 audit)
    df.select(col("*"), count(v).over(w).as("roll_n"),
        avg(v).over(w).as("roll_mean"),
        stddev_samp(v).over(w).as("roll_std"))
      .withColumn("z",
        when(col("roll_n") >= minPeriods && col("roll_std") > 0.0,
          (v - col("roll_mean")) / col("roll_std")))
  }

  /** Robust sibling: trailing median + MAD (median absolute
    * deviation), with the consistency-scaled robust z
    * 0.6745 · (v − median) / MAD. Medians interpolate on even counts
    * (quantile_cont semantics, so the DuckDB replay agrees exactly).
    * Appends roll_n, roll_median, roll_mad, robust_z (null under
    * `minPeriods` prior rows or zero MAD). */
  def rollingMadZ(df: DataFrame, keys: Seq[String],
                  orderCols: Seq[String], valCol: String,
                  window: Int, minPeriods: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minPeriods >= 1, s"minPeriods must be >= 1, got $minPeriods")
    val w = frame(keys, orderCols, window)
    val v = col(valCol).cast("double")
    def medianOf(arr: Column): Column = {
      val s = array_sort(arr)
      val n = size(s)
      when(n === 0, lit(null).cast("double"))
        .when(n % 2 === 1,
          element_at(s, ((n + 1) / 2).cast("int")).cast("double"))
        .otherwise((element_at(s, (n / 2).cast("int")).cast("double")
          + element_at(s, (n / 2).cast("int") + 1).cast("double")) / 2.0)
    }
    val withArr = df.withColumn("__fr", collect_list(v).over(w))
    withArr
      .withColumn("roll_n", size(col("__fr")).cast("long"))
      .withColumn("roll_median", medianOf(col("__fr")))
      .withColumn("roll_mad",
        medianOf(transform(col("__fr"),
          x => abs(x - col("roll_median")))))
      .withColumn("robust_z",
        when(col("roll_n") >= minPeriods && col("roll_mad") > 0.0,
          lit(0.6745) * (v - col("roll_median")) / col("roll_mad")))
      .drop("__fr")
  }

  /** One-sided CUSUM change-point statistic (Page 1954): per key,
    * C_t = max(0, C_{t−1} + (x_t − target − slack)) — the classic
    * "has the mean shifted upward" detector that accumulates small
    * persistent drifts a per-point z-score never flags. `upward =
    * false` runs the mirrored downward test on −x. A row is flagged
    * when C_t > `h` (alarm threshold, in the value's units; the
    * standard tuning is slack = drift/2, h = 4–5 sigmas).
    *
    * The recursion looks window-inexpressible, but the prefix-min
    * identity C_t = S_t − min_{j ≤ t} S_j (S = running sum of the
    * drifts, S_0 = 0) turns it into two running window aggregates —
    * exact, one keyed exchange, and SQL-replayable (the oracle uses
    * the same identity). Appends `cusum` and `alarm`. */
  def cusum(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
            valCol: String, target: Double, slack: Double,
            h: Double, upward: Boolean = true): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(h > 0, s"alarm threshold h must be positive, got $h")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val x = col(valCol).cast("double")
    val drift =
      if (upward) x - lit(target) - lit(slack)
      else lit(target) - x - lit(slack)
    // two Window nodes by necessity (the min is OF the running sum,
    // and nesting window functions is illegal) — but both share the
    // same spec, so still ONE exchange + one sort. S_0 = 0
    // participates in the min via least(..., 0).
    df.withColumn("__s", sum(drift).over(w))
      .withColumn("cusum",
        col("__s") - least(min(col("__s")).over(w), lit(0.0)))
      .withColumn("alarm", col("cusum") > h)
      .drop("__s")
  }

  /** Bounded-window ADJUSTED EWMA (pandas `ewm(adjust=true)` over
    * the trailing `window` rows, current row INCLUDED — a smoother
    * follows the series, unlike the anomaly baselines above):
    * s = Σ (1−α)^age · v / Σ (1−α)^age, age 0 for the current row.
    * The bounded frame keeps the weights computable without the
    * (1−α)^(−t) running-product trick, which overflows past ~10³
    * rows — a 100 TB metric stream has millions of rows per key, so
    * the closed-form full-history rewrite is a numerical landmine
    * this deliberately avoids. Appends `ewma`. */
  def ewma(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
           valCol: String, alpha: Double, window: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), 0)
    val v = col(valCol).cast("double")
    val fr = collect_list(v).over(w) // frame order: oldest first
    val withFr = df.withColumn("__fr", fr)
    val n = size(col("__fr"))
    val idx = sequence(lit(1), n)
    val wsum = aggregate(idx, lit(0.0),
      (acc, i) => acc + pow(lit(1.0 - alpha), (n - i).cast("double")))
    val vsum = aggregate(idx, lit(0.0),
      (acc, i) => acc + pow(lit(1.0 - alpha), (n - i).cast("double"))
        * element_at(col("__fr"), i))
    // collect_list SKIPS nulls, so a frame whose every row is null
    // arrives EMPTY (n = 0); unguarded, element_at(__fr, 1) then
    // throws under ANSI mode. An empty frame has no data to smooth —
    // emit null, mirroring pandas ewm over an all-NaN window.
    withFr.withColumn("ewma", when(n > lit(0), vsum / wsum))
      .drop("__fr")
  }
}
