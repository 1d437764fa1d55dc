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

  /** Welch's unequal-variance t-test — the metric-mean readout for
    * experiment arms (the z-test's continuous sibling): given
    * per-unit (group, value) rows, t = (m_a − m_b) / √(s²_a/n_a +
    * s²_b/n_b) with Welch–Satterthwaite degrees of freedom. Every
    * emitted value is pure arithmetic over the two arms' (n, mean,
    * sample variance) — one partial-agg groupBy, one 1-row collapse,
    * term-for-term SQL-replayable (the twoProportionZ discipline; no
    * CDF call — consumers apply the t CDF to the emitted (t, df)).
    * Degenerate arms (n < 2 or both variances 0) yield null t. */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
             groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "groupA and groupB must differ")
    val v = col(valueCol).cast("double")
    val perArm = df.filter(col(groupCol).isin(groupA, groupB)
        && v.isNotNull && !isnan(v))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), avg(v).as("__m"),
        var_samp(v).as("__s2"))
    def pick(g: String, c: String) =
      min(when(col(groupCol) === g, col(c)))
    val row = perArm.agg(
      pick(groupA, "__n").as("n_a"), pick(groupA, "__m").as("m_a"),
      pick(groupA, "__s2").as("s2_a"),
      pick(groupB, "__n").as("n_b"), pick(groupB, "__m").as("m_b"),
      pick(groupB, "__s2").as("s2_b"))
    val sea = col("s2_a") / col("n_a")
    val seb = col("s2_b") / col("n_b")
    val se2 = sea + seb
    val t = when(col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0,
      round((col("m_a") - col("m_b")) / sqrt(se2), 6))
    val dfree = when(col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0,
      round(pow(se2, 2) / (pow(sea, 2) / (col("n_a") - 1)
        + pow(seb, 2) / (col("n_b") - 1)), 4))
    row.select(col("n_a"), round(col("m_a"), 6).as("mean_a"),
      round(col("s2_a"), 6).as("var_a"),
      col("n_b"), round(col("m_b"), 6).as("mean_b"),
      round(col("s2_b"), 6).as("var_b"),
      t.as("t"), dfree.as("df"))
  }

  /** Pearson χ² test of independence between two categorical
    * columns: the full contingency arithmetic — observed vs
    * expected = row_total · col_total / n per cell — collapsed to
    * (chi2, dof, n). Null categories count as a real level is NOT
    * done: null rows are dropped (document nulls upstream; a null
    * level would silently absorb missingness into the test). Two
    * partial-agg groupBys + broadcast margins; nothing but counts
    * moves. The χ²_dof quantile is the consumer's step, as with
    * [[welchT]]. */
  def chiSquareIndependence(df: DataFrame, colA: String,
                            colB: String): DataFrame = {
    val cells = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rowT = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__ra"))
    val colT = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__cb"))
    val n = cells.agg(sum(col("__o")).as("__n"))
    // expected counts exist for EVERY (row level, col level) pair —
    // including empty observed cells, which still contribute e to χ²
    // rename the observed side: rowT/colT descend from `cells`, so
    // joining on same-named columns would hit the self-join
    // ambiguity trap
    val obs = cells.select(col("__a").as("__oa"),
      col("__b").as("__ob"), col("__o"))
    val grid = rowT.crossJoin(colT).crossJoin(broadcast(n))
      .join(obs, col("__a") <=> col("__oa")
        && col("__b") <=> col("__ob"), "left")
      .select(col("__a"), col("__b"), col("__ra"), col("__cb"),
        col("__n"), coalesce(col("__o"), lit(0L)).as("__o"))
      // a margin is cast to double BEFORE the product: row_total x
      // col_total as long x long silently wraps past Long.MaxValue
      // (margins beyond ~3e9 rows each — exactly the 100 TB regime),
      // and non-ANSI Spark would emit a wrong chi2 with no error.
      // Small-data oracles cannot catch this; ADVICE r10.
      .withColumn("__e", col("__ra").cast("double") * col("__cb")
        / col("__n").cast("double"))
    grid.agg(
      round(sum(pow(col("__o") - col("__e"), 2) / col("__e")), 4)
        .as("chi2"),
      ((count_distinct(col("__a")) - 1)
        * (count_distinct(col("__b")) - 1)).as("dof"),
      max(col("__n")).as("n"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) — the distribution-free
    * two-sample location test (the [[welchT]] alternative when means
    * mislead: heavy tails, outliers, ordinal values). Midranks over
    * the POOLED values handle ties exactly (rank + (ties−1)/2); the
    * normal approximation carries the standard tie-corrected
    * variance. Emits (n_a, n_b, u_a, z) — all closed-form arithmetic
    * over rank aggregates, SQL-replayable.
    *
    * Shape at scale: NO global-sort window. The per-arm tie census
    * (one row per distinct pooled value) feeds
    * [[Midrank.withMidranks]]'s range-partitioned prefix sum; the
    * rank sum and the tie term are then distributed aggregates over
    * distinct values — corpus-sized arms rank in parallel. */
  def mannWhitneyU(df: DataFrame, groupCol: String, valueCol: String,
                   groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "groupA and groupB must differ")
    val v = col(valueCol).cast("double")
    val pooled = df.filter(col(groupCol).isin(groupA, groupB)
      && v.isNotNull && !isnan(v))
      .select(col(groupCol).as("__g"), v.as("__v"))
    val census = pooled.groupBy(col("__v")).agg(
        sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("__ta"),
        sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("__tb"))
      .withColumn("__t", col("__ta") + col("__tb"))
    val ranked = Midrank.withMidranks(census, "__v", "__t")
    val agg = ranked.agg(
      sum(col("__ta")).as("n_a"),
      sum(col("__tb")).as("n_b"),
      sum(col("__ta") * col("__mid")).as("__ra"),
      // tie term Σ(t³−t) — exactly one census row per tie group now,
      // no per-row division trick needed
      sum(pow(col("__t"), 3) - col("__t")).as("__tt"))
    val u = col("__ra") - col("n_a") * (col("n_a") + 1) / 2.0
    val nn = col("n_a") + col("n_b")
    val mu = col("n_a") * col("n_b") / 2.0
    val sig2 = (col("n_a") * col("n_b") / 12.0) *
      ((nn + 1) - col("__tt") / (nn * (nn - 1)))
    val z = when(col("n_a") > 0 && col("n_b") > 0 && sig2 > 0,
      round((u - mu) / sqrt(sig2), 6))
    agg.select(col("n_a"), col("n_b"), round(u, 1).as("u_a"), z.as("z"))
  }

  /** Spearman rank correlation — Pearson over midranks: the
    * monotone-association measure that survives outliers and
    * nonlinear-but-monotone relationships (where [[DDF]]'s Pearson
    * corr reads noise). Ties take exact midranks (the
    * [[mannWhitneyU]] machinery); rows with a null/NaN on either
    * side are dropped PAIRWISE. Returns one row (n, rho rounded 6).
    *
    * Shape at scale: NO global-sort windows. Each side's midranks
    * come from [[Midrank.perRow]] — a distinct-value census ranked
    * by range-partitioned prefix sum, joined back on the value (the
    * join shuffles at distinct-value width; AQE broadcasts a small
    * census) — because ρ = Pearson over rank PAIRS genuinely needs
    * per-row ranks, unlike the pure rank-sum statistics. */
  def spearmanCorr(df: DataFrame, colA: String,
                   colB: String): DataFrame = {
    val a = col(colA).cast("double"); val b = col(colB).cast("double")
    val clean = df.filter(a.isNotNull && !isnan(a)
        && b.isNotNull && !isnan(b))
      .select(a.as("__a"), b.as("__b"))
    // r19: both censuses build from `clean` itself (perRowMulti) —
    // the nested perRow re-evaluated clean ⋈ mids_a just to census b
    val ranked = Midrank.perRowMulti(clean,
      Seq("__a" -> "ra", "__b" -> "rb"))
    ranked.agg(count(lit(1)).as("n"),
      round(corr(col("ra"), col("rb")), 6).as("rho"))
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
      // clamp to 9: for v within half an ulp below a decade boundary
      // (e.g. the largest double below 1000), v / 10^m rounds to
      // exactly 10.0 and floor yields digit 10 — a row that the
      // digit-1..9 join would silently drop while the total still
      // counted it, skewing p_obs/chi2_term (ADVICE r10; the DuckDB
      // oracle reproduces the same double rounding, so parity tests
      // could never flag it). The true leading digit of such a value
      // is 9.
      when(v >= math.pow(10.0, m),
        least(lit(9L), floor(v / math.pow(10.0, m))))
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

  /** Per-group WILSON score interval for a proportion — the interval
    * the experiment dashboards should draw instead of the Wald
    * ±z√(p(1−p)/n) textbook bar, which collapses to width 0 at
    * p ∈ {0, 1} and undercovers small n (Brown, Cai & DasGupta 2001).
    * Wilson inverts the score test:
    * center = (p + z²/2n) / (1 + z²/n),
    * half = z·√(p(1−p)/n + z²/4n²) / (1 + z²/n) — always inside
    * [0, 1], sane at the boundaries. Pure arithmetic over one
    * partial-agg groupBy; `successCol` is cast to boolean, null
    * success values are DROPPED (not counted as failures — absence
    * of a measurement is not a failure; spec-pinned). Returns
    * (group, n, successes, p_hat, ci_lo, ci_hi). */
  def proportionCI(df: DataFrame, groupCol: String, successCol: String,
                   z: Double = 1.959964): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val s = col(successCol).cast("boolean")
    val agg = df.filter(s.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(s, 1L).otherwise(0L)).as("successes"))
    val n = col("n").cast("double")
    val p = col("successes") / n
    val denom = lit(1.0) + lit(z * z) / n
    val center = (p + lit(z * z) / (n * 2.0)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / n
      + lit(z * z) / (n * n * 4.0))) / denom
    agg.select(col(groupCol), col("n"), col("successes"),
      p.as("p_hat"), (center - half).as("ci_lo"),
      (center + half).as("ci_hi"))
  }
}
