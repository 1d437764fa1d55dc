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

  /** REMIX a corpus to a target distribution — the data-recipe step
    * ("make the mix 50% en / 30% de / 20% fr by tokens") that turns
    * a mixing decision into a deterministic selection. The
    * achievable total is bounded by the SCARCEST targeted stratum:
    * T = min_s(available_s / p_s), each stratum's budget is
    * floor(T·p_s), and the selection is the md5(id)-ordered greedy
    * prefix per stratum (the capPerGroup/sampleWeighted discipline —
    * an unbiased, rerun/layout-stable draw, so the whole remix is
    * SQL-replayable). Strata not in `targets` are dropped; a
    * targeted stratum with no tokens THROWS (silently returning an
    * empty remix because one target was typo'd would be the worst
    * failure mode).
    *
    * Shape at 100 TB: one partial-agg stats pass (rows = strata,
    * collected — the Frequent driver-state bound), budgets broadcast
    * back, one per-stratum cumsum window. The window sorts each
    * stratum once; for mega-strata the [[tokenBudgetSelect]]
    * sampled-cutoff notes apply identically. */
  def remixToTarget(df: DataFrame, strataCol: String, idCol: String,
                    tokenCol: String,
                    targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "remix needs at least one target share")
    require(targets.values.forall(_ > 0.0),
      s"target shares must be positive, got $targets")
    val pSum = targets.values.sum
    require(math.abs(pSum - 1.0) < 1e-9,
      s"target shares must sum to 1, got $pSum — normalize explicitly " +
        "so the recipe is unambiguous")
    val spark = df.sparkSession
    val avail = df
      .filter(col(strataCol).isin(targets.keys.toSeq: _*))
      .groupBy(col(strataCol).cast("string").as("__s"))
      .agg(sum(col(tokenCol)).cast("long").as("__avail"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = targets.keySet -- avail.keySet
    require(missing.isEmpty,
      s"targeted strata with no tokens: ${missing.mkString(", ")} — " +
        "a remix toward an empty stratum is unachievable; fix the " +
        "recipe or drop the stratum")
    val total = targets
      .map { case (s, p) => avail(s) / p }.min
    val budgets = targets.toSeq
      .map { case (s, p) => (s, math.floor(total * p).toLong) }
    import spark.implicits._
    val budgetDf = budgets.toDF(strataCol, "__budget")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.join(broadcast(budgetDf), Seq(strataCol))
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") <= col("__budget"))
      .drop("__cum", "__budget")
  }

  // ---- persisted token-budget ledger (continuous selection) -----------

  /** per-stratum tokens banked so far at `ledgerPath`, or None when
    * no ledger exists yet (first cycle). The ledger is append-mode
    * like the gram index: each [[ledgerBank]] call appends one
    * (stratum, tokens) row per stratum in the batch — batch-bounded
    * writes, reads partial-agg the tiny table. */
  private def ledgerUsed(spark: org.apache.spark.sql.SparkSession,
                         ledgerPath: String,
                         strataCol: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || fs.listStatus(p).isEmpty) None
    else Some(spark.read.parquet(ledgerPath)
      .groupBy(col(strataCol))
      .agg(sum(col("tokens")).as("__used")))
  }

  /** bank a selection's per-stratum token totals into the ledger
    * (localCheckpoint first: the append must not recompute a plan
    * that could scan the ledger it writes) */
  def ledgerBank(selected: DataFrame, ledgerPath: String,
                 strataCol: String, tokenCol: String): Unit =
    selected.groupBy(col(strataCol))
      .agg(sum(col(tokenCol)).cast("long").as("tokens"))
      .localCheckpoint()
      .write.mode("append").parquet(ledgerPath)

  /** [[tokenBudgetSelect]] made CONTINUOUS across admission cycles: a
    * persisted per-stratum ledger records tokens already selected in
    * prior cycles, and this cycle's greedy (score desc, id asc)
    * prefix fits the REMAINING budget — max(budget − used, 0) per
    * stratum. With no ledger yet, identical to [[tokenBudgetSelect]].
    * Selection does NOT bank automatically — call [[ledgerBank]] on
    * the rows actually admitted (or [[tokenBudgetSelectAndBank]]),
    * keeping replay/rollback policy with the caller. Ledger reads
    * are a tiny broadcast join; nothing corpus-sized moves. */
  def tokenBudgetSelectLedgered(df: DataFrame, ledgerPath: String,
                                strataCol: String, idCol: String,
                                scoreCol: String, tokenCol: String,
                                budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val withRem = ledgerUsed(df.sparkSession, ledgerPath, strataCol) match {
      case Some(used) =>
        df.join(broadcast(used), Seq(strataCol), "left")
          .withColumn("__rem", greatest(
            lit(budget) - coalesce(col("__used"), lit(0L)), lit(0L)))
      case None => df.withColumn("__rem", lit(budget))
    }
    withRem.withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") <= col("__rem"))
      .select(df.columns.map(col): _*)
  }

  /** select under the remaining budget AND bank the selection in one
    * call — the admission-cycle convenience (select, settle, append). */
  def tokenBudgetSelectAndBank(df: DataFrame, ledgerPath: String,
                               strataCol: String, idCol: String,
                               scoreCol: String, tokenCol: String,
                               budget: Long): DataFrame = {
    val selected = tokenBudgetSelectLedgered(df, ledgerPath, strataCol,
      idCol, scoreCol, tokenCol, budget).localCheckpoint()
    ledgerBank(selected, ledgerPath, strataCol, tokenCol)
    selected
  }

  /** Weighted data mixing: split `totalBudget` tokens across strata by
    * `weights` (the mixture recipe — e.g. en 0.5, fr 0.2, code 0.3)
    * and keep each stratum's best-scoring prefix within its share.
    * Strata absent from `weights` get weight 0 (dropped). Budgets
    * floor to whole tokens; the same (score desc, id asc) greedy
    * prefix as [[tokenBudgetSelect]], with the per-stratum cap joined
    * in as a broadcast literal table — one window, one shuffle. */
  def tokenBudgetSelectWeighted(df: DataFrame, strataCol: String,
                                idCol: String, scoreCol: String,
                                tokenCol: String, totalBudget: Long,
                                weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ >= 0), "weights must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val budgets = weights.toSeq
      .map { case (s, w) => (s, (totalBudget * w).toLong) }
      .toDF(strataCol, "__budget")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.join(broadcast(budgets), Seq(strataCol))
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") <= col("__budget"))
      .select(df.columns.map(col): _*) // original column order
  }

  /** Temperature-based mixture weights — the α-sampling rule of the
    * multilingual-pretraining literature (mT5 / XLM-R, public recipe):
    * weight_s ∝ (tokens_s)^α, normalized to sum 1. α = 1 reproduces
    * the corpus's natural distribution, α → 0 approaches uniform;
    * the standard low-resource-boosting range is 0.2–0.7. Returns the
    * recipe Map for [[tokenBudgetSelectWeighted]].
    *
    * The per-stratum token totals are a one-row-per-stratum aggregate
    * (tens of language/source strata) — collecting them to the driver
    * is the same bounded barrier as the engine's other per-group
    * stats, and the recipe usually feeds configs, logs, and the
    * broadcast budgets table anyway. Stratum keys are rendered as
    * strings (the recipe's currency). */
  def temperatureWeights(df: DataFrame, strataCol: String,
                         tokenCol: String,
                         alpha: Double): Map[String, Double] = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(tokenCol)).cast("double").as("__t"))
      .select(col(strataCol).cast("string"), col("__t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .sortBy(_._1) // fixed summation order → rerun-stable weights
    val powed = totals.map { case (k, v) => k -> math.pow(v, alpha) }
    val z = powed.map(_._2).sum
    powed.map { case (k, v) => k -> v / z }.toMap
  }

  /** α-resampled mixing in one call: derive the recipe with
    * [[temperatureWeights]], select with
    * [[tokenBudgetSelectWeighted]]. */
  def tokenBudgetSelectTemperature(df: DataFrame, strataCol: String,
                                   idCol: String, scoreCol: String,
                                   tokenCol: String, totalBudget: Long,
                                   alpha: Double): DataFrame =
    tokenBudgetSelectWeighted(df, strataCol, idCol, scoreCol, tokenCol,
      totalBudget, temperatureWeights(df, strataCol, tokenCol, alpha))

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
    * variant is pinned in OperatorsSpec. Assumes (`strataCol`,
    * `idCol`) identifies a row — the same assumption the exact
    * window's deterministic tie-break already makes.
    *
    * Materialization strategy (r4, measured in BENCH_NOTES): all
    * selection machinery runs on a cached NARROW projection —
    * (strata, id, score, token) — so the score/token computation over
    * the wide payload evaluates exactly ONCE regardless of how many
    * sub-passes follow, and the cache is 4 columns even when the input
    * carries text/binary payloads (at 100 TB of documents the narrow
    * state is ~1% of input size; caching the full input, as the r3
    * version did, would not fit). Only the small per-stratum /
    * per-selected-id outputs are eagerly checkpointed; the wide input
    * is touched exactly twice, by the two column-pruned semi-joins of
    * the returned (lazy) plan. */
  def tokenBudgetSelectThreshold(df: DataFrame, strataCol: String,
                                 idCol: String, scoreCol: String,
                                 tokenCol: String, budget: Long,
                                 sampleFraction: Double = 0.1,
                                 margin: Double = 2.0,
                                 seed: Long = 42L): DataFrame = {
    val narrow = df.select(col(strataCol), col(idCol), col(scoreCol),
      col(tokenCol)).cache()
    val totals = narrow.groupBy(col(strataCol))
      .agg(sum(col(tokenCol)).as("__tot"), count(lit(1)).as("__cnt"))
      .cache()
    // under-budget strata are kept whole — one output row per stratum,
    // eagerly checkpointed (strata are languages/sources/domains:
    // bounded small) so the returned plan references no cache
    val under = totals.filter(col("__tot") <= budget)
      .select(col(strataCol)).localCheckpoint(true)
    val over = narrow.join(broadcast(totals.filter(col("__tot") > budget)
      .select(col(strataCol))), Seq(strataCol), "left_semi")

    // per-stratum cutoff from a sample: scaled cumulative tokens over
    // the sample's (score desc, id asc) window; the cutoff is the
    // LOWEST score whose scaled cumsum stays under margin*budget —
    // i.e. everything above it is (estimated) within the margin.
    // The rank floor guards the small-budget regime: when margin*budget
    // is less than ONE sampled row's scaled representation
    // (token/sampleFraction), the cumsum filter alone would pass no
    // rows, yield a null cutoff, and silently demote the stratum to
    // "all rows are candidates" — i.e. the full-stratum window the
    // threshold path exists to avoid (found by the r4 mega-stratum
    // smoke: 50 s vs 5.4 s exact at 256×). Keeping the top
    // `minSampleRows` sampled rows regardless bounds candidates at
    // ~minSampleRows/sampleFraction population rows; the safety check
    // below still verifies coverage and falls back exactly when the
    // estimate was genuinely short.
    val minSampleRows = 32
    val sw = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    // one row per over-budget stratum — eagerly checkpointed, like
    // every per-stratum aggregate here: left lazy, each one would
    // re-execute inside every downstream job that broadcasts it (the
    // r4 profile showed the final trim job re-running the whole
    // sample-window + safety chain twice through its broadcasts)
    val cutoffs = over.sample(withReplacement = false, sampleFraction, seed)
      .withColumn("__scum",
        sum(col(tokenCol)).over(sw) / lit(sampleFraction))
      .withColumn("__srank", row_number().over(sw))
      .filter(col("__scum") <= budget * margin ||
        col("__srank") <= minSampleRows)
      .groupBy(col(strataCol))
      .agg(min(col(scoreCol)).as("__cutoff"))
      .localCheckpoint(true)

    // candidate prefix = all rows at-or-above the cutoff (score ties
    // included, so candidates form an order-prefix); a stratum whose
    // sample produced no cutoff rows keeps all rows as candidates.
    // Reads the narrow cache twice (safety stats + final window) —
    // cheap; not separately cached.
    val cand = over.join(broadcast(cutoffs), Seq(strataCol), "left")
      .filter(col("__cutoff").isNull || col(scoreCol) >= col("__cutoff"))
      .drop("__cutoff")

    // safety check: candidate prefix must reach the budget or be the
    // whole stratum, else the true boundary may lie below the cutoff
    val candStats = cand.groupBy(col(strataCol))
      .agg(sum(col(tokenCol)).as("__ctot"), count(lit(1)).as("__ccnt"))
    val ok = candStats.join(totals, Seq(strataCol))
      .filter(col("__ctot") >= budget || col("__ccnt") === col("__cnt"))
      .select(col(strataCol))
      .localCheckpoint(true)
    val okCand = cand.join(broadcast(ok), Seq(strataCol), "left_semi")
    val fallback = over.join(broadcast(ok), Seq(strataCol), "left_anti")

    // exact trim on candidates only, then keep just the selected keys:
    // ≤ budget tokens' worth of (strata, id) rows per over-budget
    // stratum, eagerly checkpointed while the narrow cache is alive
    val trimmedIds = tokenBudgetSelect(okCand.unionByName(fallback),
      strataCol, idCol, scoreCol, tokenCol, budget)
      .select(col(strataCol), col(idCol)).localCheckpoint(true)
    Seq(totals, narrow).foreach(_.unpersist(false))

    // the wide input appears only here: two semi-joins against the
    // checkpointed key sets (AQE broadcasts them when small). The
    // union branches are disjoint by construction (under/over split).
    df.join(broadcast(under), Seq(strataCol), "left_semi")
      .unionByName(df.join(trimmedIds, Seq(strataCol, idCol), "left_semi"))
  }

  /** Per-group row cap (the C4/Gopher-style "at most n documents per
    * domain" rule): keep at most `maxPerGroup` rows per value of
    * `groupCols`, chosen DETERMINISTICALLY by md5(id) — an unbiased,
    * rerun- and layout-stable downsample of each oversized group
    * (ordering by the id itself would bias toward old/crawl-ordered
    * rows; RNG would not be rerun-stable).
    *
    * One shuffle keyed on the group; the window sort spills per
    * group, so a mega-group costs a disk sort but never driver
    * memory. For extreme groups the threshold pattern of
    * [[tokenBudgetSelectThreshold]] applies the same way (estimate
    * the md5 cutoff on a sample, filter, trim the boundary). */
  /** Weighted sampling WITHOUT replacement, `n` winners per stratum —
    * Efraimidis–Spirakis 2006 A-Res, made DETERMINISTIC: the uniform
    * u(id) derives from md5(seed ":" id) (the capPerGroup/hashSplit
    * hash discipline), so winners are rerun- and layout-stable and
    * the whole draw is SQL-replayable (q140's oracle) — P(id wins a
    * slot) still follows the weights exactly because u is uniform on
    * (0, 1) over the id population. Ranking key is ln(u)/w, the
    * monotone form of ES's u^(1/w) WITHOUT its underflow (u^(1/w)
    * denormals to 0 for small u and w, collapsing ties); larger key
    * wins, ties break on id. Rows with null, NaN, or non-positive
    * weight are never selected (Spark's NaN sorts ABOVE every number,
    * so an unguarded NaN weight would pass `> 0` and its NaN key
    * would steal a winner slot deterministically).
    * One shuffle on the stratum; same window
    * shape as [[capPerGroup]]. The step between uniform subsampling
    * ([[capPerGroup]]) and budgeted selection ([[tokenBudgetSelect]]):
    * keep n per stratum, biased toward quality/length/recency
    * weights, without replacement. */
  def sampleWeightedPerGroup(df: DataFrame, groupCols: Seq[String],
                             idCol: String, weightCol: String, n: Int,
                             seed: Long = 42L): DataFrame = {
    require(groupCols.nonEmpty, "sampleWeightedPerGroup needs group columns")
    require(n > 0, s"n must be positive, got $n")
    val u = (graft.expressions.TextExpressions.md5Prefix(
        concat_ws(":", lit(seed.toString), col(idCol).cast("string")), 8)
        .cast("double")
      + lit(0.5)) / lit(4294967296.0)
    val key = log(u) / col(weightCol)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(key.desc, col(idCol).asc)
    df.filter(col(weightCol).isNotNull && !isnan(col(weightCol)) &&
        col(weightCol) > 0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  def capPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                  maxPerGroup: Int): DataFrame = {
    require(groupCols.nonEmpty, "capPerGroup needs group columns")
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn")
  }

  /** Sequence packing for training batches (DRIVER-EXT): assign each
    * document a bin id so every bin holds ≈ `maxTokens` tokens — the
    * standard step that turns a filtered corpus into fixed-length
    * training sequences with minimal padding. This is the cumsum
    * ("contiguous fill") formulation: documents are laid out in
    * deterministic (idCol) order per stratum and bin =
    * floor(preceding-token-count / maxTokens). A document straddling
    * a boundary belongs to the bin containing its FIRST token —
    * combine with [[graft.functions.TextFunctions.chunkTokens]] when
    * hard per-sequence caps are needed. (True greedy
    * first-fit-decreasing is an inherently sequential recurrence —
    * not a window function — and buys ~nothing at corpus scale, where
    * bins ≫ documents; the cumsum rule is what large pipelines run.)
    * One shuffle on the stratum; the window is the same shape as
    * [[tokenBudgetSelect]]. Returns the input plus (bin, bin_offset)
    * — bin_offset = the document's first-token offset within its
    * bin. */
  def packSequences(df: DataFrame, strataCol: String, idCol: String,
                    tokenCol: String, maxTokens: Long): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol).asc)
    val cumBefore =
      coalesce(sum(col(tokenCol)).over(w) - col(tokenCol), lit(0L))
    df.withColumn("bin", floor(cumBefore / lit(maxTokens)))
      .withColumn("bin_offset", cumBefore % lit(maxTokens))
  }

  /** Scale path for [[capPerGroup]] when single groups are huge (one
    * domain = 10⁸ docs): the md5 ranking key is UNIFORM on [0, 2³²),
    * so the cap boundary for an n-row group sits near hash value
    * 2³²·max/n — an ANALYTIC cutoff, no sampling pass (the advantage
    * over [[tokenBudgetSelectThreshold]]'s score cutoffs, which have
    * no known distribution). Candidates = rows whose 32-bit hash
    * prefix is under slack× that cutoff — a fully parallel filter —
    * and the exact (md5, id) window then sorts ≈ slack·max rows per
    * group, not the whole group. Candidates are an order-prefix of
    * the full hash order (the first 8 hex chars dominate the string
    * comparison), so coverage is provable, and it is CHECKED, not
    * assumed: a group whose candidate count reaches min(max, n)
    * contains the exact selection; under-covered groups (hash
    * fluctuation beyond slack — vanishing for slack 1.5 at max ≥
    * ~100) fall back to the full window. Result equality with
    * capPerGroup is pinned in OperatorsSpec. */
  def capPerGroupThreshold(df: DataFrame, groupCols: Seq[String],
                           idCol: String, maxPerGroup: Int,
                           slack: Double = 1.5): DataFrame = {
    require(groupCols.nonEmpty, "capPerGroupThreshold needs group columns")
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    require(slack > 1.0, s"slack must exceed 1, got $slack")
    val withB = df.withColumn("__b",
      graft.expressions.TextExpressions.md5Prefix(
        col(idCol).cast("string"), 8))
    // per-group counts + analytic cutoffs: one partial-aggregated
    // pass; eagerly checkpointed (one row per group) so downstream
    // broadcasts don't re-run it
    val counts = withB.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__cut", least(lit(4294967296L),
        ceil(lit(4294967296.0) * maxPerGroup * slack / col("__n"))
          .cast("long")))
      .localCheckpoint(true)
    val joined = withB.join(broadcast(counts), groupCols)
    // small groups pass whole; big groups keep the hash-prefix head
    val cand = joined
      .filter(col("__n") <= maxPerGroup || col("__b") < col("__cut"))
      .drop("__n", "__cut")
    val candStats = cand.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__cc"))
    val ok = candStats.join(counts, groupCols)
      .filter(col("__cc") >= least(lit(maxPerGroup.toLong), col("__n")))
      .select(groupCols.map(col): _*).localCheckpoint(true)
    val okCand = cand.join(broadcast(ok), groupCols, "left_semi")
    val fallback = withB.join(broadcast(ok), groupCols, "left_anti")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    okCand.unionByName(fallback)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerGroup)
      .drop("__rn", "__b")
  }
}
