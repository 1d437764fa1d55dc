package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus vocabulary / token-frequency table (DRIVER-EXT, SURVEY.md
  * §2.12 text analysis) — the tokenizer-training and stopword/quality
  * heuristic prep step every large-scale text pipeline runs before
  * anything model-shaped.
  *
  * Shape at 100 TB: explode → groupBy(doc, token) → groupBy(token),
  * both aggregations partial (map-side combine), so the first shuffle
  * carries one row per DISTINCT token per document (not one per
  * occurrence — a document's tokens sit in one partition and combine
  * before the exchange) and the second carries one row per distinct
  * (token, partition). No windows, no driver state, no skew hazard —
  * a hot token is just a big count. Tokenization is
  * [[TextFunctions.tokens]] so counts agree with tokenCount()
  * everywhere else in the engine.
  */
object Vocabulary {

  /** (token, tok_count, doc_freq) descending by tok_count (token asc
    * tie-break). `minCount` prunes AFTER aggregation: a hapax-heavy
    * tail shrinks the RESULT, not the shuffles — partial aggregation
    * already bounded the map-side volume, and pruning earlier would
    * need the very global counts being computed. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 1L): DataFrame = {
    val perDoc = df
      .select(col(idCol).as("__doc"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("__doc"), col("token"))
      .agg(count(lit(1)).as("__c"))
    perDoc.groupBy(col("token"))
      .agg(sum(col("__c")).as("tok_count"),
        count(lit(1)).as("doc_freq"))
      .filter(col("tok_count") >= minCount)
      .orderBy(col("tok_count").desc, col("token").asc)
  }

  /** Top-k keywords per document by TF-IDF (tf · ln(N/df)) — the
    * classic per-document salience signal (topic tagging, index
    * terms, clustering features).
    *
    * Shape at 100 TB: the same partial-aggregated (doc, token, tf)
    * table as [[vocabulary]] feeds both the document-frequency agg
    * and the scoring join (shuffle keyed on token; hot tokens are
    * single hot count-lookup keys, AQE-splittable). N enters as a
    * one-row broadcast. The final top-k is a window PARTITIONed on
    * the document id — group size = the document's distinct-token
    * count, never corpus-scale. Score ties break on token asc so the
    * result is fully deterministic. */
  def topKeywords(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val perDoc = df
      .select(col(idCol).as("__doc"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("__doc"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = perDoc.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count_distinct(col(idCol)).as("__n"))
    val scored = perDoc
      .join(docFreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("__n").cast("double") / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__doc"))
      .orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__doc").as(idCol), col("rank"), col("token"),
        col("score"))
  }

  /** Zipf-law fit over the corpus vocabulary — the corpus-health
    * number a pipeline watches across ingestion cycles: natural text
    * follows freq ∝ rank^s with s ≈ −1; a slope drifting toward 0
    * means boilerplate/spam flooding the token distribution, a
    * steeper slope means collapsing diversity. OLS on
    * (x, y) = (ln rank, ln freq) over all tokens with
    * tok_count ≥ `minCount`; returns ONE row
    * (vocab_size, slope, intercept, r2).
    *
    * Scale shape: the ranking is the RANGE-PARTITIONED global rank
    * ([[Blocking.withSortRank]] on (−freq, token)) — never a
    * partition-less window, whose single reducer is exactly the
    * global-sort bottleneck the rank machinery exists to avoid; the
    * regression reduces to six partial-aggregated sums. `minCount`
    * trims the hapax tail (rank-inflating noise under OLS) — fit
    * discipline, not a shuffle bound. */
  /** COLLOCATION extraction by pointwise mutual information: bigram
    * (w1, w2) scored PMI = ln(p(w1 w2) / (p(w1) p(w2))) — how much
    * more often the pair co-occurs than independence predicts, the
    * classic multi-word-expression detector ("new york", "machine
    * learning") feeding tokenizer-vocab and stopword decisions.
    * `minCount` floors the bigram count (PMI is notoriously
    * noise-dominated at count 1 — a hapax pair of two hapax words
    * maxes the score); probabilities use corpus-total token and
    * bigram counts. Returns (w1, w2, pair_count, pmi), pmi in nats.
    *
    * Scale shape: two partial-aggregated groupBys (bigrams, tokens)
    * + two count-lookup joins keyed on the word; totals ride as
    * one-row broadcasts. Nothing driver-side, no windows. */
  def collocations(df: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = df.select(TextFunctions.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
    val bigrams = toks.select(explode(
        zip_with(slice(col("__t"), lit(1), size(col("__t")) - 1),
          slice(col("__t"), lit(2), size(col("__t")) - 1),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("__b"))
      .select(col("__b.w1"), col("__b.w2"))
    val bg = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_count"))
    val uni = df.select(explode(TextFunctions.tokens(col(textCol)))
        .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__c"))
    val totals = bg.agg(sum(col("pair_count")).as("__tb"))
      .crossJoin(uni.agg(sum(col("__c")).as("__tu")))
    bg.filter(col("pair_count") >= minCount)
      .join(uni.select(col("w").as("w1"), col("__c").as("__c1")),
        Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("__c").as("__c2")),
        Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("pair_count"),
        log((col("pair_count") / col("__tb"))
          / ((col("__c1") / col("__tu")) * (col("__c2") / col("__tu"))))
          .as("pmi"))
  }

  def zipfFit(df: DataFrame, idCol: String, textCol: String,
              minCount: Long = 1L): DataFrame = {
    val ranked = Blocking.withSortRank(
      vocabulary(df, idCol, textCol, minCount)
        .select(col("token"), col("tok_count"))
        .withColumn("__negf", -col("tok_count")),
      "__negf", "token", "rnk")
    val pts = ranked.select(
      log(col("rnk").cast("double")).as("x"),
      log(col("tok_count").cast("double")).as("y"))
    // degenerate guards (null, not divide-by-zero under ANSI): a
    // single-token vocab has zero x-variance (no slope exists); a
    // flat frequency profile has zero y-variance (r2 undefined —
    // slope is still exactly 0 there and remains emitted)
    val sxVar = col("n") * col("sxx") - col("sx") * col("sx")
    val syVar = col("n") * col("syy") - col("sy") * col("sy")
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val slope = when(sxVar =!= 0.0, cov / sxVar)
    pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n").as("vocab_size"),
        slope.as("slope"),
        ((col("sy") - col("sx") * slope) / col("n")).as("intercept"),
        when(sxVar =!= 0.0 && syVar =!= 0.0,
          pow(cov, 2) / (sxVar * syVar)).as("r2"))
  }
}
