package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-trained n-gram language-model scoring (DRIVER-EXT, SURVEY.md
  * §2.12 text analysis) — the CCNet-style quality signal: train a
  * statistical LM on the corpus itself, score every document by its
  * mean per-token negative log-likelihood, and filter/bucket on the
  * score (low NLL ≈ fluent/typical text, high NLL ≈ gibberish or
  * boilerplate-free outliers). A bigram model with add-k smoothing is
  * the classical formulation (Chen & Goodman 1998); it needs nothing
  * beyond counting, so the whole thing is two partial-aggregated
  * groupBys and two shuffle joins — no model binary, no UDF.
  *
  * Shape at 100 TB: the per-occurrence bigram stream is aggregated to
  * one row per DISTINCT bigram per document BEFORE anything joins
  * (map-side combine bounds the first exchange), so the two count
  * joins ship (bigram, count) and (token, count) pairs — never raw
  * text. Hot tokens ("the") are single hot KEYS on the unigram join;
  * AQE skew-split handles them (no salting needed: the join is
  * count-lookup, not pair expansion). The vocabulary size V enters as
  * a one-row broadcast, not a driver constant, so the plan is a single
  * lazy DAG. Documents with fewer than 2 tokens carry no bigrams and
  * are dropped (documented; the caller can left-join them back).
  */
object LanguageModel {

  /** Per-document mean negative log-likelihood under an add-k bigram
    * LM trained on `df` itself. Output: (idCol, n_bigrams, nll) with
    * nll rounded to 6 decimals (it passes through an order-sensitive
    * float sum; 1e-6 is far above the ~1e-13 reordering noise).
    *
    * NLL(d) = -(1/|d|) * Σ_bigrams ln( (c(w1 w2) + k) / (c(w1) + k·V) )
    * where counts are corpus-global and V = |vocabulary|.
    */
  def bigramNll(df: DataFrame, idCol: String, textCol: String,
                k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val toks = df
      .select(col(idCol).as("__doc"),
        TextFunctions.tokens(col(textCol)).as("__t"))

    // one row per bigram OCCURRENCE; tokens contain no whitespace
    // (they are whitespace-split), so "w1 w2" is a collision-free key.
    val bigrams = toks
      .filter(size(col("__t")) >= 2)
      .select(col("__doc"), explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => concat_ws(" ",
          element_at(col("__t"), i),
          element_at(col("__t"), i + 1)))).as("bg"))

    // collapse to (doc, bigram, multiplicity) before any join: the
    // partial agg combines occurrences map-side, so the exchanges
    // below carry distinct-bigram rows, not the raw token stream.
    val docBigrams = bigrams.groupBy(col("__doc"), col("bg"))
      .agg(count(lit(1)).as("m"))

    val bigramCounts = docBigrams.groupBy(col("bg"))
      .agg(sum(col("m")).as("c12"))
    val unigramCounts = toks
      .select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    // V as a one-row broadcast keeps the plan lazy (no driver scalar).
    val vocabSize = unigramCounts.agg(count(lit(1)).as("__v"))

    val scored = docBigrams
      .join(bigramCounts, "bg")
      .withColumn("__w1", split(col("bg"), " ").getItem(0))
      .join(unigramCounts, col("__w1") === col("w"))
      .crossJoin(broadcast(vocabSize))
      .withColumn("__nll",
        -log((col("c12") + lit(k)) / (col("c1") + lit(k) * col("__v"))))

    scored.groupBy(col("__doc").as(idCol))
      .agg(sum(col("m")).as("n_bigrams"),
        round(sum(col("m") * col("__nll")) / sum(col("m")), 6).as("nll"))
  }
}
