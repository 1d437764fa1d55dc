package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * text. For orders 3..5 — the CCNet signal proper — use
  * [[trainNgram]]/[[scoreNgram]] below: hashed contexts bound the
  * model to `m` buckets per language and scoring is a shuffle-free
  * projection. Hot tokens ("the") are single hot KEYS on the unigram join;
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
    // r18 opt: spread the tokenize+explode stage (see trainNgram)
    val toks = Partitioning.spread(df
      .select(col(idCol).as("__doc"),
        TextFunctions.tokens(col(textCol)).as("__t")))

    // one row per bigram OCCURRENCE; tokens contain no whitespace
    // (they are whitespace-split), so "w1 w2" is a collision-free key.
    // r19: native one-pass bigram construction (WordNgrams —
    // UTF8String.concatWs per position instead of the interpreted
    // transform/element_at/concat_ws chain; value-identical, pinned
    // in GramExpressionsSpec)
    val bigrams = toks
      .filter(size(col("__t")) >= 2)
      .select(col("__doc"), explode(
        graft.expressions.GramExpressions.wordNgrams(col("__t"), 2))
        .as("bg"))

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

  // ===== order-n hashed per-language LM (r18, VERDICT r17 item 2) =======

  /** bucket-count ceiling (the DSIR hashing-trick bound) */
  val MaxBuckets: Int = 1 << 20

  /** [[scoreNgram]] materializes langs × m × 2 doubles as driver
    * literals; refuse models past this (lower m or shard languages) */
  val MaxServedCells: Long = 1L << 22

  /** model format v1: (lang, kind ∈ ng|ctx, bucket, cnt) hashed
    * counts, md5 bucket chain over space-joined token n-grams */
  private[graft] val NgramModelFormat = 1

  /** gram → bucket in [0, m): the engine's portable md5 chain (hex
    * prefix → 60-bit int → mod m) — SQL-replayable, so the oracle
    * covers the shipped hashing (the q45/q262 discipline). */
  private def bucketOf(g: Column, m: Int): Column =
    // native kernel, value-identical to the SQL chain
    // conv(substring(md5(g),1,15),16,10).cast("long") (Md5PrefixSpec)
    pmod(graft.expressions.TextExpressions.md5Prefix(g, 15),
      lit(m.toLong))

  private def requireNm(n: Int, m: Int): Unit = {
    require(n >= 2 && n <= 8, s"ngram order must be in [2, 8], got $n")
    require(m >= 2 && m <= MaxBuckets,
      s"numBuckets must be in [2, $MaxBuckets], got $m")
  }

  /** Train a per-language order-`n` LM with HASHED contexts (the
    * CCNet quality signal, Wenzek et al. 2020 §3.2 — a 5-gram KenLM
    * per language — re-expressed under the hashing trick): instead
    * of materializing the unbounded n-gram vocabulary, both the
    * n-gram and its (n−1)-gram context hash to `m` buckets (the DSIR
    * m-bucket discipline, Xie et al. 2023), so the model is at most
    * `langs × m × 2` rows NO MATTER the corpus size — the 100 TB
    * lever: at order 5 the distinct-gram count approaches the token
    * count, but the bucketed model stays fixed-size and the training
    * shuffle map-side combines into it.
    *
    * Output: (lang, kind ∈ 'ng'|'ctx', bucket, cnt) sparse rows with
    * the fit params stamped on every row (`__fmt`, `__n`, `__m` —
    * the LangId/ADVICE-r17 discipline: serving refuses drifted
    * params in both directions). One explode + ONE partial-agg
    * groupBy; rows with null text/lang or fewer than n tokens are
    * ignored. */
  def trainNgram(df: DataFrame, textCol: String, langCol: String,
                 n: Int = 3, m: Int = 4096): DataFrame = {
    requireNm(n, m)
    // r18 opt: spread the fit's gram-explosion stage (guide §2.5 —
    // a small single-file scan arrives as ONE partition and would
    // serialize the md5-per-gram work; spread never shrinks inputs
    // that already carry splits). The groupBy below shuffles anyway.
    val toks = Partitioning.spread(df
      .filter(col(langCol).isNotNull && col(textCol).isNotNull)
      .select(col(langCol).cast("string").as("lang"),
        TextFunctions.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= n))
    // r19: one native kernel pass per row (NgramCtxBuckets — streams
    // the digest over token bytes + spaces, never building the gram
    // string; value-identical to the transform/concat_ws/element_at
    // chain, pinned in GramExpressionsSpec)
    val grams = toks.select(col("lang"), explode(
      graft.expressions.GramExpressions.ngramCtxBuckets(
        col("__t"), n, m)).as("b"))
    grams
      .select(col("lang"), explode(array(
        struct(lit("ng").as("kind"), col("b.ng").as("bucket")),
        struct(lit("ctx").as("kind"), col("b.ctx").as("bucket"))))
        .as("kb"))
      .groupBy(col("lang"), col("kb.kind").as("kind"),
        col("kb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__fmt", lit(NgramModelFormat))
      .withColumn("__n", lit(n))
      .withColumn("__m", lit(m))
  }

  /** collect + validate a [[trainNgram]] model into per-language
    * dense (ngramCounts, ctxCounts) arrays, bounded by
    * [[MaxServedCells]]; the (n, m) stamps must equal the serve-time
    * params — drift is refused in both directions. */
  private def collectNgramModel(model: DataFrame, n: Int, m: Int)
  : (Seq[String], Map[String, (Array[Double], Array[Double])]) = {
    val rows = model.select(col("lang").cast("string"),
      col("kind").cast("string"), col("bucket").cast("long"),
      col("cnt").cast("long"), col("__fmt").cast("int"),
      col("__n").cast("int"), col("__m").cast("int")).collect()
    require(rows.nonEmpty, "ngram lm: empty model")
    rows.foreach { r =>
      require(!r.isNullAt(4) && r.getInt(4) == NgramModelFormat,
        s"ngram lm model format ${if (r.isNullAt(4)) "null"
        else r.getInt(4)} does not match v$NgramModelFormat — refit " +
          "with LanguageModel.trainNgram")
      require(!r.isNullAt(5) && !r.isNullAt(6) && r.getInt(5) == n &&
        r.getInt(6) == m,
        s"ngram lm model params (n=${r.getInt(5)}, m=${r.getInt(6)}) " +
          s"do not match the serve-time (n=$n, m=$m) — scoring under " +
          "drifted params is wrong, not slow; refit or pass the " +
          "model's own params")
      require(r.getLong(2) >= 0 && r.getLong(2) < m,
        s"ngram lm bucket ${r.getLong(2)} outside [0, $m)")
      require(Set("ng", "ctx")(r.getString(1)),
        s"ngram lm kind '${r.getString(1)}' is not ng|ctx")
    }
    val langs = rows.map(_.getString(0)).distinct.sorted.toSeq
    require(langs.length.toLong * m * 2 <= MaxServedCells,
      s"ngram lm model too large to serve as literals: " +
        s"${langs.length} langs x $m buckets x 2 > $MaxServedCells " +
        "cells — lower m")
    val dense = langs.map(l =>
      l -> (Array.fill(m)(0.0), Array.fill(m)(0.0))).toMap
    rows.foreach { r =>
      val tgt = dense(r.getString(0))
      val arr = if (r.getString(1) == "ng") tgt._1 else tgt._2
      arr(r.getLong(2).toInt) = r.getLong(3).toDouble
    }
    (langs, dense)
  }

  /** Score every document by its mean per-n-gram negative
    * log-likelihood under a [[trainNgram]] model of ITS OWN language
    * (the CCNet head/middle/tail signal): adds `countOut` (n-gram
    * count) and `out` (NLL rounded to 6, the order-sensitive-sum
    * discipline) — both null for documents with fewer than n tokens
    * or a language absent from the model.
    *
    * NLL(d) = -(1/G) Σ_grams ln( (c_ng(b(g)) + k) / (c_ctx(b(ctx)) + k·m) )
    *
    * where both counts are HASHED-bucket counts and the smoothing
    * vocabulary is the bucket space m. (Hash collisions can make a
    * single gram's ratio exceed 1 — a documented property of the
    * hashing trick; the per-document mean is the quality signal.)
    *
    * ZERO shuffles and zero joins: the model collects once (bounded
    * by [[MaxServedCells]]), becomes per-language literal arrays,
    * and every document scores in one whole-stage-codegen projection
    * over the scan — the LangId.classify serving shape. */
  def scoreNgram(df: DataFrame, textCol: String, langCol: String,
                 model: DataFrame, n: Int = 3, m: Int = 4096,
                 k: Double = 0.5, out: String = "nll",
                 countOut: String = "n_ngrams"): DataFrame = {
    requireNm(n, m)
    require(k > 0, s"smoothing k must be positive, got $k")
    val (langs, dense) = collectNgramModel(model, n, m)
    // r19: the per-gram fold is one native kernel pass (NgramNllSum —
    // same md5 buckets, same operation order, so the double is
    // bit-identical to the aggregate fold; GramExpressionsSpec pins
    // it against the column-math spec)
    def scoreFor(lang: String): Column =
      TextFunctions.bound(TextFunctions.tokens(col(textCol))) { t =>
        TextFunctions.bound(size(t) - (n - 1)) { g =>
          when(g >= 1, struct(
            g.as("cnt"),
            round(graft.expressions.GramExpressions.ngramNllSum(
                t, n, m, k, dense(lang)._1, dense(lang)._2)
              / g.cast("double"), 6).as("nll")))
        }
      }
    val dispatch = langs.foldLeft(
      lit(null).cast("struct<cnt:int,nll:double>")) { (acc, l) =>
      when(col(langCol) === lit(l), scoreFor(l)).otherwise(acc)
    }
    df.withColumn("__lm", dispatch)
      .withColumn(countOut, col("__lm").getField("cnt"))
      .withColumn(out, col("__lm").getField("nll"))
      .drop("__lm")
  }
}
