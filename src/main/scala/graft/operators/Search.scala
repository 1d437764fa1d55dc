package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** BM25 ranked retrieval over a text corpus (DRIVER-EXT, SURVEY.md
  * §2.12 text analysis) — the lexical complement to the embedding
  * similarity search in [[Similarity]]: given a free-text query,
  * return the top-k documents by Okapi BM25 (Robertson/Sparck Jones;
  * the Lucene `ln(1 + (N-df+0.5)/(df+0.5))` idf variant, which is
  * non-negative for any df).
  *
  * Shape at 100 TB: the query's term set is a tiny literal, so the
  * exploded token stream is FILTERED to query terms before the first
  * aggregation — the (doc, term, tf) shuffle carries only documents
  * containing at least one query term, keyed on (doc, term) with
  * map-side combine. Corpus stats (N, avgdl) are one narrow scan
  * reduced to a single row and broadcast via a literal-free cross
  * join; per-term document frequencies are at most |query| rows and
  * broadcast into the scoring join. The final top-k is a global
  * `orderBy(...).limit(k)` → TakeOrderedAndProject (per-partition
  * heaps + single k-row reduce, never a full sort). Scores are
  * rounded to 6 decimals BEFORE ranking so the ordering itself is
  * deterministic and oracle-replayable (ties break on the id).
  *
  * Tokenization is [[TextFunctions.tokens]] so tf/df agree with the
  * vocabulary and token-budget operators.
  */
object Search {

  /** Top-k `(id, score)` by BM25 for a free-text `query`.
    * `k1` saturates term frequency; `b` scales length normalization
    * (standard defaults 1.2 / 0.75). */
  def bm25(df: DataFrame, idCol: String, textCol: String, query: String,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val terms = query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "query must contain at least one token")

    val base = df.select(col(idCol).as("__id"),
      TextFunctions.tokens(col(textCol)).as("__toks"))

    // one-row corpus stats, broadcast by the cross join below
    val stats = base.agg(count(lit(1)).as("__n"),
      avg(size(col("__toks")).cast("double")).as("__avgdl"))

    // (doc, term, tf, dl) for QUERY terms only — the filter lands
    // before the aggregation, so non-matching tokens never shuffle
    val tf = base
      .select(col("__id"), size(col("__toks")).cast("double").as("__dl"),
        explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(terms.toSeq: _*))
      .groupBy(col("__id"), col("__dl"), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"))

    // ≤ |terms| rows — broadcast side of the scoring join
    val dfPerTerm = tf.groupBy(col("__term"))
      .agg(count(lit(1)).cast("double").as("__df"))

    val scored = tf
      .join(broadcast(dfPerTerm), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5))
          / (col("__df") + lit(0.5))))
      .withColumn("__s",
        col("__idf") * col("__tf") * lit(k1 + 1.0)
          / (col("__tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col("__id"))
      .agg(round(sum(col("__s")), 6).as("score"))

    scored
      .select(col("__id").as(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch retrieval: top-k BM25 documents PER QUERY of a query
    * table — the shape a real retrieval pipeline runs (thousands of
    * queries against one corpus in one job), not a per-query loop.
    *
    * Shape at 100 TB: the query table is retrieval-batch-sized
    * (thousands of rows — minuscule next to the corpus), so its
    * distinct term set broadcasts into a semi-join that prunes the
    * exploded corpus token stream BEFORE the (doc, term, tf)
    * aggregation, exactly like [[bm25]]'s literal filter. Term
    * frequencies and document frequencies are computed ONCE per
    * (doc, term) / term — not once per query — and fan out to
    * queries via a broadcast join on the term; the per-(query, doc)
    * score aggregation and the per-query top-k window both key on
    * the query id, so group size is bounded by matching docs, and a
    * hot term is one aggregation key, never a window partition.
    * Queries with no matching documents are absent from the result.
    * Set `broadcastQueries = false` for a query-log-sized batch too
    * big to broadcast: the term fan-out then shuffles on the term key
    * (the semi-join prefilter becomes a shuffle too), trading the
    * broadcast for exchanges that scale with the batch.
    */
  def bm25Batch(df: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, qidCol: String, qtextCol: String,
                k: Int, k1: Double = 1.2, b: Double = 0.75,
                broadcastQueries: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val bq: DataFrame => DataFrame =
      if (broadcastQueries) broadcast else identity
    val qterms = queries.select(col(qidCol).as("__qid"),
        explode(TextFunctions.tokens(col(qtextCol))).as("__term"))
      .distinct()
    val termSet = qterms.select(col("__term")).distinct()

    val base = df.select(col(idCol).as("__id"),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val stats = base.agg(count(lit(1)).as("__n"),
      avg(size(col("__toks")).cast("double")).as("__avgdl"))

    val tf = base
      .select(col("__id"), size(col("__toks")).cast("double").as("__dl"),
        explode(col("__toks")).as("__term"))
      .join(bq(termSet), Seq("__term"), "left_semi")
      .groupBy(col("__id"), col("__dl"), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfPerTerm = tf.groupBy(col("__term"))
      .agg(count(lit(1)).cast("double").as("__df"))

    val scored = tf
      .join(bq(dfPerTerm), "__term")
      .join(bq(qterms), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5))
          / (col("__df") + lit(0.5))))
      .withColumn("__s",
        col("__idf") * col("__tf") * lit(k1 + 1.0)
          / (col("__tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col("__qid"), col("__id"))
      .agg(round(sum(col("__s")), 6).as("score"))

    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("__qid"))
        .orderBy(col("score").desc, col("__id").asc)))
      .filter(col("rank") <= k)
      .select(col("__qid").as(qidCol), col("rank"),
        col("__id").as(idCol), col("score"))
  }

  /** Hybrid lexical+semantic retrieval with reciprocal-rank fusion
    * (Cormack/Clarke/Buettcher RRF): per query, fuse the BM25 top-`kEach`
    * list and the exact-cosine top-`kEach` list by
    * `score(d) = Σ_lists 1/(rrfK + rank_list(d))`, then return the
    * fused top-`k`. RRF uses only the RANKS, never the raw scores, so
    * the two retrievers need no score calibration — the standard
    * first-stage recipe for retrieval-based data curation
    * (decontamination by retrieval, dedup candidate seeding, eval-set
    * mining) as well as serving.
    *
    * Shape at 100 TB: the corpus is scanned once per retriever — BM25
    * through [[bm25Batch]] (query-term semi-join prunes the token
    * stream before any shuffle) and cosine through
    * [[Similarity.bruteForceTopK]] (broadcast query batch, map-side
    * WindowGroupLimit top-k; swap in the IVF path for a fractional
    * scan at corpus scale). Everything AFTER the retrievers is
    * query-batch-sized: each list carries ≤ kEach rows per query, the
    * fusion is one (qid, id)-keyed full-outer join of two ≤
    * |queries|·kEach tables, and the final window partitions on qid
    * with ≤ 2·kEach rows per group. No corpus-proportional state ever
    * reaches the fusion stage.
    *
    * Determinism: ranks are integers; each RRF term is an exact
    * double division; the fused score is rounded to 6 decimals BEFORE
    * ranking and ties break on the id — the whole fusion is
    * SQL-replayable (q144's oracle replays it term by term).
    * `queries` must carry (qidCol, qtextCol, qvecCol); documents
    * missing from one list contribute only the other list's term.
    * Returns (qid, rank, id, rrf_score, lex_rank, sem_rank) with null
    * lex/sem rank when the document was absent from that list. */
  def hybridRrf(corpus: DataFrame, idCol: String, textCol: String,
                vecCol: String, queries: DataFrame, qidCol: String,
                qtextCol: String, qvecCol: String, k: Int,
                kEach: Int = 20, rrfK: Int = 60,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(kEach >= k, s"kEach ($kEach) should be >= k ($k)")
    require(rrfK >= 0, s"rrfK must be non-negative, got $rrfK")

    val lex = bm25Batch(corpus.select(col(idCol), col(textCol)),
        idCol, textCol,
        queries.select(col(qidCol), col(qtextCol)), qidCol, qtextCol,
        k = kEach, k1 = k1, b = b)
      .select(col(qidCol).as("__qid"), col(idCol).as("__id"),
        col("rank").as("lex_rank"))

    val sem = Similarity.bruteForceTopK(
        corpus.select(col(idCol), col(vecCol)),
        queries.select(col(qidCol).as(idCol), col(qvecCol).as(vecCol)),
        idCol, vecCol, k = kEach, excludeSelf = false)
      .select(col("query_id").as("__qid"), col("neighbor_id").as("__id"),
        col("rank").as("sem_rank"))

    rrfFuse(lex, sem, k, rrfK)
      .select(col("__qid").as(qidCol), col("rank"), col("__id").as(idCol),
        col("rrf_score"), col("lex_rank"), col("sem_rank"))
  }

  /** Retriever-agnostic RRF core: fuse ANY two per-query ranked lists
    * — each `(__qid, __id, <rank col>)` with ranks starting at 1 —
    * into the top-`k` by `Σ 1/(rrfK + rank)`. [[hybridRrf]] rides
    * this with (bm25Batch, bruteForceTopK); swap either side for the
    * IVF path ([[Similarity.ivfTopK]]), the IVF-PQ path
    * ([[Pq.ivfPqTopK]]), or any external ranking, renamed to the
    * triple above — fusion cost is list-sized either way. The input
    * rank column names must differ (they come through in the output;
    * e.g. `lex_rank`/`sem_rank`). */
  def rrfFuse(listA: DataFrame, listB: DataFrame, k: Int,
              rrfK: Int = 60): DataFrame = {
    // strict triple contract: guessing the rank column out of extra
    // columns (say a score column the caller forgot to drop) would
    // silently fuse on the wrong values — reject anything but
    // exactly (__qid, __id, <rank>)
    def rankColOf(df: DataFrame, side: String): String = {
      val extra = df.columns.filterNot(Set("__qid", "__id"))
      require(df.columns.toSet.contains("__qid")
          && df.columns.toSet.contains("__id") && extra.length == 1,
        s"$side list must have exactly the columns (__qid, __id, " +
          s"<rank>), got (${df.columns.mkString(", ")})")
      extra.head
    }
    val rankA = rankColOf(listA, "first")
    val rankB = rankColOf(listB, "second")
    require(rankA != rankB,
      s"rank columns must be named differently, both are '$rankA'")
    val fused = listA.join(listB, Seq("__qid", "__id"), "full_outer")
      .withColumn("rrf_score", round(
        coalesce(lit(1.0) / (lit(rrfK) + col(rankA)), lit(0.0))
          + coalesce(lit(1.0) / (lit(rrfK) + col(rankB)), lit(0.0)),
        6))
    import org.apache.spark.sql.expressions.Window
    fused
      .withColumn("rank", row_number().over(Window.partitionBy(col("__qid"))
        .orderBy(col("rrf_score").desc, col("__id").asc)))
      .filter(col("rank") <= k)
  }

  /** IR evaluation of a ranked result list against relevance
    * judgments — the yardstick the whole retrieval family (BM25,
    * cosine, IVF/IVF-PQ, RRF) is tuned BY: per query,
    * (n_rel, n_hits, recall_at_k, mrr_at_k, ndcg_at_k), binary
    * gains. One row per qid that HAS judgments; queries whose
    * retriever returned nothing still appear (all-zero metrics),
    * queries with no judgments are undefined and omitted.
    *
    * ndcg = Σ_hits 1/log2(rank+1) over the ideal prefix
    * Σ_{i≤min(k,n_rel)} 1/log2(i+1) — the ideal term is a
    * higher-order `aggregate` over `sequence`, pure column math.
    * Shape: one semi-join of the rank-≤k results against the
    * judgment pairs + two partial-agg groupBys on qid; both sides
    * are query-batch-sized, the corpus is never touched. */
  def evalRanking(results: DataFrame, qidCol: String, idCol: String,
                  rankCol: String, qrels: DataFrame, relQidCol: String,
                  relIdCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rel = qrels.select(col(relQidCol).as("__qid"),
      col(relIdCol).as("__id")).distinct()
    val nRel = rel.groupBy(col("__qid")).agg(count(lit(1)).as("n_rel"))
    // a proper ranking has one row per (qid, id); a degenerate input
    // that repeats a document would silently inflate DCG and the hit
    // count, so collapse to the BEST rank per pair first (a no-op on
    // row_number-ranked lists, one query-batch-sized aggregation)
    val hits = results
      .select(col(qidCol).as("__qid"), col(idCol).as("__id"),
        col(rankCol).as("__rk"))
      .filter(col("__rk") <= k)
      .groupBy(col("__qid"), col("__id"))
      .agg(min(col("__rk")).as("__rk"))
      .join(rel, Seq("__qid", "__id"), "left_semi")
    val per = hits.groupBy(col("__qid"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("__rk")).as("__first"),
        sum(lit(1.0) / log2(col("__rk") + 1)).as("__dcg"))
    val idcg = aggregate(
      sequence(lit(1), least(lit(k), col("n_rel")).cast("int")),
      lit(0.0), (acc, i) => acc + lit(1.0) / log2(i + 1))
    nRel.join(per, Seq("__qid"), "left")
      .select(col("__qid").as(qidCol), col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)) / col("n_rel"), 6)
          .as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 6)
          .as("mrr_at_k"),
        round(coalesce(col("__dcg"), lit(0.0)) / idcg, 6)
          .as("ndcg_at_k"))
  }
}
