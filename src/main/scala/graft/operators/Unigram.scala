package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates", arXiv:1804.10959 — the SentencePiece unigram model).
  * Completes the engine's tokenizer family: rank-greedy merge [[Bpe]]
  * (GPT lineage), longest-match [[WordPiece]] (BERT lineage), and
  * max-likelihood Viterbi segmentation over an explicit piece
  * distribution (T5/ALBERT/XLNet lineage). Unlike the other two, the
  * model here is a PROBABILITY table, so segmentation is a global
  * optimum per word (dynamic programming), not a greedy scan.
  *
  * Shape at 100 TB — the [[Bpe.train]] discipline, stated per stage:
  *   - the corpus is touched EXACTLY ONCE, by the word-count
  *     aggregation (explode → partial-agg groupBy). Everything after
  *     rides the DISTINCT-WORD table (Heaps' law: ~1e7–1e8 rows at
  *     any corpus size, sublinear in corpus bytes);
  *   - seed-candidate extraction is one substring-explode aggregation
  *     over that word table — bounded by words × maxPieceLen, never
  *     corpus-sized — finished by a distributed top-k
  *     (TakeOrderedAndProject, no single-partition exchange);
  *   - each EM iteration is ONE job over the word table: mapPartitions
  *     computes per-word lattice posteriors against the broadcast
  *     score map and pre-combines locally, a vocab-sized partial-agg
  *     sum follows, and the vocab-sized result (≤ seedSize + alphabet)
  *     is collected for the driver-side M-step — the same
  *     vocab-to-driver bound class as BPE's 1-row argmax;
  *   - below `driverCutover` distinct words the whole EM loop runs on
  *     the driver over the collected word table (the CC/PageRank/BPE
  *     cutover precedent) — zero Spark jobs per iteration.
  *
  * Determinism (what makes spec equality pins meaningful): expected
  * counts are accumulated in MICRO-UNITS — each word's posterior mass
  * per piece is rounded ONCE, word-locally, to `round(p·freq·1e6)` and
  * summed as Longs, which is exactly associative — so the fitted vocab
  * and every log-prob are a pure function of the corpus, independent of
  * partitioning and summation order (UnigramSpec pins distributed ==
  * driver-cutover EXACT equality). The micro-unit bound: a word
  * contributes ≤ len·freq·1e6 units, so totals stay inside Long for
  * any per-word frequency below ~9e12 — beyond any observed natural
  * corpus (most-frequent-token mass ~5% of 1e13 tokens ≈ 5e11).
  *
  * Pruning (`pruneMode`, r14): `"expected"` keeps the pieces the
  * E-step assigns the most posterior mass — the expected-count
  * simplification of Kudo §3.2; `"loss"` implements the paper rule
  * itself — rank each piece by the likelihood loss of removing it
  * (its Viterbi count × the score gap to its own best re-segmentation
  * without it, the SentencePiece prune recipe), computed on the same
  * bounded word table. Either way the single-code-point alphabet is
  * never pruned, so every training-corpus word stays segmentable at
  * every step. UnigramSpec pins a fixture where the two rules
  * genuinely disagree.
  *
  * Why the encoder is a UDF (the engine prefers Column math / native
  * expressions): Viterbi over a per-word lattice is a data-dependent
  * DP that Column algebra cannot express; the broadcast score map plus
  * a size-capped per-task word memo (natural text repeats words, so
  * the common case is a hash lookup) is the same exemption class as
  * [[Bpe.encode]] / [[WordPiece.encode]] (SURVEY §5).
  */
object Unigram {

  // ------------------------------------------------------------------
  // SentencePiece ▁-marker mode (r18, VERDICT r17 item 6)
  // ------------------------------------------------------------------

  /** U+2581 LOWER ONE EIGHTH BLOCK — the SentencePiece whitespace
    * marker (Kudo & Richardson 2018, arXiv:1808.06226 §3.1). */
  val Marker = "▁"

  /** Marker-mode pre-tokenization (`marker = true` on
    * [[train]]/[[encode]]): whitespace is PIECE-INTERNAL, the
    * convention T5/Llama vocabularies assume — word-split vocabs are
    * not drop-in comparable. The text lowers (Locale.ROOT), gains
    * one dummy leading space (SentencePiece's add_dummy_prefix),
    * every ASCII-whitespace char becomes one ▁ (remove_extra_
    * whitespaces=false semantics: multi-space is PRESERVED, one
    * marker per char; tab/newline normalize to the space marker —
    * the documented normalizer divergence), and tokens are the
    * maximal `▁+[^▁]*` runs — so "it  is" → ["▁it", "▁▁is"] and a
    * trailing space yields a bare "▁" token. Decoding is exact:
    * concatenate, map ▁ → space, drop the one dummy — round-trip
    * losslessness INCLUDING space multiplicity (UnigramSpec).
    * Segmentation stays per-token (split_by_whitespace=true, the
    * T5/Llama default), so the bounded word-table training shape is
    * unchanged; ▁ enters the alphabet like any code point. */
  private[graft] def markerWordsJvm(text: String): Array[String] =
    MarkerTokenRe.findAllIn(
      (" " + text.toLowerCase(java.util.Locale.ROOT))
        .replaceAll("\\s", Marker)).toArray

  private val MarkerTokenRe = (Marker + "+[^" + Marker + "]*").r

  // ------------------------------------------------------------------
  // encoding
  // ------------------------------------------------------------------

  /** Add `out` = array of unigram-LM pieces for `textCol`, given a
    * vocab of (piece, log-prob) rows. Each word ([[TextFunctions
    * .tokens]] semantics: lowercased whitespace tokens, so counts
    * compose with every other token metric in the engine) becomes its
    * max-total-log-prob segmentation (Viterbi). Code points absent
    * from the vocab are emitted VERBATIM at `charFallback` score
    * (SentencePiece's character-coverage fallback), so encoding is
    * total and LOSSLESS by construction — concatenating a word's
    * pieces always reproduces the word (q234's gate). Null text →
    * null. Ties break deterministically: fewer pieces, then the
    * longer final piece at each DP cell.
    *
    * Duplicate pieces in `vocab` resolve to their MAX log-prob
    * (deterministic, and the only resolution under which adding a
    * duplicate row can never worsen a segmentation). */
  def encode(df: DataFrame, textCol: String, vocab: DataFrame,
             pieceCol: String = "piece", logProbCol: String = "log_prob",
             out: String = "ug_tokens",
             charFallback: Double = -100.0,
             marker: Boolean = false): DataFrame = {
    require(charFallback < 0.0 && !charFallback.isInfinite,
      s"charFallback must be finite negative, got $charFallback")
    val rows = vocab
      .select(col(pieceCol).cast("string").as("p"),
        col(logProbCol).cast("double").as("s"))
      .filter(col("p").isNotNull && length(col("p")) > 0 &&
        col("s").isNotNull)
      .groupBy(col("p")).agg(max(col("s")).as("s"))
      .collect()
    val scores: Map[String, Double] =
      rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val maxLen = math.max(1,
      if (scores.isEmpty) 1 else scores.keysIterator.map(cpLen).max)
    val bc = df.sparkSession.sparkContext.broadcast(scores)
    val memoCap = 1 << 17
    val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    val enc = udf { (text: String) =>
      if (text == null) null
      else {
        val v = bc.value
        // no JVM .trim: String.trim strips ALL control chars <= U+0020
        // at the boundaries, diverging from TF.tokens (Spark trim strips
        // only spaces) and breaking round-trip losslessness on
        // control-char-edged text; split + nonEmpty filter handles
        // leading/trailing whitespace identically. Lowering is
        // Locale.ROOT on BOTH sides since r15: the trainers count
        // words through TextFunctions.tokensRoot (the shared
        // ROOT-lower expression), so train == encode on every JVM
        // locale — TokenizerLocaleSpec pins tr-TR.
        val words =
          if (marker) markerWordsJvm(text)
          else text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
            .filter(_.nonEmpty)
        words.flatMap { w =>
          var hit = cache.get(w)
          if (hit == null) {
            hit = viterbiWord(w, v, maxLen, charFallback)
            if (cache.size < memoCap) cache.put(w, hit)
          }
          hit
        }.toSeq
      }
    }
    df.withColumn(out, enc(col(textCol)))
  }

  /** exact inverse of marker-mode [[encode]] as a Column: concatenate
    * the pieces, map ▁ → space, drop the one dummy prefix — yields
    * the Locale.ROOT-lowercased, tab/newline-normalized original
    * INCLUDING space multiplicity. */
  def markerDecode(pieces: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column =
    substring(translate(array_join(pieces, ""), Marker, " "),
      2, Int.MaxValue)

  /** [[encode]] reduced to the budgeting signal: piece count. */
  def tokenCount(df: DataFrame, textCol: String, vocab: DataFrame,
                 pieceCol: String = "piece",
                 logProbCol: String = "log_prob",
                 out: String = "ug_count",
                 marker: Boolean = false): DataFrame = {
    val enc = encode(df, textCol, vocab, pieceCol, logProbCol,
      "__ug_toks", marker = marker)
    enc.withColumn(out, size(col("__ug_toks"))).drop("__ug_toks")
  }

  /** Viterbi max-sum segmentation of one word (lowercased,
    * whitespace-free). Package-visible for the spec's equality pin
    * against exhaustive segmentation enumeration. Tie rules, in
    * order: higher score; fewer pieces; longer final piece (applied
    * at every DP cell, so the whole path is deterministic). */
  private[graft] def viterbiWord(w: String, scores: Map[String, Double],
                                 maxLen: Int,
                                 fallback: Double): Seq[String] = {
    val cps = toCodePoints(w)
    val n = cps.length
    if (n == 0) return Seq.empty
    // prefix char offsets so piece substrings are O(1) per edge
    val off = new Array[Int](n + 1)
    var k = 0
    while (k < n) { off(k + 1) = off(k) + cps(k).length; k += 1 }
    val score = new Array[Double](n + 1)
    val count = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(score, Double.NegativeInfinity)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        val j = i - l
        if (score(j) > Double.NegativeInfinity) {
          val piece = w.substring(off(j), off(i))
          val s = scores.get(piece) match {
            case Some(x) => x
            case None => if (l == 1) fallback else Double.NaN
          }
          if (!s.isNaN) {
            val cand = score(j) + s
            val cnt = count(j) + 1
            // replace on strict improvement, or on a score tie when
            // the piece count does not increase — with l ascending
            // that leaves the LONGEST final piece standing
            if (cand > score(i) ||
                (cand == score(i) && cnt <= count(i)))
              { score(i) = cand; count(i) = cnt; back(i) = j }
          }
        }
        l += 1
      }
      i += 1
    }
    // alphabet fallback makes every cell reachable
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val j = back(pos)
      out += w.substring(off(j), off(pos))
      pos = j
    }
    out.reverseIterator.toSeq
  }

  // ------------------------------------------------------------------
  // seeding
  // ------------------------------------------------------------------

  /** Seed-candidate extraction — the one fully-relational stage of
    * [[train]], exposed for the q233 oracle gate: positional
    * substrings (up to `maxPieceLen` code points) of every distinct
    * word, weighted by word frequency, top `seedSize` by
    * (count desc, piece asc). Pure Column math end-to-end; the top-k
    * is orderBy+limit (TakeOrderedAndProject — distributed, no
    * single-partition window). Bounded by words × maxPieceLen ×
    * avg-len rows — the word table again, never the corpus. */
  def seedCandidates(df: DataFrame, textCol: String,
                     maxPieceLen: Int = 6,
                     seedSize: Int = 8192,
                     marker: Boolean = false): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(seedSize >= 1, s"seedSize must be >= 1, got $seedSize")
    seedFromWords(wordCountsDF(df, textCol, marker), maxPieceLen)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(seedSize)
  }

  /** (word, freq) over the corpus — the single corpus-proportional
    * pass everything else rides. In marker mode the words carry
    * their ▁ prefixes ([[markerWordsJvm]]'s column twin —
    * [[TextFunctions.markerTokens]] — so train == encode exactly). */
  private def wordCountsDF(df: DataFrame, textCol: String,
                           marker: Boolean = false): DataFrame = {
    // tokensRoot, not tokens (r15): encode() lowers with Locale.ROOT,
    // so the trained vocab must too — on tr/az/lt-default JVMs the
    // Spark lower() twin would count different words than encode sees
    val toks =
      if (marker) TextFunctions.markerTokens(col(textCol))
      else TextFunctions.tokensRoot(col(textCol))
    df.select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
  }

  /** positional substring counts of a (word, freq) table. Substring
    * positions are CHARACTER positions (Spark `substr` counts code
    * points, matching the DuckDB oracle; ASCII corpora are identical
    * under both, and the JVM lattice below is code-point-based so
    * supplementary-plane text never shears surrogate pairs). */
  private def seedFromWords(wc: DataFrame, maxPieceLen: Int): DataFrame =
    wc.select(col("freq"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), i =>
          transform(
            sequence(lit(1),
              least(lit(maxPieceLen), length(col("word")) - i + lit(1))),
            l => col("word").substr(i, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  // ------------------------------------------------------------------
  // training
  // ------------------------------------------------------------------

  /** Fit a unigram-LM piece table from the corpus: seed candidates
    * (+ the full single-code-point alphabet, always retained so every
    * word stays segmentable), `emIters` EM passes over the
    * distinct-word table, an expected-count prune to `vocabSize`
    * (alphabet never pruned), and one final EM pass to resettle the
    * kept pieces' probabilities. Returns (piece string, log_prob
    * double) ordered by (log_prob desc, piece asc).
    *
    * E-step per word: forward-backward over the segmentation lattice
    * (edges = vocab pieces ≤ maxPieceLen code points), posterior
    * occupancy per edge, accumulated in exactly-associative
    * micro-units — see the object scaladoc for the determinism and
    * cutover story. M-step: log-prob = log(mass / total-mass); a
    * multi-cp piece whose mass rounds to zero leaves the vocab (it is
    * unreachable at 1e-6 posterior resolution), an alphabet piece is
    * floored at one micro-unit. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 6, seedSize: Int = 8192,
            emIters: Int = 2,
            driverCutover: Long = 1L << 20,
            pruneMode: String = "expected",
            marker: Boolean = false): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(seedSize >= 1, s"seedSize must be >= 1, got $seedSize")
    require(emIters >= 0, s"emIters must be >= 0, got $emIters")
    require(driverCutover >= 0L,
      s"driverCutover must be >= 0, got $driverCutover")
    require(pruneMode == "expected" || pruneMode == "loss",
      s"pruneMode must be expected or loss, got $pruneMode")
    val spark = df.sparkSession
    import spark.implicits._

    val wc: Dataset[(String, Long)] = wordCountsDF(df, textCol, marker)
      .as[(String, Long)]
      .localCheckpoint() // corpus lineage ends here (one pass)

    // ---- seed: top substrings + the alphabet ----
    val seed: Array[(String, Long)] = seedFromWords(wc.toDF("word", "freq"),
        maxPieceLen)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(seedSize)
      .as[(String, Long)].collect()
    val alphabet: Array[(String, Long)] = wc.toDF("word", "freq")
      .select(col("freq"), explode(transform(
          sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .as[(String, Long)].collect()
    val alphaSet = alphabet.map(_._1).toSet
    val seedMap = scala.collection.mutable.LinkedHashMap[String, Long]()
    alphabet.sortBy(_._1).foreach { case (p, c) => seedMap(p) = c }
    seed.foreach { case (p, c) =>
      if (!seedMap.contains(p)) seedMap(p) = c }
    var total = seedMap.valuesIterator.map(_.toDouble).sum
    var scores: Map[String, Double] =
      seedMap.iterator.map { case (p, c) =>
        p -> math.log(c.toDouble / total) }.toMap

    // ---- EM loop (driver cutover or distributed, same arithmetic) --
    val nWords = wc.count()
    val localWords: Array[(String, Long)] =
      if (nWords <= driverCutover) wc.collect() else null
    lastTrainPathDiag = if (localWords != null) "local" else "distributed"

    def emPass(cur: Map[String, Double]): Map[String, Long] = {
      val ml = math.max(1, cur.keysIterator.map(cpLen).max)
      if (localWords != null) {
        val acc = scala.collection.mutable.HashMap.empty[String, Long]
        localWords.foreach { case (w, f) =>
          wordExpectations(w, f, cur, ml).foreach { case (p, m) =>
            acc(p) = acc.getOrElse(p, 0L) + m } }
        acc.toMap
      } else {
        val bc = spark.sparkContext.broadcast(cur)
        try {
          val out = wc.mapPartitions { it =>
              val acc = scala.collection.mutable.HashMap.empty[String, Long]
              val v = bc.value
              it.foreach { case (w, f) =>
                wordExpectations(w, f, v, ml).foreach { case (p, m) =>
                  acc(p) = acc.getOrElse(p, 0L) + m } }
              acc.iterator
            }.toDF("piece", "micro")
            .groupBy(col("piece")).agg(sum(col("micro")).as("micro"))
            .as[(String, Long)].collect() // vocab-sized by construction
          out.toMap
        } finally bc.destroy() // one broadcast per pass, never leaked
      }
    }

    def mStep(mass: Map[String, Long]): Map[String, Double] = {
      val floored = scores.keysIterator.flatMap { p =>
        val m = mass.getOrElse(p, 0L)
        if (m > 0L) Some(p -> m)
        else if (alphaSet.contains(p)) Some(p -> 1L) // alphabet floor
        else None // unreachable multi-cp piece retires
      }.toMap
      val tot = floored.valuesIterator.map(_.toDouble).sum
      floored.map { case (p, m) => p -> math.log(m / tot) }
    }

    var lastMass: Map[String, Long] =
      seedMap.iterator.map { case (p, c) => p -> c }.toMap
    var it = 0
    while (it < emIters) {
      lastMass = emPass(scores)
      scores = mStep(lastMass)
      it += 1
    }

    // ---- prune to vocabSize (alphabet kept), final EM resettle ----
    // Two published rules, selected by `pruneMode`:
    //  - "expected" (default, r13 behavior): drop the multi-cp
    //    pieces with the least E-step posterior mass — the
    //    expected-count simplification of Kudo §3.2.
    //  - "loss" (r14, the paper rule): Viterbi-segment the word
    //    table once under the current model, count each piece's
    //    Viterbi occurrences, and score piece p by the LIKELIHOOD
    //    LOSS of removing it — count_p · (score(p) − altScore(p)),
    //    where altScore is p's own best re-segmentation WITHOUT p
    //    (driver-side DP per piece: vocab × len² lookups, the
    //    SentencePiece prune recipe). Pieces the Viterbi path never
    //    uses lose nothing and are dropped first. Both rules ride
    //    the same bounded word table; counts are exact Longs, so
    //    the loss ranking is partition-independent like everything
    //    else here.
    val nAlpha = scores.keysIterator.count(alphaSet.contains)
    val keepMulti = math.max(0, vocabSize - nAlpha)
    def viterbiCounts(cur: Map[String, Double]): Map[String, Long] = {
      val ml = math.max(1, cur.keysIterator.map(cpLen).max)
      if (localWords != null) {
        val acc = scala.collection.mutable.HashMap.empty[String, Long]
        localWords.foreach { case (w, f) =>
          viterbiWord(w, cur, ml, -1e9).foreach { p =>
            acc(p) = acc.getOrElse(p, 0L) + f } }
        acc.toMap
      } else {
        val bc = spark.sparkContext.broadcast(cur)
        try {
          wc.mapPartitions { it =>
              val acc = scala.collection.mutable.HashMap.empty[String, Long]
              val v = bc.value
              it.foreach { case (w, f) =>
                viterbiWord(w, v, ml, -1e9).foreach { p =>
                  acc(p) = acc.getOrElse(p, 0L) + f } }
              acc.iterator
            }.toDF("piece", "cnt")
            .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
            .as[(String, Long)].collect().toMap
        } finally bc.destroy()
      }
    }
    val kept: Set[String] = pruneMode match {
      case "expected" =>
        scores.keysIterator
          .filterNot(alphaSet.contains)
          .map(p => (p, lastMass.getOrElse(p, 0L)))
          .toArray
          .sortWith { case ((pa, ma), (pb, mb)) =>
            ma > mb || (ma == mb && utf8Lt(pa, pb)) }
          .take(keepMulti).map(_._1).toSet
      case "loss" =>
        val ml = math.max(1, scores.keysIterator.map(cpLen).max)
        val vc = viterbiCounts(scores)
        scores.keysIterator
          .filterNot(alphaSet.contains)
          .map { p =>
            val c = vc.getOrElse(p, 0L)
            val loss =
              if (c == 0L) Double.NegativeInfinity // unused: free to drop
              else {
                val without = scores - p
                val alt = viterbiWord(p, without, ml, -1e9)
                  .map(q => without.getOrElse(q, -1e9)).sum
                c.toDouble * (scores(p) - alt) // ≥ 0: alt is without-p best
              }
            (p, loss)
          }
          .toArray
          .sortWith { case ((pa, la), (pb, lb)) =>
            la > lb || (la == lb && utf8Lt(pa, pb)) }
          .take(keepMulti).map(_._1).toSet
    }
    scores = scores.filter { case (p, _) =>
      alphaSet.contains(p) || kept.contains(p) }
    val finalMass = emPass(scores)
    scores = mStep(finalMass)
    wc.unpersist() // release the localCheckpoint blocks (Bpe discipline)

    scores.toSeq
      .sortWith { case ((pa, sa), (pb, sb)) =>
        sa > sb || (sa == sb && utf8Lt(pa, pb)) }
      .toDF("piece", "log_prob")
  }

  /** which path [[train]] took last — ScalaTest diagnostic only. */
  @volatile private[graft] var lastTrainPathDiag: String = ""

  // ------------------------------------------------------------------
  // model persistence (the PQ-codebook / DSIR-ratio / SemDeDup-center
  // discipline: __fmt + fit params stamped constant, validated on load)
  // ------------------------------------------------------------------

  /** Model FORMAT version stamped as `__fmt` into every persisted
    * vocab row: params alone cannot detect an incompatible layout
    * change (normalization, fallback semantics), and a stale model
    * segments WRONG, not slow. v1 = (piece, log_prob) rows as of
    * r13; v2 (r18) adds the `__marker` pre-tokenization stamp — a
    * ▁-marker vocab served in word-split mode (or vice versa) would
    * segment every document wrong, the exact trap the stamp closes. */
  private[graft] val UnigramModelFormat = 2

  /** Persist a fitted vocab: (piece, log_prob) rows with `__fmt` +
    * the fit params (vocabSize, maxPieceLen, marker) stamped constant
    * on every row (free under parquet RLE, validated on load). The
    * vocab is model-artifact-sized — one file. */
  def saveVocab(vocab: DataFrame, path: String, vocabSize: Int,
                maxPieceLen: Int, marker: Boolean = false): Unit = {
    require(vocabSize >= 1 && maxPieceLen >= 1,
      s"need vocabSize/maxPieceLen >= 1, got $vocabSize/$maxPieceLen")
    vocab.select(col("piece").cast("string").as("piece"),
        col("log_prob").cast("double").as("log_prob"))
      .withColumn("__fmt", lit(UnigramModelFormat))
      .withColumn("__vocab_size", lit(vocabSize))
      .withColumn("__max_piece_len", lit(maxPieceLen))
      .withColumn("__marker", lit(marker))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a vocab persisted by [[saveVocab]], refusing format or
    * param mismatches: the caller states the (vocabSize, maxPieceLen)
    * it expects, and a model fit under any other combination throws
    * with a refit message — a drifted maxPieceLen silently changes
    * every segmentation (pieces longer than the caller assumes), the
    * exact trap the stamps exist for. Pieces are validated distinct
    * and non-empty (a duplicated piece would silently resolve to max
    * log-prob in [[encode]] and hide a corrupted write). */
  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String,
                vocabSize: Int, maxPieceLen: Int,
                marker: Boolean = false): DataFrame = {
    val df = spark.read.parquet(path)
    val need = Seq("piece", "log_prob", "__fmt", "__vocab_size",
      "__max_piece_len", "__marker")
    val missing = need.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"not a unigram vocab file: missing columns $missing — rebuild " +
        s"with Unigram.saveVocab (format v$UnigramModelFormat)")
    // ALL validation facts in ONE job (review r13: three separate
    // jobs — stamp distinct, count, distinct count — were scheduler
    // overhead at load cadence on a one-file artifact)
    val facts = df.agg(
      count(lit(1)).as("n"),
      count_distinct(col("piece")).as("nd"),
      collect_set(struct(col("__fmt"), col("__vocab_size"),
        col("__max_piece_len"), col("__marker"))).as("stamps")).head()
    val stamps = facts.getSeq[org.apache.spark.sql.Row](2)
    require(stamps.length == 1,
      s"unigram vocab stamps not constant (${stamps.length} distinct)" +
        " — the file mixes fits; rebuild with Unigram.saveVocab")
    val st = stamps.head
    require(st.getInt(0) == UnigramModelFormat,
      s"unigram vocab format ${st.getInt(0)} does not match this " +
        s"library's v$UnigramModelFormat — refit and save again (an " +
        "incompatible layout would segment WRONG, not just miss)")
    require(st.getInt(1) == vocabSize && st.getInt(2) == maxPieceLen,
      s"unigram vocab was fit with (vocabSize=${st.getInt(1)}, " +
        s"maxPieceLen=${st.getInt(2)}) but the caller expects " +
        s"(vocabSize=$vocabSize, maxPieceLen=$maxPieceLen) — every " +
        "segmentation could silently change; refit or fix the params")
    require(st.getBoolean(3) == marker,
      s"unigram vocab was fit with marker=${st.getBoolean(3)} but the " +
        s"caller will encode with marker=$marker — a ▁-marker vocab " +
        "served word-split (or vice versa) segments every document " +
        "wrong; refit or fix the mode")
    val n = facts.getLong(0)
    val distinctN = facts.getLong(1)
    require(n == distinctN && n > 0L,
      s"unigram vocab file has $n rows, $distinctN distinct pieces — " +
        "corrupted or empty write; rebuild with Unigram.saveVocab")
    df.select(col("piece"), col("log_prob"))
  }

  /** Forward-backward posterior edge occupancies for one word,
    * emitted as word-locally-rounded micro-unit Longs (the exactness
    * trick — see object doc). Package-visible for the spec's
    * hand-computed lattice pins. */
  private[graft] def wordExpectations(w: String, freq: Long,
                                      scores: Map[String, Double],
                                      maxLen: Int)
  : Iterator[(String, Long)] = {
    val cps = toCodePoints(w)
    val n = cps.length
    if (n == 0) return Iterator.empty
    val off = new Array[Int](n + 1)
    var k = 0
    while (k < n) { off(k + 1) = off(k) + cps(k).length; k += 1 }
    @inline def pieceAt(j: Int, i: Int): String = w.substring(off(j), off(i))
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    java.util.Arrays.fill(alpha, Double.NegativeInfinity)
    java.util.Arrays.fill(beta, Double.NegativeInfinity)
    alpha(0) = 0.0; beta(n) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        val s = scores.getOrElse(pieceAt(i - l, i), Double.NaN)
        if (!s.isNaN && alpha(i - l) > Double.NegativeInfinity)
          alpha(i) = logAdd(alpha(i), alpha(i - l) + s)
        l += 1
      }
      i += 1
    }
    i = n - 1
    while (i >= 0) {
      var l = 1
      val lMax = math.min(maxLen, n - i)
      while (l <= lMax) {
        val s = scores.getOrElse(pieceAt(i, i + l), Double.NaN)
        if (!s.isNaN && beta(i + l) > Double.NegativeInfinity)
          beta(i) = logAdd(beta(i), s + beta(i + l))
        l += 1
      }
      i -= 1
    }
    val z = alpha(n)
    if (z == Double.NegativeInfinity) return Iterator.empty // unsegmentable
    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        val j = i - l
        val p = pieceAt(j, i)
        val s = scores.getOrElse(p, Double.NaN)
        if (!s.isNaN && alpha(j) > Double.NegativeInfinity &&
            beta(i) > Double.NegativeInfinity) {
          val post = math.exp(alpha(j) + s + beta(i) - z)
          acc(p) = acc.getOrElse(p, 0.0) + post
        }
        l += 1
      }
      i += 1
    }
    acc.iterator.flatMap { case (p, mass) =>
      val micro = math.round(mass * freq * 1e6)
      if (micro > 0L) Iterator.single(p -> micro) else Iterator.empty
    }
  }

  /** numerically-stable log(e^a + e^b) */
  private def logAdd(a: Double, b: Double): Double = {
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log1p(math.exp(math.min(a, b) - m)) }
  }

  /** split into Unicode code points (surrogate-pair safe — the
    * [[Bpe]] seed discipline). */
  private def toCodePoints(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** UTF-8 unsigned-byte order — Spark's native string sort order;
    * shared with [[Bpe]] so the two trainers' tie-break disciplines
    * can never desynchronize. */
  private def utf8Lt(a: String, b: String): Boolean = Bpe.utf8Lt(a, b)
}
