package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** WordPiece subword encoding (Wu et al. 2016; the BERT-family
  * tokenizer) — the greedy longest-match-first complement to
  * [[Bpe]]'s rank-greedy merge encoder (GPT family). Given a vocab
  * of pieces (word-initial pieces plain, continuations prefixed
  * `##`), each word becomes its greedy decomposition: repeatedly take
  * the LONGEST vocab piece that prefixes the remainder; if at any
  * point no piece matches, the WHOLE word becomes `unkToken` (BERT
  * semantics — no partial emissions). Tokenization (lowercase,
  * whitespace split) matches [[graft.functions.TextFunctions.tokens]]
  * so counts compose with the budget operators.
  *
  * Shape at 100 TB: the vocab is a model artifact (30-100k pieces —
  * BPE-merge-table-sized), collected once and broadcast; encoding is
  * one narrow map pass with a size-capped per-task word memo
  * ([[Bpe.encode]]'s discipline). Per-word cost is O(chars²) worst
  * case bounded by `maxInputChars` (BERT's guard: overlong words go
  * straight to unk without scanning).
  *
  * The greedy loop is not ANSI-SQL-expressible, so the split path is
  * spec-pinned against an independent recursive reference on
  * randomized (vocab, word) inputs (the BPE clean-room discipline);
  * q151 oracles the whole-word face, where greedy semantics collapse
  * to `w ∈ vocab ? w : unk` exactly (with no `##` continuations in
  * the vocab, any split attempt dead-ends into unk — the oracle
  * replays that with one CASE WHEN). */
object WordPiece {

  /** Add `out` = array of wordpiece tokens for `textCol`, given
    * `vocab` (one piece per row in `pieceCol`; continuations carry
    * the `contPrefix` themselves, exactly as a BERT vocab file
    * does). Null text → null. */
  def encode(df: DataFrame, textCol: String, vocab: DataFrame,
             pieceCol: String = "piece", out: String = "wp_tokens",
             unkToken: String = "[UNK]", contPrefix: String = "##",
             maxInputChars: Int = 200): DataFrame = {
    val pieces = vocab.select(col(pieceCol).cast("string"))
      .filter(col(pieceCol).isNotNull)
      .distinct().collect().map(_.getString(0)).toSet
    val bc = df.sparkSession.sparkContext.broadcast(pieces)
    val memoCap = 1 << 17
    val cache = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
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
        text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          .filter(_.nonEmpty)
          .flatMap { w =>
            var hit = cache.get(w)
            if (hit == null) {
              hit = encodeWord(w, v, unkToken, contPrefix, maxInputChars)
              if (cache.size < memoCap) cache.put(w, hit)
            }
            hit
          }.toSeq
      }
    }
    df.withColumn(out, enc(col(textCol)))
  }

  /** [[encode]] reduced to the budgeting signal: wordpiece count. */
  def tokenCount(df: DataFrame, textCol: String, vocab: DataFrame,
                 pieceCol: String = "piece",
                 out: String = "wp_count"): DataFrame = {
    val enc = encode(df, textCol, vocab, pieceCol, "__wp_toks")
    enc.withColumn(out, size(col("__wp_toks"))).drop("__wp_toks")
  }

  // ---- trainer (r18 — completes the trilogy's trainer set) -------------

  /** Learn a WordPiece vocab from the corpus — the likelihood-gain
    * merge criterion (Schuster & Nakajima 2012, "Japanese and Korean
    * voice search", as popularized for BERT): like BPE, repeatedly
    * merge the best adjacent symbol pair over the distinct-word
    * table, but "best" maximizes `score = count(pair) /
    * (count(left) × count(right))` — the unigram-LM likelihood gain
    * of the merge — rather than raw pair frequency, so rare-but-
    * always-together fragments win over merely common ones. Computed
    * as `(pc / cl) / cr` in double math, in THAT association order
    * on every path (local, distributed, oracle): long
    * multiplication `cl × cr` would overflow (and ANSI-throw) at
    * corpus scale, and FP association is the determinism contract.
    * Tie-break: score desc, pair count desc, left asc, right asc
    * (UTF-8) — merge sequence is a pure function of the corpus,
    * partition- and path-independent (spec-pinned).
    *
    * Symbols are BERT-form: word-initial char plain, continuations
    * `##`-prefixed; merging (l, r) concatenates l with r minus its
    * `##` (the right side of an adjacent pair is always a
    * continuation). Output = the BERT-style vocab [[encode]] consumes
    * directly: the seed ALPHABET first (rank 0.., UTF-8 order, score
    * null, freq = seed occurrence count) then one row per merge
    * (rank continuing, the winning score and pair count) — by
    * construction the alphabet covers every corpus character, so the
    * trained vocab encodes its own corpus with ZERO `[UNK]`
    * (spec-pinned; greedy always finds at least the single-char
    * piece).
    *
    * Shape at 100 TB — [[Bpe.train]]'s exactly: ONE corpus pass
    * (word-count partial agg), then every iteration rides the
    * Heaps-bounded distinct-word table, shrinking as fully-merged
    * words retire; per distributed iteration one pair-count
    * aggregation joined (broadcast) against the vocab-sized symbol
    * counts, 1-row argmax to the driver; lineage cut every
    * `checkpointEvery` merges; ≤ `driverCutover` distinct words →
    * collected local loop with incremental pair AND symbol count
    * maintenance (zero jobs per merge). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minFreq: Long = 2L, checkpointEvery: Int = 10,
            driverCutover: Long = 1L << 20,
            contPrefix: String = "##"): DataFrame = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minFreq >= 1L, s"minFreq must be >= 1, got $minFreq")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    require(driverCutover >= 0L,
      s"driverCutover must be >= 0, got $driverCutover")
    require(contPrefix.nonEmpty, "contPrefix must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._

    var words: Dataset[(Seq[String], Long)] =
      seedWords(df, textCol, contPrefix)
        .localCheckpoint() // corpus lineage ends here

    // the seed alphabet rows (emitted ahead of the merges): every
    // distinct seed symbol with its corpus occurrence count, UTF-8
    // order. Bounded by the corpus character inventory — model-sized.
    val alphabet = words.flatMap { case (syms, f) => syms.map(_ -> f) }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .collect().sortWith((a, b) => Bpe.utf8Lt(a._1, b._1))

    def out(ms: Seq[(String, String, String, Double, Long)]): DataFrame = {
      val rows = alphabet.zipWithIndex.map { case ((p, f), i) =>
        (i, p, Option.empty[Double], f)
      } ++ ms.zipWithIndex.map { case ((piece, _, _, sc, pf), i) =>
        (alphabet.length + i, piece, Some(sc), pf)
      }
      rows.toSeq.toDF("rank", "piece", "score", "freq")
    }

    if (words.count() <= driverCutover) {
      val local = words.collect()
      words.unpersist()
      lastTrainPathDiag = "local"
      return out(trainLocal(local, numMerges, minFreq, contPrefix))
    }

    var lastCheckpoint = words
    val merges = scala.collection.mutable
      .ArrayBuffer[(String, String, String, Double, Long)]()
    var done = false
    while (merges.length < numMerges && !done) {
      // symbol counts: vocab-sized (alphabet + merges so far) —
      // aggregated then joined broadcast against the pair counts;
      // score computed in the pinned (pc / cl) / cr order.
      val symc = words.toDF("syms", "freq")
        .select(explode(col("syms")).as("sym"), col("freq"))
        .groupBy(col("sym")).agg(sum(col("freq")).as("c"))
      // minFreq is a CANDIDATE filter, not a stop test: pairs below
      // it can never merge, but the loop continues with the best
      // eligible pair (the published min-frequency semantics — a
      // rare-but-high-score pair must not halt training while
      // frequent pairs remain)
      val pc = pairCounts(words).filter(col("f") >= minFreq)
      val top = pc
        .join(broadcast(symc.select(col("sym").as("l"),
          col("c").as("cl"))), "l")
        .join(broadcast(symc.select(col("sym").as("r"),
          col("c").as("cr"))), "r")
        .select(col("l"), col("r"), col("f"),
          (col("f").cast("double") / col("cl").cast("double") /
            col("cr").cast("double")).as("score"))
        .orderBy(col("score").desc, col("f").desc, col("l").asc,
          col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, f, sc) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2), top(0).getDouble(3))
        val merged = l + r.stripPrefix(contPrefix)
        merges += ((merged, l, r, sc, f))
        // no retirement filter (the Bpe divergence): a fully-merged
        // word keeps contributing its one symbol to the denominators
        val next = words
          .map { case (syms, freq) =>
            (mergePair(syms, l, r, contPrefix), freq) }
        // lineage cut only — no mid-loop cutover re-check: without
        // retirement the word table's row count is CONSTANT, so a
        // corpus that starts above driverCutover never drops under
        // it (Bpe's mid-cutover is driven by its shrink; here the
        // check would be a dead count() job per checkpoint)
        if (merges.length % checkpointEvery == 0) {
          val cp = next.localCheckpoint()
          lastCheckpoint.unpersist()
          lastCheckpoint = cp
          words = cp
        } else words = next
      }
    }
    lastCheckpoint.unpersist()
    lastTrainPathDiag = "distributed"
    out(merges.toSeq)
  }

  /** which path the last [[train]] on this JVM took — diagnostic
    * only (the [[Bpe.lastTrainPathDiag]] convention). */
  @volatile private[graft] var lastTrainPathDiag: String = ""

  /** The SQL-expressible fragment of [[train]] for the oracle gate
    * (the [[Bpe.seedPairCounts]] discipline): adjacent-pair counts
    * AND likelihood scores over the SEED symbol table — the
    * aggregation whose (score desc, f desc, l, r) argmax is
    * train()'s first merge by construction. Returns
    * (l, r, f, cl, cr, score). */
  def seedPairScores(df: DataFrame, textCol: String,
                     contPrefix: String = "##"): DataFrame = {
    val words = seedWords(df, textCol, contPrefix)
    val symc = words.toDF("syms", "freq")
      .select(explode(col("syms")).as("sym"), col("freq"))
      .groupBy(col("sym")).agg(sum(col("freq")).as("c"))
    pairCounts(words)
      .join(broadcast(symc.select(col("sym").as("l"),
        col("c").as("cl"))), "l")
      .join(broadcast(symc.select(col("sym").as("r"),
        col("c").as("cr"))), "r")
      .select(col("l"), col("r"), col("f"), col("cl"), col("cr"),
        (col("f").cast("double") / col("cl").cast("double") /
          col("cr").cast("double")).as("score"))
  }

  /** the corpus pass: ROOT-lowered word counts → BERT-form symbol
    * sequences (first char plain, continuations ##-prefixed, one per
    * code point). UNLIKE [[Bpe]], 1-symbol words are KEPT: they
    * contribute no pairs, but their symbol occurrences belong in the
    * likelihood denominators (and their chars in the alphabet —
    * dropping them would leave single-char words UNK-able by their
    * own vocab). The same rule holds mid-loop: a fully-merged word
    * stays in the table as its one symbol, still counted. */
  private def seedWords(df: DataFrame, textCol: String,
                        contPrefix: String)
  : Dataset[(Seq[String], Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(TextFunctions.tokensRoot(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (toSymbols(w, contPrefix), f) }
  }

  private def toSymbols(w: String, cont: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val c = new String(Character.toChars(cp))
      out += (if (i == 0) c else cont + c)
      i += Character.charCount(cp)
    }
    out.toSeq
  }

  private def pairCounts(words: Dataset[(Seq[String], Long)]): DataFrame =
    words.toDF("syms", "freq")
      // guard BEFORE the sequence: sequence(1, 0) DESCENDS — a
      // 1-symbol word (kept for its denominator count) must not
      // explode phantom pairs
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("f"))

  /** one left-to-right merge pass: (l, r) → l + r-minus-## ,
    * leftmost-first on overlaps (the [[Bpe.mergePair]] convention). */
  private def mergePair(syms: Seq[String], l: String, r: String,
                        cont: String): Seq[String] = {
    val merged = l + r.stripPrefix(cont)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
        out += merged; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** driver-side loop for a collected word table: incremental pair
    * AND symbol count maintenance (the [[Bpe.trainLocal]] index,
    * extended — a merge retracts the touched words' pair and symbol
    * contributions and re-adds them merged), argmax by the pinned
    * (pc / cl) / cr score with the same tie-break. Returns
    * (mergedPiece, l, r, score, pairFreq) in merge order. */
  private def trainLocal(input: Array[(Seq[String], Long)],
                         numMerges: Int, minFreq: Long, cont: String)
  : Seq[(String, String, String, Double, Long)] = {
    val syms = input.map(_._1.toArray)
    val freqs = input.map(_._2)
    val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val scnt = scala.collection.mutable.HashMap.empty[String, Long]
    val where = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.BitSet]
    def contribute(i: Int, sign: Long): Unit = {
      val s = syms(i); val f = freqs(i) * sign
      var j = 0
      while (j < s.length) {
        val c = scnt.getOrElse(s(j), 0L) + f
        if (c == 0L) scnt.remove(s(j)) else scnt(s(j)) = c
        if (j + 1 < s.length) {
          val p = (s(j), s(j + 1))
          val pc = pairs.getOrElse(p, 0L) + f
          if (pc == 0L) pairs.remove(p) else pairs(p) = pc
          if (sign > 0L)
            where.getOrElseUpdate(
              p, scala.collection.mutable.BitSet.empty) += i
        }
        j += 1
      }
    }
    var i = 0
    while (i < syms.length) { contribute(i, 1L); i += 1 }
    val merges = scala.collection.mutable
      .ArrayBuffer.empty[(String, String, String, Double, Long)]
    var done = false
    while (merges.length < numMerges && !done) {
      var bs = -1.0; var bf = 0L; var bl: String = null; var br: String = null
      pairs.foreach { case ((l, r), f) =>
        // minFreq as a candidate filter (matches the distributed
        // loop's pre-argmax filter exactly)
        if (f >= minFreq) {
          val sc = f.toDouble / scnt(l).toDouble / scnt(r).toDouble
          if (sc > bs || (sc == bs &&
              (f > bf || (f == bf &&
                (Bpe.utf8Lt(l, bl) || (l == bl && Bpe.utf8Lt(r, br)))))))
            { bs = sc; bf = f; bl = l; br = r }
        }
      }
      if (bl == null) done = true
      else {
        merges += ((bl + br.stripPrefix(cont), bl, br, bs, bf))
        where.remove((bl, br)).foreach(_.foreach { w =>
          val s = syms(w)
          var has = false; var j = 0
          while (!has && j + 1 < s.length) {
            if (s(j) == bl && s(j + 1) == br) has = true
            j += 1
          }
          if (has) {
            contribute(w, -1L)
            // keep even fully-merged words: their one symbol still
            // counts in the likelihood denominators (path parity
            // with the distributed loop's no-retirement rule)
            syms(w) = mergePair(s.toSeq, bl, br, cont).toArray
            contribute(w, 1L)
          }
        })
      }
    }
    merges.toSeq
  }

  /** Greedy longest-match-first for one word (lowercased,
    * whitespace-free). Package-visible for the spec's randomized
    * equality against an independent recursive reference. */
  private[graft] def encodeWord(w: String, vocab: Set[String],
                                unk: String, cont: String,
                                maxChars: Int): Seq[String] = {
    if (w.length > maxChars) return Seq(unk)
    val pieces = Seq.newBuilder[String]
    var start = 0
    while (start < w.length) {
      var end = w.length
      var found: String = null
      while (end > start && found == null) {
        val sub0 = w.substring(start, end)
        val sub = if (start == 0) sub0 else cont + sub0
        if (vocab.contains(sub)) found = sub else end -= 1
      }
      if (found == null) return Seq(unk) // whole word, BERT semantics
      pieces += found
      start = end
    }
    pieces.result()
  }
}
