package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Byte-pair-encoding subword tokenizer: distributed trainer +
  * encoder (DRIVER-EXT, SURVEY.md §2.12 text analysis). The engine's
  * token accounting so far is heuristic ([[TextFunctions.tokenCount]]
  * / `bpeishTokenCount`); this learns a REAL merge table from the
  * corpus (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units") so budgets, packing, and per-doc costs
  * can be measured in the same units a trained model will see.
  *
  * Shape at 100 TB — the reason BPE trains fine on Spark: the corpus
  * is touched EXACTLY ONCE, by the word-count aggregation (explode →
  * partial-agg groupBy, the [[Vocabulary]] shuffle shape). Every one
  * of the `numMerges` iterations after that rides the DISTINCT-WORD
  * table (natural-language corpora: ~1e7–1e8 rows regardless of
  * corpus size — Heaps' law, not corpus-linear), and that table only
  * SHRINKS as fully-merged words retire from the working set. Per
  * iteration: one pair-count aggregation (explode adjacent pairs →
  * partial-agg groupBy → 1-row argmax to the driver) and one narrow
  * map applying the merge — no shuffle of anything corpus-sized,
  * no driver state beyond the merge list itself. Lineage is cut
  * every `checkpointEvery` merges (localCheckpoint), so plan depth
  * is bounded and a 50k-merge vocabulary is 50k SMALL jobs, not one
  * 50k-deep plan.
  *
  * Determinism (what makes a rows-only gate meaningful): the argmax
  * tie-breaks on (freq desc, left asc, right asc), so the merge
  * sequence is a pure function of the corpus — independent of
  * partitioning, parallelism, and run order (spec-pinned by training
  * on repartitioned copies).
  *
  * Why the encoder is a UDF (the engine's stated preference is
  * Column math / native expressions): encoding is the rank-greedy
  * merge loop — a data-dependent fixpoint per word — which Column
  * algebra cannot express and a native Expression would re-implement
  * as the same JVM loop without the broadcast rank map's per-task
  * word cache (natural text repeats words; the cache makes the
  * common case a hash lookup). Same exemption class as the other
  * iterative kernels (SURVEY §5).
  */
object Bpe {

  /** end-of-word marker appended to every word's symbol sequence
    * before training/encoding (standard BPE: lets merges distinguish
    * word-final units, e.g. "est&lt;/w&gt;" vs mid-word "est").
    * Word-split mode only — marker mode has no end sentinel (the ▁
    * word-START marker plays the boundary role, the SentencePiece
    * convention). */
  val EndOfWord = "</w>"

  /** SentencePiece ▁-marker mode (`marker = true` on
    * [[train]]/[[encode]]/[[tokenCount]]/[[seedPairCounts]]) — the
    * BPE half of VERDICT r17 item 6, sharing [[Unigram]]'s r18
    * pre-tokenizer exactly ([[Unigram.markerWordsJvm]] /
    * [[TextFunctions.markerTokens]]): Locale.ROOT lower, one dummy
    * leading space, each ASCII-whitespace char → ▁ (U+2581,
    * multi-space preserved), words = maximal `▁+[^▁]*` runs. Two
    * deltas vs word-split mode, both the Kudo & Richardson 2018
    * (arXiv:1808.06226) BPE convention that T5/Llama-style vocabs
    * assume: whitespace is PIECE-INTERNAL (so "▁the" can become one
    * unit and decoding is exact — [[Unigram.markerDecode]] works on
    * BPE pieces unchanged: concatenate, ▁ → space, drop the dummy),
    * and there is NO [[EndOfWord]] sentinel (▁ already marks every
    * word start, so word-final units are distinguishable as
    * next-piece-starts-with-▁; an end sentinel would double-mark).
    * The training shape is untouched: same one corpus pass, same
    * bounded distinct-word table (▁ enters the alphabet like any
    * code point), same argmax tie-break.
    *
    * Mode safety (the LangId-stamp discipline, ADVICE r17): train()
    * stamps `__marker` constant on every output row, and encode()
    * REFUSES a table whose stamp contradicts its `marker` flag — a
    * marker table served word-split (or vice versa) would segment
    * every document wrong, not slow. Unstamped tables (pre-r18, or
    * hand-built) are accepted as caller-asserted. */
  private val MarkerStampCol = "__marker"

  /** Byte-level mode (`byteLevel = true` — the GPT-2/RoBERTa
    * convention, Radford et al. 2019 §2.2, clean-room from the
    * published algorithm description): BPE runs over UTF-8 BYTES
    * mapped to a 256-char printable alphabet, so any string —
    * any script, any emoji, any mojibake — tokenizes with ZERO
    * out-of-vocabulary outcomes and no char fallback. Three deltas
    * vs the other modes:
    *
    *  - Pre-tokenization is the GPT-2 regex ([[ByteLevelPattern]]):
    *    contractions, optional-leading-space letter/digit/punct
    *    runs, and whitespace runs (the `\s+(?!\S)` lookahead keeps
    *    the LAST space of a run attached to the following word).
    *    Case is PRESERVED — GPT-2 vocabs are cased; the ROOT
    *    lowering of the other modes does not apply (documented
    *    divergence, spec-pinned).
    *  - Each pre-token becomes its UTF-8 bytes mapped through
    *    [[byteToChar]] (printable bytes map to themselves; the 68
    *    others to U+0100+n in byte order — space→Ġ, newline→Ċ, the
    *    published table reconstructed from its generation rule).
    *    Merges then ride 256 seed symbols; no [[EndOfWord]] sentinel
    *    (the Ġ space-prefix marks word starts, as ▁ does in marker
    *    mode).
    *  - [[byteDecode]] is the exact inverse as COLUMN math: pieces
    *    concatenate, chars translate back to their latin-1 byte
    *    view, and the encode/decode pair re-reads the bytes as
    *    UTF-8 — guarded by [[graft.functions.Mojibake]]'s validity
    *    grammar (ANSI decode throws on malformed input), null on a
    *    corrupt piece stream.
    *
    * Training shape is untouched: the same one corpus pass, the same
    * Heaps-bounded distinct-pretoken table, the same argmax
    * tie-break; `__byte` is stamped next to `__marker` and encode
    * refuses any mode mismatch. */
  val ByteLevelPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+"

  private val ByteStampCol = "__byte"

  /** byte → mapped char (256 entries): printable bytes 0x21–0x7E,
    * 0xA1–0xAC, 0xAE–0xFF keep their own code point; the remaining
    * 68 map to U+0100+n counting excluded bytes in ascending order —
    * the GPT-2 bytes_to_unicode rule (so 0x20→U+0120 Ġ, 0x0A→U+010A
    * Ċ; BpeSpec pins the anchors). */
  private[graft] val byteToChar: Array[Char] = {
    val keep = ((0x21 to 0x7E) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = (0x100 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  private val ByteLevelRe =
    java.util.regex.Pattern.compile(ByteLevelPattern)

  /** GPT-2 pre-tokens of `text` (RAW — mapping to the byte alphabet
    * happens per-symbol in [[toSymbols]]); the JVM twin of the
    * column-side `regexp_extract_all` over the SAME Java pattern, so
    * train == encode exactly. */
  private[graft] def byteLevelWordsJvm(text: String): Array[String] = {
    val m = ByteLevelRe.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  /** exact inverse of byte-level [[encode]] as a Column: concatenate
    * the pieces, translate each mapped char back to its raw byte's
    * latin-1 view, re-read the bytes as UTF-8. Null (fail-soft) when
    * the piece stream is not a valid byte sequence — a foreign char
    * in a corrupted vocab, or pieces that decode to malformed UTF-8;
    * the validity grammar runs BEFORE the decode because ANSI decode
    * throws, it does not replace. */
  def byteDecode(pieces: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column = {
    val from = new String(byteToChar)
    val to = new String(Array.tabulate[Char](256)(_.toChar))
    val latin1 = translate(array_join(pieces, ""), from, to)
    when(graft.functions.Mojibake.latin1Representable(latin1) &&
      graft.functions.Mojibake.utf8ValidLatin1View(latin1),
      org.apache.spark.sql.functions.decode(
        org.apache.spark.sql.functions.encode(latin1, "ISO-8859-1"),
        "UTF-8"))
      .otherwise(lit(null).cast("string"))
  }

  /** Learn `numMerges` BPE merges from `textCol` over the corpus.
    * Words are [[TextFunctions.tokensRoot]] (ROOT-lowercased whitespace
    * tokens — the encoder's exact lowering) so learned units agree
    * with every other token metric in the engine. Returns (rank int, left string, right string,
    * freq long) ordered by rank — `freq` is the corpus-wide count of
    * the merged pair at the moment it won. Stops early when no
    * remaining pair reaches `minFreq` (so ranks are dense but the
    * result may be shorter than `numMerges`).
    *
    * Driver cutover (the CC/PageRank precedent): after the one
    * corpus-proportional word-count aggregation, if the DISTINCT-WORD
    * table is at most `driverCutover` rows it is collected and the
    * merge loop runs on the driver with incremental pair-count
    * maintenance (Sennrich's reference algorithm) — `numMerges`
    * iterations then cost zero Spark jobs instead of `2*numMerges`
    * tiny ones, which dominate wall time at any corpus size (the
    * iteration input is vocabulary-sized, never corpus-sized). Above
    * the cutover the distributed loop runs unchanged. Both paths
    * share the tie-break (freq desc, then left, then right in UTF-8
    * binary order — Spark's native string ordering) so the merge
    * sequence is identical; spec-pinned by forcing each path against
    * the clean-room naive trainer. 2^20 words ≈ tens of MB collected
    * — the same bound class as the CC driver cutover.
    *
    * The cutover is also re-checked MID-LOOP at every lineage cut:
    * the working set only shrinks (fully-merged words retire), so a
    * corpus that starts above the bound finishes on the driver the
    * moment retirement brings it under — an exact continuation (the
    * loop state is the word table; spec-pinned with a forced mid-run
    * cutover). For a corpus whose distinct-word table NEVER fits the
    * driver bound, the distributed tail stays one argmax job per
    * merge — the measured per-merge cost and its 32k-vocab
    * extrapolation live in BENCH_NOTES r10 (`bpe` section); training
    * is one-time/offline, and raising `driverCutover` on a
    * big-memory driver (1e8 words ≈ GBs) is the practical lever. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minFreq: Long = 2L, checkpointEvery: Int = 10,
            driverCutover: Long = 1L << 20,
            marker: Boolean = false,
            byteLevel: Boolean = false): DataFrame = {
    require(!(marker && byteLevel),
      "marker and byteLevel are mutually exclusive pre-tokenizations")
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minFreq >= 1L, s"minFreq must be >= 1, got $minFreq")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    require(driverCutover >= 0L,
      s"driverCutover must be >= 0, got $driverCutover")
    val spark = df.sparkSession
    import spark.implicits._

    // merge list → stamped output table (all three return paths; the
    // __marker stamp is what encode() validates — constant column,
    // free under parquet RLE if the caller persists the table)
    def out(ms: Seq[(String, String, Long)]): DataFrame =
      ms.zipWithIndex
        .map { case ((l, r, f), i) => (i, l, r, f) }
        .toSeq.toDF("rank", "left", "right", "freq")
        .withColumn(MarkerStampCol, lit(marker))
        .withColumn(ByteStampCol, lit(byteLevel))

    var words: Dataset[(Seq[String], Long)] =
      seedWords(df, textCol, marker, byteLevel)
        .localCheckpoint() // materialize once; corpus lineage ends here

    if (words.count() <= driverCutover) {
      val local = words.collect()
      words.unpersist()
      val merges = trainLocal(local, numMerges, minFreq)
      lastTrainPathDiag = "local"
      return out(merges)
    }

    var lastCheckpoint = words
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    while (merges.length < numMerges && !done) {
      // pair-count argmax: explode adjacent symbol pairs weighted by
      // word freq, partial-agg, 1 row to the driver. All Column-math,
      // whole-stage codegen'd.
      val top = pairCounts(words)
        .orderBy(col("f").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minFreq) done = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((l, r, f))
        val next = words
          .map { case (syms, freq) => (mergePair(syms, l, r), freq) }
          .filter((t: (Seq[String], Long)) => t._1.length >= 2)
        if (merges.length % checkpointEvery == 0) {
          val cp = next.localCheckpoint()
          lastCheckpoint.unpersist()
          lastCheckpoint = cp
          words = cp
          // MID-LOOP cutover (r10, the distributed-tail bound): the
          // working set only SHRINKS as fully-merged words retire, so
          // re-check the driver bound at each lineage cut and finish
          // locally the moment it fits — an EXACT continuation, since
          // the loop state IS the word table (spec-pinned against the
          // clean-room trainer with a cutover forced mid-run). The
          // count is one job over the just-materialized checkpoint.
          // driverCutover = 0 still forces pure-distributed end to end.
          if (cp.count() <= driverCutover) {
            val local = cp.collect()
            lastCheckpoint.unpersist()
            merges ++= trainLocal(local, numMerges - merges.length, minFreq)
            lastTrainPathDiag = "distributed+midCutover"
            return out(merges.toSeq)
          }
        } else words = next
      }
    }
    lastCheckpoint.unpersist()
    lastTrainPathDiag = "distributed"
    out(merges.toSeq)
  }

  /** which path the last [[train]] call on this JVM took — DIAGNOSTIC
    * ONLY (spec observability for the mid-loop cutover; meaningless
    * under concurrent trains). */
  @volatile private[graft] var lastTrainPathDiag: String = ""

  /** the single corpus-proportional step, shared by [[train]] and
    * [[seedPairCounts]]: corpus-wide word counts (partial aggregation
    * bounds the exchange to distinct words per map partition), then
    * symbol sequences. Words that are one symbol long after the
    * end-of-word marker (i.e. empty — impossible via tokens(), but
    * cheap to guard) can never contribute a pair and are dropped;
    * train()'s loop re-applies the same filter to retire fully-merged
    * words after each round. */
  private def seedWords(df: DataFrame, textCol: String,
                        marker: Boolean = false,
                        byteLevel: Boolean = false)
  : Dataset[(Seq[String], Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    // tokensRoot, not tokens (r15): encode() lowers with Locale.ROOT,
    // so the trained merges must too — on tr/az/lt-default JVMs the
    // Spark lower() twin would count different words than encode sees.
    // Marker mode rides markerTokens, the column twin of encode's
    // markerWordsJvm; byte-level rides the SAME Java regex as
    // byteLevelWordsJvm (Spark regexp_* are Java regex, lookahead
    // included) and preserves case — same train == encode discipline.
    val toks =
      if (byteLevel)
        regexp_extract_all(col(textCol), lit(ByteLevelPattern), lit(0))
      else if (marker) TextFunctions.markerTokens(col(textCol))
      else TextFunctions.tokensRoot(col(textCol))
    df.select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (toSymbols(w, marker, byteLevel), f) }
      .filter((t: (Seq[String], Long)) => t._1.length >= 2)
  }

  /** frequency-weighted adjacent-pair counts of a symbol table —
    * the aggregation each [[train]] iteration argmaxes over. */
  private def pairCounts(words: Dataset[(Seq[String], Long)]): DataFrame =
    words.toDF("syms", "freq")
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("f"))

  /** The SQL-expressible fragment of [[train]], exposed for the
    * oracle gate (q132): pair counts over the SEED symbol table —
    * exactly the aggregation whose (f desc, l asc, r asc) argmax is
    * train()'s FIRST merge, by construction (both ride [[seedWords]]
    * + [[pairCounts]]). The iterative tail stays spec-pinned
    * (BpeSpec's clean-room equality); this puts the corpus-pass and
    * first-argmax semantics under the same DuckDB discipline as
    * every other aggregation family. */
  def seedPairCounts(df: DataFrame, textCol: String,
                     marker: Boolean = false,
                     byteLevel: Boolean = false): DataFrame =
    pairCounts(seedWords(df, textCol, marker, byteLevel))

  /** driver-side merge loop for a collected distinct-word table.
    * Incremental pair-count maintenance: only words CONTAINING the
    * winning pair are touched per iteration (their old adjacent-pair
    * contributions retracted, the merge applied, new contributions
    * added), so iteration cost tracks the pair's support, not the
    * vocabulary. `where` is a stale-tolerant inverted index pair →
    * word ids (membership re-checked on use — a later merge may have
    * destroyed the pair in that word). Same argmax and tie-break as
    * the distributed loop (freq desc, left/right UTF-8-binary asc). */
  private def trainLocal(input: Array[(Seq[String], Long)], numMerges: Int,
                         minFreq: Long): Seq[(String, String, Long)] = {
    val syms = input.map(_._1.toArray)
    val freqs = input.map(_._2)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val where = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.BitSet]
    def contribute(i: Int, sign: Long): Unit = {
      val s = syms(i); val f = freqs(i) * sign
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) + f
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0L)
          where.getOrElseUpdate(
            p, scala.collection.mutable.BitSet.empty) += i
        j += 1
      }
    }
    var i = 0
    while (i < syms.length) { contribute(i, 1L); i += 1 }
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (merges.length < numMerges && !done) {
      var bf = 0L; var bl: String = null; var br: String = null
      counts.foreach { case ((l, r), f) =>
        if (f > bf ||
            (f == bf && bf > 0L &&
              (utf8Lt(l, bl) || (l == bl && utf8Lt(r, br)))))
          { bf = f; bl = l; br = r }
      }
      if (bf < minFreq) done = true
      else {
        merges += ((bl, br, bf))
        where.remove((bl, br)).foreach(_.foreach { w =>
          val s = syms(w)
          var has = false; var j = 0
          while (!has && j + 1 < s.length) {
            if (s(j) == bl && s(j + 1) == br) has = true
            j += 1
          }
          if (has) {
            contribute(w, -1L)
            val merged = mergePair(s.toSeq, bl, br)
            syms(w) = if (merged.length >= 2) merged.toArray
                      else Array.empty[String]
            if (syms(w).nonEmpty) contribute(w, 1L)
          }
        })
      }
    }
    merges.toSeq
  }

  /** a < b in UTF-8 unsigned-byte order — Spark's native string sort
    * order, so the local argmax tie-break matches `orderBy(asc)` in
    * the distributed loop (UTF-16 `String.compareTo` diverges for
    * supplementary-plane code points). Package-visible: [[Unigram]]
    * shares the same tie-break discipline. */
  private[operators] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** seed symbols for a word: one per Unicode CODE POINT (a
    * char-level split would shear surrogate pairs — emoji and
    * supplementary-plane CJK would train/encode as broken halves),
    * plus the end-of-word marker — word-split mode only: in ▁-marker
    * mode the word-START marker is already a symbol of the word
    * itself and there is no end sentinel (SentencePiece convention;
    * see the marker-mode scaladoc at the top of this object). */
  private def toSymbols(w: String, marker: Boolean = false,
                        byteLevel: Boolean = false): Seq[String] = {
    if (byteLevel)
      // one symbol per UTF-8 BYTE, through the 256-char map — no
      // sentinel (Ġ marks word starts), no surrogate concern (every
      // mapped char is a single BMP char)
      return w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => byteToChar(b & 0xFF).toString).toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    if (!marker) out += EndOfWord
    out.toSeq
  }

  /** one left-to-right merge pass: every non-overlapping occurrence
    * of (l, r) becomes l+r (overlaps resolve leftmost-first — the
    * standard convention, and the one the encoder mirrors). */
  private def mergePair(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = syms.length
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Encode `textCol` with a trained merge table: adds `outCol` as
    * array&lt;string&gt; of subword tokens (word-final tokens carry
    * the [[EndOfWord]] marker). The merge table is collected and
    * broadcast as a rank map (it is vocabulary-sized — broadcast
    * material by construction); each task additionally memoizes
    * word → tokens, so repeated words (natural text: most of them)
    * cost a hash lookup, not a merge loop. Rank-greedy encoding
    * (repeatedly merge the lowest-rank adjacent pair) is equivalent
    * to replaying merges in rank order — pinned in BpeSpec against
    * the naive replay. */
  def encode(df: DataFrame, textCol: String, merges: DataFrame,
             outCol: String = "bpe_tokens",
             marker: Boolean = false,
             byteLevel: Boolean = false): DataFrame = {
    require(!(marker && byteLevel),
      "marker and byteLevel are mutually exclusive pre-tokenizations")
    // __marker/__byte stamp validation (the LangId-stamp discipline):
    // a table trained in one pre-tokenization served in another
    // would segment every document WRONG, so refuse loudly. The
    // table is vocabulary-sized and collected below anyway; the
    // stamp check rides the same collect. Unstamped tables
    // (pre-r18/hand-built) pass as caller-asserted.
    def stamp(name: String, asserted: Boolean) =
      if (merges.columns.contains(name)) col(name).cast("boolean")
      else lit(asserted).as(name)
    val rows = merges.select(col("rank"), col("left"), col("right"),
        stamp(MarkerStampCol, marker), stamp(ByteStampCol, byteLevel))
      .collect()
    rows.foreach { r =>
      def check(i: Int, name: String, asserted: Boolean): Unit =
        require(r.isNullAt(i) || r.getBoolean(i) == asserted,
          s"merge-table $name stamp is ${r.getBoolean(i)} but encode " +
            s"was called with $name mode = $asserted — a table cannot " +
            "be served in a pre-tokenization it was not trained in " +
            "(every document would segment wrong); re-train or flip " +
            "the flag")
      check(3, MarkerStampCol, marker)
      check(4, ByteStampCol, byteLevel)
    }
    val ranked = rows
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val bc = df.sparkSession.sparkContext.broadcast(ranked)
    // per-task word memo, SIZE-CAPPED: natural text obeys Heaps' law
    // (a task's distinct words plateau far below the cap), but an
    // adversarial corpus of never-repeating words must not grow the
    // map without bound — once full, new words still encode, they
    // just stop memoizing. 2^17 entries ≈ tens of MB worst case.
    val memoCap = 1 << 17
    val cache = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    val enc = udf { (text: String) =>
      if (text == null) null
      else {
        val ranks = bc.value
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
          if (byteLevel) byteLevelWordsJvm(text)
          else if (marker) Unigram.markerWordsJvm(text)
          else text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
            .filter(_.nonEmpty)
        words.flatMap { w =>
            var hit = cache.get(w)
            if (hit == null) {
              hit = encodeWord(w, ranks, marker, byteLevel)
              if (cache.size < memoCap) cache.put(w, hit)
            }
            hit
          }.toSeq
      }
    }
    df.withColumn(outCol, enc(col(textCol)))
  }

  /** [[encode]] reduced to the budgeting signal: token count per row
    * (null text → null, matching tokenCount's null behavior). */
  def tokenCount(df: DataFrame, textCol: String, merges: DataFrame,
                 outCol: String = "bpe_count",
                 marker: Boolean = false,
                 byteLevel: Boolean = false): DataFrame = {
    val enc = encode(df, textCol, merges, "__bpe_toks", marker, byteLevel)
    enc.withColumn(outCol, size(col("__bpe_toks"))).drop("__bpe_toks")
  }

  /** rank-greedy fixpoint for one word (already lowercased,
    * whitespace-free): merge the lowest-rank adjacent pair until no
    * adjacent pair is in the table. */
  private def encodeWord(w: String,
                         ranks: Map[(String, String), Int],
                         marker: Boolean = false,
                         byteLevel: Boolean = false): Seq[String] = {
    var syms: Seq[String] = toSymbols(w, marker, byteLevel)
    var continue = syms.length >= 2
    while (continue) {
      var best = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i + 1 < syms.length) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; bl = syms(i); br = syms(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else syms = mergePair(syms, bl, br)
    }
    syms
  }
}
