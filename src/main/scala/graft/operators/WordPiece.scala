package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
