package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import TextFunctions.bound

/** Character-level quality rules for space-free scripts (r18,
  * VERDICT r17 item 1) — the CJK siblings of the whitespace-token
  * stack in [[TextFunctions]].
  *
  * The published heuristic pipelines (Gopher, Rae et al. 2021 A1;
  * C4, Raffel et al. 2020 §2.2) define their rules over
  * whitespace-delimited English, so [[TextFunctions.gopherFlags]] /
  * [[TextFunctions.c4CleanLines]] deliberately FAIL CLOSED on
  * zh/ja/ko (CjkScopeSpec) — which made ~15–20% of a real crawl
  * unprocessable beyond language id. This object restores that slice
  * with rules whose unit is the CHARACTER, the only segmentation-free
  * unit a space-free script offers:
  *
  *  - [[charEntropy]] — Shannon entropy (bits) of the non-whitespace
  *    character distribution. Natural CJK prose draws from hundreds
  *    of distinct hanzi/kana per page (entropy well above 3 bits);
  *    spam/boilerplate collapses to a few repeated characters
  *    (entropy near 0). The character-distribution sibling of
  *    Gopher's word-count + stopword evidence.
  *  - [[charRepetitionRatio]] — fraction of character n-gram
  *    occurrences that repeat an earlier n-gram, the character
  *    sibling of [[TextFunctions.repetitionRatio]] (Gopher A1.2's
  *    duplicate-n-gram family): catches the repeated-phrase spam
  *    that is INVISIBLE to word-gram rules inside an unsegmented
  *    line (CjkScopeSpec pins that blindness).
  *  - [[cjkQualityFlags]] — the per-document flag struct in the
  *    [[TextFunctions.gopherFlags]] shape: char count band, entropy
  *    floor, char-5-gram repetition ceiling, sentence-terminal
  *    presence (CJK has sentence-final punctuation: 。！？), plus
  *    `pass` = conjunction; null text → every flag false.
  *  - [[c4CleanLinesCjk]] — the C4 §2.2 line rules re-expressed in
  *    characters: a kept line ends in CJK or ASCII terminal
  *    punctuation, carries at least `minCharsPerLine` non-whitespace
  *    characters, and does not contain "javascript".
  *  - [[scriptOf]] / [[qualityPassByScript]] / [[c4CleanByScript]] —
  *    the LangId-dispatched router: zh/ja/ko flow through the
  *    character rules, everything else through the published
  *    whitespace-token rules, so a mixed corpus is processed
  *    end-to-end instead of dropping its CJK slice.
  *
  * Thresholds are engine defaults, parameterized: no published CJK
  * thresholds exist for the Gopher/C4 families (both papers are
  * English-only), so the defaults are chosen conservative and every
  * knob is a parameter — documented engine policy, not paper claims.
  *
  * Everything is pure `org.apache.spark.sql.functions` column math —
  * one codegen projection per document, zero shuffles, zero UDFs —
  * and every step (char extraction by substr, run-length grouping,
  * gram counting) replays in ANSI SQL list lambdas, so the gate
  * hashes the shipped arithmetic (the q262 discipline). At 100 TB
  * this is scan-rate work: O(L log L) per document (the entropy
  * sort), embarrassingly parallel.
  */
object CjkQuality {

  /** whitespace class used for char extraction/trim: Java `\\s` is
    * ASCII-only, so U+3000 (the ideographic space CJK pages actually
    * use) is listed explicitly — same literal class on the DuckDB
    * side (RE2 `\\s` is ASCII-only too, so the parity is exact) */
  private[graft] val Ws = "[\\s\u3000]"

  /** the space-free-script language codes the dispatcher routes to
    * the character rules (th/lo/km/my are also space-free; extend
    * per corpus via the `cjkLangs` parameter) */
  val DefaultCjkLangs: Seq[String] = Seq("zh", "ja", "ko")

  /** non-whitespace characters of `text`, one per array element —
    * substr-extracted (not split) so the DuckDB replay is verbatim.
    * Null text → empty array. */
  private[graft] def charsOf(text: Column): Column =
    bound(regexp_replace(coalesce(text, lit("")), Ws + "+", "")) { t =>
      // empty-safe [1..n]: sequence(1, 0) would DESCEND
      transform(slice(sequence(lit(0), length(t)), lit(2), length(t)),
        i => substr(t, i, lit(1)))
    }

  /** Shannon entropy (bits, rounded to 6) of the non-whitespace
    * character distribution; 0.0 for null/empty/all-whitespace text.
    * Computed by run-length grouping the SORTED character array —
    * O(L log L), order-of-sort irrelevant to the result (any total
    * order yields the same runs), so engine/oracle collation parity
    * is a non-issue. One codegen projection, shuffle-free. */
  def charEntropy(text: Column): Column =
    bound(sort_array(charsOf(text))) { sorted =>
      bound(size(sorted)) { n =>
        // run starts: position 1 plus every position whose char
        // differs from its predecessor (And short-circuits in
        // codegen, so the guarded element_at never sees index 0)
        bound(filter(slice(sequence(lit(0), n), lit(2), n),
          i => i === 1 ||
            (i > 1 && element_at(sorted, i - 1) =!=
              element_at(sorted, i)))) { starts =>
          bound(size(starts)) { k =>
            val sumPLogP = aggregate(
              slice(sequence(lit(0), k), lit(2), k), lit(0.0),
              (acc, j) => {
                val next = when(j === k, n + 1)
                  .otherwise(element_at(starts, j + 1))
                val p = (next - element_at(starts, j)).cast("double") /
                  n.cast("double")
                acc + p * log2(p)
              })
            // + 0.0 rewrites IEEE -0.0 (a single-run doc: p = 1,
            // log2 1 = 0, negated) to +0.0 — bit-identical across
            // engines, so the oracle hash never sees a signed zero
            when(n === 0, lit(0.0))
              .otherwise(round(-sumPLogP + lit(0.0), 6))
          }
        }
      }
    }

  /** fraction of character n-gram occurrences that repeat an earlier
    * n-gram: 1 − distinct/total over the whitespace-stripped text
    * (rounded to 6); 0.0 when the text has fewer than n characters.
    * The character sibling of [[TextFunctions.repetitionRatio]] —
    * the rule that SEES repetition inside an unsegmented line. */
  def charRepetitionRatio(text: Column, n: Int = 5): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    bound(regexp_replace(coalesce(text, lit("")), Ws + "+", "")) { t =>
      bound(length(t) - (n - 1)) { total =>
        when(total <= 0, lit(0.0)).otherwise(round(
          lit(1.0) - size(array_distinct(transform(
            slice(sequence(lit(0), total), lit(2), total),
            i => substr(t, i, lit(n))))).cast("double") /
            total.cast("double"), 6))
      }
    }
  }

  /** CJK + ASCII sentence-terminal punctuation (。！？ and full-width
    * ．, ASCII .!?", closing CJK quotes/bracket after a terminal is
    * NOT required — the set is the line-END match class) */
  private[graft] val TerminalClass = "[。！？．.!?\"]"

  /** Character-level quality flags for space-free scripts, in the
    * [[TextFunctions.gopherFlags]] struct shape:
    *   - `char_count_ok`: non-whitespace char count in
    *     [minChars, maxChars] (the word-count band, re-based)
    *   - `entropy_ok`: [[charEntropy]] ≥ minEntropy — natural CJK
    *     prose sits well above 3 bits; character spam collapses
    *   - `char_rep_ok`: [[charRepetitionRatio]] at `repN` ≤ maxRep —
    *     the duplicate-gram ceiling word rules cannot see here
    *   - `punct_ok`: at least one sentence terminal (。！？．.!?")
    *     anywhere — prose, not a tag soup / menu run
    * plus `pass` = conjunction. Null text → every flag false (the
    * gopherFlags fail-safe treatment). Engine-default thresholds —
    * no published CJK numbers exist; every knob is a parameter. */
  def cjkQualityFlags(text: Column, minChars: Int = 50,
                      maxChars: Int = 100000,
                      minEntropy: Double = 3.0,
                      maxRep: Double = 0.2,
                      repN: Int = 5): Column = {
    val nChars = length(regexp_replace(text, Ws + "+", ""))
    val charCountOk = nChars.between(minChars, maxChars)
    val entropyOk = charEntropy(text) >= minEntropy
    val repOk = charRepetitionRatio(text, repN) <= maxRep
    val punctOk = text.rlike(TerminalClass)
    val flags = struct(
      charCountOk.as("char_count_ok"),
      entropyOk.as("entropy_ok"),
      repOk.as("char_rep_ok"),
      punctOk.as("punct_ok"),
      (charCountOk && entropyOk && repOk && punctOk).as("pass"))
    val allFalse = struct(Seq("char_count_ok", "entropy_ok",
      "char_rep_ok", "punct_ok", "pass").map(f => lit(false).as(f)): _*)
    when(text.isNull, allFalse).otherwise(flags)
  }

  /** C4 §2.2 line cleaning re-based on characters (the CJK sibling
    * of [[TextFunctions.c4CleanLines]]): keep only lines that, after
    * stripping surrounding whitespace (the explicit [\\s U+3000]
    * class — Java `\\s` alone would miss the ideographic space, and
    * Spark's trim() strips only 0x20), end in a sentence terminal
    * (。！？．.!?"), carry at least `minCharsPerLine` non-whitespace
    * characters, and do not contain "javascript" (case-insensitive).
    * Retained lines re-join with '\n'; null text → '' (fail-safe).
    * Lines split on `\r?\n` (the CRLF rule). One split + per-line
    * HOF predicates, codegen, shuffle-free. */
  def c4CleanLinesCjk(text: Column, minCharsPerLine: Int = 10): Column =
    array_join(
      filter(transform(split(coalesce(text, lit("")), "\r?\n"),
        l => regexp_replace(regexp_replace(l, "^" + Ws + "+", ""),
          Ws + "+$", "")),
        l => length(l) > 0 &&
          l.rlike(TerminalClass + "$") &&
          length(regexp_replace(l, Ws + "+", "")) >= minCharsPerLine &&
          !lower(l).contains("javascript")),
      "\n")

  /** script class of a language code: 'cjk' for the space-free
    * codes, 'ws' (whitespace-delimited) otherwise — INCLUDING null
    * (an unidentified document routes to the whitespace rules, which
    * fail closed on space-free text, so the conservative direction
    * is preserved: nothing space-free is ever silently admitted
    * through word rules). */
  def scriptOf(lang: Column,
               cjkLangs: Seq[String] = DefaultCjkLangs): Column =
    when(lang.isin(cjkLangs.map(x => x: Any): _*), "cjk")
      .otherwise("ws")

  /** the LangId-dispatched quality gate: zh/ja/ko documents judge by
    * [[cjkQualityFlags]].pass, everything else by
    * [[TextFunctions.gopherFlags]].pass — one when() per row, both
    * branches codegen'd, only the matched branch evaluated. This is
    * the router that turns the CjkScopeSpec fail-closed contract
    * into flow-through processing for the CJK slice of a crawl. */
  def qualityPassByScript(text: Column, lang: Column,
                          cjkLangs: Seq[String] = DefaultCjkLangs)
  : Column =
    when(scriptOf(lang, cjkLangs) === "cjk",
      cjkQualityFlags(text).getField("pass"))
      .otherwise(TextFunctions.gopherFlags(text).getField("pass"))

  /** the LangId-dispatched C4 line cleaner: [[c4CleanLinesCjk]] for
    * zh/ja/ko, [[TextFunctions.c4CleanLines]] otherwise. */
  def c4CleanByScript(text: Column, lang: Column,
                      cjkLangs: Seq[String] = DefaultCjkLangs)
  : Column =
    when(scriptOf(lang, cjkLangs) === "cjk", c4CleanLinesCjk(text))
      .otherwise(TextFunctions.c4CleanLines(text))
}
