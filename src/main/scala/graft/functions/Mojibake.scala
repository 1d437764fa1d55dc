package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Encoding-quality signals + guarded mojibake repair (r18) — the
  * character-encoding dimension of corpus quality that every
  * web-crawl pipeline needs next to the linguistic rules: crawled
  * text arrives mislabeled (UTF-8 bytes served as Latin-1/CP1252 —
  * "café" → "cafÃ©", a curly apostrophe → "â€™"), truncated
  * mid-sequence (U+FFFD replacement chars), or carrying raw control
  * bytes. The detectors and the repair below are the column-math
  * core of what the ftfy tool (Speer 2019, zenodo 2591652) calls
  * "fixing text"; clean-room from the published description: detect
  * the BYTE-LEVEL signature of a UTF-8 sequence viewed through a
  * single-byte charset, and undo it only when the undo is provably
  * safe.
  *
  * Everything here is pure `Column` math (regexp counts + the
  * codegen'd encode/decode pair) — no UDF, one projection, shuffle
  * free; at 100 TB these ride the same scan as every other quality
  * flag. Character classes are built from explicit code points
  * (below), never source-literal control characters.
  *
  * Detection: [[mojibakeCount]] counts non-overlapping matches of
  * LEAD CONT where LEAD = U+00C2–U+00F4 (the Latin-1 view of a
  * UTF-8 lead byte 0xC2–0xF4) and CONT = U+0080–U+00BF (the Latin-1
  * view of a continuation byte) ∪ the 27 CP1252 printables mapped
  * from bytes 0x80–0x9F (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ‘ ’ “ ” • – — ˜
  * ™ š › œ ž Ÿ — the CP1252 view of those same continuation bytes).
  * Each misdecoded code point contributes EXACTLY one match (the
  * lead pairs with its first continuation; remaining continuations
  * are not leads), so the count equals the number of misdecoded
  * characters — the property q272's oracle replays. Legitimate
  * accented text almost never matches (é/à/ß are followed by
  * ordinary letters, in neither CONT class); the residual
  * false-positive risk ("Ã©" as intentional text) is the documented
  * ftfy trade-off, bounded by the repair guard below.
  *
  * Repair: [[fixDoubleUtf8]] re-reads the text's Latin-1 bytes as
  * UTF-8 — but ONLY when (a) at least one mojibake signature is
  * present, (b) every char is ≤ U+00FF (so the Latin-1 re-encode is
  * exact), and (c) the Latin-1 byte view is VALID UTF-8, checked by
  * [[utf8ValidLatin1View]]'s full-match grammar BEFORE any decode —
  * under ANSI mode Spark's `decode` throws on malformed input, so
  * the guard is what makes the repair total, not just correct
  * (CaseWhen short-circuits in codegen; the decode never sees
  * unvalidated bytes). Text that fails any guard passes through
  * UNTOUCHED — fail-open, the quality flags still name it.
  *
  * CP1252-coded mojibake (the "â€™" family) is DETECTED but not
  * repaired: Spark's encode/decode pair does not speak CP1252, and a
  * Latin-1 re-encode of € would be lossy — guard (b) refuses it.
  * Detected-unrepairable documents are exactly the
  * `moji_ratio > 0 && fixDoubleUtf8 unchanged` slice, routable to
  * drop. */
object Mojibake {

  /** one char (as a string) from a code point — regex-class building
    * block; every class below is explicit code points, no
    * source-literal control chars. */
  private def c(cp: Int): String = new String(Character.toChars(cp))
  private def rng(a: Int, b: Int): String = c(a) + "-" + c(b)

  /** Latin-1 view of UTF-8 lead bytes 0xC2–0xF4. */
  private val Lead = "[" + rng(0xC2, 0xF4) + "]"

  /** CP1252 printables at bytes 0x80–0x9F (0x81/8D/8F/90/9D are
    * undefined in CP1252 and already covered by the C1 range). */
  private val Cp1252Cont = Seq(0x20AC, 0x201A, 0x0192, 0x201E, 0x2026,
    0x2020, 0x2021, 0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x017D,
    0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014, 0x02DC,
    0x2122, 0x0161, 0x203A, 0x0153, 0x017E, 0x0178).map(c).mkString

  /** Latin-1 continuation view ∪ CP1252 printable continuation view. */
  private val Cont = "[" + rng(0x80, 0xBF) + Cp1252Cont + "]"

  private val MojiPattern = Lead + Cont

  /** number of misdecoded-character signatures in `text` (one per
    * mojibake'd code point — see object doc); null text → null. */
  def mojibakeCount(text: Column): Column =
    when(text.isNull, lit(null).cast("int"))
      .otherwise(size(regexp_extract_all(text, lit(MojiPattern), lit(0))))

  /** U+FFFD replacement chars per char; 0.0 for empty, null for null. */
  def replacementRatio(text: Column): Column =
    charRatio(text, "[" + c(0xFFFD) + "]")

  /** control chars (C0 minus \t\n\r, DEL, C1) per char. The C1 range
    * doubles as the Latin-1-misdecode residue class — mojibake that
    * the pair signature misses still raises this ratio. */
  def controlRatio(text: Column): Column =
    charRatio(text, "[" + rng(0x00, 0x08) + c(0x0B) + c(0x0C) +
      rng(0x0E, 0x1F) + rng(0x7F, 0x9F) + "]")

  /** mojibake signatures per char; 0.0 for empty, null for null. */
  def mojibakeRatio(text: Column): Column =
    when(text.isNull, lit(null).cast("double"))
      .otherwise(when(length(text) === 0, lit(0.0))
        .otherwise(mojibakeCount(text).cast("double") /
          length(text).cast("double")))

  private def charRatio(text: Column, cls: String): Column =
    when(text.isNull, lit(null).cast("double"))
      .otherwise(when(length(text) === 0, lit(0.0))
        .otherwise(
          size(regexp_extract_all(text, lit(cls), lit(0))).cast("double") /
            length(text).cast("double")))

  /** every char ≤ U+00FF, so a Latin-1 re-encode is byte-exact. */
  def latin1Representable(text: Column): Column =
    !text.rlike("[^" + rng(0x00, 0xFF) + "]")

  /** the text's chars, read as Latin-1 BYTES, form valid UTF-8 —
    * the RFC 3629 grammar as a full-match regex over the char view
    * (U+0000–U+00FF ↔ bytes 1:1). This is the totality guard for
    * [[fixDoubleUtf8]]: under ANSI, `decode(_, 'UTF-8')` THROWS on
    * malformed input, so validity must be established in column
    * math first. */
  def utf8ValidLatin1View(text: Column): Column = {
    def cl(s: String) = "[" + s + "]"
    val cont = cl(rng(0x80, 0xBF))
    text.rlike("^(?:" + cl(rng(0x00, 0x7F)) +
      "|" + cl(rng(0xC2, 0xDF)) + cont +
      "|" + c(0xE0) + cl(rng(0xA0, 0xBF)) + cont +
      "|" + cl(rng(0xE1, 0xEC) + rng(0xEE, 0xEF)) + cont + "{2}" +
      "|" + c(0xED) + cl(rng(0x80, 0x9F)) + cont +
      "|" + c(0xF0) + cl(rng(0x90, 0xBF)) + cont + "{2}" +
      "|" + cl(rng(0xF1, 0xF3)) + cont + "{3}" +
      "|" + c(0xF4) + cl(rng(0x80, 0x8F)) + cont + "{2})*$")
  }

  /** what `text` would look like served as Latin-1: its UTF-8 bytes
    * re-read one-char-per-byte. The corruption [[fixDoubleUtf8]]
    * inverts; exposed for fixtures, oracles, and what-if audits. */
  def latin1Misdecode(text: Column): Column =
    decode(encode(text, "UTF-8"), "ISO-8859-1")

  /** guarded double-UTF-8 repair (see object doc): re-read the
    * Latin-1 byte view as UTF-8 when the mojibake signature is
    * present AND the undo is provably exact + total; otherwise the
    * text passes through untouched. `fixDoubleUtf8(latin1Misdecode(t))
    * === t` for every `t` (MojibakeSpec + q272 pin it). */
  def fixDoubleUtf8(text: Column): Column =
    when(text.isNull, text)
      .when(mojibakeCount(text) > 0 && latin1Representable(text) &&
        utf8ValidLatin1View(text),
        decode(encode(text, "ISO-8859-1"), "UTF-8"))
      .otherwise(text)

  /** per-document encoding-quality struct in the
    * [[TextFunctions.gopherFlags]] shape: the three ratios plus
    * `pass` = all under their ceilings (defaults: any replacement or
    * mojibake signature fails; up to 1% control chars tolerated —
    * crawls carry stray ZWSP/soft-hyphen-class bytes at low rates in
    * otherwise fine text). Null text → null ratios, pass false. */
  def encodingQualityFlags(text: Column,
                           maxReplacementRatio: Double = 0.0,
                           maxControlRatio: Double = 0.01,
                           maxMojibakeRatio: Double = 0.0): Column = {
    val repl = replacementRatio(text)
    val ctrl = controlRatio(text)
    val moji = mojibakeRatio(text)
    struct(
      repl.as("repl_ratio"),
      ctrl.as("ctrl_ratio"),
      moji.as("moji_ratio"),
      coalesce(repl <= maxReplacementRatio &&
        ctrl <= maxControlRatio &&
        moji <= maxMojibakeRatio, lit(false)).as("pass"))
  }
}
