package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Raw-HTML main-content extraction — the ingest stage UPSTREAM of
  * every cleaning rule in this repo (VERDICT r15 item 1): C4 and
  * RefinedWeb both start from WARC/HTML, and
  * [[graft.functions.TextFunctions.c4CleanLines]] /
  * [[Repetition.gopherRepetitionFlags]] / [[Repetition.dropCommonLines]]
  * all assume pre-extracted text. Clean-room from the published
  * block-density heuristics: jusText (Pomikálek 2011, "Removing
  * Boilerplate and Duplicate Content from Web Corpora", ch. 5 — the
  * length / stopword-density / link-density block classifier with its
  * published defaults) and the readability/Boilerpipe family
  * (Kohlschütter et al. 2010, WSDM — text-vs-tag density
  * segmentation). No HTML parser dependency: tags are handled with
  * regex/state-free column math, which is exactly what the papers'
  * own preprocessing does (jusText §5.1 segments on a fixed list of
  * block-level tags).
  *
  * Pipeline (every step a per-row Column expression — embarrassingly
  * parallel, shuffle-free, whole-stage codegen; the 100 TB shape is
  * "one projection over the scan"):
  *
  *   1. DROP invisible content: `<script>`/`<style>`/`<noscript>`/
  *      `<template>` elements (with their bodies) and `<!-- -->`
  *      comments.
  *   2. SEGMENT into blocks on block-level tag boundaries (`p`, `div`,
  *      `h1..h6`, `li`, `ul`, `ol`, `table`, `tr`, `td`, `th`,
  *      `section`, `article`, `header`, `footer`, `nav`, `aside`,
  *      `blockquote`, `pre`, `form`, `br`, `hr`, `body`, `html`,
  *      `head`, `title`, `main`, `figure`, `figcaption`, `dl`, `dt`,
  *      `dd` — jusText's block-tag list).
  *   3. Per block: `link_density` = anchor-text chars / text chars
  *      (text = tag-stripped, entity-decoded, whitespace-collapsed);
  *      `stop_density` = stopword tokens / tokens
  *      ([[TextFunctions.defaultStopwords]] — the engine's English
  *      list; jusText ships per-language lists, same shape).
  *   4. CLASSIFY context-free (jusText ch. 5, published defaults
  *      `maxLinkDensity` 0.2, `lengthLow` 70, `lengthHigh` 200,
  *      `stopwordsLow` 0.30, `stopwordsHigh` 0.32):
  *        - link_density > maxLinkDensity            → BAD
  *        - contains © / &copy;                      → BAD
  *        - len < lengthLow → BAD if any link chars, else SHORT
  *        - stop_density > stopwordsHigh →
  *            GOOD if len > lengthHigh else NEARGOOD
  *        - stop_density > stopwordsLow              → NEARGOOD
  *        - otherwise                                → BAD
  *   5. SMOOTH one step (the documented simplification of jusText's
  *      context-sensitive nearest-good/bad pass): SHORT/NEARGOOD
  *      become GOOD iff an ADJACENT block (previous or next, in
  *      document order over non-empty blocks) is context-free GOOD;
  *      otherwise BAD. One array pass with element_at — per-doc
  *      bounded, no window, no shuffle.
  *   6. Output: GOOD blocks' text joined with '\n' (one line per
  *      block — feeds [[graft.functions.TextFunctions.c4CleanLines]]
  *      and [[Repetition.dropCommonLines]] directly).
  *
  * Conventions: entity decode covers the named set &amp; &lt; &gt;
  * &quot; &#39; &apos; &nbsp; (applied AFTER tag-stripping, in that
  * order, &amp; last so "&amp;lt;" decodes to "&lt;" not "<");
  * malformed/unclosed tags degrade gracefully (an unclosed `<a>`
  * counts its text as link text to the next `</a>` or not at all —
  * fail-soft, never an error); null html → empty output. Everything
  * is RE2-compatible regex (no lookaround/backreferences) so the
  * DuckDB oracle replays the chain verbatim.
  */
object Extract {

  /** published jusText defaults (Pomikálek 2011, ch. 5) */
  val MaxLinkDensity = 0.2
  val LengthLow = 70
  val LengthHigh = 200
  val StopwordsLow = 0.30
  val StopwordsHigh = 0.32

  /** Per-language stopword lists for the `stopwords` knob — the
    * published companion to the thresholds: jusText ships one list
    * per language (generated from corpus word frequency, Pomikálek
    * 2011 §5.2), and stop_density is meaningless under a list from
    * the wrong language (a French page scores ~0 English stopwords
    * and every block classifies BAD). Clean-room lists of each
    * language's highest-frequency function words, the same
    * construction; "en" is the engine's default list. Pick with
    * [[stopwordsFor]] — downstream of [[graft.operators.LangId]]
    * when the corpus carries no language column. */
  val stopwordLists: Map[String, Seq[String]] = Map(
    "en" -> TextFunctions.defaultStopwords,
    "fr" -> Seq("le", "la", "les", "de", "des", "du", "un", "une",
      "et", "ou", "que", "qui", "dans", "pour", "sur", "avec",
      "est", "ce", "il", "elle", "au", "aux", "pas", "par", "plus"),
    "de" -> Seq("der", "die", "das", "und", "oder", "in", "von",
      "zu", "den", "mit", "ist", "auf", "für", "nicht", "ein",
      "eine", "dem", "des", "an", "auch", "als", "bei", "aus"))

  /** the stopword list for `lang` (fallback: the English default) */
  def stopwordsFor(lang: String): Seq[String] =
    stopwordLists.getOrElse(lang, TextFunctions.defaultStopwords)

  private val blockTags =
    "p|div|h[1-6]|li|ul|ol|table|thead|tbody|tfoot|tr|td|th|section|" +
      "article|header|footer|nav|aside|blockquote|pre|form|br|hr|" +
      "body|html|head|title|main|figure|figcaption|dl|dt|dd"

  /** [1..n] that is EMPTY for n = 0: sequence(1, 0) would generate a
    * DESCENDING [1, 0] (Spark's default step is sign-of-range — the
    * q253 lesson), so build [0..n] and slice off the 0. */
  private def seq1toN(n: Column): Column =
    slice(sequence(lit(0), n), lit(2), n)

  /** the elements whose CONTENT is invisible and must die with the
    * tags; comments too */
  private def dropInvisible(html: Column): Column = {
    val noComments =
      regexp_replace(coalesce(html, lit("")), "(?s)<!--.*?-->", " ")
    Seq("script", "style", "noscript", "template").foldLeft(noComments) {
      (c, t) => regexp_replace(c, s"(?is)<$t[^>]*>.*?</$t>", " ")
    }
  }

  /** strip every remaining tag, decode the named entities, collapse
    * whitespace runs to single spaces, trim. The scalar "just give me
    * the text" face — boilerplate included. */
  def stripTags(html: Column): Column =
    normText(regexp_replace(dropInvisible(html), "<[^>]*>", " "))

  /** entity decode + whitespace collapse on ALREADY tag-free text */
  private def normText(c: Column): Column = {
    val ent = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
      .foldLeft(c) { case (x, (e, r)) => replace(x, lit(e), lit(r)) }
    trim(regexp_replace(replace(ent, lit("&amp;"), lit("&")),
      "\\s+", " "))
  }

  /** per-block feature struct: (text, len, link_chars, stop_density)
    * over a RAW html block (tags still inside) */
  private def blockFeatures(b: Column,
                            stopwords: Seq[String]): Column =
    // anchor-text chars = stripped len minus stripped len with the
    // whole <a>...</a> elements deleted — simpler than extracting and
    // summing the anchor bodies. NOT identical arithmetic to summing
    // anchor bodies: deleting an inter-word anchor also absorbs the
    // one separator space whitespace-collapse would have kept, so
    // each such anchor counts +1 char ("foo <a>bar</a> baz" -> 4,
    // not 3) and link_density sits slightly above the strict jusText
    // anchor-char ratio. Documented convention, pinned by the q257
    // oracle (which replays this same length difference in SQL) and
    // by ExtractSpec. txt and toks are BOUND (no CSE inside HOF
    // lambdas — the q253 lesson): unbound, the tag-strip regex chain
    // would re-run once per struct field referencing it.
    TextFunctions.bound(normText(regexp_replace(b, "<[^>]*>", " "))) {
      txt =>
        TextFunctions.bound(TextFunctions.tokens(txt)) { toks =>
          val noA = normText(regexp_replace(
            regexp_replace(b, "(?is)<a[^>]*>.*?</a>", " "),
            "<[^>]*>", " "))
          val stopHits = filter(toks,
            t => t.isin(stopwords.map(lit): _*))
          struct(
            txt.as("text"),
            length(txt).as("len"),
            greatest(length(txt) - length(noA), lit(0)).as("link_chars"),
            (size(stopHits).cast("double") /
              greatest(size(toks).cast("double"), lit(1.0)))
              .as("stop_density"))
        }
    }

  /** context-free jusText class for one feature struct:
    * 3 = GOOD, 2 = NEARGOOD, 1 = SHORT, 0 = BAD (ints so the
    * smoothing pass is plain comparisons) */
  private def classify(f: Column,
                       maxLinkDensity: Double, lengthLow: Int,
                       lengthHigh: Int, stopwordsLow: Double,
                       stopwordsHigh: Double): Column = {
    val len = f.getField("len").cast("double")
    val linkDensity = f.getField("link_chars").cast("double") /
      greatest(len, lit(1.0))
    val stop = f.getField("stop_density")
    when(linkDensity > maxLinkDensity, 0)
      .when(f.getField("text").contains("©") ||
        f.getField("text").contains("&copy;"), 0)
      .when(len < lengthLow,
        when(f.getField("link_chars") > 0, 0).otherwise(1))
      .when(stop > stopwordsHigh,
        when(len > lengthHigh, 3).otherwise(2))
      .when(stop > stopwordsLow, 2)
      .otherwise(0)
  }

  /** main-content extraction as a SCALAR column: html in, extracted
    * text out (GOOD blocks joined with '\n'). Null html → ''.
    * `stopwords` is the language knob (jusText ships per-language
    * lists — the density thresholds presume one that matches the
    * corpus language; the default is the engine's English list). */
  def mainContent(html: Column,
                  maxLinkDensity: Double = MaxLinkDensity,
                  lengthLow: Int = LengthLow,
                  lengthHigh: Int = LengthHigh,
                  stopwordsLow: Double = StopwordsLow,
                  stopwordsHigh: Double = StopwordsHigh,
                  stopwords: Seq[String] =
                    TextFunctions.defaultStopwords): Column = {
    // segment on block-tag boundaries; features per non-empty block.
    // the split pattern eats the boundary tags themselves — inline
    // tags (<a>, <b>, <span>, …) stay inside their block for the
    // link-density math and die in normText
    val rawBlocks = filter(
      transform(
        split(dropInvisible(html), s"(?i)</?(?:$blockTags)\\b[^>]*>"),
        b => blockFeatures(b, stopwords)),
      f => f.getField("len") > 0)
    // one bound pass (TextFunctions.bound — no CSE inside HOF
    // lambdas): classify context-free, then the one-step neighbor
    // smoothing over the per-doc block array
    TextFunctions.bound(rawBlocks) { blocks =>
      TextFunctions.bound(transform(blocks, f =>
        classify(f, maxLinkDensity, lengthLow, lengthHigh,
          stopwordsLow, stopwordsHigh))) { cls =>
        val n = size(cls)
        // And short-circuits in Spark codegen, so the element_at on
        // i-1 / i+1 never evaluates out of bounds (ANSI mode would
        // raise) — ExtractSpec pins first/last-block smoothing
        val keptIdx = filter(seq1toN(n),
          i => element_at(cls, i) === 3 ||
            ((element_at(cls, i) === 2 || element_at(cls, i) === 1) &&
              ((i > 1 && element_at(cls, i - 1) === 3) ||
                (i < n && element_at(cls, i + 1) === 3))))
        array_join(transform(keptIdx,
          i => element_at(blocks, i).getField("text")), "\n")
      }
    }
  }

  /** DIAGNOSTIC face: one row per non-empty block with its features
    * and both classes — (idCol, block_pos, text, len, link_chars,
    * stop_density, cls, kept). `cls` is the context-free class
    * (3 good / 2 neargood / 1 short / 0 bad); `kept` applies the
    * one-step smoothing. The inspection surface the paper's authors
    * use to tune thresholds per corpus; same arithmetic as
    * [[mainContent]] (spec-pinned). */
  def blocks(df: DataFrame, idCol: String, htmlCol: String,
             maxLinkDensity: Double = MaxLinkDensity,
             lengthLow: Int = LengthLow,
             lengthHigh: Int = LengthHigh,
             stopwordsLow: Double = StopwordsLow,
             stopwordsHigh: Double = StopwordsHigh,
             stopwords: Seq[String] =
               TextFunctions.defaultStopwords): DataFrame = {
    val feats = filter(
      transform(
        split(dropInvisible(col(htmlCol)),
          s"(?i)</?(?:$blockTags)\\b[^>]*>"),
        b => blockFeatures(b, stopwords)),
      f => f.getField("len") > 0)
    df.select(col(idCol), feats.as("__blocks"))
      .select(col(idCol),
        TextFunctions.bound(transform(col("__blocks"), f =>
          classify(f, maxLinkDensity, lengthLow, lengthHigh,
            stopwordsLow, stopwordsHigh))) { cls =>
          transform(seq1toN(size(cls)), i => struct(
            i.as("block_pos"),
            element_at(col("__blocks"), i).getField("text").as("text"),
            element_at(col("__blocks"), i).getField("len").as("len"),
            element_at(col("__blocks"), i).getField("link_chars")
              .as("link_chars"),
            element_at(col("__blocks"), i).getField("stop_density")
              .as("stop_density"),
            element_at(cls, i).as("cls"),
            (element_at(cls, i) === 3 ||
              ((element_at(cls, i) === 2 || element_at(cls, i) === 1) &&
                ((i > 1 && element_at(cls, i - 1) === 3) ||
                  (i < size(cls) &&
                    element_at(cls, i + 1) === 3)))).as("kept")))
        }.as("__rows"))
      .select(col(idCol), explode(col("__rows")).as("__r"))
      .select(col(idCol), col("__r.block_pos").as("block_pos"),
        col("__r.text").as("text"), col("__r.len").as("len"),
        col("__r.link_chars").as("link_chars"),
        col("__r.stop_density").as("stop_density"),
        col("__r.cls").as("cls"), col("__r.kept").as("kept"))
  }

  /** FRAME face: `htmlCol` extracted into `outCol` (default: replace
    * a column named `text`, the downstream-cleaning convention). */
  def extract(df: DataFrame, htmlCol: String, outCol: String = "text",
              maxLinkDensity: Double = MaxLinkDensity,
              lengthLow: Int = LengthLow,
              lengthHigh: Int = LengthHigh,
              stopwordsLow: Double = StopwordsLow,
              stopwordsHigh: Double = StopwordsHigh,
              stopwords: Seq[String] =
                TextFunctions.defaultStopwords): DataFrame =
    df.withColumn(outCol, mainContent(col(htmlCol), maxLinkDensity,
      lengthLow, lengthHigh, stopwordsLow, stopwordsHigh, stopwords))
}
