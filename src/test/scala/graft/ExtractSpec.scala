package graft

import org.apache.spark.sql.functions._

import graft.operators.Extract

/** Raw-HTML main-content extraction (r16) — hand-computed fixtures
  * for every classification rule, the one-step smoothing at both
  * array boundaries, entity decoding, and the blocks-face /
  * mainContent consistency contract. */
class ExtractSpec extends SparkTestBase {
  import spark.implicits._

  // stopword-dense sentence: 21/30 tokens are defaultStopwords
  // (density 0.7 > stopwordsHigh 0.32), ~110 chars — NEARGOOD alone
  // (70 < len <= 200), GOOD when doubled (len > 200)
  private val sent =
    "the cat is in the hat and it is a fine day for the dog to nap " +
      "on the mat by the door and this is a tale of it"
  private val good = sent + " " + sent
  private val badLong =
    ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).trim

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Extract.mainContent($"h")).head().getString(0)

  test("fixture preconditions: lengths and densities straddle the " +
    "published thresholds as designed") {
    assert(sent.length > Extract.LengthLow && sent.length <= Extract.LengthHigh)
    assert(good.length > Extract.LengthHigh)
    assert(badLong.length > Extract.LengthHigh)
  }

  test("mainContent: scripts/styles/comments die; link-dense menus, " +
    "copyright lines and low-stopword blocks drop; good paragraphs " +
    "and their short/neargood neighbors survive") {
    val html =
      s"""<html><head><title>Page title.</title>
         |<style>p { color: red }</style>
         |<script>var x = "<p>not a block</p>";</script></head>
         |<body><!-- navigation -->
         |<div><a href="/">first long home navigation link</a>
         |<a href="/about">second long about navigation link</a>
         |<a href="/contact">third long contact navigation link</a></div>
         |<p>$good</p>
         |<p>Read more below.</p>
         |<div>© 2026 Example Corp</div>
         |<p>$sent</p>
         |<div>$badLong</div>
         |</body></html>""".stripMargin
    // title: SHORT, next block BAD -> dropped; menu: len > 70 all
    // link chars -> link_density 1 > 0.2 -> BAD; good: GOOD; read
    // more: SHORT next to GOOD -> kept; copyright: BAD (©); sent:
    // NEARGOOD between two BADs -> dropped; badLong: stop 0 -> BAD
    assert(extract(html) == good + "\nRead more below.")
  }

  test("smoothing reaches both array boundaries (the ANSI element_at " +
    "short-circuit): a first-block NEARGOOD before a GOOD is kept, a " +
    "last-block NEARGOOD after a GOOD is kept") {
    assert(extract(s"<p>$sent</p><p>$good</p>") == sent + "\n" + good)
    assert(extract(s"<p>$good</p><p>$sent</p>") == good + "\n" + sent)
    // isolated NEARGOOD: no good neighbor -> dropped entirely
    assert(extract(s"<p>$sent</p>") == "")
  }

  test("link density vs short-with-links: a text-majority paragraph " +
    "with one small link survives; linkful short blocks never do") {
    // one 9-char anchor inside a >200-char stopword-dense para:
    // link_density ~ 0.04 < 0.2 -> still GOOD
    val linked = s"<p>$sent <a href='/x'>more here</a> $sent</p>"
    val out = extract(linked)
    assert(out == sent + " more here " + sent)
    // short with a link: BAD even though a GOOD neighbor follows
    // (jusText: short linkful blocks are navigation, not prose)
    assert(extract(s"<p><a href='/y'>tiny link</a></p><p>$good</p>")
      == good)
  }

  test("stripTags: entity decode (&amp; last), whitespace collapse, " +
    "null-html fail-safe") {
    def strip(h: String): String =
      Seq(h).toDF("h").select(Extract.stripTags($"h")).head().getString(0)
    assert(strip("<p>a &amp; b &lt;tag&gt;&nbsp;&quot;q&quot; &#39;s&#39;</p>")
      == "a & b <tag> \"q\" 's'")
    assert(strip("<b>a&amp;lt;b</b>") == "a&lt;b") // no double decode
    assert(strip("x<script>hidden</script>y  \n z") == "x y z")
    val n = Seq[String](null).toDF("h")
    assert(n.select(Extract.stripTags($"h")).head().getString(0) == "")
    assert(n.select(Extract.mainContent($"h")).head().getString(0) == "")
  }

  test("blocks diagnostic face: per-block features and classes agree " +
    "with mainContent's kept set") {
    val html =
      s"""<div><a href="/">first long home navigation link</a>
         |<a href="/about">second long about navigation link</a>
         |<a href="/contact">third long contact navigation link</a></div>
         |<p>$good</p><p>Read more below.</p>
         |<div>© 2026 Example Corp</div><p>$sent</p>""".stripMargin
    val df = Seq((1L, html)).toDF("doc_id", "html")
    val b = Extract.blocks(df, "doc_id", "html")
      .orderBy($"block_pos").collect()
    assert(b.map(_.getInt(6)).toSeq == Seq(0, 3, 1, 0, 2)) // cls
    assert(b.map(_.getBoolean(7)).toSeq ==
      Seq(false, true, true, false, false)) // kept
    // menu block: every char is link text
    assert(b(0).getInt(4) == b(0).getInt(3))
    // kept texts joined == mainContent
    val joined = b.filter(_.getBoolean(7)).map(_.getString(2)).mkString("\n")
    assert(joined ==
      df.select(Extract.mainContent($"html")).head().getString(0))
  }

  test("stopwords parameter is the language knob: a block that is " +
    "BAD under the English list is GOOD under a matching list") {
    val got = Seq(s"<p>$badLong</p>").toDF("h")
      .select(Extract.mainContent($"h",
        stopwords = Seq("alpha", "beta", "gamma", "delta", "epsilon")))
      .head().getString(0)
    assert(got == badLong) // 20/40 tokens hit -> 0.5 > 0.32, len > 200
  }

  test("shipped per-language lists: a French paragraph is BAD under " +
    "the English default and GOOD under stopwordsFor(\"fr\")") {
    // > 200 chars, ~half the tokens French function words, no links
    val fr = ("le renard et la nuit dans les bois avec le chien " +
      "de la ferme qui marche sur les collines pour une promenade " +
      "du soir et la lumiere qui tombe sur les arbres dans un " +
      "silence que le monde entier attend avec une grande joie " +
      "pour la fin de la journee").trim
    assert(fr.length > Extract.LengthHigh)
    val df = Seq(Tuple1(s"<html><body><p>$fr</p></body></html>"))
      .toDF("html")
    val en = df.select(Extract.mainContent($"html")).head().getString(0)
    val gotFr = df.select(Extract.mainContent($"html",
      stopwords = Extract.stopwordsFor("fr"))).head().getString(0)
    assert(en == "")     // ~0 English-stopword density -> BAD
    assert(gotFr == fr)  // French list -> stop_density > 0.32 -> GOOD
    // unknown language falls back to the English default list
    assert(Extract.stopwordsFor("xx") ==
      graft.functions.TextFunctions.defaultStopwords)
  }

  test("extract face rewrites into the downstream text column and " +
    "composes with c4CleanLines") {
    val html = s"<p>$good</p><div>© footer</div>"
    val out = Extract.extract(Seq((1L, html)).toDF("id", "html"), "html")
    assert(out.columns.toSeq == Seq("id", "html", "text"))
    assert(out.head().getString(2) == good)
    // the extracted line is prose without terminal punctuation — C4's
    // line rule then decides; with a period appended it survives
    val c4 = out
      .withColumn("text", concat($"text", lit(".")))
      .select(graft.functions.TextFunctions.c4CleanLines($"text"))
      .head().getString(0)
    assert(c4 == good + ".")
  }
}
