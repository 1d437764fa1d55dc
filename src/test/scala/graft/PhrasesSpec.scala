package graft

import org.apache.spark.sql.functions._
import graft.operators.Phrases

/** Aho–Corasick phrase-tagging pins. The load-bearing test is the
  * randomized equality of the automaton against naive per-phrase
  * contains() over a SMALL alphabet (forces overlapping phrases,
  * shared prefixes, and failure-link chains — the cases where a
  * hand-rolled AC goes wrong). */
class PhrasesSpec extends SparkTestBase {
  import spark.implicits._

  test("automaton == naive contains, randomized small-alphabet") {
    val rnd = new scala.util.Random(99L)
    for (_ <- 1 to 200) {
      val alpha = "ab c" // includes space: multi-word phrases
      def str(n: Int) =
        (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val phrases = (1 to (1 + rnd.nextInt(8)))
        .map(_ => str(1 + rnd.nextInt(4))).distinct
        .filter(_.nonEmpty).toArray
      val text = str(rnd.nextInt(30))
      val ac = Phrases.Automaton.build(phrases)
      val got = ac.matches(text)
      val want = phrases.filter(text.contains(_)).distinct.sorted.toSeq
      assert(got == want,
        s"phrases=${phrases.mkString("|")} text='$text': $got != $want")
    }
  }

  test("overlapping phrases, shared prefixes, failure chains") {
    val ac = Phrases.Automaton.build(Array("ab", "b", "abc", "bc", "c"))
    assert(ac.matches("abc") == Seq("ab", "abc", "b", "bc", "c"))
    assert(ac.matches("zb") == Seq("b"))
    assert(ac.matches("") == Seq.empty)
    // a phrase that is a suffix of another is found via the fail link
    val ac2 = Phrases.Automaton.build(Array("ushers", "she", "he", "hers"))
    assert(ac2.matches("ushers") == Seq("he", "hers", "she", "ushers"))
  }

  test("tagPhrases: case-insensitive, null text, empty phrases dropped") {
    val docs = Seq((1L, "The quick BROWN fox"), (2L, null: String),
      (3L, "nothing here")).toDF("id", "text")
    val phrases = Seq("Brown", "QUICK", "", "missing").toDF("phrase")
    val out = Phrases.tagPhrases(docs, "text", phrases)
      .orderBy("id").select("matched_phrases").collect()
    assert(out(0).getSeq[String](0) == Seq("brown", "quick"))
    assert(out(1).isNullAt(0))
    assert(out(2).getSeq[String](0) == Seq.empty)
  }

  test("filterPhrases: drop and keep faces") {
    val docs = Seq((1L, "clean text"), (2L, "bad phrase inside"),
      (3L, "also clean")).toDF("id", "text")
    val block = Seq("bad phrase").toDF("phrase")
    val dropped = Phrases.filterPhrases(docs, "text", block)
      .select("id").as[Long].collect().sorted.toSeq
    assert(dropped == Seq(1L, 3L))
    val kept = Phrases.filterPhrases(docs, "text", block, keep = true)
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  // ---- r14: word-boundary mode, driver guard, persistence ---------

  test("word mode: boundary-checked hits only; substring unchanged") {
    val docs = Seq(
      (1L, "a class act"),          // 'ass' inside 'class' only
      (2L, "the ass brayed"),       // standalone word
      (3L, "bad word here"),        // multi-word phrase as a unit
      (4L, "badword here"),         // fused -> substring only
      (5L, "ass"),                  // exact text == phrase (both edges)
      (6L, "kick-ass move")         // punctuation is a boundary
    ).toDF("id", "text")
    val block = Seq("ass", "bad word").toDF("phrase")
    def ids(mode: String) =
      Phrases.filterPhrases(docs, "text", block, keep = true,
          mode = mode)
        .select("id").as[Long].collect().sorted.toSeq
    assert(ids("substring") == Seq(1L, 2L, 3L, 5L, 6L))
    assert(ids("word") == Seq(2L, 3L, 5L, 6L))
    intercept[IllegalArgumentException] {
      Phrases.tagPhrases(docs, "text", block, mode = "regex")
    }
  }

  test("word mode == naive regex-boundary contains, randomized") {
    val rnd = new scala.util.Random(1234L)
    for (_ <- 1 to 200) {
      val alpha = "ab c"
      def str(n: Int) =
        (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val phrases = (1 to (1 + rnd.nextInt(8)))
        .map(_ => str(1 + rnd.nextInt(4))).distinct
        .filter(_.nonEmpty).toArray
      val text = str(rnd.nextInt(30))
      val got = Phrases.Automaton.build(phrases)
        .matches(text, wordBoundary = true)
      def bounded(p: String): Boolean = {
        var from = 0
        var ok = false
        while (!ok && from <= text.length - p.length) {
          val i = text.indexOf(p, from)
          if (i < 0) from = text.length + 1
          else {
            val l = i == 0 ||
              !Character.isLetterOrDigit(text.charAt(i - 1))
            val r = i + p.length == text.length ||
              !Character.isLetterOrDigit(text.charAt(i + p.length))
            if (l && r) ok = true else from = i + 1
          }
        }
        ok
      }
      val want = phrases.filter(bounded).distinct.sorted.toSeq
      assert(got == want,
        s"phrases=${phrases.mkString("|")} text='$text': $got != $want")
    }
  }

  test("maxPhrases guard refuses a corpus-sized phrase frame loudly") {
    val docs = Seq((1L, "x")).toDF("id", "text")
    val big = (1 to 50).map(i => s"p$i").toDF("phrase")
    val e = intercept[IllegalArgumentException] {
      Phrases.tagPhrases(docs, "text", big, maxPhrases = 10)
    }
    assert(e.getMessage.contains("maxPhrases"))
    // at the cap exactly it runs
    assert(Phrases.tagPhrases(docs, "text", big, maxPhrases = 50)
      .count() == 1)
  }

  test("savePhrases/loadPhrases: canonical round-trip drives the " +
    "same matches; stamps refuse foreign, truncated, edited files") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_phrases").toString
    val docs = Seq((1L, "The quick BROWN fox"), (2L, "nothing"))
      .toDF("id", "text")
    val raw = Seq("Brown", "QUICK", "", "brown").toDF("phrase")
    Phrases.savePhrases(spark, raw, s"$base/ok")
    val loaded = Phrases.loadPhrases(spark, s"$base/ok")
    // canonical: lowered, deduped, empties dropped
    assert(loaded.as[String].collect().sorted.toSeq ==
      Seq("brown", "quick"))
    val viaLoaded = Phrases.tagPhrases(docs, "text", loaded)
      .orderBy("id").select("matched_phrases").collect()
    assert(viaLoaded(0).getSeq[String](0) == Seq("brown", "quick"))
    assert(viaLoaded(1).getSeq[String](0) == Seq.empty)
    // foreign file: missing stamps
    Seq("x").toDF("phrase").write.parquet(s"$base/foreign")
    intercept[IllegalArgumentException] {
      Phrases.loadPhrases(spark, s"$base/foreign")
    }
    // truncated: drop a row behind the stamp's back
    spark.read.parquet(s"$base/ok").filter(col("phrase") =!= "brown")
      .write.parquet(s"$base/trunc")
    intercept[IllegalArgumentException] {
      Phrases.loadPhrases(spark, s"$base/trunc")
    }
    // edited: same count, different content -> digest refuses
    spark.read.parquet(s"$base/ok")
      .withColumn("phrase",
        when(col("phrase") === "brown", "green").otherwise(col("phrase")))
      .write.parquet(s"$base/edited")
    intercept[IllegalArgumentException] {
      Phrases.loadPhrases(spark, s"$base/edited")
    }
    intercept[IllegalArgumentException] {
      Phrases.savePhrases(spark, Seq("").toDF("phrase"), s"$base/empty")
    }
  }
}
