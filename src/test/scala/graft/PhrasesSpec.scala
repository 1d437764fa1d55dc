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
}
