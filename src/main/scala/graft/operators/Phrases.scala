package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-phrase matching over document text (DRIVER-EXT, SURVEY.md
  * §2.12 text analysis): the published blocklist-filter shape (C4's
  * "bad words" rule, Raffel et al. 2020, arXiv:1910.10683 §2.2)
  * implemented with the Aho–Corasick automaton (Aho & Corasick 1975,
  * CACM 18(6)) so ONE O(chars) scan per document matches the whole
  * phrase set — a per-phrase `contains` sweep is O(chars × phrases)
  * and stops being runnable around 10⁴ phrases at corpus scale.
  *
  * Matching semantics: case-insensitive SUBSTRING containment
  * (document and phrases lowercased; "ass" matches inside "class" —
  * callers wanting word-boundary semantics should pad phrases with
  * spaces, the C4 convention for multi-word entries). Matches are
  * reported as the DISTINCT set of phrases found, sorted — a pure
  * function of (text, phrase set).
  *
  * Shape at 100 TB: the phrase table is a blocklist (10²–10⁵ rows —
  * model-artifact-sized), collected once, compiled to the automaton
  * on the driver, and broadcast; tagging is one narrow map pass with
  * no shuffle, and the filter faces push the scan's verdict into a
  * WHERE. The automaton walk is a UDF by the tokenizer exemption
  * (SURVEY §5: data-dependent state machine per document — not
  * Column-expressible; the broadcast automaton is shared per
  * executor, not per task). */
object Phrases {

  /** Add `out` = sorted array of the DISTINCT blocklist phrases
    * contained in `textCol` (case-insensitive substring semantics —
    * see object doc). Null text → null; empty phrase rows are
    * dropped (an empty needle matches everything vacuously). */
  def tagPhrases(df: DataFrame, textCol: String, phrases: DataFrame,
                 phraseCol: String = "phrase",
                 out: String = "matched_phrases"): DataFrame = {
    // lowercase on the DRIVER with Locale.ROOT — the same lowering the
    // UDF applies to the text side. Spark's lower() falls back to the
    // JVM default locale for non-ASCII strings, and a tr-TR default
    // would build the automaton from a dotless-ı phrase the ROOT-
    // lowered text can never contain.
    val pats = phrases.select(col(phraseCol).cast("string"))
      .filter(col(phraseCol).isNotNull)
      .distinct().collect()
      .map(_.getString(0).toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).distinct
    val bc = df.sparkSession.sparkContext.broadcast(Automaton.build(pats))
    val tag = udf { (text: String) =>
      if (text == null) null
      else bc.value.matches(text.toLowerCase(java.util.Locale.ROOT))
    }
    df.withColumn(out, tag(col(textCol)))
  }

  /** Drop (default) or keep the documents containing ANY blocklist
    * phrase — the C4 filter faces. Null text contains no phrases, so
    * it survives the drop face and is excluded by the keep face (the
    * coalesce below; a bare `size(null) > 0` is NULL under ANSI mode
    * and would silently drop the row from BOTH faces). */
  def filterPhrases(df: DataFrame, textCol: String, phrases: DataFrame,
                    phraseCol: String = "phrase",
                    keep: Boolean = false): DataFrame = {
    val tagged = tagPhrases(df, textCol, phrases, phraseCol, "__mp")
    val flagged = coalesce(size(col("__mp")) > 0, lit(false))
    tagged.filter(if (keep) flagged else !flagged).drop("__mp")
  }

  /** Aho–Corasick goto/fail/output automaton over UTF-16 chars.
    * Built once on the driver from the lowercased phrase set;
    * immutable and serializable for broadcast. Package-visible for
    * the spec's randomized equality against naive contains(). */
  private[graft] final class Automaton(
      gotoMaps: Array[Map[Char, Int]],
      fail: Array[Int],
      outputs: Array[List[String]]) extends Serializable {

    /** distinct phrases contained in `text` (already lowercased),
      * sorted for determinism */
    def matches(text: String): Seq[String] = {
      var state = 0
      val found = scala.collection.mutable.HashSet.empty[String]
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        var s = state
        while (s != 0 && !gotoMaps(s).contains(c)) s = fail(s)
        state = gotoMaps(s).getOrElse(c, 0)
        if (outputs(state).nonEmpty) found ++= outputs(state)
        i += 1
      }
      found.toSeq.sorted
    }
  }

  private[graft] object Automaton {
    /** classic construction: trie of phrases, BFS failure links,
      * output sets merged along failure chains */
    def build(phrases: Array[String]): Automaton = {
      val gotoMaps = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
      val outputs = scala.collection.mutable.ArrayBuffer(List.empty[String])
      phrases.foreach { p =>
        var state = 0
        p.foreach { c =>
          state = gotoMaps(state).getOrElseUpdate(c, {
            gotoMaps += scala.collection.mutable.Map.empty[Char, Int]
            outputs += List.empty[String]
            gotoMaps.length - 1
          })
        }
        outputs(state) = p :: outputs(state)
      }
      val n = gotoMaps.length
      val fail = new Array[Int](n)
      val queue = scala.collection.mutable.Queue.empty[Int]
      gotoMaps(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        gotoMaps(r).foreach { case (c, s) =>
          queue += s
          var f = fail(r)
          while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
          fail(s) = if (gotoMaps(f).contains(c) && gotoMaps(f)(c) != s)
            gotoMaps(f)(c) else 0
          outputs(s) = outputs(s) ++ outputs(fail(s))
        }
      }
      new Automaton(gotoMaps.map(_.toMap).toArray, fail,
        outputs.map(_.distinct).toArray)
    }
  }
}
