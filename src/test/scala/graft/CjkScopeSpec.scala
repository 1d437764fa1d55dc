package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{LangId, Repetition}

/** Space-free-script (CJK) scope of the whitespace-token quality
  * stack (r17, VERDICT r16 item 4). The published pipelines are
  * per-language — Gopher (Rae 2021 A1) and C4 (Raffel 2020 §2.2)
  * define their rules over whitespace-delimited English; this engine
  * documents the same scope rather than inventing unpublished CJK
  * thresholds. These specs PIN what each rule does on spaceless text
  * today, so the degeneration is a chosen, visible contract:
  *
  *  - tokens() yields ONE giant token per spaceless run, so
  *    gopherFlags drops ALL spaceless docs (word_count/mean-word-len
  *    /stopword rules fail) — it never silently admits them;
  *  - c4CleanLines drops ALL spaceless lines (min-words-per-line
  *    fails; '。' is not in the terminal set) — same direction;
  *  - gopherRepetitionFlags PASSES spaceless docs (no grams, no
  *    repeated lines → every fraction 0): it cannot see repetition
  *    inside an unsegmented line, so it must not be the only gate
  *    for CJK corpora;
  *  - r18 FLIP: the fail-closed dead end is now a ROUTE — LangId
  *    (char-n-gram, whitespace-free by construction) segregates the
  *    corpus first, and [[graft.functions.CjkQuality]]'s script
  *    dispatch sends zh/ja/ko through character-level siblings of
  *    the quality/repetition/C4 rules (entropy, char-gram
  *    repetition, char-count band, CJK terminal punctuation) while
  *    whitespace-delimited languages keep the published word rules.
  *    The per-rule CJK behavior pinned below is UNCHANGED — the
  *    word rules still fail closed on spaceless text, which is
  *    exactly why the dispatcher routes around them (CjkQualitySpec
  *    owns the char-rule pins; the last test here pins the route).
  */
class CjkScopeSpec extends SparkTestBase {
  import spark.implicits._

  // a spaceless CJK-style paragraph with heavy internal repetition
  private val zh = ("这是一个没有空格的中文句子" * 8) + "。"
  private val zhDf = Seq((1L, zh)).toDF("id", "text")

  test("tokens: a spaceless run is ONE token (whitespace-delimited " +
    "scope, documented)") {
    val toks = zhDf.select(TextFunctions.tokens($"text"))
      .as[Seq[String]].head()
    assert(toks.length == 1 && toks.head == zh)
  }

  test("gopherFlags DROPS spaceless docs: word count, mean word " +
    "length and stopword rules all fail — never a silent admit") {
    val f = zhDf.select(TextFunctions.gopherFlags($"text").as("f"))
      .select(col("f.word_count_ok"), col("f.mean_word_len_ok"),
        col("f.stopword_ok"), col("f.pass"))
      .as[(Boolean, Boolean, Boolean, Boolean)].head()
    assert(f == ((false, false, false, false)))
  }

  test("c4CleanLines DROPS spaceless lines: the min-words rule fails " +
    "and '。' is not a terminal-punctuation match") {
    val cleaned = zhDf.select(TextFunctions.c4CleanLines($"text"))
      .head().getString(0)
    assert(cleaned == "")
    // even with an ASCII period the one-token line stays below the
    // 5-words-per-line floor
    val ascii = Seq(Tuple1(("这是一个没有空格的中文句子" * 8) + "."))
      .toDF("text")
      .select(TextFunctions.c4CleanLines($"text")).head().getString(0)
    assert(ascii == "")
  }

  test("gopherRepetitionFlags PASSES spaceless docs (no word grams, " +
    "no repeated lines -> every fraction 0): repetition inside an " +
    "unsegmented line is INVISIBLE to the whitespace rules") {
    val r = Repetition.gopherRepetitionFlags(zhDf, "id", "text")
    val row = r.select(col("rep_pass"), col("top2_char_frac"),
      col("dup5_char_frac"), col("dup_line_frac"))
      .as[(Boolean, Double, Double, Double)].head()
    assert(row == ((true, 0.0, 0.0, 0.0)))
  }

  test("the documented recipe works: char-n-gram LangId separates a " +
    "CJK pseudo-language from whitespace languages without any " +
    "tokenization") {
    val labeled = ((0 until 40).map { i =>
      (i.toLong, "zh", Seq("这是中文的句子没有空格", "中文网页的内容很长",
        "没有空格的长句子测试")(i % 3) * (2 + i % 3))
    } ++ (0 until 40).map { i =>
      (100L + i, "en",
        Seq("the quick brown fox", "lazy dogs jump over",
          "night falls while dogs sleep")(i % 3) * (2 + i % 3))
    }).toDF("id", "lang", "text")
    val model = LangId.train(labeled, "text", "lang", m = 512)
    val test = Seq((1L, "zh", "中文句子的测试内容"),
      (2L, "en", "the lazy brown dogs")).toDF("id", "true", "text")
    val got = LangId.classify(test, "text", model, m = 512)
      .select($"true", $"lang").as[(String, String)].collect()
    assert(got.forall { case (t, p) => t == p })
  }

  test("r18: the LID-then-dispatch route processes the CJK slice " +
    "instead of dropping it — the repetitive zh doc drops for its " +
    "REPETITION (visible to the char rules), a clean zh doc passes") {
    val zhClean = "今天的天气很好我们决定去公园散步。他在图书馆里读了一本" +
      "关于历史的书。孩子们在学校学习数学和科学知识。"
    val df = Seq((1L, "zh", zhClean), (2L, "zh", zh),
      (3L, "en", Seq.fill(8)("the dogs run fast to be near the " +
        "house and that is fine with everyone here have fun.")
        .mkString(" ")))
      .toDF("id", "lang", "text")
    val got = df.select($"id",
        graft.functions.CjkQuality
          .qualityPassByScript($"text", $"lang").as("pass"),
        graft.functions.CjkQuality
          .charRepetitionRatio($"text", 5).as("rep"))
      .as[(Long, Boolean, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L)._1 == true)
    assert(got(2L)._1 == false && got(2L)._2 > 0.8) // seen, and judged
    assert(got(3L)._1 == true) // ws languages keep the word rules
  }
}
