package graft

import org.apache.spark.sql.functions._
import graft.functions.{CjkQuality, TextFunctions}

/** Character-level CJK quality rules (r18, VERDICT r17 item 1) —
  * entropy arithmetic against hand-computed closed forms, char-gram
  * repetition, the flag struct's per-rule drop reasons, the C4-style
  * CJK line cleaner, the U+3000 whitespace contract, the LangId
  * script dispatch, and the shuffle-free plan. */
class CjkQualitySpec extends SparkTestBase {
  import spark.implicits._

  private val zhGood =
    "今天的天气很好我们决定去公园散步。他在图书馆里读了一本关于历史的书。" +
      "孩子们在学校学习数学和科学知识。"
  private val zhSpam = "好" * 80 + "。"
  private val zhRepeat = "这是一个没有空格的中文句子" * 8 + "。"

  private def entropy(s: String): Double =
    Seq(Tuple1(s)).toDF("t")
      .select(CjkQuality.charEntropy($"t")).head().getDouble(0)

  private def rep(s: String, n: Int = 5): Double =
    Seq(Tuple1(s)).toDF("t")
      .select(CjkQuality.charRepetitionRatio($"t", n)).head().getDouble(0)

  test("charEntropy: hand-computed closed forms — uniform, skewed, " +
    "degenerate, null/empty/whitespace-only") {
    // 4 equiprobable chars: exactly 2 bits
    assert(entropy("abcd") == 2.0)
    // 好x4 + 。x1: -(0.8 lg 0.8 + 0.2 lg 0.2) = 0.721928
    assert(entropy("好好好好。") == 0.721928)
    // single repeated char: 0 bits
    assert(entropy("好好好") == 0.0)
    assert(entropy("") == 0.0)
    assert(entropy("  \t\n") == 0.0) // whitespace-only strips to empty
    assert(Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(CjkQuality.charEntropy($"t")).head().getDouble(0) == 0.0)
    // whitespace carries no entropy mass: stripped before counting
    assert(entropy("a b\tc\nd") == 2.0)
  }

  test("charRepetitionRatio: 1 - distinct/total char n-grams; 0 below " +
    "n chars; whitespace stripped first") {
    // "abcdeabcde": 6 5-grams, 5 distinct -> 1 - 5/6
    assert(rep("abcdeabcde") == 0.166667)
    assert(rep("abcde") == 0.0)    // one gram, distinct
    assert(rep("abcd") == 0.0)     // shorter than n: 0, not negative
    assert(Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(CjkQuality.charRepetitionRatio($"t", 5))
      .head().getDouble(0) == 0.0)
    assert(rep("abcde abcde") == 0.166667) // space invisible
    // heavy repetition detected INSIDE an unsegmented run — the case
    // word-gram rules are blind to (CjkScopeSpec)
    assert(rep(zhRepeat) > 0.8)
    assert(rep(zhGood) == 0.0)
  }

  test("cjkQualityFlags: each planted casualty drops for ITS rule") {
    val df = Seq(
      (1L, zhGood),                      // all pass
      (2L, zhSpam),                      // entropy + rep fail
      (3L, zhRepeat),                    // rep fails (entropy ok)
      (4L, "短句子。"),                   // char_count fails
      (5L, "今天的天气很好我们决定去公园散步然后回家吃饭休息一会儿再看一本书然后" +
        "写字画画聊天喝茶散步运动唱歌跳舞"), // no terminal punct
      (6L, null.asInstanceOf[String]))   // all false
      .toDF("id", "text")
    val got = df.select($"id", CjkQuality.cjkQualityFlags($"text").as("f"))
      .select($"id", $"f.char_count_ok", $"f.entropy_ok",
        $"f.char_rep_ok", $"f.punct_ok", $"f.pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(t => t._1 -> (t._2, t._3, t._4, t._5, t._6)).toMap
    assert(got(1L) == ((true, true, true, true, true)))
    assert(got(2L) == ((true, false, false, true, false)))
    assert(got(3L) == ((true, true, false, true, false)))
    assert(got(4L) == ((false, false, true, true, false)))
    assert(got(5L)._4 == false && got(5L)._5 == false)
    assert(got(6L) == ((false, false, false, false, false)))
  }

  test("c4CleanLinesCjk: keeps terminal-punctuated lines of >= " +
    "minChars; drops short/menu/javascript lines; strips U+3000; " +
    "null -> ''") {
    val page = "今天的天气很好我们决定去公园散步。\n" +
      "短。\n" +                             // < 10 chars
      "菜单 导航 登录\n" +                    // no terminal
      "这个页面使用javascript才能正常工作。\n" + // boilerplate rule
      "　他在图书馆里读了一本关于历史的书！　"   // U+3000-padded, kept
    val got = Seq(Tuple1(page)).toDF("t")
      .select(CjkQuality.c4CleanLinesCjk($"t")).head().getString(0)
    assert(got == "今天的天气很好我们决定去公园散步。\n" +
      "他在图书馆里读了一本关于历史的书！")
    assert(Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(CjkQuality.c4CleanLinesCjk($"t")).head().getString(0) == "")
    // ideographic space is whitespace for the min-chars count too
    assert(Seq(Tuple1("好　句　子　甲　乙　丙　丁　戊。")).toDF("t")
      .select(CjkQuality.c4CleanLinesCjk($"t", minCharsPerLine = 10))
      .head().getString(0) == "") // 9 non-ws chars < 10
  }

  test("script dispatch: zh/ja/ko route to the char rules, everything " +
    "else (incl. null lang) to the whitespace rules") {
    val df = Seq(
      ("zh", zhGood, true),     // char rules admit good CJK prose
      ("ja", zhRepeat, false),  // char rules still drop repetition
      ("en", Seq.fill(8)("the dogs run fast to be near the house " +
        "and that is fine with everyone here have fun.")
        .mkString(" "), true),  // gopher admits good English
      ("en", zhGood, false),    // CJK text under ws rules: fail closed
      (null.asInstanceOf[String], zhGood, false)) // null lang -> ws
      .toDF("lang", "text", "want")
    val got = df.select($"want",
        CjkQuality.qualityPassByScript($"text", $"lang").as("got"))
      .as[(Boolean, Boolean)].collect()
    assert(got.forall { case (w, g) => w == g })
    assert(Seq(("zh", zhGood + "\n短。"), ("en", "No terminal here"))
      .toDF("lang", "text")
      .select(CjkQuality.c4CleanByScript($"text", $"lang"))
      .as[String].collect().toSeq == Seq(zhGood, ""))
    assert(Seq(Tuple1("th")).toDF("l")
      .select(CjkQuality.scriptOf($"l", Seq("zh", "ja", "ko", "th")))
      .head().getString(0) == "cjk") // extensible code list
  }

  test("the whole char-rule family is one shuffle-free codegen " +
    "projection (no Exchange)") {
    val df = Seq(("zh", zhGood)).toDF("lang", "text")
    val plan = df.select(CjkQuality.charEntropy($"text"),
      CjkQuality.charRepetitionRatio($"text", 5),
      CjkQuality.cjkQualityFlags($"text"),
      CjkQuality.c4CleanByScript($"text", $"lang"),
      CjkQuality.qualityPassByScript($"text", $"lang"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("entropy/rep agree between ws and cjk text handling: latin " +
    "text through the char rules is well-defined (dispatch policy, " +
    "not a crash path)") {
    val en = "the quick brown fox jumps over the lazy dog. " * 4
    assert(entropy(en) > 3.0)
    assert(rep(en) > 0.5) // 4x repetition visible at char level too
    val f = Seq(Tuple1(en)).toDF("t")
      .select(CjkQuality.cjkQualityFlags($"t").getField("pass"))
      .head().getBoolean(0)
    assert(!f) // repeated latin boilerplate drops under char rules too
    // and TextFunctions' scope pins remain true alongside (the ws
    // rules still fail closed on spaceless text; dispatch is the fix)
    assert(Seq(Tuple1(zhGood)).toDF("t")
      .select(TextFunctions.gopherFlags($"t").getField("pass"))
      .head().getBoolean(0) == false)
  }
}
