package graft

import org.apache.spark.sql.functions._
import graft.functions.Mojibake

/** Encoding-quality + mojibake-repair pins. The load-bearing tests:
  * the inversion law `fixDoubleUtf8(latin1Misdecode(t)) == t` across
  * 1–4-byte UTF-8 sequences (incl. a randomized sweep), and the
  * TOTALITY of the guarded repair under ANSI (a truncated/invalid
  * byte view must pass through untouched, never throw — Spark's
  * decode raises on malformed UTF-8, so the column-math UTF-8
  * validation grammar is what keeps the operator total). */
class MojibakeSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head().get(0)

  test("detection: misdecode signatures counted one per code point") {
    val cases = Seq(
      "cafÃ©" -> 1, // "cafÃ©" — latin-1-coded é
      "Ã©Ã©" -> 2, // consecutive, non-overlapping
      "café" -> 0, // real "café": é then end
      "à la carte" -> 0, // real "à la": à then space
      "aâ€™b" -> 1, // "â€™" — CP1252-coded ’
      "ascii only" -> 0,
      "" -> 0)
    for ((s, n) <- cases)
      assert(one(Mojibake.mojibakeCount(lit(s))) == n, s"<$s>")
    assert(one(Mojibake.mojibakeCount(lit(null).cast("string"))) == null)
  }

  test("inversion law: fixDoubleUtf8(latin1Misdecode(t)) == t, " +
      "1-4 byte sequences") {
    val texts = Seq(
      "café au lait", "naïve résumé", "großes ß",
      "中文测试 句子。", "日本語テスト", "한국어",
      "emoji 😀🎉 end", // 4-byte sequences
      "mixed é中😀!", "plain ascii", "")
    val df = texts.toDF("t")
      .withColumn("bad", Mojibake.latin1Misdecode(col("t")))
      .withColumn("fixed", Mojibake.fixDoubleUtf8(col("bad")))
    val rows = df.select("t", "bad", "fixed")
      .as[(String, String, String)].collect()
    for ((t, bad, fixed) <- rows) {
      assert(fixed == t, s"<$t> via <$bad>")
      // the corruption is the latin-1 byte view: length == byte count
      assert(bad.length ==
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
    }
  }

  test("inversion law: randomized unicode sweep") {
    val rnd = new scala.util.Random(83)
    val texts = Seq.fill(60) {
      val sb = new StringBuilder("x") // non-empty, starts ascii
      (0 until (1 + rnd.nextInt(30))).foreach { _ =>
        val cp = rnd.nextInt(4) match {
          case 0 => 0x20 + rnd.nextInt(0x5F) // ascii
          case 1 => 0xA1 + rnd.nextInt(0x17E - 0xA1) // latin-1/ext
          case 2 => 0x4E00 + rnd.nextInt(200) // CJK
          case _ => 0x1F300 + rnd.nextInt(100) // supplementary
        }
        sb.append(new String(Character.toChars(cp)))
      }
      sb.toString
    }
    val rows = texts.toDF("t")
      .select(col("t"),
        Mojibake.fixDoubleUtf8(Mojibake.latin1Misdecode(col("t")))
          .as("rt"))
      .as[(String, String)].collect()
    for ((t, rt) <- rows) assert(rt == t, s"<$t>")
  }

  test("repair is GUARDED and total: invalid byte views pass through " +
      "untouched (no ANSI decode error), CP1252 mojibake detected " +
      "but not repaired") {
    // "Ã©Ã": valid signature, but the trailing lead byte makes the
    // byte view INVALID UTF-8 — must pass through, not throw
    val torn = "Ã©Ã"
    assert(one(Mojibake.mojibakeCount(lit(torn))) == 1)
    assert(one(Mojibake.utf8ValidLatin1View(lit(torn))) == false)
    assert(one(Mojibake.fixDoubleUtf8(lit(torn))) == torn)
    // CP1252 family: â€™ carries € (> U+00FF) — latin-1 re-encode
    // would be lossy, guard (b) refuses; detected, unrepaired
    val cp1252 = "itâ€™s"
    assert(one(Mojibake.mojibakeCount(lit(cp1252))) == 1)
    assert(one(Mojibake.latin1Representable(lit(cp1252))) == false)
    assert(one(Mojibake.fixDoubleUtf8(lit(cp1252))) == cp1252)
    // clean text: untouched by construction (no signature)
    assert(one(Mojibake.fixDoubleUtf8(lit("café"))) == "café")
    // the documented ftfy trade-off: a bare "Ã©" IS repaired
    assert(one(Mojibake.fixDoubleUtf8(lit("Ã©"))) == "é")
  }

  test("ratios and encodingQualityFlags") {
    assert(one(Mojibake.replacementRatio(lit("ab�c"))) == 0.25)
    assert(one(Mojibake.replacementRatio(lit(""))) == 0.0)
    assert(one(Mojibake.controlRatio(lit("a\u0001b\u0085"))) == 0.5)
    assert(one(Mojibake.controlRatio(lit("tab\tok\r\n"))) == 0.0)
    val clean = one(Mojibake.encodingQualityFlags(lit("fine text.")))
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(clean.getBoolean(3))
    assert(clean.getDouble(0) == 0.0 && clean.getDouble(2) == 0.0)
    val moji = one(Mojibake.encodingQualityFlags(
      lit("cafÃ©"))).asInstanceOf[org.apache.spark.sql.Row]
    assert(!moji.getBoolean(3) && moji.getDouble(2) > 0.0)
    val nul = one(Mojibake.encodingQualityFlags(
      lit(null).cast("string"))).asInstanceOf[org.apache.spark.sql.Row]
    assert(nul.isNullAt(0) && !nul.getBoolean(3))
  }
}
