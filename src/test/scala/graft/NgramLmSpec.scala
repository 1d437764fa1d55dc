package graft

import org.apache.spark.sql.functions._
import graft.operators.LanguageModel

/** Order-n hashed per-language LM (r18, VERDICT r17 item 2) —
  * hand-computed add-k NLL in the collision-free regime, model
  * shape/stamps, per-language isolation, drift refusals, null
  * contracts, the quality-signal direction, and the shuffle-free
  * serving plan. */
class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("trigram NLL matches the hand formula (m large enough that " +
    "the deterministic md5 buckets are collision-free here)") {
    val m = 4096
    val docs = Seq((1L, "en", "a b a b a"), (2L, "en", "a b c"))
      .toDF("id", "lang", "text")
    val model = LanguageModel.trainNgram(docs, "text", "lang",
      n = 3, m = m)
    val got = LanguageModel.scoreNgram(docs, "text", "lang", model,
        n = 3, m = m, k = 0.5)
      .select($"id", $"n_ngrams", $"nll")
      .as[(Long, Int, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // c("a b a")=2, c("b a b")=1, c("a b c")=1;
    // ctx c("a b")=3 (two from d1, one from d2), c("b a")=1
    val d1 = -(2 * math.log((2 + 0.5) / (3 + 0.5 * m)) +
      math.log((1 + 0.5) / (1 + 0.5 * m))) / 3
    val d2 = -math.log((1 + 0.5) / (3 + 0.5 * m))
    assert(got(1L)._1 == 3 && got(2L)._1 == 1)
    assert(math.abs(got(1L)._2 - d1) < 1e-6)
    assert(math.abs(got(2L)._2 - d2) < 1e-6)
  }

  test("model shape: (lang, kind, bucket, cnt) sparse rows, stamps " +
    "constant; ng and ctx totals equal the gram-occurrence count") {
    val docs = Seq((1L, "en", "a b a b a"), (2L, "fr", "x y z w"))
      .toDF("id", "lang", "text")
    val model = LanguageModel.trainNgram(docs, "text", "lang",
      n = 3, m = 64)
    val rows = model.collect()
    assert(rows.forall(r => r.getInt(4) == 1 && r.getInt(5) == 3 &&
      r.getInt(6) == 64))
    assert(rows.forall(r => Set("ng", "ctx")(r.getString(1))))
    // d1 carries 3 trigram occurrences, d2 carries 2
    val sums = model.groupBy($"lang", $"kind")
      .agg(sum($"cnt").as("s")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sums(("en", "ng")) == 3 && sums(("en", "ctx")) == 3)
    assert(sums(("fr", "ng")) == 2 && sums(("fr", "ctx")) == 2)
  }

  test("per-language isolation: the same text scores under ITS " +
    "language's counts only") {
    val docs = Seq((1L, "en", "a b c"), (2L, "en", "a b c"),
      (3L, "fr", "a b c")).toDF("id", "lang", "text")
    val model = LanguageModel.trainNgram(docs, "text", "lang",
      n = 3, m = 1024)
    val got = LanguageModel.scoreNgram(docs, "text", "lang", model,
        n = 3, m = 1024, k = 0.5)
      .select($"id", $"nll").as[(Long, Double)].collect().toMap
    // en saw "a b c" twice, fr once: en is strictly more likely
    assert(got(1L) == got(2L) && got(1L) < got(3L))
  }

  test("param drift is refused in BOTH directions; wrong kind/bucket " +
    "rows are refused") {
    val docs = Seq((1L, "en", "a b c d"), (2L, "fr", "p q r s"))
      .toDF("id", "lang", "text")
    val model = LanguageModel.trainNgram(docs, "text", "lang",
      n = 3, m = 256)
    intercept[IllegalArgumentException] {
      LanguageModel.scoreNgram(docs, "text", "lang", model,
        n = 3, m = 512)
    }
    intercept[IllegalArgumentException] {
      LanguageModel.scoreNgram(docs, "text", "lang", model,
        n = 3, m = 128)
    }
    intercept[IllegalArgumentException] {
      LanguageModel.scoreNgram(docs, "text", "lang", model,
        n = 4, m = 256)
    }
    intercept[IllegalArgumentException] {
      LanguageModel.scoreNgram(docs, "text", "lang",
        model.withColumn("kind", lit("zz")), n = 3, m = 256)
    }
  }

  test("null contracts: fewer than n tokens, null text, or a " +
    "language absent from the model -> null count and null nll; " +
    "other rows unaffected") {
    val train = Seq((1L, "en", "a b c d e")).toDF("id", "lang", "text")
    val model = LanguageModel.trainNgram(train, "text", "lang",
      n = 3, m = 256)
    val score = Seq(
      (1L, "en", "a b c"), (2L, "en", "a b"),
      (3L, "en", null.asInstanceOf[String]), (4L, "de", "a b c"),
      (5L, null.asInstanceOf[String], "a b c"))
      .toDF("id", "lang", "text")
    val got = LanguageModel.scoreNgram(score, "text", "lang", model,
        n = 3, m = 256)
      .select($"id", $"n_ngrams", $"nll").collect()
      .map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(got(1L) == ((false, false)))
    assert(got(2L) == ((true, true)))
    assert(got(3L) == ((true, true)))
    assert(got(4L) == ((true, true)))
    assert(got(5L) == ((true, true)))
  }

  test("the quality-signal direction: corpus-typical text scores a " +
    "LOWER NLL than out-of-distribution gibberish (order 4)") {
    val typical = (0 until 60).map { i =>
      (i.toLong, "en", Seq(
        "the quick brown fox jumps over the lazy dog tonight",
        "the lazy dog sleeps while the quick fox runs away",
        "a quick fox and a lazy dog run over the hill")(i % 3))
    }.toDF("id", "lang", "text")
    val model = LanguageModel.trainNgram(typical, "text", "lang",
      n = 4, m = 8192)
    val probe = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "en", "zq xv wk jj pq mn zz yy xx ww"))
      .toDF("id", "lang", "text")
    val got = LanguageModel.scoreNgram(probe, "text", "lang", model,
        n = 4, m = 8192)
      .select($"id", $"nll").as[(Long, Double)].collect().toMap
    assert(got(1L) < got(2L))
  }

  test("scoring is one shuffle-free projection (no Exchange)") {
    val docs = Seq((1L, "en", "a b c d"), (2L, "fr", "x y z w"))
      .toDF("id", "lang", "text")
    val model = LanguageModel.trainNgram(docs, "text", "lang",
      n = 3, m = 64).cache()
    model.count()
    val plan = LanguageModel.scoreNgram(docs, "text", "lang", model,
        n = 3, m = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    model.unpersist()
  }
}
