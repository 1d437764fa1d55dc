package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val m = 64

  test("bucketArr: unigram+bigram MULTISET, 2n-1 grams per doc") {
    val df = Seq((1L, "a b a"), (2L, "solo"), (3L, "")).toDF("id", "text")
    val sizes = df.select($"id", size(Dsir.bucketArr($"text", m)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // "a b a": 3 unigrams + 2 bigrams; "solo": 1 + 0; "": 0
    assert(sizes == Map(1L -> 5, 2L -> 1, 3L -> 0))
    // repeated gram -> same bucket, repeated (multiset, not a set)
    val arr = df.filter($"id" === 1L)
      .select(Dsir.bucketArr($"text", m)).head().getSeq[Long](0)
    assert(arr(0) == arr(2)) // the two "a" unigrams
  }

  test("hashedNgramCounts: zero-filled to m rows, counts sum to grams") {
    val df = Seq("a b c", "a a").toDF("text")
    val cnt = Dsir.hashedNgramCounts(df, "text", m)
    assert(cnt.count() == m)
    // 5 + 3 grams total
    assert(cnt.agg(sum($"cnt")).head().getLong(0) == 8L)
    assert(cnt.filter($"cnt" < 0).count() == 0)
  }

  test("logRatioTable: hand-checked smoothing arithmetic") {
    val target = Seq("aa aa").toDF("text") // 3 grams
    val raw = Seq("aa bb").toDF("text")    // 3 grams
    val ratios = Dsir.logRatioTable(target, raw, "text", m, alpha = 1.0)
    assert(ratios.count() == m)
    val tc = Dsir.hashedNgramCounts(target, "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rc = Dsir.hashedNgramCounts(raw, "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = ratios.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (b <- 0L until m.toLong) {
      val want = math.log((tc(b) + 1.0) / (3.0 + m)) -
        math.log((rc(b) + 1.0) / (3.0 + m))
      assert(math.abs(got(b) - want) < 1e-12, s"bucket $b")
    }
  }

  test("importanceWeights equals the explode-join formulation") {
    val target = Seq("the cat sat", "the dog sat").toDF("text")
    val raw = Seq("the cat sat", "le chat", "der hund", "el gato")
      .toDF("text")
    val ratios = Dsir.logRatioTable(target, raw, "text", m)
    val docs = raw.withColumn("id", monotonically_increasing_id())
    val fast = Dsir.importanceWeights(docs, "text", ratios, m)
      .select($"id", $"log_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val slow = docs
      .select($"id", explode(Dsir.bucketArr($"text", m)).as("bucket"))
      .join(ratios, Seq("bucket"))
      .groupBy($"id").agg(sum($"log_ratio").as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (id, w) =>
      assert(math.abs(w - slow(id)) < 1e-9, s"id $id") }
    // and target-like raw docs outrank off-target ones
    val byText = Dsir.importanceWeights(raw, "text", ratios, m)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byText("the cat sat") > byText("le chat"))
    assert(byText("the cat sat") > byText("der hund"))
  }

  test("resampleGumbel: deterministic, n respected, weight-biased") {
    val df = (1L to 200L).map(i =>
      (i, if (i <= 100) 5.0 else -5.0)).toDF("id", "w")
    val a = Dsir.resampleGumbel(df, "id", "w", n = 20)
      .select($"id").as[Long].collect().toSeq
    val b = Dsir.resampleGumbel(df, "id", "w", n = 20)
      .select($"id").as[Long].collect().toSeq
    assert(a == b)
    assert(a.size == 20)
    // log-weight gap of 10 vs Gumbel noise: high-weight ids dominate
    assert(a.count(_ <= 100) >= 18)
    // different seed -> different draw (statistically certain)
    val c = Dsir.resampleGumbel(df, "id", "w", n = 20, seed = 7L)
      .select($"id").as[Long].collect().toSeq
    assert(a != c)
  }

  test("null text scores 0.0 like empty text (selectable, not " +
    "NULLS-LAST-buried)") {
    val target = Seq("the cat").toDF("text")
    val ratios = Dsir.logRatioTable(target, target, "text", m)
    val docs = Seq((1L, "the cat"), (2L, ""), (3L, null))
      .toDF("id", "text")
    val w = Dsir.importanceWeights(docs, "text", ratios, m)
      .select($"id", $"log_weight")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(2L) == 0.0)
    assert(w(3L) == 0.0) // null text == empty text, never null weight
  }

  test("parameter validation refuses bad inputs") {
    val df = Seq("x").toDF("text")
    intercept[IllegalArgumentException] {
      Dsir.hashedNgramCounts(df, "text", 1)
    }
    intercept[IllegalArgumentException] {
      Dsir.logRatioTable(df, df, "text", m, alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      // ratio table built at a DIFFERENT m than the weighting pass
      val ratios = Dsir.logRatioTable(df, df, "text", 32)
      Dsir.importanceWeights(df, "text", ratios, m)
    }
    intercept[IllegalArgumentException] {
      Dsir.resampleGumbel(df.withColumn("id", lit(1L))
        .withColumn("w", lit(0.0)), "id", "w", n = 0)
    }
  }
}
