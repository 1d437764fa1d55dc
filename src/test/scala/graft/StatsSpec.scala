package graft

import org.apache.spark.sql.functions._
import graft.operators.{AbTest, Profile}

/** Statistical-test operators: hand-traced fixtures for Welch's t,
  * chi-square independence, Mann–Whitney U (incl. exact tie
  * handling), Jensen–Shannon drift, and Gini concentration. */
class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("welchT: hand-computed arms, degenerate arm yields null t") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("A", _))
      ++ Seq(2.0, 4.0, 6.0, 8.0, 10.0).map(("B", _))).toDF("g", "v")
    val r = AbTest.welchT(df, "g", "v", "A", "B").collect().head
    assert(r.getLong(0) == 4L && r.getLong(3) == 5L)
    assert(r.getDouble(1) == 2.5 && r.getDouble(4) == 6.0)
    // s2_a = 5/3, s2_b = 10; t = -3.5/sqrt(5/12 + 2); df by W-S
    val se2 = 5.0 / 3 / 4 + 10.0 / 5
    val tExp = -3.5 / math.sqrt(se2)
    val dfExp = se2 * se2 /
      (math.pow(5.0 / 3 / 4, 2) / 3 + math.pow(2.0, 2) / 4)
    assert(math.abs(r.getDouble(6) - tExp) < 1e-5)
    assert(math.abs(r.getDouble(7) - dfExp) < 1e-3)
    // single-row arm: variance undefined -> null t, not NaN
    val tiny = Seq(("A", 1.0), ("B", 2.0), ("B", 3.0)).toDF("g", "v")
    assert(AbTest.welchT(tiny, "g", "v", "A", "B")
      .collect().head.isNullAt(6))
  }

  test("chiSquare: perfect independence is 0; 2x2 hand value; empty cell") {
    // independent: every (a, b) combo equally likely
    val ind = (for (a <- Seq("x", "y"); b <- Seq("u", "w");
                    _ <- 1 to 10) yield (a, b)).toDF("a", "b")
    val r0 = AbTest.chiSquareIndependence(ind, "a", "b").collect().head
    assert(r0.getDouble(0) == 0.0 && r0.getLong(1) == 1L
      && r0.getLong(2) == 40L)
    // (10,20 / 20,10): e = 15 everywhere, chi2 = 4 * 25/15 = 6.6667
    val skew = (Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "w"))
      ++ Seq.fill(20)(("y", "u")) ++ Seq.fill(10)(("y", "w")))
      .toDF("a", "b")
    val r1 = AbTest.chiSquareIndependence(skew, "a", "b").collect().head
    assert(math.abs(r1.getDouble(0) - 20.0 / 3) < 1e-3)
    // an absent observed cell still contributes its expected count:
    // (5,5 / 5,0): e(y,w) = 10*5/15 = 10/3, term = 10/3
    val gap = (Seq.fill(5)(("x", "u")) ++ Seq.fill(5)(("x", "w"))
      ++ Seq.fill(5)(("y", "u"))).toDF("a", "b")
    val r2 = AbTest.chiSquareIndependence(gap, "a", "b").collect().head
    // chi2 = sum over 4 cells: e = (10*10/15, 10*5/15, 5*10/15, 5*5/15)
    //      = (20/3, 10/3, 10/3, 5/3); o = (5, 5, 5, 0)
    val chi = math.pow(5 - 20.0 / 3, 2) / (20.0 / 3) +
      math.pow(5 - 10.0 / 3, 2) / (10.0 / 3) +
      math.pow(5 - 10.0 / 3, 2) / (10.0 / 3) +
      math.pow(0 - 5.0 / 3, 2) / (5.0 / 3)
    assert(math.abs(r2.getDouble(0) - chi) < 1e-3)
  }

  test("mannWhitneyU: tie-free and tied hand fixtures") {
    val plain = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    val r = AbTest.mannWhitneyU(plain, "g", "v", "A", "B")
      .collect().head
    assert(r.getDouble(2) == 0.0) // U_a = 0: A fully below B
    assert(math.abs(r.getDouble(3) - (-2.0 / math.sqrt(20.0 / 12)))
      < 1e-5)
    // ties: A=[1,1], B=[1,2] -> midranks 2,2,2,4; U_a=1; sigma^2=1
    val tied = Seq(("A", 1.0), ("A", 1.0), ("B", 1.0), ("B", 2.0))
      .toDF("g", "v")
    val rt = AbTest.mannWhitneyU(tied, "g", "v", "A", "B")
      .collect().head
    assert(rt.getDouble(2) == 1.0)
    assert(math.abs(rt.getDouble(3) - (-1.0)) < 1e-6)
  }

  test("jsDrift: identical 0, disjoint 1 bit, null categories dropped") {
    val p = (Seq.fill(30)("en") ++ Seq.fill(10)("de")).toDF("lang")
    assert(Profile.jsDrift(p, p, "lang")
      .collect().head.getDouble(3) == 0.0)
    val q = Seq.fill(20)("fr").toDF("lang")
    val dis = Profile.jsDrift(p, q, "lang").collect().head
    assert(math.abs(dis.getDouble(3) - 1.0) < 1e-9)
    assert(dis.getLong(2) == 3L) // en, de, fr
    val withNull = (Seq.fill(30)(Some("en")) ++ Seq.fill(10)(None))
      .toDF("lang")
    val r = Profile.jsDrift(withNull, p, "lang").collect().head
    assert(r.getLong(0) == 30L) // nulls dropped from the census
  }

  test("spearman: monotone-nonlinear 1, reversed -1, tie midranks") {
    val mono = (1 to 50).map(i => (i.toDouble, math.pow(i, 3)))
      .toDF("a", "b")
    assert(AbTest.spearmanCorr(mono, "a", "b")
      .collect().head.getDouble(1) == 1.0)
    val rev = (1 to 50).map(i => (i.toDouble, -math.pow(i, 3)))
      .toDF("a", "b")
    assert(AbTest.spearmanCorr(rev, "a", "b")
      .collect().head.getDouble(1) == -1.0)
    // ties on one side: midranks, |rho| < 1 but positive
    val tied = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 2.0), (4.0, 3.0))
      .toDF("a", "b")
    val rho = AbTest.spearmanCorr(tied, "a", "b")
      .collect().head.getDouble(1)
    assert(rho > 0.9 && rho < 1.0)
  }

  test("evalRanking: hand-computed recall/mrr/ndcg, zero-hit queries") {
    import graft.operators.Search
    val results = Seq((1L, 101L, 1), (1L, 102L, 2), (1L, 103L, 3),
      (2L, 101L, 1), (2L, 102L, 2)).toDF("qid", "id", "rank")
    val qrels = Seq((1L, 101L), (1L, 103L), (1L, 104L),
      (2L, 999L), (3L, 101L)).toDF("qid", "id")
    val got = Search.evalRanking(results, "qid", "id", "rank",
        qrels, "qid", "id", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // qid 1: hits at rank 1 and 3 of 3 relevant
    val dcg = 1.0 / (math.log(2) / math.log(2)) +
      1.0 / (math.log(4) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    val e1 = got(1L)
    assert(e1._1 == 3L && e1._2 == 2L)
    assert(math.abs(e1._3 - 2.0 / 3) < 1e-6)
    assert(e1._4 == 1.0)
    assert(math.abs(e1._5 - dcg / idcg) < 1e-6)
    // qid 2: judged but no hit in top-k -> all zeros
    assert(got(2L) == ((1L, 0L, 0.0, 0.0, 0.0)))
    // qid 3: judged but the retriever returned nothing -> zeros too
    assert(got(3L)._2 == 0L && got(3L)._3 == 0.0)
    assert(got.size == 3)
  }

  test("proportionCI: Wilson hand values, boundary sanity, null drop") {
    import graft.operators.AbTest
    val df = (Seq.fill(8)(("g1", Some(true))) ++
      Seq.fill(2)(("g1", Some(false))) ++
      Seq.fill(5)(("g2", Some(false))) ++
      Seq(("g2", None))).toDF("g", "ok")
    val z = 1.959964
    val got = AbTest.proportionCI(df, "g", "ok", z)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    val (n1, s1, p1, lo1, hi1) = got("g1")
    assert((n1, s1, p1) == ((10L, 8L, 0.8)))
    // Wilson closed form at p=0.8, n=10
    val denom = 1.0 + z * z / 10
    val center = (0.8 + z * z / 20) / denom
    val half = z * math.sqrt(0.8 * 0.2 / 10 + z * z / 400) / denom
    assert(math.abs(lo1 - (center - half)) < 1e-12)
    assert(math.abs(hi1 - (center + half)) < 1e-12)
    // p = 0 boundary: the Wald bar has width 0; Wilson does not,
    // and the null success row was DROPPED (n=5, not 6)
    val (n2, s2, p2, lo2, hi2) = got("g2")
    assert((n2, s2, p2) == ((5L, 0L, 0.0)))
    assert(lo2 == 0.0 && hi2 > 0.3)
    assert(hi1 <= 1.0 && lo2 >= 0.0)
  }

  test("rocAuc: rank identity, ties at 1/2, degenerate null") {
    import graft.operators.Classifier
    // pos {0.9, 0.4}, neg {0.6, 0.1}: 3 of 4 pairs ordered -> 0.75
    val df = Seq((0.9, true), (0.4, true), (0.6, false), (0.1, false))
      .toDF("s", "y")
    assert(Classifier.rocAuc(df, "s", "y").collect().head
      .getDouble(2) == 0.75)
    // perfect / inverted / all-tied
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false))
      .toDF("s", "y")
    assert(Classifier.rocAuc(perfect, "s", "y").collect().head
      .getDouble(2) == 1.0)
    val inverted = Seq((0.1, true), (0.9, false)).toDF("s", "y")
    assert(Classifier.rocAuc(inverted, "s", "y").collect().head
      .getDouble(2) == 0.0)
    val tied = Seq((0.5, true), (0.5, false), (0.5, true))
      .toDF("s", "y")
    assert(Classifier.rocAuc(tied, "s", "y").collect().head
      .getDouble(2) == 0.5)
    // single-class input: auc undefined -> null, not 0 or NaN
    val onlyPos = Seq((0.9, true)).toDF("s", "y")
    assert(Classifier.rocAuc(onlyPos, "s", "y").collect().head
      .isNullAt(2))
  }

  test("calibration: bin assignment, rates, probability-axis guard") {
    import graft.operators.Classifier
    val df = Seq((0.05, false), (0.95, true), (0.92, true),
      (0.98, false), (1.0, true)).toDF("s", "y")
    val got = Classifier.calibration(df, "s", "y", bins = 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got(0) == ((1L, 0.0)))
    // 1.0 clamps into the LAST bin, not a phantom bin 10
    assert(got(9)._1 == 4L && got(9)._2 == 0.75)
    assert(got.size == 2) // empty bins omitted
    intercept[IllegalArgumentException] {
      Classifier.calibration(Seq((1.2, true)).toDF("s", "y"), "s", "y")
    }
  }

  test("calibration: refusal census fused into the bin scan — 1 job") {
    import graft.operators.Classifier
    val df = Seq((0.1, false), (0.9, true), (0.5, true)).toDF("s", "y")
    val jobs = countJobs {
      Classifier.calibration(df, "s", "y", bins = 10)
    }
    assert(jobs == 1, s"expected the fused single job, saw $jobs")
  }

  test("gini: uniform 0, one-hot (n-1)/n, negatives refused") {
    val eq = Seq.fill(8)(5.0).toDF("v")
    assert(Profile.gini(eq, "v").collect().head.getDouble(2) == 0.0)
    val hot = Seq(0.0, 0.0, 0.0, 10.0).toDF("v")
    assert(Profile.gini(hot, "v").collect().head.getDouble(2) == 0.75)
    intercept[IllegalArgumentException] {
      Profile.gini(Seq(1.0, -2.0).toDF("v"), "v")
    }
    // all-zero total -> null gini, not NaN
    assert(Profile.gini(Seq(0.0, 0.0).toDF("v"), "v")
      .collect().head.isNullAt(2))
  }
}
