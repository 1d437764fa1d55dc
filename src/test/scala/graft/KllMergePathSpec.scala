package graft

import org.apache.spark.sql.functions._

/** VERDICT r10 item 3: [[graft.operators.Profile.kllQuantiles]] must
  * not funnel an unbounded-cycles append-only digest through the
  * driver — past `kllDistributedMergeThreshold` rows the merge runs
  * as a per-column reduceByKey, and only one merged row per column
  * returns. These tests pin the two paths against each other by
  * forcing each via the `mergeThreshold` knob.
  *
  * Exactness framing: KLL compaction is randomized, so different
  * merge-tree shapes are equally valid sketch states, not byte-equal
  * ones. On sub-k digests the sketch retains every value, no
  * compaction happens, and BOTH paths must return identical exact
  * order statistics; past compaction scale the distributed path must
  * sit within the sketch's rank-error bound against the true ECDF,
  * same floor the driver path is pinned to in OperatorsSpec. */
class KllMergePathSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Profile

  test("sub-k digest: distributed merge == driver merge, exactly") {
    // 30 append cycles x 3 values x 2 columns, total 90 < k=200 per
    // column: every value is retained, merge order cannot matter
    val dir = java.nio.file.Files.createTempDirectory("graft_kllmp")
      .toString + "/d"
    (0 until 30).foreach { c =>
      val rows = (0 until 3).map(i => (c * 3 + i + 0.5, 1000.0 - c * 3 - i))
      Profile.appendKllDigest(rows.toDF("a", "b"), Seq("a", "b"), dir)
    }
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    def run(thr: Int) =
      Profile.kllQuantiles(spark, dir, qs, mergeThreshold = thr)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
        .toMap
    val driver = run(Int.MaxValue)
    val dist = run(0)
    assert(driver == dist)
    assert(driver.size == qs.size * 2)
    // and both are the exact order statistics
    assert(driver(("a", 1.0)) == 89.5 && driver(("a", 0.0)) == 0.5)
    assert(driver(("b", 1.0)) == 1000.0)
  }

  test("joinCardinality: exact product arithmetic, nulls never match") {
    val a = Seq(Some(1L), Some(1L), Some(2L), None).toDF("k")
    val b = Seq(1L, 2L, 2L, 3L).toDF("j")
    val r = Profile.joinCardinality(a, b, Seq("k"), Seq("j"))
      .collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)    // n_a, n_b
    assert(r.getLong(2) == 1 && r.getLong(3) == 0)    // null keys
    assert(r.getLong(4) == 2 && r.getLong(5) == 3)    // distincts
    assert(r.getLong(6) == 2)                         // matching keys
    // join rows: k=1 -> 2x1, k=2 -> 1x2  = 4; hottest key 2 rows
    // (doubles by design: long x long products wrap at the hot-key
    // scale this pre-flight exists to warn about)
    assert(r.getDouble(7) == 4.0 && r.getDouble(8) == 2.0)
    // the prediction IS the join's count
    assert(a.join(b, a("k") === b("j")).count() == 4)
    // disjoint sides: zero matches, zero rows, maxes stay 0 not null
    val r2 = Profile.joinCardinality(a,
        Seq(9L).toDF("j"), Seq("k"), Seq("j")).collect().head
    assert(r2.getLong(6) == 0 && r2.getDouble(7) == 0.0 &&
      r2.getDouble(8) == 0.0)
    intercept[IllegalArgumentException] {
      Profile.joinCardinality(a, b, Nil, Nil)
    }
  }

  test("entropy: uniform, skew, single-category, null drop") {
    val uni = Seq("a", "b", "c", "d").toDF("v")
    val r = Profile.entropy(uni, "v").collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    // p = (0.75, 0.25): H = 0.811278 bits
    val skew = Seq("a", "a", "a", "b").toDF("v")
    val s = Profile.entropy(skew, "v").collect().head
    assert(math.abs(s.getDouble(2) - 0.8112781244591328) < 1e-12)
    // one category: H = 0, normalized undefined (null, not NaN)
    val one = Seq(Some("a"), Some("a"), None).toDF("v")
    val o = Profile.entropy(one, "v").collect().head
    assert(o.getLong(0) == 2 && o.getDouble(2) == 0.0 && o.isNullAt(3))
  }

  test("mutualInformation: dependence 1 bit, independence 0, identity") {
    // b == a: one determines the other exactly
    val dep = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("y", "y"))
      .toDF("a", "b")
    val d = Profile.mutualInformation(dep, "a", "b").collect().head
    assert(math.abs(d.getDouble(4) - 1.0) < 1e-12)
    assert(math.abs(d.getDouble(5) - 1.0) < 1e-12)
    // all four combinations equally often: independent
    val ind = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"))
      .toDF("a", "b")
    val i = Profile.mutualInformation(ind, "a", "b").collect().head
    assert(math.abs(i.getDouble(4)) < 1e-12)
    assert(math.abs(i.getDouble(3) - 2.0) < 1e-12) // H(a,b) = 2 bits
    // a null on EITHER side drops the row from all three entropies
    val withNull = Seq(("x", Some("x")), ("y", None), ("x", Some("x")))
      .toDF("a", "b")
    assert(Profile.mutualInformation(withNull, "a", "b")
      .collect().head.getLong(0) == 2)
  }

  test("post-compaction scale: distributed merge holds the rank bound") {
    val rng = new scala.util.Random(411)
    val vals = (1 to 50000).map(_ => math.pow(rng.nextDouble(), 2) * 1e3)
    val dir = java.nio.file.Files.createTempDirectory("graft_kllmp2")
      .toString + "/d"
    val df = vals.toDF("v").repartition(8)
    Profile.appendKllDigest(df.filter($"v" < 300), Seq("v"), dir)
    Profile.appendKllDigest(df.filter($"v" >= 300), Seq("v"), dir)
    val qs = Seq(0.5, 0.9, 0.99)
    val est = Profile.kllQuantiles(spark, dir, qs, mergeThreshold = 0)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val rank = sorted.count(_ <= est(q)).toDouble / vals.size
      assert(math.abs(rank - q) < 0.05,
        s"q=$q: est ${est(q)} sits at rank $rank")
    }
  }
}
