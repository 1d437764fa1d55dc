package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, GraphMetrics, Scd}

/** Batch sessionization, SCD2 interval building, and the degree-
  * oriented triangle census: hand-traced fixtures plus randomized
  * equality against naive references. */
class CensusOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- sessions ---------------------------------------------------------

  test("sessions: gap splits, islands aggregate, idx is 1-based in order") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:00:10")),
      (1L, ts("2024-01-01 01:00:00")), // 3590 s gap > 1800
      (2L, ts("2024-01-01 05:00:00"))
    ).toDF("user_id", "t")
    val got = EventAnalytics.sessions(df, "user_id", "t", 1800L)
      .orderBy(col("user_id"), col("session_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 10000000L), // 2 events, 10 s span
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
  }

  test("sessions: equal timestamps never split; nulls are dropped") {
    val df = Seq(
      (1L, Some(ts("2024-01-01 00:00:00"))),
      (1L, Some(ts("2024-01-01 00:00:00"))),
      (1L, None)
    ).toDF("user_id", "t")
    val got = EventAnalytics.sessions(df, "user_id", "t", 60L).collect()
    assert(got.length == 1)
    assert(got(0).getLong(4) == 2L) // n_events: null row gone
    assert(got(0).getLong(5) == 0L)
  }

  test("sessions: partition-count invariant") {
    val rng = new scala.util.Random(401)
    val rows = (1 to 500).map { _ =>
      (rng.nextInt(5).toLong,
        new Timestamp(1700000000000L + rng.nextInt(1000000) * 1000L))
    }
    def run(parts: Int) =
      EventAnalytics.sessions(rows.toDF("user_id", "t").repartition(parts),
          "user_id", "t", 300L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
          r.getLong(5))).toSet
    assert(run(1) == run(7))
  }

  // ---- scd2 -------------------------------------------------------------

  private val changeLog = Seq(
    (1L, ts("2024-01-01 00:00:00"), "A"),
    (1L, ts("2024-01-02 00:00:00"), "A"), // no-op
    (1L, ts("2024-01-03 00:00:00"), "B"),
    (1L, ts("2024-01-04 00:00:00"), "B"), // no-op
    (1L, ts("2024-01-05 00:00:00"), "A") // back to A -> NEW interval
  ).toDF("k", "t", "attr")

  test("scd2: maximal intervals, half-open bounds, current flag") {
    val got = Scd.scd2(changeLog, "k", "t", Seq("attr"))
      .orderBy(col("valid_from"))
      .collect().map(r => (r.getTimestamp(1), Option(r.getTimestamp(2)),
        r.getBoolean(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")),
        false, "A"),
      (ts("2024-01-03 00:00:00"), Some(ts("2024-01-05 00:00:00")),
        false, "B"),
      (ts("2024-01-05 00:00:00"), None, true, "A")))
  }

  test("scd2: collapse=false keeps every distinct-instant change") {
    val got = Scd.scd2(changeLog, "k", "t", Seq("attr"),
      collapse = false)
    assert(got.count() == 5)
    // still gapless: valid_to chain equals the next valid_from
    val rows = got.orderBy(col("valid_from")).collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(2) == b.getTimestamp(1))
    }
  }

  test("scd2: same-instant writes collapse to the max-struct winner") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, ts("2024-01-01 00:00:00"), "C"),
      (1L, ts("2024-01-01 00:00:00"), "B")
    ).toDF("k", "t", "attr")
    val got = Scd.scd2(df, "k", "t", Seq("attr")).collect()
    assert(got.length == 1 && got(0).getString(4) == "C")
  }

  test("scd2: null-safe no-op detection over multiple attrs") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), Some("x"), None: Option[String]),
      (1L, ts("2024-01-02 00:00:00"), Some("x"), None: Option[String]),
      (1L, ts("2024-01-03 00:00:00"), Some("x"), Some("y"))
    ).toDF("k", "t", "a1", "a2")
    val got = Scd.scd2(df, "k", "t", Seq("a1", "a2"))
    assert(got.count() == 2) // null==null is a no-op, not a change
  }

  test("scd2 snapshotAt: containment incl. the half-open boundary") {
    val dim = Scd.scd2(changeLog, "k", "t", Seq("attr"))
    def stateAt(s: String): Seq[String] =
      Scd.snapshotAt(dim, lit(ts(s)))
        .collect().map(_.getString(4)).toSeq
    assert(stateAt("2024-01-02 12:00:00") == Seq("A"))
    assert(stateAt("2024-01-03 00:00:00") == Seq("B")) // boundary -> new
    assert(stateAt("2024-12-01 00:00:00") == Seq("A")) // current
    assert(stateAt("2023-12-31 00:00:00").isEmpty) // before first
  }

  // ---- windowed funnel / twap ----------------------------------------------

  test("funnelWindowed: window bounds from FIRST touch, no re-anchor") {
    import graft.operators.EventAnalytics
    val ev = Seq(
      // u1: click inside the 60 s window -> reaches 2
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:00:30"), "click"),
      // u2: click after the window -> stuck at 1
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 00:02:00"), "click"),
      // u3: a SECOND view inside would admit the click if the window
      // re-anchored; first-touch semantics say no
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:01:30"), "view"),
      (3L, ts("2024-01-01 00:02:00"), "click")
    ).toDF("u", "t", "e")
    val got = EventAnalytics.funnelWindowed(ev, "u", "t", "e",
        Seq("view", "click"), windowSeconds = 60L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 3L, 2 -> 1L))
    // and the unwindowed funnel admits all three clicks
    val plain = EventAnalytics.funnel(ev, "u", "t", "e",
        Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(plain == Map(1 -> 3L, 2 -> 3L))
  }

  test("timeWeightedAvg: duration weights, null on zero duration") {
    import graft.operators.EventAnalytics
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:00:10"), 20.0),
      (1L, ts("2024-01-01 00:00:30"), 99.0), // terminal: no duration
      (2L, ts("2024-01-01 00:00:00"), 7.0) // single obs
    ).toDF("u", "t", "v")
    val got = EventAnalytics.timeWeightedAvg(ev, "u", "t", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    // (10*10 + 20*20) / 30 = 16.666667
    assert(got(1L)._1 == 3L && got(1L)._2 == 30000000L)
    assert(got(1L)._3.map(_.asInstanceOf[Double]).exists(
      v => math.abs(v - 500.0 / 30) < 1e-5))
    assert(got(2L)._3.isEmpty)
  }

  // ---- scd2 enrichment / diff --------------------------------------------

  test("enrichAsOf: facts get the state current AT FACT TIME") {
    val dim = Scd.scd2(changeLog, "k", "t", Seq("attr"))
    val facts = Seq(
      (1L, ts("2024-01-02 12:00:00"), "f1"), // inside [01-01, 01-03) A
      (1L, ts("2024-01-03 00:00:00"), "f2"), // boundary -> B
      (1L, ts("2023-12-01 00:00:00"), "f3"), // before history -> null
      (1L, ts("2025-06-01 00:00:00"), "f4"), // current interval -> A
      (9L, ts("2024-01-02 00:00:00"), "f5") // unknown key -> null
    ).toDF("k", "ft", "tag")
    val got = Scd.enrichAsOf(facts, "ft", dim, "k")
      .collect().map(r => r.getAs[String]("tag")
        -> Option(r.getAs[String]("attr"))).toMap
    assert(got == Map("f1" -> Some("A"), "f2" -> Some("B"),
      "f3" -> None, "f4" -> Some("A"), "f5" -> None))
  }

  test("changedBetween: added/removed/changed, stable keys absent") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), "A"), // stable A throughout
      (2L, ts("2024-01-01 00:00:00"), "A"), // A -> B between probes
      (2L, ts("2024-01-15 00:00:00"), "B"),
      (3L, ts("2024-01-12 00:00:00"), "C") // first seen between
    ).toDF("k", "t", "attr")
    val dim = Scd.scd2(log, "k", "t", Seq("attr"))
    val got = Scd.changedBetween(dim,
        lit(ts("2024-01-05 00:00:00")), lit(ts("2024-01-20 00:00:00")),
        "k")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[String]("attr_before")),
          Option(r.getAs[String]("attr_after")),
          r.getAs[String]("change"))).toMap
    assert(got == Map(
      2L -> (Some("A"), Some("B"), "changed"),
      3L -> (None, Some("C"), "added")))
  }

  // ---- path n-grams --------------------------------------------------------

  test("pathNgrams: counts every consecutive run, pins n bounds") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:01"), "a"),
      (1L, ts("2024-01-01 00:00:02"), "b"),
      (1L, ts("2024-01-01 00:00:03"), "c"),
      (1L, ts("2024-01-01 00:00:04"), "b"),
      (2L, ts("2024-01-01 00:00:01"), "a"),
      (2L, ts("2024-01-01 00:00:02"), "b")
    ).toDF("u", "t", "e")
    val got3 = EventAnalytics.pathNgrams(ev, "u", "t", "e", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got3 == Map("a>b>c" -> 1L, "b>c>b" -> 1L))
    val got2 = EventAnalytics.pathNgrams(ev, "u", "t", "e", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == Map("a>b" -> 2L, "b>c" -> 1L, "c>b" -> 1L))
    intercept[IllegalArgumentException] {
      EventAnalytics.pathNgrams(ev, "u", "t", "e", 1)
    }
  }

  // ---- triangles --------------------------------------------------------

  test("triangles: K4 minus an edge, counts and lcc hand-traced") {
    // edges incl. a reversed duplicate and a self-loop to exercise
    // canonicalization
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 3L)).toDF("s", "d")
    val tri = GraphMetrics.triangles(e, "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(tri == Set((1L, 2L, 3L), (2L, 3L, 4L)))
    val lcc = GraphMetrics.clusteringCoefficients(e, "s", "d")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(lcc == Map(
      1L -> (2L, 1L, 1.0), 2L -> (3L, 2L, 0.6667),
      3L -> (3L, 2L, 0.6667), 4L -> (2L, 1L, 1.0)))
  }

  test("triangles: hub skew — star plus one rim edge has exactly one") {
    val star = (1L to 10L).map(i => (100L, i))
    val e = (star :+ (1L, 2L)).toDF("s", "d")
    val tri = GraphMetrics.triangles(e, "s", "d").collect()
    assert(tri.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 2L, 100L)))
    // triangle-free nodes surface with lcc 0 in the full census
    val census = GraphMetrics.clusteringCoefficients(e, "s", "d")
    assert(census.count() == 11)
    assert(census.filter(col("n_triangles") === 0).count() == 8)
  }

  test("triangles: randomized equality vs the naive driver reference") {
    val rng = new scala.util.Random(402)
    val n = 30
    val edges = (for {
      a <- 1 to n; b <- (a + 1) to n if rng.nextDouble() < 0.2
    } yield (a.toLong, b.toLong)).toVector
    val adj = edges.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap.withDefaultValue(Set.empty)
    def connected(a: Long, b: Long) = adj(a).contains(b)
    val naive = (for {
      x <- 1L to n.toLong; y <- (x + 1) to n.toLong
      z <- (y + 1) to n.toLong
      if connected(x, y) && connected(x, z) && connected(y, z)
    } yield (x, y, z)).toSet
    val got = GraphMetrics.triangles(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == naive)
  }

  test("triangles: triangle-free and empty graphs yield empty counts") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    assert(GraphMetrics.triangleCounts(path, "s", "d").count() == 0)
    val empty = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(GraphMetrics.triangles(empty, "s", "d").count() == 0)
  }

  // ---- k-core ------------------------------------------------------------

  test("kCore: pendant chains peel away, the dense core survives") {
    // triangle {1,2,3} + chain 3-4-5-6: 2-core = the triangle only
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L)).toDF("s", "d")
    val got = GraphMetrics.kCore(e, "s", "d", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the max possible degree -> empty core, no crash
    assert(GraphMetrics.kCore(e, "s", "d", k = 4).count() == 0)
  }

  test("kCore: randomized equality vs a naive driver peeling") {
    val rng = new scala.util.Random(404)
    val n = 40
    val edges = (for {
      a <- 1 to n; b <- (a + 1) to n if rng.nextDouble() < 0.12
    } yield (a.toLong, b.toLong)).toVector
    def naive(k: Int): Map[Long, Int] = {
      var e = edges.toSet
      var stable = false
      while (!stable) {
        val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val e2 = e.filter(p => deg(p._1) >= k && deg(p._2) >= k)
        stable = e2 == e
        e = e2
      }
      e.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .view.mapValues(_.size).toMap
    }
    for (k <- Seq(2, 3)) {
      val got = GraphMetrics.kCore(edges.toDF("s", "d"), "s", "d", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got == naive(k), s"k=$k")
    }
  }

  test("kCore: maxIters guard throws rather than half-peeling") {
    // a 6-chain needs 3 peel rounds at k=2 to empty out
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("s", "d")
    val ex = intercept[IllegalStateException] {
      GraphMetrics.kCore(e, "s", "d", k = 2, maxIters = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  // ---- Benford census -----------------------------------------------------

  test("benford: digit ladder, expected probabilities, chi2 arithmetic") {
    import graft.operators.AbTest
    // 9000 values with first digit d appearing d times per block of 45
    val vals = (0 until 200).flatMap { _ =>
      (1 to 9).flatMap(d => Seq.fill(d)(d * 100.0 + 7))
    } // digit d occurs 200*d times; n = 9000
    val df = vals.toDF("v")
    val got = AbTest.benford(df, "v")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    val n = vals.size
    got.foreach { case (d, obs, pb) =>
      assert(obs == 200L * d, s"digit $d")
      assert(math.abs(pb - math.log10(1.0 + 1.0 / d)) < 1e-6)
    }
    // decade boundaries: 10 -> 1, 9.99 -> 9, 0.5 dropped, -200 -> 2.
    // nextDown(1000.0) is the ADVICE-r10 half-ulp case: v/100 rounds
    // to exactly 10.0 and the unclamped ladder emitted digit 10 — a
    // row the digit-1..9 join dropped while the total still counted
    // it. The clamp lands it on its true leading digit, 9, and the
    // probability column proves it stayed IN the total.
    val edge = Seq(10.0, 9.99, 0.5, -200.0, Double.NaN,
      Math.nextDown(1000.0)).toDF("v")
    val out = AbTest.benford(edge, "v").collect()
    val digs = out.filter(_.getLong(1) > 0)
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(digs == Map(1 -> 1L, 9 -> 2L, 2 -> 1L))
    // p_obs sums to 1: no row silently dropped from the census
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-5)
    assert(n == 9000)
  }

  // ---- sorted-neighborhood blocking -------------------------------------

  test("blocking: pairs follow the (key, id) sort order exactly") {
    import graft.operators.Blocking
    // sort order by (key, id): (a,1) (a,3) (b,2) (c,4)
    val df = Seq((1L, "a"), (3L, "a"), (2L, "b"), (4L, "c"))
      .toDF("id", "k")
    val got = Blocking.sortedNeighborPairs(df, "id", "k", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      (1L, 3L, 1L), (3L, 2L, 1L), (2L, 4L, 1L), // adjacent
      (1L, 2L, 2L), (3L, 4L, 2L))) // distance 2
  }

  test("blocking: candidate count is the exact n*w law, skew-free") {
    import graft.operators.Blocking
    // all rows share ONE key — the case that melts a bucket-join;
    // the window bound keeps it linear regardless
    val n = 200
    val df = (1 to n).map(i => (i.toLong, "same")).toDF("id", "k")
    val w = 5
    val cnt = Blocking.sortedNeighborPairs(df, "id", "k", w).count()
    assert(cnt == (1 until w).map(j => n - j).sum.toLong)
  }

  test("blocking: rank is deterministic across partitionings") {
    import graft.operators.Blocking
    val rng = new scala.util.Random(403)
    val rows = (1 to 300).map(i => (i.toLong, s"k${rng.nextInt(40)}"))
    def run(parts: Int) =
      Blocking.sortedNeighborPairs(
          rows.toDF("id", "k").repartition(parts), "id", "k", 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(run(1) == run(8))
  }

  test("blocking: window bounds throw early") {
    import graft.operators.Blocking
    val df = Seq((1L, "a")).toDF("id", "k")
    intercept[IllegalArgumentException] {
      Blocking.sortedNeighborPairs(df, "id", "k", 1)
    }
    intercept[IllegalArgumentException] {
      Blocking.sortedNeighborPairs(df, "id", "k", 1001)
    }
  }

  test("stationaryDistribution: converges to the known eigenvector") {
    // chain P(A->B)=1, P(B->A)=P(B->B)=0.5 has stationary (1/3, 2/3);
    // transition counts are forged from two-event user sequences
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(0), "A"), (1L, ts(1), "B"),   // A->B
      (2L, ts(0), "A"), (2L, ts(1), "B"),   // A->B
      (3L, ts(0), "B"), (3L, ts(1), "A"),   // B->A
      (4L, ts(0), "B"), (4L, ts(1), "B")    // B->B
    ).toDF("user_id", "t", "event_type")
    val got = EventAnalytics.stationaryDistribution(ev, "user_id",
        "t", "event_type", iters = 40)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("A") - 1.0 / 3) < 1e-9, s"A: ${got("A")}")
    assert(math.abs(got("B") - 2.0 / 3) < 1e-9)
    // every round is a valid distribution
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // absorbing chain: B is a sink (appears only as a target) — the
    // implicit self-loop absorbs all mass instead of renormalizing
    // 0/0 (the defect this fixture caught in r11)
    val absorbing = Seq((1L, ts(0), "A"), (1L, ts(1), "B"))
      .toDF("user_id", "t", "event_type")
    val abs = EventAnalytics.stationaryDistribution(absorbing,
        "user_id", "t", "event_type", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(abs("A") == 0.0 && abs("B") == 1.0)
    intercept[IllegalArgumentException] {
      EventAnalytics.stationaryDistribution(ev, "user_id", "t",
        "event_type", iters = 0)
    }
  }

  test("linkPrediction: CN/Jaccard/Adamic-Adar hand graph, hub cap") {
    // 1-2, 1-3, 2-3, 3-4, 2-4: the one non-adjacent pair with shared
    // neighbors is (1,4) through {2, 3} (both degree 3)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L),
      (2L, 1L) /* dup reversed */).toDF("s", "d")
    val got = GraphMetrics.linkPrediction(e, "s", "d").collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 4L, 2L)))
    assert(r.getDouble(3) == 1.0) // 2 / (2 + 2 - 2)
    assert(math.abs(r.getDouble(4) - 2.0 / math.log(3.0)) < 1e-12)
    // keep existing edges: (2,3) scores through {1, 4} as well
    val all = GraphMetrics.linkPrediction(e, "s", "d",
        excludeExisting = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(all((2L, 3L)) == 2L && all.contains((1L, 4L)))
    // hub cap: with maxDegree = 2 the degree-3 intermediates {2, 3}
    // are excluded and (1,4) is no longer reachable — the documented
    // recall trade
    assert(GraphMetrics.linkPrediction(e, "s", "d", maxDegree = 2)
      .count() == 0)
  }

  test("attribution: first/last touch in lookback, organic nulls, ties") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      ("u", ts(0), 1L, "click"),
      ("u", ts(10), 2L, "view"),
      ("u", ts(15), 3L, "purchase"),  // window [-20, 15]: click, view
      ("u", ts(100), 4L, "purchase"), // nothing within 20s: organic
      ("v", ts(50), 5L, "view"),
      ("v", ts(50), 6L, "view"),      // same-second tie: id breaks it
      ("v", ts(50), 7L, "purchase"),  // touch at conversion instant counts
      ("v", ts(60), 8L, "error")      // not a touch, not a conversion
    ).toDF("user_id", "t", "event_id", "event_type")
    val got = EventAnalytics.attribution(df, "user_id", "t", "event_id",
        "event_type", "purchase", Seq("click", "view"), 20L)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.getString(3)), Option(r.get(4)),
          Option(r.getString(5)), Option(r.get(6))))).toMap
    assert(got(3L) == ((Some("click"), Some(1L), Some("view"), Some(2L))))
    assert(got(4L) == ((None, None, None, None)))
    // v: two views at the same second — first takes id 5, last id 6
    assert(got(7L) == ((Some("view"), Some(5L), Some("view"), Some(6L))))
    assert(got.size == 3)
    intercept[IllegalArgumentException] {
      EventAnalytics.attribution(df, "user_id", "t", "event_id",
        "event_type", "purchase", Seq("purchase"), 20L)
    }
  }
}
