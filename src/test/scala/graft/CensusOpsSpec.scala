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
}
