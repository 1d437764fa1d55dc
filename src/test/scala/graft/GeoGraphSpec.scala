package graft

import org.apache.spark.sql.functions._
import graft.operators.{Geo, PageRank}

class GeoGraphSpec extends SparkTestBase {
  import spark.implicits._

  private def square(cx: Double, cy: Double, half: Double) =
    Seq((cx - half, cy - half), (cx + half, cy - half),
      (cx + half, cy + half), (cx - half, cy + half))
      .map { case (x, y) => (x, y) }

  test("pointInPolygon: inside / outside / concave") {
    val poly = Seq((1, square(0, 0, 1))).toDF("pid", "verts")
      .select($"pid", expr(
        "transform(verts, v -> named_struct('x', v._1, 'y', v._2))").as("verts"))
    def hit(x: Double, y: Double): Boolean =
      poly.select(Geo.pointInPolygon(lit(x), lit(y), $"verts")).head()
        .getBoolean(0)
    assert(hit(0.0, 0.0) && hit(0.9, -0.9))
    assert(!hit(1.5, 0.0) && !hit(0.0, -2.0))
    // concave "L" polygon: notch at the top-right quadrant
    val l = Seq(Tuple1(Seq((0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0),
      (1.0, 2.0), (0.0, 2.0)))).toDF("verts")
      .select(expr(
        "transform(verts, v -> named_struct('x', v._1, 'y', v._2))").as("verts"))
    def lhit(x: Double, y: Double): Boolean =
      l.select(Geo.pointInPolygon(lit(x), lit(y), $"verts")).head()
        .getBoolean(0)
    assert(lhit(0.5, 0.5) && lhit(0.5, 1.5) && lhit(1.5, 0.5))
    assert(!lhit(1.5, 1.5)) // the notch
  }

  test("geoWithin: points pick up attributes of containing polygons") {
    val polys = Seq(("zoneA", square(0, 0, 1)), ("zoneB", square(10, 10, 1)))
      .toDF("zone", "verts")
      .select($"zone", expr(
        "transform(verts, v -> named_struct('x', v._1, 'y', v._2))").as("verts"))
    val pts = Seq((1L, 0.5, 0.5), (2L, 10.2, 9.8), (3L, 5.0, 5.0))
      .toDF("id", "x", "y")
    val joined = Geo.geoWithin(pts, polys, "x", "y", "verts")
    val got = joined.select($"id", $"zone").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "zoneA", 2L -> "zoneB")) // 3 is nowhere
  }

  test("pagerank: sink of a triangle ranks highest, ranks positive") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val ranks = PageRank.run(edges, maxIters = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 3)
    assert(ranks.values.forall(_ > 0.15))
    assert(ranks(3L) > ranks(2L)) // 3 receives from both 1 and 2
    assert(ranks(1L) > ranks(2L)) // 1 receives all of 3's rank
    // with no dangling nodes total rank converges to N
    assert(math.abs(ranks.values.sum - 3.0) < 0.05)
  }

  test("pagerank: distributed path agrees with the driver path") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L),
      (2L, 4L)).toDF("src", "dst")
    def ranks(thr: Long) = PageRank.run(edges, maxIters = 10,
        driverThreshold = thr).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val driver = ranks(1L << 20)
    val dist = ranks(0L)
    assert(driver.keySet == dist.keySet)
    driver.foreach { case (id, r) =>
      assert(math.abs(r - dist(id)) < 1e-9, s"id=$id $r vs ${dist(id)}")
    }
  }

  test("personalized pagerank: mass concentrates at seeds, absent " +
    "seeds renormalize, all-vertices seeding == global/n") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L),
      (2L, 4L)).toDF("src", "dst")
    // seed {1}: walker restarts at 1, so 1 and its successors carry
    // the mass; 999 is not a vertex and must be ignored
    val ppr = PageRank.personalized(edges, "src", "dst",
        Seq(1L, 999L).toDF("id"), "id", maxIters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppr(1L) > ppr(4L) && ppr(2L) > ppr(4L))
    assert(ppr.values.forall(_ >= 0.0))
    // seeding EVERY vertex makes the recurrence global PR scaled by
    // 1/n exactly (linearity: same matrix, scaled restart vector)
    val all = PageRank.personalized(edges, "src", "dst",
        Seq(1L, 2L, 3L, 4L).toDF("id"), "id", maxIters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val global = PageRank.run(edges, maxIters = 10,
        driverThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    all.foreach { case (id, r) =>
      assert(math.abs(r - global(id) / 4.0) < 1e-9, s"id=$id")
    }
    // no seed in the graph -> loud failure
    val e = intercept[IllegalArgumentException] {
      PageRank.personalized(edges, "src", "dst",
        Seq(999L).toDF("id"), "id")
    }
    assert(e.getMessage.contains("nowhere to land"))
  }

  test("withinDistance == brute-force haversine cross at every radius") {
    import graft.operators.Geo
    val rnd = new scala.util.Random(11)
    // |lat| <= 60 so the largest tested radius (2000 km) never crosses
    // the pole-wrap guard: sin(2000/R)/cos(60°) ≈ 0.62 < 1
    val pts = (1L to 60L).map(i =>
      (i, rnd.nextDouble() * 120 - 60, rnd.nextDouble() * 340 - 170))
      .toDF("pid", "lat", "lon")
    val ctrs = (1L to 15L).map(i =>
      (i, rnd.nextDouble() * 120 - 60, rnd.nextDouble() * 340 - 170))
      .toDF("cid", "clat", "clon")
    val cross = pts.crossJoin(ctrs)
      .withColumn("km", Geo.haversineKm($"lat", $"lon", $"clat", $"clon"))
      .cache()
    for (radius <- Seq(50.0, 300.0, 2000.0)) {
      val want = cross.filter(round($"km", 4) <= radius)
        .select($"pid", $"cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Geo.withinDistance(pts, "lat", "lon", ctrs, "clat",
          "clon", radius)
        .select($"pid", $"cid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // the 3x3 cell cover loses nothing AND emits nothing twice
      assert(got.length == got.toSet.size, s"radius=$radius duplicates")
      assert(got.toSet == want, s"radius=$radius")
    }
    cross.unpersist()
    // polar latitudes are rejected, not silently mis-gridded
    val polar = Seq((1L, 89.0, 0.0)).toDF("pid", "lat", "lon")
    val e = intercept[IllegalArgumentException] {
      Geo.withinDistance(polar, "lat", "lon", ctrs, "clat", "clon", 100)
    }
    assert(e.getMessage.contains("85"))
    // high-latitude regression (review r10): lat 70, r=1500 km,
    // lon delta 40° — great-circle distance 1494 km IS in radius,
    // but the parallel-arc lon width (39.4°) puts the pair two cells
    // apart (missed); the exact spherical-cap width (43.0°) covers it
    val hp = Seq((1L, 70.0, -40.0)).toDF("pid", "lat", "lon")
    val hc = Seq((9L, 70.0, 0.0)).toDF("cid", "clat", "clon")
    val hi = Geo.withinDistance(hp, "lat", "lon", hc, "clat", "clon",
      1500.0).select($"pid", $"cid").collect()
    assert(hi.length == 1, "high-latitude in-radius pair missed")
    // a radius whose cap crosses the pole at the data's latitude is
    // rejected, not silently under-covered (no finite lon grid works)
    val e2 = intercept[IllegalArgumentException] {
      Geo.withinDistance(hp, "lat", "lon", hc, "clat", "clon", 8000.0)
    }
    assert(e2.getMessage.contains("pole"))
    // explicit maxAbsLat skips the stats scan and gives the same pairs
    val explicitBound = Geo.withinDistance(pts, "lat", "lon", ctrs,
        "clat", "clon", 300.0, maxAbsLat = 80.0)
      .select($"pid", $"cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val derived = Geo.withinDistance(pts, "lat", "lon", ctrs,
        "clat", "clon", 300.0)
      .select($"pid", $"cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(explicitBound == derived)
    // known distance: 1 degree of longitude at the equator ~111.2 km
    val oneDeg = Geo.withinDistance(
      Seq((1L, 0.0, 0.0)).toDF("pid", "lat", "lon"),
      "lat", "lon",
      Seq((1L, 0.0, 1.0)).toDF("cid", "clat", "clon"),
      "clat", "clon", 120.0)
      .select($"distance_km").as[Double].head()
    assert(math.abs(oneDeg - 111.195) < 0.01, s"1 deg = $oneDeg km")
  }

  test("nearestCenter: argmin assignment, tie to lower id, range cut") {
    import graft.operators.Geo
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.0, 0.5), (3L, 40.0, 40.0))
      .toDF("pid", "lat", "lon")
    val ctrs = Seq((10L, 0.0, 0.2), (20L, 0.0, 1.0), (30L, 0.0, -0.2))
      .toDF("cid", "clat", "clon")
    val got = Geo.nearestCenter(pts, "lat", "lon", ctrs, "clat", "clon",
        maxRadiusKm = 100.0)
      .select($"pid", $"cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // p1 is equidistant from 10 and 30 (0.2 deg each) -> lower id 10;
    // p2 is closest to 10 (0.3 deg vs 0.5); p3 has nothing in range
    assert(got == Map(1L -> 10L, 2L -> 10L))
  }

  test("labelPropagation: bridged triangles split into their cores") {
    import graft.operators.LabelProp
    // two triangles joined by ONE bridge edge: CC would merge them
    // into a single component; LPA keeps the dense cores apart —
    // hand-traced through 3 synchronous min-tie rounds, {1,2,3}
    // settles on label 1 and {4,5,6} on label 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = LabelProp.labelPropagation(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(labels(1L), labels(2L), labels(3L)).size == 1)
    assert(Set(labels(4L), labels(5L), labels(6L)).size == 1)
    assert(labels(1L) != labels(4L), s"cores merged: $labels")
    // determinism: repartitioned and reversed-orientation edges give
    // the identical labeling (sync updates + min tie-break leave no
    // order to matter)
    val again = LabelProp.labelPropagation(
      edges.select($"dst".as("src"), $"src".as("dst")).repartition(7),
      "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == labels)
    // labels only flow along edges: disjoint subgraphs never share
    assert((Set(labels(1L), labels(2L), labels(3L)) ++
      Set(labels(4L), labels(5L), labels(6L))).subsetOf(Set(1L, 3L)))
    // iters = 0 is the identity labeling; self-loops are dropped
    val id0 = LabelProp.labelPropagation(
      edges.union(Seq((2L, 2L)).toDF("src", "dst")), "src", "dst", 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(id0 == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L,
      5L -> 5L, 6L -> 6L))
    // audit face mirrors clusterSizes
    val sizes = LabelProp.communitySizes(edges, "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(sizes.map(_._2).toSeq == Seq(3L, 3L))
  }
}
