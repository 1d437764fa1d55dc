package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** reference: ddf_library/functions/geo/ :: geo_within — spatial join:
  * keep (point, polygon-attribute) rows where the point falls inside a
  * polygon. The reference builds a pyqtree bbox index over the polygon
  * set and tests candidates per point.
  *
  * Spark-first shape: polygons are the provably-small side →
  * broadcast; a bbox prefilter prunes candidates inside the broadcast
  * join condition (cheap column comparisons the optimizer can see),
  * and a native ray-casting expression decides the exact test. No
  * shuffle of the point table at all — the plan is a single broadcast
  * nested-loop join over pruned candidates.
  */
object Geo {

  /** even-odd ray casting over a polygon given as array<struct<x,y>>;
    * boundary-inclusive on vertices-level precision */
  case class PointInPolygon(px: Expression, py: Expression,
                            vertices: Expression)
      extends Expression {
    override def children: Seq[Expression] = Seq(px, py, vertices)
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    def compute(x: Double, y: Double, arr: ArrayData): Boolean = {
      val n = arr.numElements()
      var inside = false
      var i = 0
      var j = n - 1
      while (i < n) {
        val vi = arr.getStruct(i, 2); val vj = arr.getStruct(j, 2)
        val xi = vi.getDouble(0); val yi = vi.getDouble(1)
        val xj = vj.getDouble(0); val yj = vj.getDouble(1)
        if (((yi > y) != (yj > y)) &&
            (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) inside = !inside
        j = i
        i += 1
      }
      inside
    }
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val xv = px.eval(input); val yv = py.eval(input)
      val vs = vertices.eval(input)
      if (xv == null || yv == null || vs == null) return null
      compute(xv.asInstanceOf[Double], yv.asInstanceOf[Double],
        vs.asInstanceOf[ArrayData])
    }
    // The exact test runs inside whole-stage codegen (it sits in a
    // broadcast-join condition evaluated per bbox-pruned candidate —
    // the hottest geo loop); children are codegen'd, the ray-casting
    // kernel is one virtual call.
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val xGen = px.genCode(ctx)
      val yGen = py.genCode(ctx)
      val vGen = vertices.genCode(ctx)
      val ref = ctx.addReferenceObj("pip", this, classOf[PointInPolygon].getName)
      ev.copy(code = code"""
        |${xGen.code}
        |${yGen.code}
        |${vGen.code}
        |boolean ${ev.isNull} =
        |  ${xGen.isNull} || ${yGen.isNull} || ${vGen.isNull};
        |boolean ${ev.value} = false;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $ref.compute(${xGen.value}, ${yGen.value}, ${vGen.value});
        |}""".stripMargin)
    }
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression =
      copy(c(0), c(1), c(2))
  }

  def pointInPolygon(x: Column, y: Column, vertices: Column): Column =
    Bridge.column(PointInPolygon(Bridge.expression(x),
      Bridge.expression(y), Bridge.expression(vertices)))

  /** Great-circle distance in km between two (lat, lon) degree pairs
    * — the haversine formula on a 6371.0088 km mean-radius sphere.
    * Degrees→radians is written out as `x * π / 180` with a π literal
    * rather than the `radians` builtin: Spark's Radians is
    * `x / 180 * π` while DuckDB's is `x * (π/180)` — same math, up to
    * 1-ulp different doubles; spelling the op order once and
    * replaying it verbatim keeps the oracle's arithmetic identical.
    * (sin/cos/asin come from each engine's libm and may still differ
    * in the last ulp — q154 rounds to 4 decimals, 0.1 m, so a
    * boundary flip needs the true value within ~1e-12 of a rounding
    * edge.) */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    def rad(c: Column): Column = c * lit(math.Pi) / lit(180.0)
    val dLat = rad(lat2 - lat1) / 2
    val dLon = rad(lon2 - lon1) / 2
    val h = sin(dLat) * sin(dLat) +
      cos(rad(lat1)) * cos(rad(lat2)) * sin(dLon) * sin(dLon)
    lit(2 * 6371.0088) * asin(sqrt(h))
  }

  /** Spatial radius join: every (point, center) pair within
    * `radiusKm` great-circle km — the proximity sibling of
    * [[geoWithin]], grid-cell bucketed so it is NEVER an all-pairs
    * cross (the reference's geo surface stops at containment; this is
    * the engine-ext k-NN/geofence primitive a location pipeline
    * needs).
    *
    * Shape at 100 TB: one stats aggregation computes the data's max
    * |lat| (pass `maxAbsLat` yourself to skip it when the domain is
    * known — geofencing usually is); each center explodes to its 3x3
    * neighbor cells, each point maps to ONE cell, the join keys on
    * the cell (hash shuffle both sides, AQE-splittable), and the
    * exact haversine predicate filters candidates. Cell sizing is
    * the EXACT spherical-cap bound, not the parallel-arc
    * approximation: the max longitude delta of an in-radius pair at
    * latitude φ is `asin(sin(r/R) / cos(φ))` — always ≥ the naive
    * `r / (111.195·cos φ)`, and the gap matters (at lat 80°,
    * r=2000 km the naive width misses true pairs two cells away).
    * With that width the 3x3 neighborhood COVERS the radius — no
    * recall loss (spec-pinned against the brute-force cross,
    * including the high-latitude case the naive sizing fails).
    * Candidate volume per cell is (points in cell) x (centers within
    * one cell), the usual grid trade.
    * Latitudes beyond ±85° are rejected (cos → 0 degenerates the lon
    * grid; polar workloads need a polar-cap partition, not a lon
    * grid), and the grid does NOT wrap the antimeridian — pairs
    * straddling lon ±180 are missed (shift the frame or
    * dual-register seam rows for trans-pacific data). Returns
    * point x center rows + `distance_km` rounded to 4 decimals
    * (0.1 m); name collisions are the caller's to resolve. */
  def withinDistance(points: DataFrame, pLatCol: String, pLonCol: String,
                     centers: DataFrame, cLatCol: String, cLonCol: String,
                     radiusKm: Double,
                     maxAbsLat: Double = Double.NaN): DataFrame = {
    require(radiusKm > 0, s"radiusKm must be positive, got $radiusKm")
    val kmPerDegLat = 111.195 // 2πR/360 at R = 6371.0088
    val latBound =
      if (!maxAbsLat.isNaN) maxAbsLat
      else { // ONE stats aggregation over the union of both lat columns
        val r = points.select(abs(col(pLatCol)).as("__l"))
          .unionByName(centers.select(abs(col(cLatCol)).as("__l")))
          .agg(max(col("__l"))).head()
        if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      }
    require(latBound <= 85.0,
      s"withinDistance supports |lat| <= 85 (got $latBound): the " +
        "lon grid degenerates toward the poles")
    val dLat = radiusKm / kmPerDegLat
    // exact spherical-cap max lon delta at the worst latitude; the
    // sine ratio >= 1 means the radius circle wraps past the pole at
    // that latitude — no finite lon grid covers it
    val sinRatio = math.sin(radiusKm / 6371.0088) /
      math.cos(math.toRadians(latBound))
    require(sinRatio < 1.0,
      s"radius $radiusKm km reaches around the pole at |lat| " +
        s"$latBound — shrink the radius or partition the polar cap")
    val dLon = math.toDegrees(math.asin(sinRatio))
    val pc = points
      .withColumn("__cy", floor(col(pLatCol) / dLat).cast("long"))
      .withColumn("__cx", floor(col(pLonCol) / dLon).cast("long"))
    val cc = centers
      .withColumn("__cy", explode(sequence(
        floor(col(cLatCol) / dLat).cast("long") - 1,
        floor(col(cLatCol) / dLat).cast("long") + 1)))
      .withColumn("__cx", explode(sequence(
        floor(col(cLonCol) / dLon).cast("long") - 1,
        floor(col(cLonCol) / dLon).cast("long") + 1)))
    pc.join(cc, Seq("__cy", "__cx"))
      .withColumn("distance_km", round(haversineKm(col(pLatCol),
        col(pLonCol), col(cLatCol), col(cLonCol)), 4))
      .filter(col("distance_km") <= radiusKm)
      .drop("__cy", "__cx")
  }

  /** Nearest-center assignment within a search radius: each point's
    * closest center by great-circle distance (ties break on the
    * center's first column, deterministically), provided one lies
    * within `maxRadiusKm` — points with no center in range are
    * absent, exactly like an inner radius join. The radius bounds the
    * candidate grid ([[withinDistance]]'s 3x3 cover), so assignment
    * cost is the radius join plus one per-point WindowGroupLimit
    * top-1 — never a scan of all centers per point. Pick the radius
    * from the center density (e.g. p99 nearest-hub distance); a too
    * -small radius loses points (visible as missing rows), a too
    * -large one only costs candidates. Point ROWS must be distinct
    * (the argmin window partitions on the point's columns) — frames
    * without a unique point id collapse coincident duplicates to one
    * assignment; carry an id column through. */
  def nearestCenter(points: DataFrame, pLatCol: String, pLonCol: String,
                    centers: DataFrame, cLatCol: String, cLonCol: String,
                    maxRadiusKm: Double,
                    maxAbsLat: Double = Double.NaN): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cIdCol = centers.columns.head
    val joined = withinDistance(points, pLatCol, pLonCol, centers,
      cLatCol, cLonCol, maxRadiusKm, maxAbsLat)
    val w = Window.partitionBy(points.columns.map(col): _*)
      .orderBy(col("distance_km").asc, col(cIdCol).asc)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** points(idCols..., xCol, yCol) x polygons(attrs..., verticesCol) →
    * points joined with the attributes of every polygon containing
    * them. Polygon table must be broadcast-small (reference semantics:
    * an indexed in-memory polygon set). */
  def geoWithin(points: DataFrame, polygons: DataFrame,
                xCol: String, yCol: String,
                verticesCol: String): DataFrame = {
    val polys = polygons
      .withColumn("__minx", expr(s"array_min(transform($verticesCol, v -> v.x))"))
      .withColumn("__maxx", expr(s"array_max(transform($verticesCol, v -> v.x))"))
      .withColumn("__miny", expr(s"array_min(transform($verticesCol, v -> v.y))"))
      .withColumn("__maxy", expr(s"array_max(transform($verticesCol, v -> v.y))"))
    points.join(broadcast(polys),
        col(xCol) >= col("__minx") && col(xCol) <= col("__maxx") &&
          col(yCol) >= col("__miny") && col(yCol) <= col("__maxy") &&
          pointInPolygon(col(xCol), col(yCol), col(verticesCol)),
        "inner")
      .drop("__minx", "__maxx", "__miny", "__maxy")
  }
}
