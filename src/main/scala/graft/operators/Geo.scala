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
