package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** reference: ddf_library/functions/ml/clustering.py :: DBSCAN — the
  * reference grid-partitions 2-D space and runs local DBSCAN per cell
  * with a border merge. Same decomposition here, expressed
  * relationally so it scales shuffle-wise:
  *
  *  1. bin points into eps-sized grid cells (narrow map)
  *  2. candidate neighbor pairs = points in the same or adjacent cell
  *     (explode 3x3 neighborhood → equi-join on cell key; distance
  *     filter keeps true eps-neighbors). Shuffle key = cell id, so
  *     density, not n², bounds the join.
  *  3. core points: neighbor count (incl self) >= minPts
  *  4. clusters: connected components over core-core edges
  *     (min-label propagation, same loop as dedup components)
  *  5. border points join the cluster of any core neighbor;
  *     remaining points are noise (cluster = -1)
  *
  * reference also ships ST-DBSCAN (functions/geo): the same plan with
  * a third (temporal) grid axis — pass `tCol`/`epsT` to enable.
  */
object DBSCAN {

  def cluster(df: DataFrame, idCol: String, xCol: String, yCol: String,
              eps: Double, minPts: Int,
              tCol: Option[String] = None,
              epsT: Double = 0.0): DataFrame = {
    val pts0 = df.select(col(idCol).as("id"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"),
      tCol.map(c => col(c).cast("double")).getOrElse(lit(0.0)).as("t"))
    val pts = graft.operators.Partitioning.spread(pts0)
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))
      .withColumn("ct", if (tCol.isDefined) floor(col("t") / epsT).cast("long")
                        else lit(0L))
      .cache()

    // 3x3(x3) neighborhood cells each point could have neighbors in
    val tRange = if (tCol.isDefined) Seq(-1, 0, 1) else Seq(0)
    val offsets = for (dx <- Seq(-1, 0, 1); dy <- Seq(-1, 0, 1);
                       dt <- tRange) yield (dx, dy, dt)
    val probes = pts.select(col("id"), col("x"), col("y"), col("t"),
      explode(array(offsets.map { case (dx, dy, dt) =>
        struct((col("cx") + dx).as("gx"), (col("cy") + dy).as("gy"),
          (col("ct") + dt).as("gt"))
      }: _*)).as("cell"))
      .select(col("id"), col("x"), col("y"), col("t"),
        col("cell.gx"), col("cell.gy"), col("cell.gt"))
    val home = pts.select(col("id").as("nid"), col("x").as("nx"),
      col("y").as("ny"), col("t").as("nt"),
      col("cx").as("gx"), col("cy").as("gy"), col("ct").as("gt"))

    val inEps = probes.join(home, Seq("gx", "gy", "gt"))
      .filter(
        (col("x") - col("nx")) * (col("x") - col("nx")) +
          (col("y") - col("ny")) * (col("y") - col("ny")) <= eps * eps)
      .filter(if (tCol.isDefined) abs(col("t") - col("nt")) <= epsT
              else lit(true))
      // no distinct needed: the join key is the neighbor's HOME cell and
      // each probe list names each of the 9/27 distinct cells exactly once,
      // so a pair (id, nid) can match in exactly one cell. A distinct here
      // would full-shuffle the largest intermediate of the plan for nothing.
      .select(col("id"), col("nid"))
      .cache()

    val degrees = inEps.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val core = degrees.filter(col("deg") >= minPts).select(col("id")).cache()

    // connected components over core-core eps-edges
    val coreEdges = inEps
      .join(core, Seq("id"))
      .join(core.withColumnRenamed("id", "nid"), Seq("nid"))
      .filter(col("id") < col("nid"))
      .select(col("id").as("id_a"), col("nid").as("id_b"))
    val comps = Dedup.connectedComponentMinLabel(coreEdges)

    // core labels (singleton cores keep their own id as cluster)
    val coreLabels = core.join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("cluster"))
    // border points: any core neighbor's cluster (min for determinism)
    val borderLabels = inEps
      .join(core.withColumnRenamed("id", "nid"), Seq("nid"))
      .join(coreLabels.select(col("id").as("nid"), col("cluster")), Seq("nid"))
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
    val labels = coreLabels.unionByName(borderLabels)
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))

    val out = pts.select(col("id"), col("x"), col("y"))
      .join(labels, Seq("id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), lit(-1L)))
      .withColumnRenamed("id", idCol)
      // materialize, then release the internal caches: repeated
      // cluster() calls in a long session must not accumulate storage
      .localCheckpoint(true)
    Seq(pts, inEps, core).foreach(_.unpersist(false))
    out
  }
}
