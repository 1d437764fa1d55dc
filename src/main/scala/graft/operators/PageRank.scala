package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** reference: ddf_library/functions/graph/ :: PageRank(inlink, outlink,
  * damping, max_iters) — iterative DataFrame joins (the GraphFrames
  * pattern): contribs = ranks/out-degree flowed along edges, new rank
  * = (1-d) + d * Σ contribs. One shuffle per iteration keyed on dst;
  * lineage cut with localCheckpoint each iteration so plans stay flat
  * over arbitrarily many rounds (SURVEY.md §2.9).
  */
object PageRank {

  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          damping: Double = 0.85, maxIters: Int = 10): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    // out-degree is static — join it into the cached edge table ONCE
    // instead of once per iteration
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val eDeg = e.join(outDeg, Seq("src"))
      .select(col("src"), col("dst"), col("deg")).cache()

    var ranks = vertices.withColumn("rank", lit(1.0))
    var i = 0
    while (i < maxIters) {
      val contribs = eDeg
        .join(ranks, eDeg("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("recv"))
      val next = vertices
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("recv"), lit(0.0))).as("rank"))
      // checkpoint every few rounds: enough to keep plans flat without
      // paying a materialization per iteration
      ranks = if (i % 3 == 2 || i == maxIters - 1) next.localCheckpoint()
              else next
      i += 1
    }
    // the final ranks are localCheckpoint-materialized (loop tail), so
    // the graph-side caches can be released before returning
    val out = if (maxIters == 0) ranks.localCheckpoint() else ranks
    Seq(e, vertices, eDeg).foreach(_.unpersist(false))
    out
  }
}
