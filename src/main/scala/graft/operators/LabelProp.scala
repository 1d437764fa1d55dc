package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation for community detection
  * (Raghavan/Albert/Kumara 2007, made DETERMINISTIC) — the third
  * member of the graph family next to [[PageRank]] and the connected
  * components in [[Dedup]]: where CC answers "which rows touch at
  * all" (the dedup-cluster question), LPA answers "which rows cluster
  * DENSELY" — near-dup graphs bridged by a single spurious pair split
  * into their dense cores instead of collapsing into one component.
  *
  * The classic algorithm is randomized (visit order + tie coin-flips
  * decide everything); this implementation pins both sources of
  * nondeterminism so the answer is a pure function of the graph:
  * updates are SYNCHRONOUS (every node recomputes from the PREVIOUS
  * round's labels — no visit order exists) and ties break to the
  * SMALLEST label. That determinism is what lets q149 carry a full
  * DuckDB oracle (each round unrolled as count + row_number CTEs)
  * where textbook LPA would be rows-only. The cost: synchronous LPA
  * can oscillate on bipartite structures instead of converging — the
  * standard trade (GraphX's LPA documents the same) — so `iters` is a
  * fixed budget, not a convergence test.
  *
  * Shape at 100 TB: each round is one join of the edge list with the
  * (node, label) table on the node key, one (node, label) partial-agg
  * count, and one per-node window whose partition is bounded by the
  * node's DISTINCT NEIGHBOR LABEL count (≤ degree, shrinking as
  * communities form — never the whole graph). Lineage is cut per
  * round (the CC/PageRank discipline); rounds are a fixed budget, so
  * the whole run is `iters` bounded supersteps with no driver state.
  */
object LabelProp {

  /** Community label per node after `iters` synchronous rounds over
    * the UNDIRECTED graph of `edges` (orientation and duplicate pairs
    * are normalized away; self-loops dropped — a node voting for its
    * own label would freeze singleton labels). Labels start as the
    * node's own id; each round every node adopts the most frequent
    * label among its neighbors, ties to the smallest. Isolated nodes
    * (no edges) are absent from the result, as from the input.
    * Returns (node, label). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .union(edges.select(col(dstCol).as("__a"), col(srcCol).as("__b")))
      .filter(col("__a") =!= col("__b"))
      .distinct()
      .localCheckpoint()
    var labels = e.select(col("__a").as("node")).distinct()
      .withColumn("label", col("node"))
    var i = 0
    while (i < iters) {
      val nb = e.join(labels, e("__b") === labels("node"))
        .select(col("__a").as("node"), col("label"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("__n"))
      val w = Window.partitionBy(col("node"))
        .orderBy(col("__n").desc, col("label").asc)
      labels = nb.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint() // cut the per-round lineage (CC discipline)
      i += 1
    }
    labels
  }

  /** Audit face: (community label, n_nodes, min node) per community,
    * mirroring `Dedup.clusterSizes`. */
  def communitySizes(edges: DataFrame, srcCol: String, dstCol: String,
                     iters: Int): DataFrame =
    labelPropagation(edges, srcCol, dstCol, iters)
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"), min(col("node")).as("min_node"))
}
