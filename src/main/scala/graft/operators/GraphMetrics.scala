package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Undirected-graph census metrics (DRIVER-EXT, SURVEY.md §2.12
  * graph family, alongside connected components / label propagation
  * / PageRank): exact triangle counts and local clustering
  * coefficients — the structural signals dedup-graph audits and
  * link-spam screens read (a near-dup cluster that is also a dense
  * triangle core is a template farm; a high-degree node with zero
  * triangles is a hub/spam hinge).
  *
  * Algorithm: degree-ORIENTED wedge join (the MapReduce-era standard
  * from Suri & Vassilvitskii 2011 / Cohen 2009). Each undirected
  * edge is directed from its lower-(degree, id) endpoint to the
  * higher; every out-neighborhood is then O(√m)-bounded REGARDLESS
  * of how skewed raw degrees are (a degree-10⁷ hub's edges almost
  * all point INTO it), so the wedge self-join — the step that
  * explodes on naive orientations — carries Σ outdeg² = O(m^1.5)
  * pairs worst-case instead of Σ deg². Each triangle materializes
  * exactly once (its three edges orient acyclically by rank; the
  * wedge sits at the rank-lowest corner). Three hash joins, all on
  * node/edge keys; no windows, no driver state.
  */
object GraphMetrics {

  /** Canonical simple undirected edges from an arbitrary pair list:
    * nulls and self-loops dropped, both orientations + duplicates
    * collapsed to one (min(a,b), max(a,b)) row. */
  def canonicalEdges(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame =
    edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull
        && col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()

  /** (node, degree) over the canonical simple graph. */
  def degrees(edges: DataFrame, srcCol: String,
              dstCol: String): DataFrame =
    canonicalEdges(edges, srcCol, dstCol)
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))

  /** One row per triangle, (x, y, z) with x < y < z — the exact
    * enumeration the counts aggregate. Callers wanting only counts
    * should use [[triangleCounts]]/[[clusteringCoefficients]]; the
    * enumeration is exposed for audits (which template farms share
    * a core) and spec oracles. */
  def triangles(edges: DataFrame, srcCol: String,
                dstCol: String): DataFrame = {
    // localCheckpoint (eager) rather than lazy persist: the canonical
    // table feeds the degree count AND both wedge sides — a lazy
    // persist leaves the upstream edge build (often an expensive
    // self-join) re-planned per branch until first materialization,
    // and this operator IS usually the pipeline's first action
    // (caught by the r10 explain audit). Checkpointing settles it
    // once, up front.
    val e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
    trianglesOf(e, degreesOf(e))
  }

  private def degreesOf(canon: DataFrame): DataFrame =
    canon.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))

  /** wedge join over a SETTLED canonical edge table + its degrees —
    * the shared core of [[triangles]]/[[clusteringCoefficients]] */
  private def trianglesOf(e: DataFrame, deg: DataFrame): DataFrame = {
    // rank-orient: u -> v iff (deg(u), u) < (deg(v), v)
    val ranked = e
      .join(deg.withColumnRenamed("node", "a")
        .withColumnRenamed("degree", "da"), Seq("a"))
      .join(deg.withColumnRenamed("node", "b")
        .withColumnRenamed("degree", "db"), Seq("b"))
    val oriented = ranked.select(
      when(col("da") < col("db")
          || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v")))
        .as("__e"))
      .select(col("__e.u").as("u"), col("__e.v").as("v"))
    // wedges at the rank-lowest corner: two out-edges of u, ordered
    // by the orientation's own rank via a second lookup-free trick —
    // (v, w) unordered pairs dedup by requiring the closing edge in
    // its oriented direction (exactly one of v->w / w->v exists)
    val w1 = oriented.select(col("u"), col("v").as("x"))
    val w2 = oriented.select(col("u"), col("v").as("y"))
    val wedges = w1.join(w2, Seq("u")).filter(col("x") =!= col("y"))
    val closed = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")),
      Seq("x", "y"))
    val tri = closed.select(col("u"), col("x"), col("y"))
    tri.select(
      least(col("u"), col("x"), col("y")).as("x"),
      when(col("u") =!= least(col("u"), col("x"), col("y"))
          && col("u") =!= greatest(col("u"), col("x"), col("y")),
        col("u"))
        .when(col("x") =!= least(col("u"), col("x"), col("y"))
          && col("x") =!= greatest(col("u"), col("x"), col("y")),
          col("x"))
        .otherwise(col("y")).as("y"),
      greatest(col("u"), col("x"), col("y")).as("z"))
  }

  /** (node, n_triangles) — nodes in no triangle are absent (join
    * [[degrees]] with a zero-coalesce for the full census). */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame =
    triangles(edges, srcCol, dstCol)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))

  /** Full per-node census: (node, degree, n_triangles, lcc) where
    * lcc = 2T / (deg·(deg−1)) rounded to 4 (0 for degree-1 nodes —
    * no possible wedge). Canonicalizes and settles the edge table
    * ONCE and shares it (and the degree table) across the census and
    * the wedge join — the naive composition re-ran the upstream edge
    * build once per branch (r10 explain audit). */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
                             dstCol: String): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
    val deg = degreesOf(e).localCheckpoint()
    val counts = trianglesOf(e, deg)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(counts, Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("lcc",
        when(col("degree") >= 2,
          round(col("n_triangles") * 2.0
            / (col("degree") * (col("degree") - 1)), 4))
          .otherwise(lit(0.0)))
  }

  /** k-CORE: the maximal subgraph in which every node keeps degree
    * ≥ k — the standard "dense backbone" extraction (spam-farm and
    * template-cluster cores survive, pendant chains and casual links
    * peel away). Returns (node, degree) over the surviving core, the
    * degree being the IN-CORE degree.
    *
    * Iterative peeling: drop all nodes of degree < k simultaneously,
    * recompute, repeat to fixpoint — the textbook algorithm, which
    * is also the only distributed-friendly one (sequential min-degree
    * peeling is inherently serial; simultaneous peeling converges to
    * the SAME core because removing a < k node never raises another
    * node's degree). Each round is one partial-agg degree count plus
    * two semi-join filters, with lineage cut per round
    * (localCheckpoint — the PageRank/CC loop discipline) so the plan
    * never deepens. Rounds ≤ the peeling depth of the graph (small
    * in practice — 9 on the sf0.01 co-purchase graph); `maxIters`
    * guards pathological chains by THROWING rather than returning a
    * half-peeled subgraph that silently violates the core contract. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxIters: Int = 200,
            driverThreshold: Long = 1L << 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    var e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
    var nEdges = e.count()
    // r18 opt: adaptive driver cutover (the PageRank.run /
    // connectedComponentMinLabel pattern) — a canonical edge list of
    // integral ids under the threshold peels in a tight local loop
    // instead of rounds x (degree-agg + two semi-joins +
    // localCheckpoint + count) jobs, whose per-job overhead dominates
    // on small graphs (q170's profile: 19 jobs for a 9-round peel).
    // Simultaneous peeling over integer counts — the surviving core
    // and in-core degrees are EXACTLY the distributed result (no FP
    // involved); the maxIters contract throws identically.
    locally {
      import org.apache.spark.sql.types.{ByteType, ShortType,
        IntegerType, LongType}
      val integral = Seq(e.schema("a").dataType, e.schema("b").dataType)
        .forall {
          case ByteType | ShortType | IntegerType | LongType => true
          case _                                             => false
        }
      val idType =
        if (Seq(e.schema("a").dataType, e.schema("b").dataType)
              .contains(LongType)) LongType
        else e.schema("a").dataType
      if (integral && nEdges <= driverThreshold) {
        val spark = edges.sparkSession
        import spark.implicits._
        var es = e.select(col("a").cast("long"), col("b").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        var it = 0
        var done = es.isEmpty
        while (!done) {
          it += 1
          if (it > maxIters)
            throw new IllegalStateException(
              s"k-core peeling did not converge in $maxIters rounds " +
                s"(${es.length} edges left) — raise maxIters; a " +
                "partial peel is not a core")
          val deg = scala.collection.mutable.Map.empty[Long, Int]
            .withDefaultValue(0)
          es.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
          val next = es.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
          done = next.length == es.length
          es = next
        }
        val deg = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        es.foreach { case (a, b) => deg(a) += 1L; deg(b) += 1L }
        return deg.toSeq.filter(_._2 >= k).toDF("node", "degree")
          .select(col("node").cast(idType).as("node"), col("degree"))
      }
    }
    var iters = 0
    var converged = nEdges == 0L
    while (!converged) {
      iters += 1
      if (iters > maxIters)
        throw new IllegalStateException(
          s"k-core peeling did not converge in $maxIters rounds " +
            s"($nEdges edges left) — raise maxIters; a partial peel " +
            "is not a core")
      val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("node"))
      val next = e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .localCheckpoint()
      val n = next.count()
      converged = n == nEdges
      e = next
      nEdges = n
    }
    e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .filter(col("degree") >= k)
  }

  /** LINK PREDICTION scores over the canonical simple graph: for
    * every non-adjacent node pair sharing at least one neighbor,
    * the three classic common-neighborhood signals —
    * common-neighbor count, Jaccard |N(a)∩N(b)| / |N(a)∪N(b)|, and
    * Adamic–Adar Σ_c 1/ln(deg(c)) (rare shared neighbors weigh
    * more; a shared neighbor's degree is ≥ 2 by construction, so
    * ln(deg) > 0 always). The "which entities will co-occur next"
    * primitive — recommendation candidates, knowledge-graph
    * completion, co-purchase forecasting.
    *
    * Shape at scale: candidate pairs come from a wedge join keyed on
    * the COMMON neighbor — never an all-pairs product — so a node of
    * degree d contributes C(d,2) wedges: quadratic in the hub's
    * degree, the same hot spot as every wedge shape here. Unlike the
    * triangle census, degree-ORIENTING cannot fix it (both wedge
    * arms must stay, whichever endpoint is ranked), so hubs above
    * `maxDegree` are EXCLUDED as intermediates — the documented
    * recall cap (pairs whose ONLY shared neighbors are hubs are
    * missed), the [[Dedup]] bucket-cap trade under a different name.
    * Everything else is partial-agg groupBys and two degree joins.
    * `excludeExisting = false` keeps adjacent pairs (useful as a
    * tie-strength score rather than a prediction). */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
                     maxDegree: Int = 10000,
                     excludeExisting: Boolean = true): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val e = canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
    val deg = degreesOf(e)
    val adj = e.select(col("a").as("c"), col("b").as("n"))
      .union(e.select(col("b").as("c"), col("a").as("n")))
    // degree-1 nodes cannot be SHARED neighbors (a wedge needs two
    // arms) — and their 1/ln(1) weight is a division by zero under
    // ANSI, so the filter is semantic and defensive at once
    val mid = adj.join(
      deg.filter(col("degree") >= 2 && col("degree") <= maxDegree)
        .select(col("node").as("c"), (lit(1.0)
          / log(col("degree").cast("double"))).as("__w")),
      Seq("c"))
    val wedges = mid.select(col("c"), col("n").as("pa"), col("__w"))
      .join(mid.select(col("c"), col("n").as("pb")), Seq("c"))
      .filter(col("pa") < col("pb"))
    val scored = wedges.groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("__w")).as("adamic_adar"))
    val base =
      if (excludeExisting)
        scored.join(e, scored("pa") === e("a") && scored("pb") === e("b"),
          "left_anti")
      else scored
    base
      .join(deg.select(col("node").as("pa"), col("degree").as("__da")),
        Seq("pa"))
      .join(deg.select(col("node").as("pb"), col("degree").as("__db")),
        Seq("pb"))
      .select(col("pa").as("a"), col("pb").as("b"),
        col("common_neighbors"),
        (col("common_neighbors")
          / (col("__da") + col("__db") - col("common_neighbors"))
          .cast("double")).as("jaccard"),
        col("adamic_adar"))
  }
}
