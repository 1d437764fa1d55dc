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

  /** Adaptive execution, same spirit as Spark's broadcast-join
    * cutover (and Dedup.connectedComponentMinLabel): a graph below
    * `driverThreshold` (deduplicated) edges whose vertex ids are
    * INTEGRAL is provably driver-resolvable — one collect + a tight
    * local loop replaces maxIters rounds of join jobs whose per-job
    * overhead dominates on small graphs. The local loop indexes
    * vertices as longs, so string ids (URL-labeled graphs) or
    * fractional ids take the distributed path instead of NPE-ing /
    * silently collapsing distinct vertices; the driver result is cast
    * back to the input id type so both paths agree on schema. Above
    * the threshold the distributed loop runs (one shuffle per
    * iteration keyed on dst, lineage cut with localCheckpoint).
    * Identical recurrence either way; summation order may differ at
    * ~1 ulp, as between any two executions of a distributed sum. */
  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          damping: Double = 0.85, maxIters: Int = 10,
          driverThreshold: Long = 1L << 20): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType, DataType}
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    // the output id column is cast back to the WIDER of the two input
    // types (src ids and dst ids may differ in width)
    val srcT = e.schema("src").dataType
    val dstT = e.schema("dst").dataType
    val idType = if (Seq(srcT, dstT).contains(LongType)) LongType
                 else if (Seq(srcT, dstT).contains(IntegerType)) IntegerType
                 else if (Seq(srcT, dstT).contains(ShortType)) ShortType
                 else srcT
    val integralIds = integral(srcT) && integral(dstT)
    if (integralIds && e.count() <= driverThreshold) {
      import spark.implicits._
      val es = e.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      e.unpersist(false)
      val verts = es.iterator.flatMap(p => Iterator(p._1, p._2))
        .toArray.distinct.sorted
      val idx = verts.zipWithIndex.toMap
      val deg = new Array[Int](verts.length)
      es.foreach { case (s, _) => deg(idx(s)) += 1 }
      var rank = Array.fill(verts.length)(1.0)
      var it = 0
      while (it < maxIters) {
        val recv = new Array[Double](verts.length)
        es.foreach { case (s, d) =>
          recv(idx(d)) += rank(idx(s)) / deg(idx(s))
        }
        rank = recv.map(r => (1.0 - damping) + damping * r)
        it += 1
      }
      return verts.zip(rank).toSeq.toDF("id", "rank")
        .select(col("id").cast(idType).as("id"), col("rank"))
    }
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

  /** PERSONALIZED PageRank — random walk with restart to a source
    * SET: rank' = (1−d)·p + d·Σ contribs where p(v) = 1/|S| over the
    * sources and 0 elsewhere. The "what's near THESE nodes"
    * relevance score (seed-expansion for a dedup cluster, related-
    * item scoring from a seed set) — global PageRank answers "what's
    * central overall", PPR answers "central relative to S". Same
    * per-iteration shape as [[run]] (one dst-keyed shuffle, lineage
    * cut every third round); the restart vector rides the cached
    * vertex table as a column, costing nothing per round. Sources
    * not present in the graph are ignored (and the restart mass
    * renormalizes over the present ones — a typo'd seed id must not
    * silently deflate every score); an empty intersection throws.
    * Initial rank = p, so iteration 0 already concentrates mass at
    * the seeds (the standard PPR start). */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
                   sources: DataFrame, sourceIdCol: String,
                   damping: Double = 0.85,
                   maxIters: Int = 10,
                   driverThreshold: Long = 1L << 20): DataFrame = {
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    // r18 opt: [[run]]'s adaptive driver cutover, extended to the
    // personalized face (it had only the distributed loop — q182's
    // stage profile showed 10 rounds x ~5 join/agg jobs on a graph of
    // a few hundred edges, all per-job overhead). Identical
    // recurrence, bounded by the same threshold; summation order may
    // differ at ~1 ulp, as between any two executions of a
    // distributed sum. Seed ids must be integral too (they index the
    // same vertex space).
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType, DataType}
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    val srcT = e.schema("src").dataType
    val dstT = e.schema("dst").dataType
    val seedT = sources.schema(sourceIdCol).dataType
    val idType = if (Seq(srcT, dstT).contains(LongType)) LongType
                 else if (Seq(srcT, dstT).contains(IntegerType)) IntegerType
                 else if (Seq(srcT, dstT).contains(ShortType)) ShortType
                 else srcT
    if (integral(srcT) && integral(dstT) && integral(seedT) &&
        e.count() <= driverThreshold) {
      import spark.implicits._
      val es = e.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      e.unpersist(false)
      val verts = es.iterator.flatMap(p => Iterator(p._1, p._2))
        .toArray.distinct.sorted
      val idx = verts.zipWithIndex.toMap
      val seedIds = sources.select(col(sourceIdCol).cast("long"))
        .distinct().collect().map(_.getLong(0)).filter(idx.contains)
      require(seedIds.nonEmpty,
        "no source id is a vertex of the graph — personalized restart " +
          "has nowhere to land; check the seed set")
      val p = new Array[Double](verts.length)
      seedIds.foreach(s => p(idx(s)) = 1.0 / seedIds.length)
      val deg = new Array[Int](verts.length)
      es.foreach { case (s, _) => deg(idx(s)) += 1 }
      var rank = p.clone()
      var it = 0
      while (it < maxIters) {
        val recv = new Array[Double](verts.length)
        es.foreach { case (s, d) =>
          recv(idx(d)) += rank(idx(s)) / deg(idx(s))
        }
        rank = Array.tabulate(verts.length)(v =>
          (1.0 - damping) * p(v) + damping * recv(v))
        it += 1
      }
      return verts.zip(rank).toSeq.toDF("id", "rank")
        .select(col("id").cast(idType).as("id"), col("rank"))
    }
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val seeds = sources.select(col(sourceIdCol).as("id")).distinct()
      .join(vertices, Seq("id"), "left_semi").cache()
    val nS = seeds.count()
    require(nS > 0L,
      "no source id is a vertex of the graph — personalized restart " +
        "has nowhere to land; check the seed set")
    val withP = vertices
      .join(seeds.withColumn("__s", lit(true)), Seq("id"), "left")
      .select(col("id"),
        when(col("__s"), lit(1.0 / nS)).otherwise(lit(0.0)).as("p"))
      .cache()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val eDeg = e.join(outDeg, Seq("src"))
      .select(col("src"), col("dst"), col("deg")).cache()
    var ranks = withP.select(col("id"), col("p").as("rank"))
    var i = 0
    while (i < maxIters) {
      val contribs = eDeg
        .join(ranks, eDeg("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("recv"))
      val next = withP
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) * col("p") +
            lit(damping) * coalesce(col("recv"), lit(0.0))).as("rank"))
      ranks = if (i % 3 == 2 || i == maxIters - 1) next.localCheckpoint()
              else next
      i += 1
    }
    val out = if (maxIters == 0) ranks.localCheckpoint() else ranks
    Seq(e, seeds, withP, eDeg).foreach(_.unpersist(false))
    out
  }
}
