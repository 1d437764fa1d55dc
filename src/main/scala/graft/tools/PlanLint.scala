package graft.tools

import org.apache.spark.sql.SparkSession

/** Engine-wide physical-plan linter: builds (does not execute) every
  * catalog query's initial physical plan and flags scale red-flags —
  * cartesian products, nested-loop joins, parquet scans that read all
  * columns, filter-bearing scans without pushed filters. Intentional
  * exceptions are allow-listed with the reason inline. Run:
  * `sbt "runMain graft.tools.PlanLint"`. Exit code 1 on unexpected
  * findings (used as a local gate before benching). */
object PlanLint {

  // queries where a "red flag" node is the intended plan shape
  private val allow: Map[String, String] = Map(
    "q11_cross_join" -> "operator IS a cross join (reference semantics)",
    "q63_geo_within" -> ("non-equi broadcast join: bbox-pruned " +
      "BroadcastNestedLoopJoin over the broadcast-small polygon side " +
      "is the intended plan"),
    "q49_embed_topk" -> ("brute-force top-k scores a broadcast query " +
      "batch against the corpus by design (IVF is the pruned path)"),
    "q60_knn" -> "KNN classify wraps bruteForceTopK (broadcast query batch)",
    "q38_freq_items" -> ("scalar-broadcast pattern: the 1-row global " +
      "count crosses the (already reduced) per-value counts — " +
      "build side is a single row"),
    "q50_similarity_ivf" -> ("query->centroid scoring is a broadcast " +
      "cross of Q x K rows (K = nCentroids, tiny); corpus side is " +
      "probed, never crossed"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    // streaming/eager queries execute work at construction — lint the
    // batch-plan queries only (the eager ops assert their plan shapes
    // in ScaleSpec instead)
    val skip = Set("q66_stream_window", "q72_stream_interval_join")

    // positive checks: these queries MUST show the named scan property
    // (filter pushdown reaching parquet / column-pruned read schema)
    val mustContain: Map[String, (String, String)] = Map(
      "q03_filter" -> ("GreaterThanOrEqual(l_quantity",
        "filter not pushed to the lineitem scan"),
      "q01_flagship_agg" -> ("PushedFilters: [IsNotNull(",
        "filter not pushed to the scan"),
      "q02_select" -> ("ReadSchema: struct<p_partkey:bigint,p_name:string,p_retailprice:double>",
        "projection not pruned to the 3 selected columns"))

    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip(name)) {
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan.toString
          mustContain.get(name).foreach { case (needle, why) =>
            if (!plan.contains(needle)) {
              bad += 1
              println(s"[plan-lint] FLAG  $name: $why (missing `$needle`)")
            }
          }
          val flags = Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "BroadcastNestedLoopJoin" ->
              plan.contains("BroadcastNestedLoopJoin")
          ).collect { case (f, true) => f }
          if (flags.nonEmpty) {
            allow.get(name) match {
              case Some(reason) =>
                println(s"[plan-lint] ALLOW $name: ${flags.mkString(",")} — $reason")
              case None =>
                bad += 1
                println(s"[plan-lint] FLAG  $name: ${flags.mkString(",")}")
            }
          }
        } catch {
          case e: Throwable =>
            bad += 1
            println(s"[plan-lint] ERROR $name: ${e.getMessage.take(120)}")
        } finally spark.catalog.clearCache()
      }
    }
    println(s"[plan-lint] done, unexpected=$bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
