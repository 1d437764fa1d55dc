package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch: asserted plan pins for the r12 changes — the
  * explain-and-iterate loop, kept rerunnable like ExplainR11. The
  * point this round: the experiment-readout family (rocAuc /
  * mannWhitneyU / spearmanCorr) must no longer contain a global-sort
  * Window (the single-task rank shape); their ranking now happens in
  * Midrank's range-partitioned prefix sum, whose own plan is pinned
  * too. */
object ExplainR12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    var bad = 0

    def audit(name: String, df: org.apache.spark.sql.DataFrame,
              checks: (String, String => Boolean)*): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== $name ===")
      checks.foreach { case (what, ok) =>
        val o = ok(plan)
        if (!o) bad += 1
        println(f"  [${if (o) "ok" else "VIOLATION"}] $what")
      }
    }
    // the old scale-killer: any Window node over an EMPTY partition
    // spec funnels every row through one task. The rewired readouts
    // must have NO Window node at all (their final 1-row agg's
    // SinglePartition exchange is fine — it moves partial aggregates,
    // not rows).
    def noWindow(p: String): Boolean =
      !"\\bWindow\\b".r.findFirstIn(p).isDefined

    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(((col("o_orderkey") % 97
        + when(col("o_orderstatus") === "F", 30).otherwise(0))
        / lit(127.0)).as("score"),
        (col("o_orderstatus") === "F").as("label"))
    audit("rocAuc",
      graft.operators.Classifier.rocAuc(orders, "score", "label"),
      ("no global-sort Window node", noWindow),
      ("final agg is partial-then-final",
        p => p.contains("HashAggregate")))

    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("arm",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
    audit("mannWhitneyU",
      graft.operators.AbTest.mannWhitneyU(ev, "arm", "value", "A", "B"),
      ("no global-sort Window node", noWindow))

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    audit("spearmanCorr",
      graft.operators.AbTest.spearmanCorr(li, "l_quantity",
        "l_extendedprice"),
      ("no global-sort Window node", noWindow),
      ("rank join is a real join, not nested-loop",
        p => !p.contains("Cartesian")
          && !p.contains("BroadcastNestedLoop")))

    // the midrank machinery itself: the census sort must be a RANGE
    // exchange (parallel sort, disjoint ranges) — never a
    // SinglePartition exchange, and the census groupBy partial-aggs
    // map-side before its hash exchange
    val census = li.select(col("l_quantity").cast("double").as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__t"))
    val sorted = census.repartitionByRange(col("__v").asc)
      .sortWithinPartitions(col("__v").asc)
    audit("midrank census sort", sorted,
      ("range exchange present",
        p => p.contains("Exchange rangepartitioning")),
      ("no single-partition funnel",
        p => !p.contains("Exchange SinglePartition")),
      ("map-side partial agg before the census shuffle",
        p => "HashAggregate".r.findAllIn(p).length >= 2))

    // late-r12 operators: DSIR's weighting pass must be ONE
    // shuffle-free codegen pass (the m-row ratio table is an array
    // literal — a join or exchange here would mean the literal path
    // regressed), and SemDeDup's assignment must be a pure project
    // over the scan (the argmin is column math, not a join against
    // a centers table).
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ratios = graft.operators.Dsir.logRatioTable(
      docs.filter(col("lang") === "en"), docs, "text", 512)
    audit("dsir importanceWeights (scoring pass only)",
      graft.operators.Dsir.importanceWeights(docs, "text", ratios, 512),
      ("no exchange — shuffle-free corpus pass",
        p => !p.contains("Exchange")),
      ("no join — ratio table is a literal", p => !p.contains("Join")))

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val centers = emb.orderBy(col("vec_id")).limit(8).collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    audit("semDedup assign",
      graft.operators.SemDedup.assign(emb, "v", centers),
      ("no exchange — one-pass assignment", p => !p.contains("Exchange")),
      ("no join — centers are literals", p => !p.contains("Join")))

    spark.stop()
    if (bad > 0) { println(s"$bad VIOLATION(s)"); sys.exit(1) }
    println("all plan pins ok")
  }
}
