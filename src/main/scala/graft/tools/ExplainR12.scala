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

    spark.stop()
    if (bad > 0) { println(s"$bad VIOLATION(s)"); sys.exit(1) }
    println("all plan pins ok")
  }
}
