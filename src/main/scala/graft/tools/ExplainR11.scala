package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch: dump formatted plans for the r11 operators at sf0.1 —
  * the explain-and-iterate loop, kept rerunnable like ExplainProbe.
  * Checks asserted inline (exchange counts, broadcast shapes) so a
  * regression prints loudly instead of needing plan archaeology. */
object ExplainR11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def audit(name: String, df: org.apache.spark.sql.DataFrame,
              checks: (String, String => Boolean)*): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== $name ===")
      checks.foreach { case (what, ok) =>
        println(f"  [${if (ok(plan)) "ok" else "VIOLATION"}] $what")
      }
    }
    def exchanges(p: String): Int =
      "Exchange hashpartitioning".r.findAllIn(p).length

    // rolling z-score: ONE hash exchange shared by all three windows
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    audit("rollingZscore",
      graft.operators.TimeSeries.rollingZscore(orders, Seq("o_custkey"),
        Seq("o_orderdate", "o_orderkey"), "o_totalprice", 5),
      ("exactly one hash exchange", p => exchanges(p) == 1),
      ("single Window node computes all stats",
        p => "\\bWindow\\b".r.findAllIn(p).length == 1))

    // attribution: ONE exchange, range frame, no join
    val ev = graft.streaming.EventStream.eventsBatchNtz(spark, dir)
    audit("attribution",
      graft.operators.EventAnalytics.attribution(ev, "user_id", "ts",
        "event_id", "event_type", "purchase", Seq("click", "view"),
        604800L),
      ("exactly one hash exchange", p => exchanges(p) == 1),
      ("no join anywhere (window, not touches x conversions)",
        p => !p.contains("Join")))

    // expectations: fused row-local pass = one partial agg; FK is an
    // anti join with the dim side broadcast
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    audit("expect fused agg",
      li.agg(count(lit(1)), sum(when(col("l_orderkey").isNull, 1L)
        .otherwise(0L))),
      ("partial agg before the single-partition exchange",
        p => p.contains("HashAggregate") &&
          p.contains("Exchange SinglePartition")))

    // linkage: blocked equi join — hash join on the block key, never
    // a cartesian
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val a = cust.select(col("c_custkey").as("rid"),
      col("c_nationkey").as("blk"), col("c_name").as("nm"))
    audit("linkPairs",
      graft.operators.Linkage.linkPairs(a, "rid", a, "rid", Seq("blk"),
        Seq(graft.operators.Linkage.FieldSpec("nm", 0.9, 0.1))),
      ("no cartesian/nested-loop",
        p => !p.contains("Cartesian") && !p.contains("BroadcastNestedLoop")))

    // int8 quantize: encode is pure project over the scan (no
    // exchange at all)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val m = graft.operators.Quantize.fitScalarQuantizer(
      emb.limit(2000), "embedding", 64)
    audit("quantize encode",
      graft.operators.Quantize.quantize(emb, "embedding", m),
      ("zero exchanges (row-local codegen)",
        p => !p.contains("Exchange")))

    spark.stop()
  }
}
