package graft.tools

import org.apache.spark.sql.SparkSession

/** scratch diagnostics main — q120 validation-amortization timing
  * (r9): N back-to-back passes of q120 in one session, printing each
  * wall time. Pass 1 pays the index build + one validation job;
  * passes 2+ should ride the (files, params) validation memo. */
object ProbeQ120 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q120_dedup_incr_updated")(spark, dir).count()
      spark.catalog.clearCache()
      println(f"[probe] q120 pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
