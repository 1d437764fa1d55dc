package graft.tools

import org.apache.spark.sql.SparkSession

/** scratch diagnostics main — not part of the library surface */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "orders")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        df.printSchema()
        df.show(2, false)
      } catch { case e: Throwable => println(s"$t FAILED: $e") }
    }
    // discount domain
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.selectExpr("min(l_discount)", "max(l_discount)", "min(l_quantity)",
      "max(l_quantity)", "min(l_shipdate)", "max(l_shipdate)").show(false)
    spark.stop()
  }
}
