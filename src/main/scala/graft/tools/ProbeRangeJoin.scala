package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch diagnostics main — measure the RangeJoin bucket rewrite
  * against Catalyst's native plan for the same inequality join (a
  * BroadcastNestedLoopJoin once the interval side is small), on
  * lineitem.l_extendedprice ∈ [s_acctbal·3, s_acctbal·3 + 500].
  * runMain graft.tools.ProbeRangeJoin [sfDir] */
object ProbeRangeJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val points = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice").as("v"))
    val ivs = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"),
        (col("s_acctbal") * 3).as("lo"),
        (col("s_acctbal") * 3 + 500).as("hi"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe-rangejoin] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    println(s"[probe-rangejoin] points=${points.count()} intervals=${ivs.count()}")
    time("bucket rewrite (w=500)") {
      graft.operators.RangeJoin
        .pointInInterval(points, "v", ivs, "lo", "hi", 500.0).count()
    }
    time("bucket rewrite (auto)") {
      graft.operators.RangeJoin
        .pointInInterval(points, "v", ivs, "lo", "hi").count()
    }
    time("native inequality join") {
      points.join(ivs, col("v") >= col("lo") && col("v") <= col("hi"))
        .count()
    }
    spark.stop()
  }
}
