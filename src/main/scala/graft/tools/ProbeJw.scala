package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch: q211 disagreement probe — distribution of native
  * JaroWinkler values over the blocked name pairs vs specific hand
  * pairs, to localize whether the expression, the join context, or
  * the threshold is wrong. */
object ProbeJw {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    import graft.expressions.TextExpressions.jaroWinkler
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val a = cust.select(col("c_custkey").as("ida"),
      col("c_nationkey").as("blk"), col("c_name").as("nma"))
    val b = cust.select(col("c_custkey").as("idb"),
      col("c_nationkey").as("blk"), col("c_name").as("nmb"))
    val pairs = a.join(b, Seq("blk"))
      .select(col("ida"), col("idb"),
        jaroWinkler(col("nma"), col("nmb")).as("jw"))
    println("total pairs: " + pairs.count())
    println(">=0.97: " + pairs.filter(col("jw") >= 0.97).count())
    pairs.select(round(col("jw"), 3).as("jwr"))
      .groupBy(col("jwr")).count().orderBy(col("jwr").desc)
      .show(15, false)
    // a couple of specific pairs
    import spark.implicits._
    Seq(("Customer#000000001", "Customer#000000019"),
        ("Customer#000000001", "Customer#000000042"),
        ("Customer#000000042", "Customer#000000719"))
      .toDF("x", "y")
      .select(col("x"), col("y"), jaroWinkler(col("x"), col("y")))
      .show(false)
    spark.stop()
  }
}
