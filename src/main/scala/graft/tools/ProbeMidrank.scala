package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch: A/B the Midrank.perRow join-back strategy on the q184
  * fixture (lineitem quantity vs extendedprice, sf0.1) — broadcast
  * hint vs shuffled join, same JVM, interleaved so JIT warmup is
  * shared. Drives spearmanCorr's exact code path via Midrank.perRow
  * with the threshold forced each way. */
object ProbeMidrank {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val clean = li.select(col("l_quantity").cast("double").as("__a"),
      col("l_extendedprice").cast("double").as("__b"))

    def spearman(limit: Long): Double = {
      val t0 = System.nanoTime()
      val r = graft.operators.Midrank.perRow(
        graft.operators.Midrank.perRow(clean, "__a", "ra",
          broadcastRowLimit = limit), "__b", "rb",
        broadcastRowLimit = limit)
        .agg(count(lit(1)), round(corr(col("ra"), col("rb")), 6))
        .collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] limit=$limit%9d rho=${r.getDouble(1)}%.6f  $dt%6.2f s")
      dt
    }
    println("[probe] distinct a=" + clean.select("__a").distinct.count()
      + " b=" + clean.select("__b").distinct.count()
      + " rows=" + clean.count())
    for (_ <- 1 to 3) { spearman(0L); spearman(2000000L) }
    spark.stop()
  }
}
