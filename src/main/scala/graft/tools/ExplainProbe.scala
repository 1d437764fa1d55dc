package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch: dump formatted plans for the r10 graph/blocking
  * operators at sf0.1 — the explain-and-iterate loop, kept as a
  * rerunnable probe like the other tools. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val e = li.alias("l1").join(li.alias("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey")
          && col("l1.l_partkey") < col("l2.l_partkey"))
      .select(col("l1.l_partkey").as("a"), col("l2.l_partkey").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2).drop("w")
    println("=== triangle census ===")
    graft.operators.GraphMetrics.clusteringCoefficients(e, "a", "b")
      .explain("formatted")
    println("=== sorted-neighbor pairs ===")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), "\\s+", ""),
          1, 12).as("bkey"))
    graft.operators.Blocking
      .sortedNeighborPairs(docs, "doc_id", "bkey", 4)
      .explain("formatted")
    println("=== cms estimate ===")
    val ev = graft.streaming.EventStream.eventsBatchNtz(spark, dir)
    val sk = graft.operators.CountMin.sketch(ev, "user_id", 4, 64)
    graft.operators.CountMin.estimate(sk, ev, "user_id", 4, 64)
      .explain("formatted")
    spark.stop()
  }
}
