package graft.tools

import org.apache.spark.sql.SparkSession

/** scratch diagnostics main — r12: measure q145/q148 recall at the
  * gate scale factors to size the bounded-sibling floors. */
object ProbeR12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      for (q <- Seq("q145_pq_adc", "q148_ivfpq")) {
        val row = graft.SparkEntry.queries(q)(spark, dir).collect().head
        println(s"[probe-r12] $sf $q -> $row")
      }
    }
    spark.stop()
  }
}
