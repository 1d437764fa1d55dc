package graft.tools

import org.apache.spark.sql.SparkSession

/** scratch diagnostics main — r9 new-query timings at sf0.1 (two
  * passes each) + plan audit hooks. */
object ProbeR9 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q132_bpe_seed_pairs", "q133_substring_spans",
        "q134_substring_removed", "q135_unicode_nfc_dedup",
        "q136_heavy_hitters", "q137_substring_screen_indexed");
        pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      spark.catalog.clearCache()
      println(f"[probe] $q pass $pass: ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    spark.stop()
  }
}
