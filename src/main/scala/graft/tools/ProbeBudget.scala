package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Budget
import graft.functions.{TextFunctions => TF}

/** scratch diagnostics main — q77-shaped token-budget selection timed
  * with eager vs lazy localCheckpoint, two passes each (not part of
  * the library surface). runMain graft.tools.ProbeBudget [sfDir] */
object ProbeBudget {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("quality", TF.qualityScore(col("text")))
      .withColumn("n_tok", TF.tokenCount(col("text")))
    // warmup
    docs.count()
    spark.catalog.clearCache()
    for (variant <- Seq("threshold", "exact"); pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val sel =
        if (variant == "threshold")
          Budget.tokenBudgetSelectThreshold(docs, "lang", "doc_id",
            "quality", "n_tok", budget = 5000L)
        else
          Budget.tokenBudgetSelect(docs, "lang", "doc_id",
            "quality", "n_tok", budget = 5000L)
      // downstream consumption = the q77 aggregate
      val n = sel.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_tok")).as("t")).count()
      println(f"[probebudget] $variant%-9s pass=$pass ${(System.nanoTime() - t0) / 1e9}%6.2f s strata=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
