package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Budget

/** scratch diagnostics main — capPerGroup exact-window vs analytic
  * hash-threshold path on a synthetic mega-group (one domain with
  * millions of rows, the regime the threshold path exists for), two
  * passes each, equality asserted (not part of the library surface).
  * runMain graft.tools.ProbeCap [nRows] [cap]
  */
object ProbeCap {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one mega-domain plus a long tail of small ones (95/5 split)
    def df = spark.range(n).toDF("id")
      .withColumn("g", when(col("id") % 20 < 19, lit("mega"))
        .otherwise(concat(lit("tail"), col("id") % 1000)))
    df.count() // warmup
    var exactN = -1L; var thrN = -1L
    for (variant <- Seq("threshold", "exact"); pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val sel =
        if (variant == "threshold")
          Budget.capPerGroupThreshold(df, Seq("g"), "id", cap)
        else Budget.capPerGroup(df, Seq("g"), "id", cap)
      val kept = sel.count()
      if (variant == "exact") exactN = kept else thrN = kept
      println(f"[probecap] $variant%-9s pass=$pass " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s kept=$kept")
    }
    assert(exactN == thrN, s"row-count mismatch: exact=$exactN thr=$thrN")
    spark.stop()
  }
}
