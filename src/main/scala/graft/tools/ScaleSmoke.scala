package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch diagnostics main — scaling smoke for the dedup family:
  * replicates the documents table k× (ids offset; texts get a
  * replica-suffix token so replicas are near- but not exact dups) and
  * times exact dedup / minhash LSH / count-based jaccard at each
  * scale. Verifies the operators' growth curves empirically rather
  * than by assertion. Not part of the library surface. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                 else Seq(1, 4, 8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def corpus(k: Int) = (0 until k).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 1000000)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ union _).cache()

    scales.foreach { k =>
      val c = corpus(k)
      val n = c.count() // materialize cache outside timings
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(f"[scale-smoke] k=$k%-2d n=$n%-6d $label%-18s " +
          f"${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows")
      }
      time("exact")(graft.operators.Dedup
        .exact(c, Seq("text"), "doc_id").count())
      time("minhashPairs")(graft.operators.Dedup
        .minhashPairs(c, "doc_id", "text", threshold = 0.8).count())
      time("jaccardExact(0.5)")(graft.operators.Dedup
        .jaccardPairsExact(c, "doc_id", "text", threshold = 0.5).count())
      c.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
