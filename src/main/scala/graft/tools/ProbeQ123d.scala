package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** scratch diagnostics main — r15 (admission diet): per-JOB
  * decomposition of one warm admitBatch cycle. Prints every Spark
  * job launched during the cycle with its wall time and callsite, so
  * redundant jobs are visible by name. Not part of the library
  * surface. */
object ProbeQ123d {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{TextFunctions => TF}
    import graft.operators.Dedup
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (record) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(j.stageInfos.lastOption.map(_.name))
            .getOrElse("?")
          starts.put(j.jobId,
            (System.nanoTime(), s"stages=${j.stageInfos.size} " +
              desc.linesIterator.next().take(110)))
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null)
          println(f"[probe-q123d] job ${j.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%6.2f s  ${s._2}")
      }
    })
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") < 2000)
    val rev = concat_ws(" ", reverse(TF.tokens(col("text"))))
    val b1 = base.filter(col("doc_id") < 200)
      .select((col("doc_id") + 30000).as("doc_id"), rev.as("text"))
    // warm everything once
    (1 to 2).foreach { round =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_probe_q123d")
      val c = tmp.resolve("corpus").toString
      val i = tmp.resolve("index").toString
      base.write.mode("overwrite").parquet(c)
      Dedup.minhashIndex(base, "doc_id", "text", numHashes = 64, bands = 32)
        .write.mode("overwrite").parquet(i)
      if (round == 2) {
        println("[probe-q123d] ---- warm cycle jobs ----")
        record = true
      }
      val t0 = System.nanoTime()
      graft.streaming.Admission.admitBatch(b1, c, i, "doc_id", "text",
        numHashes = 64, bands = 32, threshold = 0.6,
        dedupWithinBatch = false, collectStats = false)
      record = false
      println(f"[probe-q123d] cycle wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
