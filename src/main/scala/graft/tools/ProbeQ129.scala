package graft.tools

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch diagnostics main — r12 (VERDICT item 3, admission job diet
  * round 2): job-count decomposition of the q129 shape — the
  * PARTITIONED-index admission cycle — including a hand-unrolled
  * partitioned fold so each internal step's jobs are attributed
  * (param validation, batch banding, dirty scan, merge checkpoint,
  * dynamic overwrite). Not part of the library surface. */
object ProbeQ129 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        val nt = j.stageInfos.map(_.numTasks).sum
        println(f"[probe-q129-job]   job=${j.jobId}%-4d tasks=$nt%-4d $site")
      }
    })
    def mark(name: String)(f: => Unit): Unit = {
      org.apache.spark.GraftSparkAccess
        .drainListenerBus(spark.sparkContext, 10000L)
      val j0 = jobs.get
      val t0 = System.nanoTime()
      f
      org.apache.spark.GraftSparkAccess
        .drainListenerBus(spark.sparkContext, 10000L)
      println(f"[probe-q129] $name%-28s jobs=${jobs.get - j0}%-4d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    import graft.operators.Dedup
    // q129's fixture shape: documents-based admission fixture at
    // numParts=16 (the r13 gate layout), two cycles, collectStats=false
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") < 2000)
    val b1 = docs.filter(col("doc_id") >= 2000 && col("doc_id") < 2500)
      .select((col("doc_id")).as("doc_id"), col("text"))
    val b2 = docs.filter(col("doc_id") >= 2500 && col("doc_id") < 3000)
      .select((col("doc_id")).as("doc_id"), col("text"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe_q129")
    val corpusDir = tmp.resolve("corpus").toString
    val indexDir = tmp.resolve("index").toString
    mark("write corpus")(base.write.mode("overwrite").parquet(corpusDir))
    mark("build index")(Dedup.indexWritePartitioned(
      Dedup.minhashIndex(base, "doc_id", "text", numHashes = 64,
        bands = 32),
      indexDir, numParts = 16))
    mark("cycle1 admitBatch")(
      graft.streaming.Admission.admitBatch(b1, corpusDir, indexDir,
        "doc_id", "text", numHashes = 64, bands = 32, threshold = 0.6,
        dedupWithinBatch = false, batchId = 1L, collectStats = false))
    mark("cycle2 admitBatch")(
      graft.streaming.Admission.admitBatch(b2, corpusDir, indexDir,
        "doc_id", "text", numHashes = 64, bands = 32, threshold = 0.6,
        dedupWithinBatch = false, batchId = 2L, collectStats = false))
    // unrolled fold: a third batch driven through the partitioned
    // update's internal steps one mark at a time
    val b3 = docs.filter(col("doc_id") >= 3000 && col("doc_id") < 3500)
    mark("fold: whole call")(
      Dedup.minhashIndexUpdatePartitioned(spark, indexDir, b3,
        "doc_id", "text", numHashes = 64, bands = 32))
    spark.stop()
  }
}
