package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** scratch diagnostics main — r15 (admission diet, streaming leg):
  * what does Structured Streaming's machinery add on top of the two
  * admitBatch cycles in q123? Attaches a StreamingQueryListener and
  * prints each micro-batch's durationMs decomposition
  * (triggerExecution / addBatch / getBatch / latestOffset /
  * walCommit / commitOffsets), plus wall from start() to
  * termination. Not part of the library surface. */
object ProbeQ123c {
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
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe-q123c] batch ${p.batchId} durations " +
          p.durationMs.toString + s" rows=${p.numInputRows}")
      }
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup
    (1 to 2).foreach { round =>
      println(s"[probe-q123c] ---- round $round ----")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") < 2000)
      val rev = concat_ws(" ", reverse(TF.tokens(col("text"))))
      val b1 = base.filter(col("doc_id") < 200)
        .select((col("doc_id") + 30000).as("doc_id"), rev.as("text"))
      val b2 = b1.filter(col("doc_id") < 30050)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" zzz")).as("text"))
        .union(base.filter(col("doc_id") < 100)
          .select((col("doc_id") + 20000).as("doc_id"), col("text")))
        .union(base.filter(col("doc_id") < 30))
      val tmp = java.nio.file.Files.createTempDirectory("graft_probe_q123c")
      val corpusDir = tmp.resolve("corpus").toString
      val indexDir = tmp.resolve("index").toString
      base.write.mode("overwrite").parquet(corpusDir)
      Dedup.minhashIndex(base, "doc_id", "text", numHashes = 64, bands = 32)
        .write.mode("overwrite").parquet(indexDir)
      val inDir = tmp.resolve("in").toString
      def parts = new java.io.File(inDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSet
      b1.coalesce(1).write.mode("append").parquet(inDir)
      val firstFiles = parts
      b2.coalesce(1).write.mode("append").parquet(inDir)
      val t0m = 1700000000000L
      firstFiles.foreach(f => f.setLastModified(t0m))
      (parts -- firstFiles).foreach(f => f.setLastModified(t0m + 600000L))
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val t0 = System.nanoTime()
      graft.streaming.Admission.admitStream(stream, corpusDir, indexDir,
        tmp.resolve("ckpt").toString, "doc_id", "text",
        numHashes = 64, bands = 32, threshold = 0.6,
        dedupWithinBatch = false, collectStats = false)
      println(f"[probe-q123c] admitStream total wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
