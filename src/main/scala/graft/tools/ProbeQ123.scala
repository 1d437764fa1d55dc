package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch diagnostics main — r14 (VERDICT item 5, admission gate
  * diet round 4): wall decomposition of the q123 shape — the
  * STREAMING admission cycle — into fixture/state build, input file
  * staging, and the admitStream run itself, so the diet lands where
  * the seconds are. Not part of the library surface. */
object ProbeQ123 {
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
    def mark[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-q123] $name%-28s wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warmup (the BenchSome discipline)
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    (1 to 2).foreach { round =>
      println(s"[probe-q123] ---- round $round ----")
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
      val tmp = java.nio.file.Files.createTempDirectory("graft_probe_q123")
      val corpusDir = tmp.resolve("corpus").toString
      val indexDir = tmp.resolve("index").toString
      mark("corpus write")(base.write.mode("overwrite").parquet(corpusDir))
      mark("index build")(Dedup.minhashIndex(base, "doc_id", "text",
          numHashes = 64, bands = 32)
        .write.mode("overwrite").parquet(indexDir))
      val inDir = tmp.resolve("in").toString
      mark("input staging") {
        def parts = new java.io.File(inDir).listFiles()
          .filter(_.getName.endsWith(".parquet")).toSet
        b1.coalesce(1).write.mode("append").parquet(inDir)
        val firstFiles = parts
        b2.coalesce(1).write.mode("append").parquet(inDir)
        val t0 = 1700000000000L
        firstFiles.foreach(f => f.setLastModified(t0))
        (parts -- firstFiles).foreach(f => f.setLastModified(t0 + 600000L))
      }
      mark("admitStream (2 batches)") {
        val stream = spark.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(inDir)
        graft.streaming.Admission.admitStream(stream, corpusDir, indexDir,
          tmp.resolve("ckpt").toString, "doc_id", "text",
          numHashes = 64, bands = 32, threshold = 0.6,
          dedupWithinBatch = false)
      }
      mark("final corpus read")(
        spark.read.parquet(corpusDir).select(col("doc_id"))
          .orderBy(col("doc_id")).count())
    }
    spark.stop()
  }
}
