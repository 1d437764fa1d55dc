package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch diagnostics main — r15 (VERDICT item 1, admission gate
  * diet): SUB-STEP wall decomposition of one warm admission cycle —
  * replicating [[graft.streaming.Admission.admitBatch]]'s body step
  * by step with marks — plus a streaming-vs-direct comparison, so
  * the diet lands where the seconds actually are (screen vs fold vs
  * stats counts vs Structured Streaming machinery). Not part of the
  * library surface. */
object ProbeQ123b {
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
      println(f"[probe-q123b] $name%-32s wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup
    (1 to 2).foreach { round =>
      println(s"[probe-q123b] ---- round $round ----")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") < 2000)
      val rev = concat_ws(" ", reverse(TF.tokens(col("text"))))
      val b1 = base.filter(col("doc_id") < 200)
        .select((col("doc_id") + 30000).as("doc_id"), rev.as("text"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_probe_q123b")
      val corpusDir = tmp.resolve("corpus").toString
      val indexDir = tmp.resolve("index").toString
      base.write.mode("overwrite").parquet(corpusDir)
      Dedup.minhashIndex(base, "doc_id", "text", numHashes = 64, bands = 32)
        .write.mode("overwrite").parquet(indexDir)
      // ---- one cycle, admitBatch's body inlined with marks ----
      val corpus = spark.read.parquet(corpusDir)
      val index = spark.read.parquet(indexDir)
      val batch = b1
      val batchRows = mark("stats: batch.count")(batch.count())
      val fresh = Dedup.exactAgainst(batch.dropDuplicates("doc_id"),
        corpus, Seq("doc_id"), hashKeys = false).cache()
      val nFresh = mark("id screen + stats count")(fresh.count())
      val matchedDf = Dedup.minhashPairsAgainstIndex(fresh, corpus, index,
        "doc_id", "text", numHashes = 64, bands = 32, threshold = 0.6)
        .select(col("id_new").as("doc_id")).distinct()
      val screened = fresh.join(matchedDf, Seq("doc_id"), "left_anti")
      val admitted = mark("near screen + localCheckpoint")(
        screened.localCheckpoint())
      val nAdmitted = mark("admitted.count")(admitted.count())
      mark("corpus append")(
        admitted.write.mode("append").parquet(corpusDir))
      mark("index fold + swapWrite") {
        val folded = Dedup.minhashIndexUpdate(index, admitted,
          "doc_id", "text", numHashes = 64, bands = 32)
        graft.streaming.Admission.swapWriteIndex(folded, indexDir)
      }
      fresh.unpersist()
      println(s"[probe-q123b] rows: batch=$batchRows fresh=$nFresh admitted=$nAdmitted")
      // ---- the same single cycle via admitBatch (sanity) ----
      val tmp2 = java.nio.file.Files.createTempDirectory("graft_probe_q123b2")
      val c2 = tmp2.resolve("corpus").toString
      val i2 = tmp2.resolve("index").toString
      base.write.mode("overwrite").parquet(c2)
      Dedup.minhashIndex(base, "doc_id", "text", numHashes = 64, bands = 32)
        .write.mode("overwrite").parquet(i2)
      mark("admitBatch (1 cycle, stats on)")(
        graft.streaming.Admission.admitBatch(b1, c2, i2, "doc_id", "text",
          numHashes = 64, bands = 32, threshold = 0.6,
          dedupWithinBatch = false))
      val tmp3 = java.nio.file.Files.createTempDirectory("graft_probe_q123b3")
      val c3 = tmp3.resolve("corpus").toString
      val i3 = tmp3.resolve("index").toString
      base.write.mode("overwrite").parquet(c3)
      Dedup.minhashIndex(base, "doc_id", "text", numHashes = 64, bands = 32)
        .write.mode("overwrite").parquet(i3)
      mark("admitBatch (1 cycle, stats OFF)")(
        graft.streaming.Admission.admitBatch(b1, c3, i3, "doc_id", "text",
          numHashes = 64, bands = 32, threshold = 0.6,
          dedupWithinBatch = false, collectStats = false))
    }
    spark.stop()
  }
}
