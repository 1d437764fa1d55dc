package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStream

/** scratch diagnostics main — left-outer stream-stream interval join
  * watermark/flush behavior across checkpointed drains (not part of
  * the library surface). runMain graft.tools.ProbeStream */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Files.createTempDirectory("graft_probe_louter").toString
    val src = s"$base/src"; val sink = s"$base/sink"; val chk = s"$base/chk"
    Files.createDirectories(Paths.get(src))
    Files.copy(new java.io.File(s"$dir/events.parquet").toPath,
      Paths.get(s"$src/events_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val srcLayout = EventStream.probeTsLayout(spark, s"$src/events_a.parquet")
    val maxUs = EventStream.eventsRawMicros(spark, dir)
      .agg(max(col("ts"))).head().getLong(0)
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("l_id")),
      df.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("ts_r"),
          col("event_id").as("r_id")))
    def drain(tag: String): Unit = {
      val (sl, sr) = sides(EventStream.readStream(spark, src))
      val q = EventStream.intervalJoin(sl, sr, "user_id",
          before = "30 minutes", after = "30 minutes",
          joinType = "leftOuter")
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", chk)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val progs = q.recentProgress
      progs.foreach { p =>
        println(s"[probe] $tag batch=${p.batchId} rows=${p.numInputRows} " +
          s"watermark=${p.eventTime.get("watermark")} " +
          s"stateRows=${Option(p.stateOperators).map(_.map(_.numRowsTotal).mkString(",")).getOrElse("-")}")
      }
      val n = spark.read.parquet(sink).count()
      println(s"[probe] $tag sink=$n")
    }
    def sentinel(name: String, us: Long): Unit = {
      val scratch = s"$base/scratch_$name"
      import spark.implicits._
      EventStream.renderTs(
          Seq((-1L, us, -1L, "click", 0.0, ""),
            (-2L, us, -1L, "purchase", 0.0, ""))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
          srcLayout)
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$src/$name"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    drain("d1")
    sentinel("events_z1.parquet", maxUs + 365L * 24 * 3600 * 1000000L)
    drain("d2")
    sentinel("events_z2.parquet", maxUs + 366L * 24 * 3600 * 1000000L)
    drain("d3")
    spark.stop()
  }
}
