package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStream

/** scratch diagnostics main — q72 (stream-stream interval join)
  * latency-floor probe: how much of the gate cost is micro-batch
  * machinery vs settings we could change without weakening the
  * stream==batch semantics. Times the identical join under
  * (a) the current memory-sink + processAllAvailable shape,
  * (b) Trigger.AvailableNow + awaitTermination,
  * (c) shape (a) with fewer state partitions (state store instances
  *     scale with spark.sql.shuffle.partitions at stream start).
  * Two passes each; result row counts asserted identical.
  * runMain graft.tools.ProbeQ72 [sfDir] */
object ProbeQ72 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def joined() = {
      val stream = EventStream.readStream(spark, dir)
      val l = stream.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("l_id"))
      val r = stream.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("ts_r"),
          col("event_id").as("r_id"))
      EventStream.intervalJoin(l, r, "user_id",
        before = "30 minutes", after = "30 minutes")
    }

    var want = -1L
    def check(n: Long): Unit = {
      if (want < 0) want = n
      require(n == want, s"row count diverged: $n vs $want")
    }

    def time(label: String)(f: => Long): Unit = (1 to 2).foreach { p =>
      val t0 = System.nanoTime()
      val n = f
      check(n)
      println(f"[probe-q72] $label%-28s pass=$p " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }

    time("processAllAvailable") {
      val res = EventStream.runToMemory(joined(), "p_default",
        OutputMode.Append())
      val n = res.count(); spark.catalog.dropTempView("p_default"); n
    }

    time("availableNow") {
      val q = joined().writeStream.format("memory").queryName("p_avnow")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val n = spark.table("p_avnow").count()
      spark.catalog.dropTempView("p_avnow"); n
    }

    Seq(8, 4).foreach { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      time(s"processAllAvailable p=$parts") {
        val res = EventStream.runToMemory(joined(), s"p_$parts",
          OutputMode.Append())
        val n = res.count(); spark.catalog.dropTempView(s"p_$parts"); n
      }
    }
    spark.stop()
  }
}
