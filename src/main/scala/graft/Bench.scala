package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed warmup so JVM/codegen/scan-setup startup cost is not
    // attributed to whichever query happens to run first (map order)
    try SparkEntry.queries("q02_select")(spark, sfDir).count()
    catch { case _: Throwable => }
    spark.catalog.clearCache()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators cache intermediates (LSH payloads, grid cells);
      // drop them so 72 queries don't accumulate heap pressure and
      // each query measures cold
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // the stdout line can drown in sbt log noise — also write the JSON
    // to a file so the driver never depends on stdout scraping
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    catch { case _: Throwable => }
    // also drop a copy in the repo so the artifact is readable even if
    // the driver's stdout parse truncates (committed per round)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/bench_last.json"), json)
    catch { case _: Throwable => }
    spark.stop()
    // final line of the process, after Spark's shutdown logging
    println(json)
  }
}
