package graft
import org.apache.spark.sql.SparkSession

/** Benchmark gate main. Runs every catalog query on
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line.
  *
  * Measurement protocol (round 5 revision): each query runs TWICE — a
  * cold pass and a repeat pass. The driver-documented fields `value`/
  * `queries` carry the SINGLE COLD PASS, the meaning they had in
  * rounds 1–3, so any consumer keying on them compares like with like
  * across every round. The per-query minimum of the two passes — the
  * capability number — is appended as the extension fields
  * `queries_best`/`value_best` (round 4 briefly redefined `value` as
  * best-of; ADVICE r4 flagged the silent contract change and this
  * restores it). Rationale for two passes (BENCH_NOTES.md): the shared
  * host shows a 67–295 s total-time variance envelope for identical
  * bytecode across rounds; one sample per query cannot distinguish a
  * code regression from a noisy neighbor. Cold-vs-best spread plus the
  * recorded `/proc/loadavg` make contention visible inside the
  * artifact itself instead of requiring an out-of-band triage.
  *
  * Round-7 extension: the two CC-loop queries named in `median_of_3`
  * run a THIRD pass and report the median of three in `queries_best`
  * (instrumented rationale inline below; distribution in
  * BENCH_NOTES.md r7). All other fields keep their meaning; the new
  * key appends strictly after the existing ones.
  *
  * Round-9 extension (the BASELINE.md failure contract, violated in
  * r8): a query whose ANY pass throws records -1 in `queries` AND
  * `queries_best`, its name joins the appended `failed` list, and
  * BOTH totals become -1 — a red query can no longer masquerade as a
  * fast pass, and a red round can no longer post a headline total.
  */
object Bench {
  /** Time one query; a FAILED query returns -1.0, never its
    * time-to-fail (BASELINE.md's contract: failed queries score −1
    * and must be unmissably red — r8 recorded time-to-fail and 15
    * broken queries masqueraded as ~0.05 s speedups). Pinned in
    * BenchContractSpec. */
  def timeOne(spark: SparkSession, sfDir: String,
              fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
  : Double = {
    val t0 = System.nanoTime()
    val ok =
      try { fn(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
    val dt = (System.nanoTime() - t0) / 1e9
    // operators cache intermediates (LSH payloads, grid cells);
    // drop them so 77 queries don't accumulate heap pressure and
    // each pass measures from parquet, not from a leftover cache
    spark.catalog.clearCache()
    if (ok) dt else -1.0
  }

  private def loadavg(): String =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim
      s.split("\\s+").take(3).mkString(" ")
    } catch { case _: Throwable => "unavailable" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = loadavg()
    // one untimed warmup so JVM/codegen/scan-setup startup cost is not
    // attributed to whichever query happens to run first (map order)
    try SparkEntry.queries("q02_select")(spark, sfDir).count()
    catch { case _: Throwable => }
    spark.catalog.clearCache()

    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      Bench.timeOne(spark, sfDir, fn)

    // The two CC-label-propagation queries (many small jobs +
    // localCheckpoints) are the catalog's most scheduler/JIT-
    // sensitive shapes and have swung 2-4x across rounds on identical
    // bytecode. ProbeVariance (r7, 12 interleaved runs, quiet host)
    // showed their job/task counts are DETERMINISTIC (31 jobs/745
    // tasks and 23/249 every run) and steady-state wall spread is a
    // tight 1.2x — the outlier is the first post-warmup run (2.3x,
    // JIT-cold for these specific shapes; the generic q02 warmup
    // doesn't touch them). min-of-2 keeps one foot in that cold
    // window, so for THESE queries the gate runs a third pass and
    // reports the MEDIAN of three in queries_best — one scheduler
    // hiccup or cold pass can no longer pollute round comparisons.
    val medianOf3 = Set("q62_dbscan", "q80_dedup_keep_best")
    val timings = SparkEntry.queries.map { case (name, fn) =>
      val cold = timeOne(fn)
      val rep = timeOne(fn)
      // ANY failed pass makes the query red: -1 in both fields, never
      // a min/median that could launder a failure into a timing
      val passes =
        if (medianOf3(name)) Seq(cold, rep, timeOne(fn)) else Seq(cold, rep)
      val best =
        if (passes.exists(_ < 0)) -1.0
        else if (medianOf3(name)) passes.sorted.apply(1)
        else passes.min
      name -> (if (cold < 0 || best < 0) -1.0 else cold, best)
    }
    val loadEnd = loadavg()
    val failed = timings.collect { case (k, (_, b)) if b < 0 => k }.toSeq.sorted
    def jmap(sel: ((Double, Double)) => Double): String =
      timings.map { case (k, v) => s"\"" + k + "\":" + sel(v) }
        .mkString("{", ",", "}")
    // totals poison on any failure (BASELINE.md): a red query must be
    // impossible to miss in the artifact's headline number
    val totalBest =
      if (failed.nonEmpty) -1.0 else timings.values.map(_._2).sum
    val totalCold =
      if (failed.nonEmpty) -1.0 else timings.values.map(_._1).sum
    // the driver-documented fields (metric/value/unit/queries/sf) keep
    // their original order, original SINGLE-COLD-PASS meaning, and come
    // first; protocol extensions (best-of-two, loadavg) append strictly
    // after, so any prefix- or key-based parse of the old shape still
    // works and never silently changes metric
    val json =
      s"""{"metric":"total","value":$totalCold,"unit":"sec","queries":${jmap(_._1)},"sf":"$sfDir","queries_best":${jmap(_._2)},"value_best":$totalBest,"passes":2,"loadavg_start":"$loadStart","loadavg_end":"$loadEnd","median_of_3":[${medianOf3.toSeq.sorted.map("\"" + _ + "\"").mkString(",")}],"failed":[${failed.map("\"" + _ + "\"").mkString(",")}]}"""
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
