package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch: asserted plan pins for the r13-extension operators — the
  * explain-and-iterate loop, rerunnable like ExplainR11/R12. The
  * points this round: the signature screen must be equi broadcast
  * joins (never a nested-loop or cartesian) with a map-side partial
  * agg for its census; the unigram seed top-k must be a
  * TakeOrderedAndProject (no single-partition window); the
  * gopherFlags / phrase-tag passes must be shuffle-free projections
  * over the scan. */
object ExplainR13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    var bad = 0

    def audit(name: String, df: org.apache.spark.sql.DataFrame,
              checks: (String, String => Boolean)*): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== $name ===")
      checks.foreach { case (what, ok) =>
        val o = ok(plan)
        if (!o) bad += 1
        println(f"  [${if (o) "ok" else "VIOLATION"}] $what")
      }
    }
    def noLoops(p: String): Boolean =
      !p.contains("Cartesian") && !p.contains("BroadcastNestedLoop")
    def noWindow(p: String): Boolean =
      !"\\bWindow\\b".r.findFirstIn(p).isDefined
    def noExchange(p: String): Boolean = !p.contains("Exchange")

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // signature screen: batch chunks broadcast into the index via
    // EQUI hash joins (candidate join + hot-bucket anti join); the
    // census partial-aggs map-side before its exchange
    val corpusSigs = spark.range(100000).select(col("id"),
      xxhash64(col("id")).as("sig"))
    val batchSigs = spark.range(200).select((col("id") + 1000000L).as("id"),
      xxhash64(col("id")).bitwiseXOR(lit(1L)).as("sig"))
    audit("signaturePairsAgainst",
      graft.operators.Dedup.signaturePairsAgainst(batchSigs, corpusSigs,
        "id", "sig", maxDistance = 3),
      ("equi broadcast joins only (no nested loop / cartesian)", noLoops),
      ("broadcast hash join present",
        p => p.contains("BroadcastHashJoin")),
      ("census partial-aggs map-side",
        p => "HashAggregate".r.findAllIn(p).length >= 2),
      ("no Window node", noWindow))

    // index build: one distinct hash agg, no window, no loops
    audit("signatureIndex",
      graft.operators.Dedup.signatureIndex(corpusSigs, "id", "sig"),
      ("no loops", noLoops),
      ("no Window node", noWindow))

    // unigram seed: distributed top-k — TakeOrderedAndProject, never
    // a single-partition window rank
    audit("Unigram.seedCandidates",
      graft.operators.Unigram.seedCandidates(docs, "text",
        maxPieceLen = 4, seedSize = 200),
      ("TakeOrderedAndProject top-k",
        p => p.contains("TakeOrderedAndProject")),
      ("no Window node", noWindow),
      ("no single-partition funnel",
        p => !p.contains("Exchange SinglePartition")))

    // gopherFlags: a pure projection over the scan — no exchange, no
    // join. (NOT a whole-stage-codegen pin: the rules ride
    // higher-order array functions — transform/filter/aggregate —
    // which Spark evaluates outside WSCG by design; the scale
    // property that matters is the single shuffle-free project.)
    audit("gopherFlags projection",
      docs.select(graft.functions.TextFunctions
        .gopherFlags(col("text")).as("g")),
      ("shuffle-free", noExchange),
      ("no loops", noLoops),
      ("single project over the scan",
        p => p.contains("Project")))

    // phrase tagging: broadcast automaton + narrow map — the scan
    // plus a project, nothing else
    val phrases = docs.select(explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("phrase"))
      .limit(50)
    audit("Phrases.tagPhrases",
      graft.operators.Phrases.tagPhrases(docs, "text", phrases),
      ("shuffle-free", noExchange),
      ("no loops", noLoops))

    if (bad > 0) { println(s"$bad VIOLATION(s)"); sys.exit(1) }
    println("explain-r13: all pins hold")
    spark.stop()
  }
}
