package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** scratch diagnostics main — stage-by-stage timing of the threshold
  * token-budget path on the mega-stratum corpus (not part of the
  * library surface). runMain graft.tools.ProbeBudget2 [k] */
object ProbeBudget2 {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(256)
    val sfDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val topLang = docs0.groupBy(col("lang")).count()
      .orderBy(col("count").desc).head().getString(0)
    val one = docs0.filter(col("lang") === topLang)
    val rest = docs0.filter(col("lang") =!= topLang)
    val c = (0 until k).map { i =>
      one.select((col("doc_id") + lit(i.toLong * 10000000)).as("doc_id"),
        col("lang"), concat(col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ union _).unionByName(rest)
      .repartition(16)
      .withColumn("quality", TF.qualityScore(col("text")))
      .withColumn("n_tok", TF.tokenCount(col("text")))
      .cache()
    println(s"[probe2] corpus n=${c.count()}")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe2] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val (strataCol, idCol, scoreCol, tokenCol, budget) =
      ("lang", "doc_id", "quality", "n_tok", 5000L)
    val sampleFraction = 0.1; val margin = 2.0; val seed = 42L

    val narrow = c.select(col(strataCol), col(idCol), col(scoreCol),
      col(tokenCol)).cache()
    t("narrow build")(narrow.count())
    t("narrow count 2")(narrow.count())
    t("c count 2")(c.count())
    spark.sparkContext.getRDDStorageInfo.foreach(i =>
      println(s"[probe2] storage ${i.name} mem=${i.memSize >> 20}MB " +
        s"disk=${i.diskSize >> 20}MB parts=${i.numCachedPartitions}/${i.numPartitions}"))
    println("[probe2] narrow plan: " + narrow.queryExecution.executedPlan
      .toString.linesIterator.take(6).mkString(" | "))
    val totals = narrow.groupBy(col(strataCol))
      .agg(sum(col(tokenCol)).as("__tot"), count(lit(1)).as("__cnt"))
      .cache()
    t("totals")(totals.count())
    val under = t("under ckpt")(totals.filter(col("__tot") <= budget)
      .select(col(strataCol)).localCheckpoint(true))
    val over = narrow.join(broadcast(totals.filter(col("__tot") > budget)
      .select(col(strataCol))), Seq(strataCol), "left_semi")
    t("over count")(over.count())

    val minSampleRows = 32
    val sw = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val cutoffs = over.sample(withReplacement = false, sampleFraction, seed)
      .withColumn("__scum",
        sum(col(tokenCol)).over(sw) / lit(sampleFraction))
      .withColumn("__srank", row_number().over(sw))
      .filter(col("__scum") <= budget * margin ||
        col("__srank") <= minSampleRows)
      .groupBy(col(strataCol))
      .agg(min(col(scoreCol)).as("__cutoff"))
    t("cutoffs show")(cutoffs.collect().foreach(r =>
      println(s"[probe2]   cutoff ${r.get(0)} = ${r.get(1)}")))

    val cand = over.join(broadcast(cutoffs), Seq(strataCol), "left")
      .filter(col("__cutoff").isNull || col(scoreCol) >= col("__cutoff"))
      .drop("__cutoff")
    val candN = t("cand count")(cand.count())
    println(s"[probe2] cand rows=$candN")

    val candStats = cand.groupBy(col(strataCol))
      .agg(sum(col(tokenCol)).as("__ctot"), count(lit(1)).as("__ccnt"))
    val ok = candStats.join(totals, Seq(strataCol))
      .filter(col("__ctot") >= budget || col("__ccnt") === col("__cnt"))
      .select(col(strataCol))
    t("ok show")(ok.collect().foreach(r => println(s"[probe2]   ok ${r.get(0)}")))
    val okCand = cand.join(broadcast(ok), Seq(strataCol), "left_semi")
    val fallback = over.join(broadcast(ok), Seq(strataCol), "left_anti")
    t("fallback count")(println(s"[probe2] fallback rows=${fallback.count()}"))

    val trimmedIds = t("trim ckpt")(graft.operators.Budget.tokenBudgetSelect(
      okCand.unionByName(fallback), strataCol, idCol, scoreCol, tokenCol,
      budget).select(col(strataCol), col(idCol)).localCheckpoint(true))
    val out = c.join(broadcast(under), Seq(strataCol), "left_semi")
      .unionByName(c.join(trimmedIds, Seq(strataCol, idCol), "left_semi"))
    t("final count")(println(s"[probe2] out rows=${out.count()}"))
    spark.stop()
  }
}
