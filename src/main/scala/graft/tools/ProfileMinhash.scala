package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** stage-by-stage timing of the minhash dedup pipeline at sf0.1 */
object ProfileMinhash {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val all = docs
      .union(docs.filter(col("doc_id") < 50)
        .select(col("doc_id") + 10000, concat(col("text"), lit(" zzz"))))
      .union(docs.filter(col("doc_id") < 100)
        .select(col("doc_id") + 20000, col("text")))

    val sh = all.select(col("doc_id").as("id"),
        wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0).cache()
    time("shingle+cache")(sh.count())
    val sig = sh.select(col("id"), minhashSignature(col("sh"), 64).as("sig"))
    time("signatures")(sig.count())
    val banded = sh.select(col("id"),
        explode(minhashBands(minhashSignature(col("sh"), 64), 32, 2)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    time("banded")(banded.count())
    val bandedC = banded.cache(); time("banded cache")(bandedC.count())
    val cand = bandedC.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(bandedC.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct().cache()
    time("candidates")(println("  n_cand=" + cand.count()))
    val verified = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= 0.6)
    time("verify")(verified.count())
    spark.stop()
  }
}
