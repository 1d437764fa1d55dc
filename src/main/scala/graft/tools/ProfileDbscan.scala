package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch diagnostics main — stage-by-stage timing of the q62 DBSCAN
  * pipeline (not part of the library surface) */
object ProfileDbscan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val pts0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        (element_at(col("embedding"), 1) * 100).cast("double").as("x"),
        (element_at(col("embedding"), 2) * 100).cast("double").as("y"))
    time("warmup count")(pts0.count())
    val eps = 2.0; val minPts = 4
    val pts = graft.operators.Partitioning.spread(pts0)
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))
      .withColumn("ct", lit(0L))
      .cache()
    time("pts cache")(pts.count())
    val offsets = for (dx <- Seq(-1, 0, 1); dy <- Seq(-1, 0, 1)) yield (dx, dy)
    val probes = pts.select(col("id"), col("x"), col("y"),
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("cx") + dx).as("gx"), (col("cy") + dy).as("gy"))
      }: _*)).as("cell"))
      .select(col("id"), col("x"), col("y"), col("cell.gx"), col("cell.gy"))
    val home = pts.select(col("id").as("nid"), col("x").as("nx"),
      col("y").as("ny"), col("cx").as("gx"), col("cy").as("gy"))
    val inEps = probes.join(home, Seq("gx", "gy"))
      .filter((col("x") - col("nx")) * (col("x") - col("nx")) +
        (col("y") - col("ny")) * (col("y") - col("ny")) <= eps * eps)
      .select(col("id"), col("nid")).cache() // pairs unique by construction
    time("inEps")(println("  edges=" + inEps.count()))
    val degrees = inEps.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val core = degrees.filter(col("deg") >= minPts).select(col("id")).cache()
    time("core")(println("  core=" + core.count()))
    val coreEdges = inEps.join(core, Seq("id"))
      .join(core.withColumnRenamed("id", "nid"), Seq("nid"))
      .filter(col("id") < col("nid"))
      .select(col("id").as("id_a"), col("nid").as("id_b"))
    time("coreEdges")(println("  ce=" + coreEdges.count()))
    val comps = time("CC")(
      graft.operators.Dedup.connectedComponentMinLabel(coreEdges))
    time("full cluster()")(
      graft.ml.DBSCAN.cluster(pts0, "id", "x", "y", eps, minPts).count())
    spark.stop()
  }
}
