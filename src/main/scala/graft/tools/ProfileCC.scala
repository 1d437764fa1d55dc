package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch diagnostics main — step-by-step timing of the
  * connectedComponentMinLabel driver path on the q62 core-edge graph
  * (not part of the library surface) */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
      .cache()
    pts.count()
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
      .select(col("id"), col("nid")).cache()
    inEps.count()
    val degrees = inEps.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val core = degrees.filter(col("deg") >= minPts).select(col("id")).cache()
    core.count()
    val coreEdges = inEps.join(core, Seq("id"))
      .join(core.withColumnRenamed("id", "nid"), Seq("nid"))
      .filter(col("id") < col("nid"))
      .select(col("id").as("id_a"), col("nid").as("id_b"))
    time("coreEdges count")(coreEdges.count())

    // ---- CC internals, mirrored from Dedup.connectedComponentMinLabel
    val pairs = coreEdges
    val edges0 = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
    time("edges0 count")(edges0.count())
    time("edges0 count again")(edges0.count())
    val edges = time("edges distinct+lckpt")(edges0.localCheckpoint())
    val edges0b = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
    time("2nd lckpt same lineage")(edges0b.localCheckpoint())
    val nEdges = time("edges count")(edges.count())
    println("  nEdges=" + nEdges)
    val es = time("edges collect")(
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))))
    import scala.collection.mutable
    val parent = mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val next = parent.getOrElse(c, c); parent(c) = r; c = next
      }
      r
    }
    time("union-find")(es.foreach { case (x, y) =>
      val (a, b) = (find(x), find(y))
      if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
    })
    import spark.implicits._
    val labels = time("labels toDF")(
      es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet.toSeq
        .map((id: Long) => (id, find(id))).toDF("id", "rep"))
    time("labels count")(labels.count())
    // the rest of cluster(): border assignment
    val comps = graft.operators.Dedup.connectedComponentMinLabel(coreEdges)
    time("library CC")(comps.count())
    time("full cluster()")(
      graft.ml.DBSCAN.cluster(pts0, "id", "x", "y", eps, minPts).count())
    spark.stop()
  }
}
