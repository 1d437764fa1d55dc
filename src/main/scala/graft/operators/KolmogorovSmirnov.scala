package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** reference: ddf_library/functions/statistics ::
  * kolmogorov_smirnov_one_sample — one-sample KS test: distributed
  * sort → empirical CDF → sup-distance against a theoretical CDF.
  *
  * Scalable ECDF: a global `orderBy` (Spark's sampled range partition +
  * local sort, the same TeraSort pattern the reference hand-rolls in
  * etl/sort.py) followed by `RDD.zipWithIndex`, which assigns dense
  * global ranks in partition order WITHOUT collapsing to one partition
  * (unlike a partition-less SQL window). The sup-distance then reduces
  * with a single max aggregation. With ties, taking
  * max(|F(x)-i/n|, |F(x)-(i+1)/n|) over every tied row still attains
  * the true D, so tie order is irrelevant.
  */
object KolmogorovSmirnov {

  /** Standard-normal CDF via the Abramowitz & Stegun 7.1.26 erf
    * approximation (|err| < 1.5e-7), built from codegen'd arithmetic
    * columns — no UDF. */
  def normalCdf(x: Column, mean: Double = 0.0, std: Double = 1.0): Column = {
    val z = (x - lit(mean)) / lit(std)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(z) / sqrt(lit(2.0)))
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) +
      t * lit(1.061405429)))))
    val erfAbs = lit(1.0) - poly * exp(-(z * z) / lit(2.0))
    val cdfPos = lit(0.5) * (lit(1.0) + erfAbs)
    when(z >= 0, cdfPos).otherwise(lit(1.0) - cdfPos)
  }

  def uniformCdf(x: Column, lo: Double = 0.0, hi: Double = 1.0): Column =
    least(lit(1.0), greatest(lit(0.0), (x - lit(lo)) / lit(hi - lo)))

  def cdfFor(distribution: String, params: Seq[Double]): Column => Column =
    distribution match {
      case "norm" =>
        val m = params.headOption.getOrElse(0.0)
        val s = if (params.size > 1) params(1) else 1.0
        normalCdf(_, m, s)
      case "uniform" =>
        val lo = params.headOption.getOrElse(0.0)
        val hi = if (params.size > 1) params(1) else 1.0
        uniformCdf(_, lo, hi)
      case other => sys.error(s"unknown distribution: $other")
    }

  /** D statistic as a 1-row DataFrame (column `ks_stat`). */
  def statisticDF(df: DataFrame, column: String, distribution: String,
                  params: Seq[Double] = Nil): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // cache the sorted values: the sizing job below is one pass and the
    // final sup-distance aggregation is the second — without the cache
    // the global sort would execute twice (the same lesson Zip.zipByIndex
    // learned).
    val vals = df.select(col(column).cast("double")).na.drop()
      .orderBy(col(column)).cache()
    // ONE sizing job supplies both the per-partition rank offsets (what
    // RDD.zipWithIndex computes internally) and the global n — the
    // separate count() this replaces was a third full pass over the
    // cached sort.
    val rdd = vals.rdd
    val sizes = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val n = sizes.sum.toDouble
    val offsets = sizes.scanLeft(0L)(_ + _)
    val ranked = rdd.mapPartitionsWithIndex { (i, it) =>
      var k = offsets(i)
      it.map { r => val out = (r.getDouble(0), k); k += 1; out }
    }.toDF("x", "rank")
    val cdf = cdfFor(distribution, params)(col("x"))
    val out = ranked
      .select(greatest(abs(cdf - col("rank") / lit(n)),
        abs(cdf - (col("rank") + 1) / lit(n))).as("d"))
      .agg(max(col("d")).as("ks_stat"))
      .localCheckpoint(true) // 1 row; lets the sort cache release now
    vals.unpersist(false)
    out
  }

  def statistic(df: DataFrame, column: String, distribution: String,
                params: Seq[Double] = Nil): Double =
    statisticDF(df, column, distribution, params).head().getDouble(0)
}
