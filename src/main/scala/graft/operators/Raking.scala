package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Raking / iterative proportional fitting (Deming & Stephan 1940 —
  * the survey-statistics classic, public method): fit per-cell
  * weights over a 2-D contingency table (e.g. lang × source) so the
  * weighted row AND column marginals simultaneously match caller
  * targets, then select a budgeted, md5-deterministic sample at the
  * fitted cell fractions. This is the multi-marginal generalization
  * of [[Budget.remixToTarget]]: remix hits ONE stratification's
  * proportions; raking reconciles two at once (a corpus can't
  * usually hit exact lang targets AND exact source targets by
  * independent per-stratum trims — IPF finds the unique
  * minimum-KL-divergence reweighting that does, Csiszár 1975).
  *
  * Engine shape at 100 TB:
  *  - the ONLY corpus-sized work is one partial-aggregated cell
  *    count (exchange carries ≤ |rows|·|cols| cells) and the final
  *    selection pass. The IPF iterations run on the COLLECTED cell
  *    table — a bounded driver read (hard-capped like Dsir's ratio
  *    table; a lang × source table is hundreds of cells, never
  *    corpus-shaped), the same discipline as remixToTarget's
  *    per-stratum budget math.
  *  - iteration count is FIXED (deterministic — no convergence
  *    epsilon), which is what lets q223's oracle unroll every
  *    row/column pass as SQL CTEs, the q149 label-prop discipline.
  *  - selection is the capPerGroup shape: fitted cell quotas joined
  *    back broadcast, one window per cell ordered by md5(seed:id) —
  *    rerun- and layout-stable; a mega-cell pays one spilled
  *    per-cell sort, and the md5-cutoff threshold estimation of
  *    [[Budget.tokenBudgetSelectThreshold]] is the documented
  *    mega-cell escape hatch.
  */
object Raking {

  private val MaxCells = 1 << 20

  /** observed (row, col, n) cells — one bounded partial aggregation. */
  def cellCounts(df: DataFrame, rowCol: String, colCol: String): DataFrame =
    df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("n"))

  private def validateTargets(what: String, t: Map[String, Double]): Unit = {
    require(t.nonEmpty, s"$what targets must be non-empty")
    t.foreach { case (k, v) =>
      require(v > 0, s"$what target for '$k' must be positive, got $v") }
    val s = t.values.sum
    require(math.abs(s - 1.0) < 1e-6,
      s"$what targets must sum to 1, got $s")
  }

  /** IPF cell fractions: (r, c, n, weight, cell_frac) with
    * `cell_frac` the fitted proportion of the final mix. `iters`
    * full row-then-column passes; every OBSERVED row/column value
    * must have a target (extra target keys for unobserved values are
    * fine — their mass is unreachable and the fit renormalizes). */
  def ipfCellFractions(df: DataFrame, rowCol: String, colCol: String,
                       rowTargets: Map[String, Double],
                       colTargets: Map[String, Double],
                       iters: Int = 5): DataFrame = {
    validateTargets("row", rowTargets)
    validateTargets("col", colTargets)
    require(iters >= 1 && iters <= 100,
      s"iters must be in [1, 100], got $iters")
    val spark = df.sparkSession
    val cells = cellCounts(df, rowCol, colCol).collect()
    require(cells.length > 0, "ipfCellFractions: input has no rows")
    require(cells.length <= MaxCells,
      s"ipfCellFractions: ${cells.length} cells exceed the bounded-" +
        s"driver-read cap $MaxCells — this operator is for LOW-" +
        "cardinality stratifications (lang x source), not key pairs")
    val rs = cells.map(_.getString(0)).distinct
    val cs = cells.map(_.getString(1)).distinct
    rs.foreach(r => require(rowTargets.contains(r),
      s"observed $rowCol value '$r' has no row target"))
    cs.foreach(c => require(colTargets.contains(c),
      s"observed $colCol value '$c' has no col target"))

    val n = cells.map(_.getLong(2).toDouble)
    val w = Array.fill(cells.length)(1.0)
    (0 until iters).foreach { _ =>
      // row pass: scale every row group to its target mass
      val rowSum = collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      cells.indices.foreach(i =>
        rowSum(cells(i).getString(0)) += n(i) * w(i))
      cells.indices.foreach { i =>
        val s = rowSum(cells(i).getString(0))
        if (s > 0) w(i) *= rowTargets(cells(i).getString(0)) / s
      }
      // column pass
      val colSum = collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      cells.indices.foreach(i =>
        colSum(cells(i).getString(1)) += n(i) * w(i))
      cells.indices.foreach { i =>
        val s = colSum(cells(i).getString(1))
        if (s > 0) w(i) *= colTargets(cells(i).getString(1)) / s
      }
    }
    val tot = cells.indices.map(i => n(i) * w(i)).sum
    val rows = cells.indices.map { i =>
      Row(cells(i).getString(0), cells(i).getString(1),
        cells(i).getLong(2), w(i), n(i) * w(i) / tot)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("r",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("weight",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("cell_frac",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** Budgeted selection at the fitted mix. Per-cell quotas are
    * largest-remainder (Hamilton) apportionments of totalN over the
    * fitted fractions — floor(totalN·frac + 1e-9) plus one extra for
    * the cells with the largest rounded remainders, so the selection
    * hits totalN EXACTLY whenever populations allow (a bare floor
    * loses up to #cells−1 rows — at a 97-cell lang×source table
    * that's a double-digit-percent shortfall of a small budget).
    * The 1e-9 epsilon and the round-9 remainder pin the two FP seams
    * (floor flip, remainder rank) against last-ulp replay drift.
    * Winners per cell by md5(seed ":" id) order (capPerGroup's
    * rerun-stable discipline), capped at the cell's population —
    * the only remaining shortfall is a cell smaller than its quota,
    * which no apportionment can fill without leaving the fitted
    * mix. */
  def rakeSelect(df: DataFrame, idCol: String, rowCol: String,
                 colCol: String, rowTargets: Map[String, Double],
                 colTargets: Map[String, Double], totalN: Long,
                 iters: Int = 5, seed: Long = 42L): DataFrame = {
    require(totalN > 0, s"totalN must be positive, got $totalN")
    val fracs = ipfCellFractions(df, rowCol, colCol, rowTargets,
      colTargets, iters).collect() // bounded — same table IPF ran on
    val base = fracs.map { r =>
      val exact = totalN.toDouble * r.getDouble(4)
      val q = math.floor(exact + 1e-9).toLong
      val rem = BigDecimal(exact - q)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r.getString(0), r.getString(1), q, rem)
    }
    val short = (totalN - base.map(_._3).sum).toInt
    val bumped = base.sortBy { case (r, c, _, rem) => (-rem, r, c) }
      .zipWithIndex
      .map { case ((r, c, q, _), i) => (r, c, if (i < short) q + 1 else q) }
    val spark = df.sparkSession
    val quotas = spark.createDataFrame(
      spark.sparkContext.parallelize(
        bumped.toSeq.map(t => Row(t._1, t._2, t._3)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__r",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("__c",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("__q",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val key = conv(substring(md5(concat_ws(":", lit(seed.toString),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(rowCol), col(colCol))
      .orderBy(key.asc, col(idCol).asc)
    df.join(broadcast(quotas),
        col(rowCol) === col("__r") && col(colCol) === col("__c"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__q"))
      .drop("__r", "__c", "__q", "__rn")
  }
}
