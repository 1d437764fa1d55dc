package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Raking / iterative proportional fitting (Deming & Stephan 1940 —
  * the survey-statistics classic, public method): fit per-cell
  * weights over a k-dimensional contingency table (e.g. lang ×
  * source × length-bucket) so the weighted marginals of EVERY
  * stratification simultaneously match caller targets, then select a
  * budgeted, deterministic sample at the fitted cell fractions. This
  * is the multi-marginal generalization of [[Budget.remixToTarget]]:
  * remix hits ONE stratification's proportions; raking reconciles k
  * at once (a corpus can't usually hit exact lang targets AND exact
  * source targets by independent per-stratum trims — IPF finds the
  * unique minimum-KL-divergence reweighting that does, Csiszár 1975).
  *
  * Engine shape at 100 TB:
  *  - the ONLY corpus-sized work is one partial-aggregated cell
  *    count (exchange carries ≤ Π|dims| cells) and the final
  *    selection pass. The IPF iterations run on the COLLECTED cell
  *    table — a bounded driver read (hard-capped like Dsir's ratio
  *    table; a lang × source × bucket table is hundreds of cells,
  *    never corpus-shaped), the same discipline as remixToTarget's
  *    per-stratum budget math.
  *  - iteration count is FIXED (deterministic — no convergence
  *    epsilon), which is what lets q223/q225's oracles unroll every
  *    marginal pass as SQL CTEs, the q149 label-prop discipline.
  *  - selection is the capPerGroup shape: fitted cell quotas joined
  *    back broadcast, one window per cell ordered by md5(seed:id)
  *    (or a caller priority column — [[rakeSelectByN]]) — rerun- and
  *    layout-stable; a mega-cell pays one spilled per-cell sort, and
  *    the md5-cutoff threshold estimation of
  *    [[Budget.tokenBudgetSelectThreshold]] is the documented
  *    mega-cell escape hatch.
  *
  * Stratification contract: cells are STRINGS. Non-string columns
  * (an int year, a computed bucket) are cast to string inside
  * [[cellCountsN]] so targets are always keyed by the string form;
  * a NULL cell value is refused with a contract message (nulls have
  * no target key — bucket or fill them upstream).
  */
object Raking {

  private val MaxCells = 1 << 20

  private def requireCols(cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "raking needs at least one stratification column")
    require(cols.distinct.length == cols.length,
      s"stratification columns must be distinct, got $cols")
  }

  /** observed k-dim cells — one bounded partial aggregation. Output:
    * the stratification columns (each cast to string, null-refused
    * at fit time) followed by `n`. */
  def cellCountsN(df: DataFrame, cols: Seq[String]): DataFrame = {
    requireCols(cols)
    df.groupBy(cols.map(c => col(c).cast("string").as(c)): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** 2-marginal face of [[cellCountsN]] (output renamed r/c). */
  def cellCounts(df: DataFrame, rowCol: String, colCol: String): DataFrame =
    cellCountsN(df, Seq(rowCol, colCol))
      .select(col(rowCol).as("r"), col(colCol).as("c"), col("n"))

  private def validateTargets(what: String, t: Map[String, Double]): Unit = {
    require(t.nonEmpty, s"$what targets must be non-empty")
    t.foreach { case (k, v) =>
      require(v > 0, s"$what target for '$k' must be positive, got $v") }
    val s = t.values.sum
    require(math.abs(s - 1.0) < 1e-6,
      s"$what targets must sum to 1, got $s")
  }

  /** collected, validated cell table: (cell keys per dim, n, w=1). */
  private def collectCells(df: DataFrame, cols: Seq[String],
                           targets: Seq[Map[String, Double]])
  : (Array[Array[String]], Array[Double]) = {
    requireCols(cols)
    require(targets.length == cols.length,
      s"need one target map per stratification column: " +
        s"${cols.length} columns, ${targets.length} maps")
    cols.zip(targets).foreach { case (c, t) => validateTargets(c, t) }
    val cells = cellCountsN(df, cols).collect()
    require(cells.length > 0, "ipfCellFractions: input has no rows")
    require(cells.length <= MaxCells,
      s"ipfCellFractions: ${cells.length} cells exceed the bounded-" +
        s"driver-read cap $MaxCells — this operator is for LOW-" +
        "cardinality stratifications (lang x source), not key pairs")
    val keys = cells.map { r =>
      cols.indices.map { d =>
        val v = r.getString(d)
        require(v != null,
          s"NULL value in stratification column '${cols(d)}' — " +
            "raking cells are target keys; bucket or fill nulls " +
            "upstream (fillna / a CASE bucket)")
        v
      }.toArray
    }
    cols.indices.foreach { d =>
      keys.map(_(d)).distinct.foreach(v =>
        require(targets(d).contains(v),
          s"observed ${cols(d)} value '$v' has no target"))
    }
    (keys, cells.map(_.getLong(cols.length).toDouble))
  }

  /** IPF cell fractions over k marginals: one row per observed cell
    * — the stratification columns (string), `n`, `weight`,
    * `cell_frac` (the fitted proportion of the final mix). `iters`
    * full passes, each rescaling every marginal in column order;
    * every OBSERVED value needs a target (extra target keys for
    * unobserved values are fine — their mass is unreachable and the
    * fit renormalizes). */
  def ipfCellFractionsN(df: DataFrame, cols: Seq[String],
                        targets: Seq[Map[String, Double]],
                        iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 100,
      s"iters must be in [1, 100], got $iters")
    val spark = df.sparkSession
    val (keys, n) = collectCells(df, cols, targets)
    val w = Array.fill(keys.length)(1.0)
    (0 until iters).foreach { _ =>
      cols.indices.foreach { d =>
        // marginal pass d: scale every dim-d group to its target mass
        val msum = collection.mutable.Map.empty[String, Double]
          .withDefaultValue(0.0)
        keys.indices.foreach(i => msum(keys(i)(d)) += n(i) * w(i))
        keys.indices.foreach { i =>
          val s = msum(keys(i)(d))
          if (s > 0) w(i) *= targets(d)(keys(i)(d)) / s
        }
      }
    }
    val tot = keys.indices.map(i => n(i) * w(i)).sum
    val rows = keys.indices.map { i =>
      // Seq[Any], explicitly — Seq(long, double, double) would
      // numeric-widen the count to Double and break the BIGINT field
      Row.fromSeq(keys(i).toSeq ++
        Seq[Any](n(i).toLong, w(i), n(i) * w(i) / tot))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(
        cols.map(c => StructField(c, StringType, nullable = false)) ++
          Seq(StructField("n", LongType, nullable = false),
            StructField("weight", DoubleType, nullable = false),
            StructField("cell_frac", DoubleType, nullable = false))))
  }

  /** 2-marginal face of [[ipfCellFractionsN]] (output renamed r/c —
    * the q223 contract). */
  def ipfCellFractions(df: DataFrame, rowCol: String, colCol: String,
                       rowTargets: Map[String, Double],
                       colTargets: Map[String, Double],
                       iters: Int = 5): DataFrame =
    ipfCellFractionsN(df, Seq(rowCol, colCol),
        Seq(rowTargets, colTargets), iters)
      .select(col(rowCol).as("r"), col(colCol).as("c"),
        col("n"), col("weight"), col("cell_frac"))

  /** Hamilton (largest-remainder) quotas over the fitted fractions:
    * floor(totalN·frac + 1e-9) plus one extra for the cells with the
    * largest rounded remainders, so the selection hits totalN
    * EXACTLY whenever populations allow (a bare floor loses up to
    * #cells−1 rows — at a 97-cell lang×source table that's a
    * double-digit-percent shortfall of a small budget). The 1e-9
    * epsilon and the round-9 remainder pin the two FP seams (floor
    * flip, remainder rank) against last-ulp replay drift. The floor
    * flip CAN overshoot — an exact value within 1e-9 BELOW an
    * integer rounds up, leaving `short` negative — so the mirror
    * branch trims the overshoot from the cells with the SMALLEST
    * remainders (exactly the rounded-up cells: their remainder is
    * ≈ −1e-9, the minimum) instead of silently exceeding totalN. */
  private[graft] def hamiltonQuotas(keys: Array[Array[String]],
                                    fracs: Array[Double],
                                    totalN: Long): Array[Long] = {
    val exact = fracs.map(_ * totalN.toDouble)
    val q = exact.map(e => math.floor(e + 1e-9).toLong)
    val rem = exact.indices.map(i => BigDecimal(exact(i) - q(i))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray
    // tie-break elementwise on the key columns — exactly the
    // oracle's ORDER BY rem, k0, k1, …
    implicit val keyOrd: Ordering[Array[String]] =
      (a: Array[String], b: Array[String]) => {
        var i = 0; var c = 0
        while (c == 0 && i < a.length) { c = a(i).compareTo(b(i)); i += 1 }
        c
      }
    var short = totalN - q.sum
    if (short > 0) {
      val order = keys.indices.sortBy(i => (-rem(i), keys(i)))
      order.take(short.toInt).foreach(i => q(i) += 1)
    } else if (short < 0) {
      val order = keys.indices.filter(q(_) > 0)
        .sortBy(i => (rem(i), keys(i)))
      order.take((-short).toInt).foreach(i => q(i) -= 1)
    }
    short = totalN - q.sum
    // tripwire, not a reachable branch: every overshoot unit comes
    // from one cell whose floor rounded UP through the epsilon, and
    // that cell then has q >= 1 AND the minimal (≈ -1e-9) remainder
    // — so the rem-ascending trim always finds exactly the rounded-
    // up cells first and exhaustion cannot occur. (The SQL oracles
    // mirror only the trim arithmetic, not this assertion; that is
    // sound precisely because the assertion cannot fire on any
    // input — it exists to fail loudly if the quota arithmetic
    // itself is ever broken.)
    require(short == 0,
      s"Hamilton apportionment off by $short — impossible by the " +
        "round-up/trim pairing argument above; quota arithmetic bug")
    q
  }

  /** Budgeted selection at the fitted k-marginal mix, winners per
    * cell by md5(seed ":" id) order (capPerGroup's rerun-stable
    * discipline), capped at the cell's population — the only
    * remaining shortfall is a cell smaller than its quota, which no
    * apportionment can fill without leaving the fitted mix. */
  def rakeSelectN(df: DataFrame, idCol: String, cols: Seq[String],
                  targets: Seq[Map[String, Double]], totalN: Long,
                  iters: Int = 5, seed: Long = 42L): DataFrame = {
    val key = graft.expressions.TextExpressions.md5Prefix(
      concat_ws(":", lit(seed.toString), col(idCol).cast("string")), 8)
    rakeSelectCore(df, idCol, cols, targets, totalN, iters,
      Seq(key.asc, col(idCol).asc))
  }

  /** [[rakeSelectN]] with winners ranked by a caller PRIORITY column
    * (descending, ties to the lower id) instead of the md5 draw —
    * the training-data-recipe face: fill each raked cell's quota
    * with its highest-value examples (e.g. DSIR importance weights)
    * rather than uniformly. Round/pin the priority upstream if it is
    * a float that must replay across engines. */
  def rakeSelectByN(df: DataFrame, idCol: String, cols: Seq[String],
                    targets: Seq[Map[String, Double]], totalN: Long,
                    priorityCol: String, iters: Int = 5): DataFrame =
    rakeSelectCore(df, idCol, cols, targets, totalN, iters,
      Seq(col(priorityCol).desc, col(idCol).asc))

  private def rakeSelectCore(df: DataFrame, idCol: String,
                             cols: Seq[String],
                             targets: Seq[Map[String, Double]],
                             totalN: Long, iters: Int,
                             order: Seq[Column]): DataFrame = {
    require(totalN > 0, s"totalN must be positive, got $totalN")
    val fitted = ipfCellFractionsN(df, cols, targets, iters)
      .collect() // bounded — same table IPF ran on
    val keys = fitted.map(r => cols.indices.map(r.getString).toArray)
    val fracs = fitted.map(_.getDouble(cols.length + 2))
    val quotas = hamiltonQuotas(keys, fracs, totalN)
    val spark = df.sparkSession
    val qRows = keys.indices.map(i =>
      Row.fromSeq(keys(i).toSeq :+ quotas(i)))
    val kNames = cols.indices.map(d => s"__rk$d")
    val quotaDf = spark.createDataFrame(
      spark.sparkContext.parallelize(qRows, 1),
      StructType(
        kNames.map(k => StructField(k, StringType, nullable = false)) :+
          StructField("__q", LongType, nullable = false)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(cols.map(col): _*)
      .orderBy(order: _*)
    val cond = cols.zip(kNames)
      .map { case (c, k) => col(c).cast("string") === col(k) }
      .reduce(_ && _)
    df.join(broadcast(quotaDf), cond)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__q"))
      .drop(kNames :+ "__q" :+ "__rn": _*)
  }

  /** 2-marginal face of [[rakeSelectN]] (the q224 contract). */
  def rakeSelect(df: DataFrame, idCol: String, rowCol: String,
                 colCol: String, rowTargets: Map[String, Double],
                 colTargets: Map[String, Double], totalN: Long,
                 iters: Int = 5, seed: Long = 42L): DataFrame =
    rakeSelectN(df, idCol, Seq(rowCol, colCol),
      Seq(rowTargets, colTargets), totalN, iters, seed)
}
