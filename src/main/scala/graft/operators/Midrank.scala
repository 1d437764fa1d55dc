package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Distributed exact MIDRANKS — the shared rank machinery behind the
  * experiment-readout family ([[Classifier.rocAuc]],
  * [[AbTest.mannWhitneyU]], [[AbTest.spearmanCorr]]). A midrank is
  * rank + (ties−1)/2: the average position a value's tie group
  * occupies in the total order — the quantity every rank statistic
  * (AUC, U, Spearman ρ) is actually built from.
  *
  * The naive encoding is `rank().over(Window.orderBy(v))`: an EMPTY
  * window partition, i.e. every row funneled through ONE task — the
  * classic scale-killer (fine at experiment size, fatal at corpus
  * size). This helper replaces it with the ntileGlobal shape
  * ([[graft.ddf.DDF.ntileGlobal]]'s TeraSort trick), applied to the
  * GROUPED value census rather than raw rows:
  *
  *   1. the caller pre-aggregates to one row per distinct value with
  *      a tie count `t` (a partial-agg groupBy — map-side combined,
  *      so the shuffle moves distinct values, not rows);
  *   2. range-partition + sort-within-partitions on the value — a
  *      parallel sort with disjoint key ranges in partition order;
  *   3. one light job counts rows-per-range (a Long fold, driver
  *      state bounded by the partition count), whose prefix sums are
  *      the global offsets;
  *   4. a per-partition sequential pass converts each tie group's
  *      cumulative row position into its midrank — genuine
  *      imperative prefix-sum logic, the one place mapPartitions
  *      beats any relational encoding.
  *
  * The counts job and the output read the SAME shuffled RDD, so the
  * sort's map outputs are reused — no resample, nothing cached.
  * Midranks are exact multiples of 0.5 (c + (t+1)/2), so every rank
  * SUM downstream is binary-exact below 2⁵³ — bit-identical to the
  * single-task window it replaces, which is what keeps the DuckDB
  * oracles replaying `rank() OVER (ORDER BY v)` green.
  *
  * DRIVER-EXT scaffolding (reference `/root/reference/` is empty; no
  * file:line citation possible — SURVEY.md §0 protocol).
  */
private[graft] object Midrank {

  /** Append midranks to a PRE-GROUPED census: `grouped` has exactly
    * one row per distinct value of `valueCol`, with the tie count in
    * `tCol` (a positive long). Appends `out` = that value's midrank
    * over the implied row population (Σ t rows). Nulls in `valueCol`
    * must be filtered by the caller — a rank over nulls is
    * undefined in every convention this library exposes. EAGER: the
    * per-range counting job runs at call time. */
  def withMidranks(grouped: DataFrame, valueCol: String, tCol: String,
                   out: String = "__mid"): DataFrame =
    withMidranksCounted(grouped, valueCol, tCol, out)._1

  /** [[withMidranks]] plus the census ROW count, measured by the
    * same per-range counting job that computes the rank offsets —
    * free information callers can use for join-side planning
    * (an RDD-backed frame has no Catalyst size statistics, so
    * without it the join-back NEVER broadcasts, however small the
    * census; see [[perRow]]). */
  def withMidranksCounted(grouped: DataFrame, valueCol: String,
                          tCol: String,
                          out: String = "__mid"): (DataFrame, Long) = {
    val spark = grouped.sparkSession
    val sorted = grouped.drop(out)
      .repartitionByRange(col(valueCol).asc)
      .sortWithinPartitions(col(valueCol).asc)
    val schema = StructType(sorted.schema.fields :+
      StructField(out, DoubleType, nullable = false))
    val tIdx = sorted.schema.fieldIndex(tCol)
    val rdd = sorted.rdd
    // Long folds, not Iterator.size: one range of a 100 TB census can
    // exceed Int range, same edge ntileGlobal guards
    val counts = rdd.mapPartitionsWithIndex((i, it) => {
        var rows = 0L; var n = 0L
        while (it.hasNext) { rows += 1L; n += it.next().getLong(tIdx) }
        Iterator((i, rows, n))
      }, preservesPartitioning = true)
      .collect().sortBy(_._1)
    val censusRows = counts.map(_._2).sum
    val offsets = counts.map(_._3).scanLeft(0L)(_ + _)
    val ranked = rdd.mapPartitionsWithIndex { (i, it) =>
      var c = offsets(i) // rows strictly below this tie group
      it.map { row =>
        val t = row.getLong(tIdx)
        val mid = c + (t + 1) / 2.0 // = minrank + (t-1)/2
        c += t
        Row.fromSeq(row.toSeq :+ mid)
      }
    }
    (spark.createDataFrame(ranked, schema), censusRows)
  }

  /** Census rows below this broadcast the join-back (≲ tens of MB
    * serialized at 2M × (value, mid)); above it the join shuffles —
    * a billion-distinct-value corpus must never be broadcast. The
    * "tens of MB" arithmetic assumes a NARROW value (the numeric
    * columns every in-repo caller ranks); [[perRow]] divides the
    * limit by [[WideValueDivisor]] for string/binary/complex value
    * types, whose per-row width is unbounded — a census over long
    * strings can be hundreds of MB at the same row count. Callers
    * ranking known-huge values should still lower
    * `broadcastRowLimit` explicitly. */
  private val BroadcastCensusRows = 2000000L

  /** Width-type discount on [[BroadcastCensusRows]]: 16× assumes a
    * wide value averages ≲ 128 bytes where a double is 8 — a
    * deliberately blunt guard (the census is RDD-backed, so no
    * Catalyst size statistic exists to be precise with). */
  private val WideValueDivisor = 16L

  /** Per-ROW midranks of `valueCol` (for statistics that need rank
    * pairs, e.g. Spearman): census + [[withMidranks]] + a join back
    * on the value. The mids frame is RDD-backed — Catalyst sees no
    * size statistic and AQE only re-plans exchanges it can measure —
    * so a small census would still sort-merge the full row corpus
    * without the explicit `broadcast()` hint below, keyed on the
    * census count the ranking job already measured (threshold
    * [[BroadcastCensusRows]]; a wide census falls back to the
    * shuffled join, which clusters at distinct-value width). */
  def perRow(df: DataFrame, valueCol: String, out: String,
             broadcastRowLimit: Long = BroadcastCensusRows): DataFrame = {
    val census = df.groupBy(col(valueCol))
      .agg(count(lit(1)).as("__t"))
    val (ranked, censusRows) =
      withMidranksCounted(census, valueCol, "__t", out)
    val mids = ranked.drop("__t")
    // a fixed-width value is ≤ 8 bytes/row; string/binary/complex
    // values have no width bound, so the row threshold alone could
    // force-broadcast a multi-hundred-MB census — discount it by
    // type (ADVICE r12)
    val wide = df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BinaryType => true
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType => true
      case _ => false
    }
    val limit = if (wide) broadcastRowLimit / WideValueDivisor
                else broadcastRowLimit
    if (censusRows <= limit)
      df.join(broadcast(mids), Seq(valueCol))
    else df.join(mids, Seq(valueCol))
  }

  /** [[perRow]] for SEVERAL value columns at once (r19, the Spearman
    * shape): every census builds from `df` ITSELF rather than from
    * the previous join's output — a nested perRow(perRow(df, a), b)
    * re-evaluates df ⋈ mids_a just to census b, and an inner join on
    * a non-null value column preserves row multiplicity exactly (one
    * census row per value), so the censuses are identical either way.
    * One scan per census + one scan through the join chain, instead
    * of re-running the join per nesting level. */
  def perRowMulti(df: DataFrame, specs: Seq[(String, String)],
                  broadcastRowLimit: Long = BroadcastCensusRows)
  : DataFrame = {
    val mids = specs.map { case (valueCol, out) =>
      val census = df.groupBy(col(valueCol))
        .agg(count(lit(1)).as("__t"))
      val (ranked, censusRows) =
        withMidranksCounted(census, valueCol, "__t", out)
      val wide = df.schema(valueCol).dataType match {
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.BinaryType => true
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType => true
        case _ => false
      }
      val limit = if (wide) broadcastRowLimit / WideValueDivisor
                  else broadcastRowLimit
      (valueCol, ranked.drop("__t"), censusRows <= limit)
    }
    mids.foldLeft(df) { case (acc, (valueCol, m, small)) =>
      if (small) acc.join(broadcast(m), Seq(valueCol))
      else acc.join(m, Seq(valueCol))
    }
  }
}
