package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** reference: ddf_library/functions/etl/add_columns.py — `add_column`
  * zips two tables side-by-side BY ROW POSITION (the reference
  * re-balances fragments so sizes align, then pandas-concats each
  * fragment pair axis=1).
  *
  * Spark has no relational primitive for positional zip (partitions are
  * unordered sets after any shuffle — SURVEY.md §7 "row-position
  * semantics"), so this materializes an explicit row index on both
  * sides via `RDD.zipWithIndex` (one lightweight count job per side,
  * no data movement) and equi-joins on it. The join shuffles both
  * sides by index — the unavoidable cost of positional semantics in a
  * shared-nothing engine; at scale prefer a real key join.
  */
object Zip {

  /** Attach a contiguous 0-based row index in partition order.
    * Unlike `monotonically_increasing_id` the index is dense, so the
    * two sides align exactly even with ragged partition sizes.
    *
    * r10: rides the InternalRow RDD (`queryExecution.toRdd` +
    * `Bridge.internalCreateDataFrame`) instead of `df.rdd` +
    * `createDataFrame` — the external-Row path boxed every column of
    * every row on the way out AND re-validated the schema on the way
    * back in, roughly doubling q32's wall time at sf0.1. The
    * UnsafeRow is copied (toRdd reuses buffers) and the index is
    * appended via JoinedRow — two slim allocations per row, zero
    * boxing of the payload columns. */
  def withRowIndex(df: DataFrame, name: String = "__idx"): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    val schema = df.schema.add(name, LongType, nullable = false)
    val rdd = df.queryExecution.toRdd.zipWithIndex().map { case (r, i) =>
      new JoinedRow(r.copy(),
        new GenericInternalRow(Array[Any](i))): InternalRow
    }
    org.apache.spark.sql.graftbridge.Bridge
      .internalCreateDataFrame(df.sparkSession, rdd, schema)
  }

  def zipByIndex(a: DataFrame, b: DataFrame,
                 suffixes: (String, String) = ("_l", "_r")): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.JoinedRow
    val clash = a.columns.toSet.intersect(b.columns.toSet)
    // cache both sides: zipWithIndex runs a partition-sizing job before
    // the real scan, which would otherwise recompute each side's full
    // upstream plan (often a sort) twice.
    // CACHING CONTRACT: both input caches stay registered after return
    // (the result can be arbitrarily large, so it is NOT eagerly
    // materialized here, unlike the pair-finding operators). Callers
    // running many zips in one session should unpersist via
    // spark.catalog.clearCache() between calls — Bench/Verify do.
    val l = clash.foldLeft(a)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
      .cache()
    val r = clash.foldLeft(b)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
      .cache()
    // ALIGNED fast path (r10): when the two sides have identical
    // per-partition row counts — the common case, e.g. two
    // projections of one frame (q32) — pairing partition i row j
    // with partition i row j IS the global index join (the index is
    // partition order x within-partition order on both sides), so a
    // narrow RDD.zip replaces the two index materializations and the
    // hash join: zero shuffle, zero index column. Misaligned inputs
    // (different layout/counts) fall back to the explicit index join.
    val lRdd = l.queryExecution.toRdd
    val rRdd = r.queryExecution.toRdd
    def partCounts(rdd: org.apache.spark.rdd.RDD[InternalRow]): Seq[Long] =
      rdd.mapPartitions(it => Iterator.single(it.size.toLong),
        preservesPartitioning = true).collect().toSeq
    val aligned = lRdd.getNumPartitions == rRdd.getNumPartitions &&
      partCounts(lRdd) == partCounts(rRdd)
    if (aligned) {
      val schema = org.apache.spark.sql.types.StructType(
        l.schema.fields ++ r.schema.fields)
      // both iterators hand out reused UnsafeRow buffers — copy each
      val zipped = lRdd.zip(rRdd).map { case (x, y) =>
        new JoinedRow(x.copy(), y.copy()): InternalRow
      }
      org.apache.spark.sql.graftbridge.Bridge
        .internalCreateDataFrame(l.sparkSession, zipped, schema)
    } else {
      val li = withRowIndex(l)
      val ri = withRowIndex(r)
      // no ordering of the result: rows pair by index, but the output
      // is a relation like any other (callers needing display order
      // sort explicitly — SURVEY.md §7 row-position trap)
      li.join(ri, Seq("__idx"), "inner")
        .drop("__idx")
    }
  }
}
