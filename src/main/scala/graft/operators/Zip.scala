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
    * two sides align exactly even with ragged partition sizes. */
  def withRowIndex(df: DataFrame, name: String = "__idx"): DataFrame = {
    val schema = df.schema.add(name, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  def zipByIndex(a: DataFrame, b: DataFrame,
                 suffixes: (String, String) = ("_l", "_r")): DataFrame = {
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
    val li = withRowIndex(l)
    val ri = withRowIndex(r)
    // no ordering of the result: rows pair by index, but the output is
    // a relation like any other (callers needing display order sort
    // explicitly — SURVEY.md §7 row-position trap)
    li.join(ri, Seq("__idx"), "inner")
      .drop("__idx")
  }
}
