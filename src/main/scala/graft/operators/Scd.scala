package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 builder (DRIVER-EXT, SURVEY.md
  * §2.12 sibling of the as-of join): turn an append-only change log
  * (key, ts, attrs...) into validity INTERVALS — one row per state a
  * key held, with [valid_from, valid_to) half-open bounds and a
  * current-row flag. The interval table is what the as-of join
  * family queries against; [[snapshotAt]] is the degenerate-but-
  * ubiquitous point-in-time read.
  *
  * Semantics, pinned so the whole build is SQL-replayable:
  *  - Same-instant writes (equal (key, ts)) collapse to ONE state:
  *    the MAX of the attribute struct — an arbitrary-but-
  *    deterministic winner, the md5-order discipline of the sampling
  *    family. A change log with a real writer-order column should
  *    encode it as the leading attr (or fold it into ts) to make
  *    "last writer wins" explicit.
  *  - `collapse=true` (default) drops no-op changes: a row whose
  *    attrs null-safely equal the previous surviving state extends
  *    that state instead of opening a new interval — so intervals
  *    are maximal and `n_intervals = 1 + number of real changes`.
  *  - `valid_to` = the next interval's `valid_from` (half-open, no
  *    gaps, no overlaps by construction); null marks the current
  *    state, mirrored in `is_current`.
  *
  * Shape at 100 TB: two exchanges, both keyed and partial-agg
  * friendly — the same-instant dedupe is a groupBy(key, ts) with
  * map-side max-combine (NOT a (key, ts)-window: the aggregate
  * pre-reduces same-instant pileups before the shuffle), and the
  * collapse + lead windows share one hash partitioning on the key
  * with in-partition sorts. A key's cost is its own change count —
  * the per-user window bound of every operator in this family. */
object Scd {

  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           attrCols: Seq[String], collapse: Boolean = true): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    require(!attrCols.contains(keyCol) && !attrCols.contains(tsCol),
      "key/ts columns cannot also be tracked attributes")
    import org.apache.spark.sql.expressions.Window
    val attrStruct = struct(attrCols.map(col): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    // same-instant collapse: deterministic max-struct winner
    val dedup = changes
      .filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(attrStruct).as("__a"))
    // no-op collapse: keep rows opening a genuinely new state
    val opens =
      if (collapse)
        dedup
          .withColumn("__prev", lag(col("__a"), 1).over(w))
          .filter(col("__prev").isNull || !(col("__prev") <=> col("__a")))
          .drop("__prev")
      else dedup
    val iv = opens
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
    iv.select(
      Seq(col(keyCol), col(tsCol).as("valid_from"), col("valid_to"),
        col("is_current")) ++
        attrCols.map(a => col("__a").getField(a).as(a)): _*)
  }

  /** Point-in-time view of an interval table built by [[scd2]]: the
    * rows whose [valid_from, valid_to) contains `at`. A plain
    * codegen'd filter — partition/z-order the interval table on
    * valid_from to prune it at scale. */
  def snapshotAt(dim: DataFrame, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at
      && (col("valid_to").isNull || at < col("valid_to")))
}
