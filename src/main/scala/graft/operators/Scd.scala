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

  /** Enrich a fact table with the dimension state AS OF each fact's
    * own timestamp — the production face of SCD2 (every event joined
    * to the attribute values that were current WHEN IT HAPPENED, not
    * now). Left join: facts with no covering interval (before the
    * key's first change, or an unknown key) keep null attributes.
    * Column contract: the fact side must not already carry the
    * dimension's attribute names or the interval bookkeeping names
    * (valid_from/valid_to) — rename on one side first, as with any
    * enrichment join (q174 renames the tracked attr to `state`).
    *
    * Shape at 100 TB: a plain equi-join on the KEY with the interval
    * containment as a join-level residual — deliberately NOT the
    * binning rewrite (RangeJoin): SCD2 intervals are keyed, and a
    * key's interval count is its change count (small), so the range
    * predicate filters a handful of rows per fact. The heavy term is
    * the fact-side shuffle on the key, which any enrichment pays;
    * AQE broadcast-plans small dimensions for free. */
  def enrichAsOf(facts: DataFrame, factTsCol: String,
                 dim: DataFrame, keyCol: String): DataFrame = {
    val dimCols = dim.columns.filterNot(
      Seq(keyCol, "valid_from", "valid_to", "is_current").contains)
    val d = dim.select(
      (Seq(col(keyCol), col("valid_from"), col("valid_to")) ++
        dimCols.map(col)): _*)
    facts.join(d,
      facts(keyCol) === d(keyCol)
        && d("valid_from") <= facts(factTsCol)
        && (d("valid_to").isNull
          || facts(factTsCol) < d("valid_to")),
      "left")
      .drop(d(keyCol)).drop("valid_from").drop("valid_to")
  }

  /** Dimension DIFF between two instants: per key, the state at `t1`
    * vs the state at `t2`, keeping only keys that were added,
    * removed, or changed (null-safe struct compare over the attr
    * columns). `change` ∈ {added, removed, changed}. Two containment
    * filters + one full-outer join on the key — the audit face of
    * the interval table ("what changed in the dimension this
    * week?"), no history scan beyond the two snapshots. */
  def changedBetween(dim: DataFrame, t1: Column, t2: Column,
                     keyCol: String): DataFrame = {
    val attrCols = dim.columns.filterNot(
      Seq(keyCol, "valid_from", "valid_to", "is_current").contains)
    require(attrCols.nonEmpty, "interval table carries no attributes")
    // explicit presence markers, NOT attr-null sniffing: a key whose
    // state legitimately holds all-null attributes must still read
    // as present on that side
    def side(at: Column, suffix: String): DataFrame =
      snapshotAt(dim, at).select(
        (Seq(col(keyCol), lit(true).as("__present" + suffix)) ++
          attrCols.map(a => col(a).as(a + suffix))): _*)
    val a = side(t1, "_before")
    val b = side(t2, "_after")
    val beforeS = struct(attrCols.map(a => col(a + "_before")): _*)
    val afterS = struct(attrCols.map(a => col(a + "_after")): _*)
    val hasBefore = coalesce(col("__present_before"), lit(false))
    val hasAfter = coalesce(col("__present_after"), lit(false))
    a.join(b, Seq(keyCol), "full_outer")
      .withColumn("change",
        when(!hasBefore && hasAfter, "added")
          .when(hasBefore && !hasAfter, "removed")
          .when(!(beforeS <=> afterS), "changed"))
      .filter(col("change").isNotNull)
      .drop("__present_before", "__present_after")
  }
}
