package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality EXPECTATIONS — declarative constraint checks over a
  * table, the admission gate for upstream data rather than documents:
  * "every id non-null, quantities in [1, 50], flags from this set,
  * (order, line) unique, every order id resolvable" as one census
  * frame with a violation count per constraint. The pipeline pattern
  * at 100 TB: run the suite per ingested partition and refuse (or
  * quarantine) on any `passed = false` row, BEFORE a malformed batch
  * poisons downstream joins — the [[graft.operators.Profile]] drift
  * census's enforcing sibling.
  *
  * DRIVER-EXT (reference `/root/reference/` is empty; no file:line
  * citation possible — SURVEY.md §0 protocol).
  *
  * Scale shape: every row-local constraint (not-null / range / set /
  * regex) AND every uniqueness constraint folds into ONE aggregation
  * over ONE scan — row-local checks as `sum(when(violated, 1))`,
  * uniqueness as `count(*) − count_distinct(key struct)` (the excess
  * rows beyond one per key), all partial-aggregated map-side. Only
  * referential checks cost more: one anti-join count per foreign
  * key, corpus-side shuffle-free when the reference's distinct keys
  * broadcast. Nothing ever collects rows; the result is one row per
  * constraint. Null semantics are spec-pinned: range/set/regex SKIP
  * nulls (declare NotNull separately — conflating the two makes one
  * constraint unfixable without the other), foreign keys skip null
  * keys (SQL semantics), uniqueness counts null keys as values. */
object Expect {

  sealed trait Expectation { def name: String }
  /** `col` must never be null. */
  case class NotNull(col: String) extends Expectation {
    val name = s"not_null($col)"
  }
  /** The tuple `cols` appears at most once; violations = excess
    * rows beyond the first per duplicated tuple. */
  case class Unique(cols: Seq[String]) extends Expectation {
    val name = s"unique(${cols.mkString(",")})"
  }
  /** Non-null values of `col` lie in [lo, hi] (inclusive). */
  case class InRange(col: String, lo: Double, hi: Double)
      extends Expectation {
    val name = s"in_range($col,$lo,$hi)"
  }
  /** Non-null values of `col` (as strings) belong to `values`. */
  case class InSet(col: String, values: Seq[String]) extends Expectation {
    val name = s"in_set($col)"
  }
  /** Non-null values of `col` fully match `regex`. */
  case class Matches(col: String, regex: String) extends Expectation {
    val name = s"matches($col)"
  }
  /** Non-null values of `col` exist in `ref`'s `refCol`. The name
    * includes the reference column: two FK expectations on the same
    * column against DIFFERENT reference tables must stay
    * distinguishable in the census (downstream ledgers key on
    * (batch_id, constraint) — expectStream's dedup would silently
    * merge identically-named rows). */
  case class ForeignKey(col: String, ref: DataFrame, refCol: String)
      extends Expectation {
    val name = s"foreign_key($col->$refCol)"
  }

  /** Run the suite; returns (constraint, violations, total, passed)
    * — one row per expectation, in the order given. */
  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "check needs at least one expectation")
    val spark = df.sparkSession
    import spark.implicits._
    def viol(e: Expectation): Option[Column] = e match {
      case NotNull(c) =>
        Some(sum(when(col(c).isNull, 1L).otherwise(0L)))
      case Unique(cols) =>
        Some(count(lit(1)) - count_distinct(struct(cols.map(col): _*)))
      case InRange(c, lo, hi) =>
        Some(sum(when(col(c).isNotNull &&
          (col(c).cast("double") < lo || col(c).cast("double") > hi),
          1L).otherwise(0L)))
      case InSet(c, vs) =>
        Some(sum(when(col(c).isNotNull &&
          !col(c).cast("string").isin(vs: _*), 1L).otherwise(0L)))
      case Matches(c, re) =>
        // FULL match (anchored): "matches" reading partially would
        // pass "X12Y" against "[0-9]+" — not what a constraint means
        Some(sum(when(col(c).isNotNull &&
          !col(c).cast("string").rlike("^(?:" + re + ")$"),
          1L).otherwise(0L)))
      case _: ForeignKey => None
    }
    val local = expectations.zipWithIndex.flatMap { case (e, i) =>
      viol(e).map(v => coalesce(v, lit(0L)).as(s"__v$i"))
    }
    // r19 note: spreading the fused aggregation's input was tried and
    // REVERTED — at gate scale the extra round-robin exchange + AQE
    // stage cost more than the ~2 s serial aggregation it
    // parallelized (measured +0.5-0.7 s in two independent bench
    // windows). At 100 TB the scan arrives with thousands of splits
    // and the partial aggregation is already wide; the single-file
    // case is a gate artifact, not the production shape.
    val localRow: Map[Int, (Long, Long)] =
      if (local.isEmpty) Map.empty
      else {
        val aggs = count(lit(1)).as("__n") +: local
        val r = df.agg(aggs.head, aggs.tail: _*).collect().head
        val n = r.getLong(0)
        expectations.zipWithIndex.filter(x => viol(x._1).isDefined)
          .zipWithIndex.map { case ((_, i), j) =>
            i -> (r.getLong(j + 1), n)
          }.toMap
      }
    // total rows: free from the fused aggregation when any row-local
    // constraint ran; one count job only for an all-FK suite
    lazy val total: Long = localRow.headOption.map(_._2._2)
      .getOrElse(df.count())
    // ALL foreign keys fold into ONE job: each FK's anti-join
    // survivors tagged with the expectation's index, unioned, then
    // counted per tag. N separate .count() actions would re-launch
    // (and re-schedule) N jobs over the fact table; the union is one
    // action whose branches run as parallel stages. Each branch is
    // still bounded by its reference's DISTINCT keys (broadcast when
    // small — the dims-vs-facts shape). A violation-free FK emits no
    // rows, hence the default of 0.
    val fks = expectations.zipWithIndex.collect {
      case (fk: ForeignKey, i) => (fk, i)
    }
    val fkCounts: Map[Int, Long] =
      if (fks.isEmpty) Map.empty
      else fks.map { case (ForeignKey(c, ref, rc), i) =>
          val keys = ref.select(col(rc).as(c)).distinct()
          df.filter(col(c).isNotNull).join(keys, Seq(c), "left_anti")
            .select(lit(i).as("__fk"))
        }.reduce(_ unionByName _)
        .groupBy("__fk").agg(count(lit(1)).as("__bad"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        .withDefaultValue(0L)
    val rows = expectations.zipWithIndex.map {
      case (fk: ForeignKey, i) =>
        val bad = fkCounts(i)
        (fk.name, bad, total, bad == 0L)
      case (e, i) =>
        val (v, n) = localRow(i)
        (e.name, v, n, v == 0L)
    }
    rows.toDF("constraint", "violations", "total", "passed")
  }
}
