package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiler (DRIVER-EXT, SURVEY.md §2.12) — the data-quality
  * census run before a corpus enters a pipeline: per column, null
  * count, exact distinct count, and min/max rendered as strings (one
  * uniform output schema across column types).
  *
  * Shape at 100 TB: ONE aggregation over ONE scan. Multiple exact
  * distinct counts make Catalyst plan an Expand (k× row multiplier
  * before the partial aggregate) — the standard cost of multi-column
  * exact distincts; swap `count_distinct` for
  * `approx_count_distinct` when ±2% is acceptable and the Expand is
  * not (that variant stays a plain single-pass aggregate). The wide
  * 1-row aggregate is then stacked to long format driver-free.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val dist = if (exactDistinct) count_distinct(col(c))
                 else approx_count_distinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        dist.as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __null_$c, __dist_$c, __min_$c, __max_$c").mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stacked) AS " +
      "(col_name, n_null, n_distinct, min_val, max_val)")
  }
}
