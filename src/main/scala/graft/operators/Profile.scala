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
    // user column names are quoted on resolve and never interpolated
    // into parsed SQL text; internal aliases key on the POSITION, so
    // quotes/dots/spaces/hyphens in a name cannot break or inject
    def in(c: String) = df.col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val dist = if (exactDistinct) count_distinct(in(c))
                 else approx_count_distinct(in(c))
      Seq(
        sum(when(in(c).isNull, 1L).otherwise(0L)).as(s"__p${i}n"),
        dist.as(s"__p${i}d"),
        min(in(c)).cast("string").as(s"__p${i}lo"),
        max(in(c)).cast("string").as(s"__p${i}hi"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col_name"),
      col(s"__p${i}n").as("n_null"),
      col(s"__p${i}d").as("n_distinct"),
      col(s"__p${i}lo").as("min_val"),
      col(s"__p${i}hi").as("max_val")) }
    wide.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }
}
