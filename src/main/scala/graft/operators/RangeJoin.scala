package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch range join — points joined into intervals (`lo <= p <= hi`)
  * with NO equi key (engine ext; the streaming interval join in
  * [[graft.streaming.EventStream]] is the equi-keyed time-bounded
  * sibling). Catalyst plans a bare inequality join as a nested-loop
  * (broadcast or cartesian) — quadratic at scale. This operator
  * rewrites it as an EQUI join on fixed-width buckets: each interval
  * is exploded to every bucket it overlaps (`sequence(floor(lo/w),
  * floor(hi/w))`), each point maps to exactly one bucket, the join
  * keys on the bucket, and the exact containment predicate filters
  * the candidates — the same binning rewrite the public engines apply
  * to range joins, expressed directly in the DataFrame API.
  *
  * Shape at 100 TB: both sides shuffle once, keyed on the bucket —
  * hash-partitioned, AQE-splittable; candidate volume per bucket is
  * (points in bucket) × (intervals overlapping it), so `bucketWidth`
  * should sit near the TYPICAL interval width: each interval then
  * explodes to ≤ 2-3 buckets (duplication factor ~2), and a bucket
  * pairs points only with intervals that nearly contain them. A width
  * 100× the interval width degenerates toward per-bucket cross
  * products; a width 100× too small explodes the interval side 100×.
  * Pick it from the interval-length distribution (p50–p90), not the
  * data range. Duplicate (point, interval) candidates cannot arise:
  * a point matches an interval only in the point's OWN bucket.
  *
  * Returns the inner join of `points` × `intervals` rows (column-name
  * collisions must be resolved by the caller; the bucket key is
  * dropped). Rows with null point/bounds drop out (SQL comparison
  * semantics — same as the inequality join it replaces). Values must
  * be numeric (cast timestamps to epoch first).
  */
object RangeJoin {

  /** `bucketWidth = 0` self-sizes from the interval-length
    * distribution: the p75 length (one `approx_percentile` pass over
    * the interval side — the SMALL side of a point-in-interval join)
    * keeps the per-interval explode factor ≤ 2-3 for three quarters
    * of intervals while the long tail pays proportionally more
    * buckets, which is the right trade (long intervals match more
    * points anyway). Degenerate all-zero-length distributions fall
    * back to width 1. */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double = 0.0): DataFrame = {
    require(bucketWidth >= 0, s"bucketWidth must be >= 0, got $bucketWidth")
    if (bucketWidth == 0.0) {
      val row = intervals
        .filter(col(loCol) <= col(hiCol))
        .agg(percentile_approx(
          (col(hiCol) - col(loCol)).cast("double"), lit(0.75), lit(10000)))
        .head()
      val p75 = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
      return pointInInterval(points, pCol, intervals, loCol, hiCol,
        if (p75 > 0.0) p75 else 1.0)
    }
    val w = lit(bucketWidth)
    val pb = points.withColumn("__bucket",
      floor(col(pCol).cast("double") / w))
    val ib = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol).cast("double") / w).cast("long"),
        floor(col(hiCol).cast("double") / w).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bucket")
  }
}
