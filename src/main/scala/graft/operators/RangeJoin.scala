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

  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
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
