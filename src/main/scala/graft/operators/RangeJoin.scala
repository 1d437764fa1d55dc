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

  /** Interval-OVERLAP join (`aLo <= bHi AND bLo <= aHi`, both sides
    * ranges — the genomics/temporal-validity sibling of
    * [[pointInInterval]]) under the same binning rewrite. Both sides
    * explode to their overlapped buckets and equi-join on the bucket;
    * a pair overlapping several shared buckets would duplicate, so
    * each candidate is emitted ONLY in its canonical bucket — the
    * bucket containing the overlap's START, `max(aLo, bLo)` (the
    * standard interval-join dedup: exact, no distinct pass). Shape at
    * 100 TB matches pointInInterval: one bucket-keyed shuffle per
    * side, candidate volume set by `bucketWidth` vs the interval
    * width distribution (self-sized from BOTH sides' p75 length when
    * 0 — overlap cost is symmetric, unlike the point join).
    * Negative-length rows (lo > hi) drop; zero-length `[x, x]`
    * intervals are KEPT and overlap anything touching x (closed
    * endpoints). Null bounds drop. Column-name collisions are the
    * caller's to resolve. */
  def intervalOverlap(a: DataFrame, aLoCol: String, aHiCol: String,
                      b: DataFrame, bLoCol: String, bHiCol: String,
                      bucketWidth: Double = 0.0): DataFrame = {
    require(bucketWidth >= 0, s"bucketWidth must be >= 0, got $bucketWidth")
    if (bucketWidth == 0.0) {
      val lengths = a.filter(col(aLoCol) <= col(aHiCol))
        .select((col(aHiCol) - col(aLoCol)).cast("double").as("__len"))
        .unionByName(b.filter(col(bLoCol) <= col(bHiCol))
          .select((col(bHiCol) - col(bLoCol)).cast("double").as("__len")))
      val row = lengths.agg(
        percentile_approx(col("__len"), lit(0.75), lit(10000))).head()
      val p75 = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
      return intervalOverlap(a, aLoCol, aHiCol, b, bLoCol, bHiCol,
        if (p75 > 0.0) p75 else 1.0)
    }
    val w = lit(bucketWidth)
    def buckets(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(lo) <= col(hi))
        .withColumn("__bucket", explode(sequence(
          floor(col(lo).cast("double") / w).cast("long"),
          floor(col(hi).cast("double") / w).cast("long"))))
    buckets(a, aLoCol, aHiCol).join(buckets(b, bLoCol, bHiCol),
        Seq("__bucket"))
      .filter(col(aLoCol) <= col(bHiCol) && col(bLoCol) <= col(aHiCol))
      // canonical bucket: the one holding the overlap's start — every
      // overlapping pair shares it (both intervals cover max(lo,lo)),
      // and it is unique, so the emit-once rule is exact
      .filter(col("__bucket") ===
        floor(greatest(col(aLoCol), col(bLoCol)).cast("double") / w)
          .cast("long"))
      .drop("__bucket")
  }
}
