package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the
  * record-linkage candidate generator that LSH does not cover: sort
  * the corpus by a fuzzy blocking key and emit every pair within a
  * fixed window of the sort order. Where MinHash banding needs set
  * overlap, the sorted window catches SEQUENCE-shaped near-keys
  * (typos in a name prefix, off-by-one ids, date slips) at a
  * guaranteed O(n·w) candidate bound — no bucket-skew cap needed,
  * because the window IS the cap. Multi-pass blocking = call per key
  * and union+distinct the pair lists (the standard recall recipe).
  *
  * Shape at 100 TB: the global sort rank uses the ntileGlobal
  * machinery (DDF.scala): range-partition on (key, id) — the
  * TeraSort shape, parallel across the cluster — then per-partition
  * sequential numbering converted to global ranks by driver-side
  * offsets (bounded by the partition COUNT, not the data). The
  * window pairing is then a plain equi-join on rank (each row
  * re-emitted w−1 times with shifted ranks) — shuffle rows ≈ n·w
  * longs, never a cross join, no window function over a single
  * global partition (the anti-pattern this operator exists to
  * avoid).
  */
object Blocking {

  /** `df` plus `out` = the 1-based GLOBAL rank of the row under an
    * ascending (keyCol, idCol) sort. `idCol` must be unique per row
    * (the usual id contract: it makes the order total, so ranks are
    * deterministic and oracle-replayable). EAGER: runs the
    * partition-count job at call time, like ntileGlobal. */
  def withSortRank(df: DataFrame, keyCol: String, idCol: String,
                   out: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    val sortCols = Seq(col(keyCol).asc, col(idCol).asc)
    val sorted = df.drop(out).repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(out, LongType, nullable = false))
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex((i, it) => {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }
        Iterator((i, n))
      }, preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val ranked = rdd.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Candidate pairs (a, b, dist): ids whose sort positions under
    * the (keyCol, idCol) order differ by 1 ≤ dist < window, with `a`
    * the earlier row. Output size is exactly
    * Σ_{j=1..w−1} (n−j) — linear in n, independent of key skew. */
  def sortedNeighborPairs(df: DataFrame, idCol: String, keyCol: String,
                          window: Int): DataFrame = {
    require(window >= 2 && window <= 1000,
      s"window must be in [2,1000], got $window — the candidate set " +
        "is n*(window-1) pairs; recall wants multiple small-window " +
        "passes over different keys, not one huge window")
    val ranked = withSortRank(
      df.select(col(idCol), col(keyCol)), keyCol, idCol)
    val left = ranked.select(col("rnk"), col(idCol).as("a"))
    val right = ranked.select(
        explode(sequence(lit(1), lit(window - 1))).as("__j"),
        col("rnk"), col(idCol).as("b"))
      .select((col("rnk") - col("__j")).as("rnk"), col("b"),
        col("__j").cast("long").as("dist"))
    left.join(right, Seq("rnk")).select(col("a"), col("b"), col("dist"))
  }
}
