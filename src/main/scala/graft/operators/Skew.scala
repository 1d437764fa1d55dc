package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys (SURVEY.md §4: the
  * reference's `balancer` rebalances fragment sizes; the shared-
  * nothing equivalent is key salting). AQE's skew-join split handles
  * oversized partitions after the fact; explicit salting additionally
  * splits a single hot KEY across `salt` reducers, which AQE cannot.
  *
  * HYBRID salting (r13): only keys above a hotness threshold are
  * salted. A one-pass census of the left side (partial-aggregated —
  * the exchange carries distinct keys, never rows; the same count
  * table [[Profile.joinCardinality]] prices joins with) finds the
  * heavy hitters; hot left rows get a random salt in [0, salt), hot
  * right rows are replicated once per salt value, and every COLD row
  * on both sides carries the constant salt 0 — so replicated shuffle
  * bytes are ∝ (hot-key right rows × salt), not (entire right side ×
  * salt), which at 100 TB with a non-tiny right side is the
  * difference between a targeted fix and a salt-fold multiplier on
  * the whole exchange (the pre-r13 shape). The join's row multiset
  * is untouched in every regime: salting is answer-preserving by
  * construction (q215's oracle is the PLAIN equi-join SQL; ScaleSpec
  * pins multiset equality for hybrid and all-hot regimes).
  *
  * The hot-key set is a bounded driver read (≤ `maxHotKeys` rows —
  * heavy hitters are few by definition; a threshold that admits more
  * is refused with a remediation message rather than silently
  * broadcast) and is joined back as a broadcast flag on both sides,
  * which keys of any arity or type ride for free.
  *
  * Inner and left joins preserve semantics exactly; right/full would
  * need the mirrored construction.
  */
object Skew {

  /** Hot-key census: distinct left keys with row count >=
    * `threshold`, as a (keys..., __hot=true) frame collected onto
    * the driver (bounded by `maxHotKeys`) and re-parallelized so the
    * flag join below broadcasts a LITERAL frame — no recompute of
    * the census per side. */
  private def hotKeyFlags(left: DataFrame, keys: Seq[String],
                          threshold: Long,
                          maxHotKeys: Int): Option[DataFrame] = {
    val census = left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= threshold)
      .select(keys.map(col): _*)
    val rows = census.limit(maxHotKeys + 1).collect()
    require(rows.length <= maxHotKeys,
      s"more than $maxHotKeys keys exceed hotKeyThreshold=$threshold " +
        "— that is not a skew profile, it is the join's working set; " +
        "raise the threshold (salt only true heavy hitters) or " +
        "repartition instead")
    if (rows.isEmpty) None
    else {
      val spark = left.sparkSession
      val schema = org.apache.spark.sql.types.StructType(
        keys.map(k => left.schema(k)))
      Some(spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), schema)
        .withColumn("__hot", lit(true)))
    }
  }

  /** Hybrid salted equi-join. `hotKeyThreshold = 0` (default)
    * self-sizes: a key is hot when its left row count exceeds what
    * one even shuffle partition would hold (n_left /
    * spark.sql.shuffle.partitions) — the point past which that key
    * alone stalls a reducer. Pass an explicit threshold when the
    * census baseline is known (e.g. from a prior
    * [[Profile.joinCardinality]] run). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, mode: String = "inner",
                 seed: Long = 42L, hotKeyThreshold: Long = 0L,
                 maxHotKeys: Int = 10000): DataFrame = {
    require(mode == "inner" || mode == "left" || mode == "left_outer",
      "salted join preserves semantics for inner/left modes")
    require(salt >= 2, s"salt must be >= 2, got $salt")
    require(hotKeyThreshold >= 0L,
      s"hotKeyThreshold must be >= 0, got $hotKeyThreshold")
    require(maxHotKeys >= 1, s"maxHotKeys must be >= 1, got $maxHotKeys")
    val threshold =
      if (hotKeyThreshold > 0L) hotKeyThreshold
      else math.max(1L, left.count() /
        left.sparkSession.conf.get("spark.sql.shuffle.partitions").toLong)
    hotKeyFlags(left, keys, threshold, maxHotKeys) match {
      case None =>
        // nothing hot: the plain join IS the answer — zero replication
        left.join(right, keys, mode)
      case Some(hot) =>
        val l = left.join(broadcast(hot), keys, "left")
          .withColumn("__salt", when(col("__hot"),
            (rand(seed) * salt).cast("int")).otherwise(0))
          .drop("__hot")
        // cold right rows keep ONE copy (salt 0 — the value every
        // cold left row carries); hot right rows replicate salt-fold
        val r = right.join(broadcast(hot), keys, "left")
          .withColumn("__salt", explode(when(col("__hot"),
            sequence(lit(0), lit(salt - 1)))
            .otherwise(array(lit(0)))))
          .drop("__hot")
        l.join(r, keys :+ "__salt", mode).drop("__salt")
    }
  }
}
