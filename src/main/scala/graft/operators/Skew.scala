package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * NULL keys are hotness-tracked too (null-safe flag join): SQL
  * equality never matches them, but a null-heavy left side is the
  * CLASSIC skew cause, and without a salt spread every null row
  * hashes to one reducer of the final sort-merge exchange — so a hot
  * null group salts like any other hot key (its rows still match
  * nothing; only their placement changes).
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

  /** Hot-key flag frame from a (possibly cached) census: distinct
    * left keys with row count >= `threshold`, collected onto the
    * driver (bounded by `maxHotKeys`) and re-parallelized so the
    * flag join broadcasts a LITERAL frame. Key columns are renamed
    * `__hk*` so the null-safe flag join never collides with caller
    * column names. */
  private def hotKeyFlags(left: DataFrame, census: DataFrame,
                          keys: Seq[String], threshold: Long,
                          maxHotKeys: Int): Option[DataFrame] = {
    val rows = census.filter(col("__n") >= threshold)
      .select(keys.map(col): _*)
      .limit(maxHotKeys + 1).collect()
    require(rows.length <= maxHotKeys,
      s"more than $maxHotKeys keys exceed hotKeyThreshold=$threshold " +
        "— that is not a skew profile, it is the join's working set; " +
        "raise the threshold (salt only true heavy hitters) or " +
        "repartition instead")
    if (rows.isEmpty) None
    else {
      val spark = left.sparkSession
      val schema = org.apache.spark.sql.types.StructType(
        keys.zipWithIndex.map { case (k, i) =>
          left.schema(k).copy(name = s"__hk$i") })
      Some(spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), schema)
        .withColumn("__hot", lit(true)))
    }
  }

  /** Both salted sides against a hot-flag frame — exposed for the
    * ScaleSpec structural pin (cold right rows keep ONE copy, hot
    * rows replicate exactly salt-fold; hot left rows spread across
    * salts, cold left rows ride salt 0). The flag joins are
    * NULL-SAFE so a hot null group spreads like any other hot key. */
  private[graft] def saltSides(left: DataFrame, right: DataFrame,
                               keys: Seq[String], hot: DataFrame,
                               salt: Int, seed: Long)
  : (DataFrame, DataFrame) = {
    def flagged(df: DataFrame): DataFrame = {
      val cond = keys.zipWithIndex
        .map { case (k, i) => df(k) <=> hot(s"__hk$i") }
        .reduce(_ && _)
      df.join(broadcast(hot), cond, "left")
        .drop(keys.indices.map(i => s"__hk$i"): _*)
    }
    val l = flagged(left)
      .withColumn("__salt", when(col("__hot"),
        (rand(seed) * salt).cast("int")).otherwise(0))
      .drop("__hot")
    val r = flagged(right)
      .withColumn("__salt", explode(when(col("__hot"),
        sequence(lit(0), lit(salt - 1)))
        .otherwise(array(lit(0)))))
      .drop("__hot")
    (l, r)
  }

  /** Hybrid salted equi-join. `hotKeyThreshold = 0` (default)
    * self-sizes: a key is hot when its left row count exceeds what
    * one even shuffle partition would hold (n_left /
    * spark.sql.shuffle.partitions) — the point past which that key
    * alone stalls a reducer. The auto path derives n_left from the
    * census itself (persisted around its two reads — ONE scan of the
    * left side either way); pass an explicit threshold to skip the
    * total-sum read entirely (e.g. from a prior
    * [[Profile.joinCardinality]] run — the at-scale habit).
    * `salt = 1` (or no key above the threshold) degenerates to the
    * plain join: zero replication, zero extra columns. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, mode: String = "inner",
                 seed: Long = 42L, hotKeyThreshold: Long = 0L,
                 maxHotKeys: Int = 10000): DataFrame = {
    require(mode == "inner" || mode == "left" || mode == "left_outer",
      "salted join preserves semantics for inner/left modes")
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(hotKeyThreshold >= 0L,
      s"hotKeyThreshold must be >= 0, got $hotKeyThreshold")
    require(maxHotKeys >= 1, s"maxHotKeys must be >= 1, got $maxHotKeys")
    if (salt == 1) return left.join(right, keys, mode)
    // one partial-aggregated pass over the left builds the census;
    // persist only on the auto path, where the total-sum read and
    // the hot-key read would otherwise each recompute it
    val census = left.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val auto = hotKeyThreshold == 0L
    if (auto) census.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val threshold =
        if (!auto) hotKeyThreshold
        else {
          val total = census.agg(sum(col("__n"))).head().getLong(0)
          // numeric parse of the conf is guarded: some platforms set
          // spark.sql.shuffle.partitions to "auto"
          val parts = scala.util.Try(left.sparkSession.conf
            .get("spark.sql.shuffle.partitions").toLong)
            .getOrElse(200L)
          math.max(1L, total / math.max(1L, parts))
        }
      hotKeyFlags(left, census, keys, threshold, maxHotKeys) match {
        case None =>
          // nothing hot: the plain join IS the answer — zero replication
          left.join(right, keys, mode)
        case Some(hot) =>
          val (l, r) = saltSides(left, right, keys, hot, salt, seed)
          l.join(r, keys :+ "__salt", mode).drop("__salt")
      }
    } finally if (auto) census.unpersist(false): Unit
  }
}
