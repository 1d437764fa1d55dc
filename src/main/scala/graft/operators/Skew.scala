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
  * All four equi-join modes preserve semantics exactly (r14):
  *  - inner/left: left rows salted randomly, hot right rows
  *    replicated salt-fold (the original construction).
  *  - right: the MIRRORED construction — the census moves to the
  *    right side (in a right join it is the right rows that must all
  *    be kept, so it is their pile-up that stalls a reducer), hot
  *    RIGHT rows take the random salt, hot LEFT rows replicate.
  *    Every matched pair still meets exactly once (the replicated
  *    side covers all salts), and an unmatched right row exists
  *    exactly once because it carries ONE salt.
  *  - full/outer: left-outer salted (above) ∪ the right rows whose
  *    key has NO left match, null-padded. The union is exact because
  *    a right row's key either exists on the left — then the
  *    replicas cover every left salt and the row matches in the
  *    left-outer part exactly as in the plain join — or it does not,
  *    and the left_anti term emits it exactly once (null keys never
  *    equal anything, so they land in the anti term, matching SQL
  *    full-join semantics). The anti join is keyed on the DISTINCT
  *    left key set (one row per key — never the raw left), and a
  *    hot right key in the anti term is an oversized but
  *    independent sort-merge partition, exactly what AQE's skew
  *    split handles; the part AQE cannot do (split one hot KEY of a
  *    row-producing join) stays with the salted left-outer term.
  */
object Skew {

  /** Hot-key flag frame from a (possibly cached) census: distinct
    * left keys with row count >= `threshold`, collected onto the
    * driver (bounded by `maxHotKeys`) and re-parallelized so the
    * flag join broadcasts a LITERAL frame. Key columns are renamed
    * `__hk*` so the null-safe flag join never collides with caller
    * column names. */
  private def hotKeyFlags(side: DataFrame, census: DataFrame,
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
      val spark = side.sparkSession
      val schema = org.apache.spark.sql.types.StructType(
        keys.zipWithIndex.map { case (k, i) =>
          side.schema(k).copy(name = s"__hk$i") })
      Some(spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), schema)
        .withColumn("__hot", lit(true)))
    }
  }

  /** Both salted sides against a hot-flag frame — exposed for the
    * ScaleSpec structural pin (cold replicated-side rows keep ONE
    * copy, hot rows replicate exactly salt-fold; hot random-side
    * rows spread across salts, cold rows ride salt 0). The flag
    * joins are NULL-SAFE so a hot null group spreads like any other
    * hot key. `mirror = false` (inner/left): left random, right
    * replicated. `mirror = true` (right): left replicated, right
    * random. */
  private[graft] def saltSides(left: DataFrame, right: DataFrame,
                               keys: Seq[String], hot: DataFrame,
                               salt: Int, seed: Long,
                               mirror: Boolean = false)
  : (DataFrame, DataFrame) = {
    def flagged(df: DataFrame): DataFrame = {
      val cond = keys.zipWithIndex
        .map { case (k, i) => df(k) <=> hot(s"__hk$i") }
        .reduce(_ && _)
      df.join(broadcast(hot), cond, "left")
        .drop(keys.indices.map(i => s"__hk$i"): _*)
    }
    def randomSalted(df: DataFrame): DataFrame = flagged(df)
      .withColumn("__salt", when(col("__hot"),
        (rand(seed) * salt).cast("int")).otherwise(0))
      .drop("__hot")
    def replicated(df: DataFrame): DataFrame = flagged(df)
      .withColumn("__salt", explode(when(col("__hot"),
        sequence(lit(0), lit(salt - 1)))
        .otherwise(array(lit(0)))))
      .drop("__hot")
    if (mirror) (replicated(left), randomSalted(right))
    else (randomSalted(left), replicated(right))
  }

  /** Hybrid salted equi-join — inner, left, right and full modes
    * (see object doc for each construction). `hotKeyThreshold = 0`
    * (default) self-sizes: a key is hot when its censused row count
    * exceeds what one even shuffle partition would hold (n /
    * spark.sql.shuffle.partitions) — the point past which that key
    * alone stalls a reducer. The census side is the RANDOM-salted
    * side: left for inner/left/full, right for right (its rows are
    * the kept multitude in that mode). The auto path derives n from
    * the census itself (persisted around its two reads — ONE scan
    * either way); pass an explicit threshold to skip the total-sum
    * read entirely (e.g. from a prior [[Profile.joinCardinality]]
    * run — the at-scale habit). `salt = 1` (or no key above the
    * threshold) degenerates to the plain join: zero replication,
    * zero extra columns. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, mode: String = "inner",
                 seed: Long = 42L, hotKeyThreshold: Long = 0L,
                 maxHotKeys: Int = 10000): DataFrame = {
    val m = mode match {
      case "inner"                            => "inner"
      case "left" | "left_outer"              => "left"
      case "right" | "right_outer"            => "right"
      case "full" | "outer" | "full_outer"    => "full"
      case other => throw new IllegalArgumentException(
        s"salted join supports inner/left/right/full equi-joins, " +
          s"got $other")
    }
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(hotKeyThreshold >= 0L,
      s"hotKeyThreshold must be >= 0, got $hotKeyThreshold")
    require(maxHotKeys >= 1, s"maxHotKeys must be >= 1, got $maxHotKeys")
    if (salt == 1) return left.join(right, keys, m)

    if (m == "full") {
      // left-outer salted ∪ right rows whose key never matches,
      // null-padded. POSITIONAL union: both terms are built in the
      // using-join column order (keys, left non-keys, right
      // non-keys), and left/right may legally share non-key names —
      // unionByName would be ambiguous where positions are not.
      // The union is position-typed, so the key dtypes must agree
      // EXACTLY (a plain join would implicitly upcast int/bigint;
      // the union cannot — refuse loudly instead of mis-typing).
      keys.foreach { k =>
        require(left.schema(k).dataType == right.schema(k).dataType,
          s"full-mode salted join needs identical key dtypes on both " +
            s"sides; '$k' is ${left.schema(k).dataType.simpleString} " +
            s"vs ${right.schema(k).dataType.simpleString} — cast one " +
            "side explicitly")
      }
      val lo = saltedJoin(left, right, keys, salt, "left", seed,
        hotKeyThreshold, maxHotKeys)
      // Accepted extra pass (ADVICE r14): this distinct is a second
      // left-side scan on top of the recursive left-join's census.
      // Sharing the census frame would not actually save it — the
      // census persist window closes inside that call (finally
      // unpersist), and the plan returned here is LAZY, so by the
      // time a caller runs an action the census would recompute
      // anyway; the distinct and the census groupBy are the same
      // shuffle class. Crucially only KEY columns ride this shuffle
      // (keys-only distinct), never payload rows — at 100 TB the
      // cost is one column-pruned scan + a keys-only exchange.
      val leftKeys = left.select(keys.map(col): _*).distinct()
      val unmatched = right.join(leftKeys, keys, "left_anti")
      val keySet = keys.toSet
      val padded = unmatched.select(
        keys.map(col) ++
          left.schema.fields.filterNot(f => keySet.contains(f.name))
            .map(f => lit(null).cast(f.dataType).as(f.name)) ++
          right.columns.filterNot(keySet.contains).map(col): _*)
      return lo.union(padded)
    }

    val mirror = m == "right"
    val censusSide = if (mirror) right else left
    // one partial-aggregated pass over the census side; persist only
    // on the auto path, where the total-sum read and the hot-key
    // read would otherwise each recompute it
    val census = censusSide.groupBy(keys.map(col): _*)
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
          val parts = scala.util.Try(censusSide.sparkSession.conf
            .get("spark.sql.shuffle.partitions").toLong)
            .getOrElse(200L)
          math.max(1L, total / math.max(1L, parts))
        }
      hotKeyFlags(censusSide, census, keys, threshold, maxHotKeys) match {
        case None =>
          // nothing hot: the plain join IS the answer — zero replication
          left.join(right, keys, m)
        case Some(hot) =>
          val (l, r) = saltSides(left, right, keys, hot, salt, seed,
            mirror)
          l.join(r, keys :+ "__salt", m).drop("__salt")
      }
    } finally if (auto) census.unpersist(false): Unit
  }
}
