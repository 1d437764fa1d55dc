package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169, public method): pick raw-pool examples that
  * look like a small TARGET corpus by importance weight under two
  * hashed-n-gram bag-of-words multinomials,
  *
  *   log w(x) = log p_target(x) − log p_raw(x)
  *            = Σ_b c_b(x) · r_b,
  *   r_b = ln((t_b + α)/(T + αm)) − ln((q_b + α)/(Q + αm)),
  *
  * with c_b(x) the example's multiset count of hashed unigrams +
  * bigrams in bucket b, and Laplace-α smoothing over the m buckets.
  * Selection Gumbel-resamples by weight (the paper's resampling,
  * made deterministic with the q140 md5-uniform discipline).
  *
  * Engine shape at 100 TB:
  *  - the FIT is two corpus passes, each partial-aggregated into at
  *    most m rows before the (only) shuffle — the exchange carries
  *    (bucket, partial count), never grams or text.
  *  - the per-bucket log-ratio table is m rows (m defaults to 2¹³;
  *    hard-capped so it stays a bounded driver read). The WEIGHTING
  *    pass collects it once into one array LITERAL and scores the
  *    corpus in a single codegen'd pass — no join, no shuffle, no
  *    per-doc gram explosion; the hashing-trick point of the paper
  *    is exactly that the model stays O(m) however big the corpora.
  *  - selection is a global top-n on (key, id) — TakeOrderedAndProject,
  *    never a full sort.
  *
  * Hashing uses the md5 → 60-bit → mod-m discipline of
  * [[TextFunctions.fingerprintPortable]] (q45), so every stage —
  * counts, smoothing, weights, the Gumbel draw — is SQL-replayable
  * and q221/q222 run under the full DuckDB hash gate. (A per-token
  * xxhash64 variant would shave scan cost at production scale; it is
  * deliberately NOT the default here so the gate covers the shipped
  * arithmetic — flip `bucketOf` if that trade ever matters.)
  */
object Dsir {

  /** m is a driver-side array of doubles during weighting; cap it as
    * a bounded read (2²⁰ buckets = 8 MB — far past the paper's 10⁴). */
  private val MaxBuckets = 1 << 20

  private def requireM(m: Int): Unit =
    require(m >= 2 && m <= MaxBuckets,
      s"numBuckets must be in [2, $MaxBuckets], got $m")

  /** gram → bucket in [0, m): md5 hex prefix → 60-bit int → mod m
    * (the q45 portable-hash chain, exact under ANSI). */
  private def bucketOf(g: Column, m: Int): Column =
    pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"), lit(m.toLong))

  /** per-row hashed unigram+bigram bucket MULTISET (array<long>) —
    * counts, not a shingle set: the multinomial weights repeated
    * grams, per the paper. */
  private[graft] def bucketArr(textCol: Column, m: Int): Column =
    TextFunctions.bound(TextFunctions.tokens(textCol)) { t =>
      val bigrams = when(size(t) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(t) - 2),
          i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
      transform(concat(t, bigrams), g => bucketOf(g, m))
    }

  /** corpus bucket counts, ALL m buckets zero-filled (the smoothing
    * denominator needs every bucket to exist exactly once). */
  def hashedNgramCounts(df: DataFrame, textCol: String, m: Int): DataFrame = {
    requireM(m)
    val cnt = df
      .select(explode(bucketArr(col(textCol), m)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    df.sparkSession.range(m).select(col("id").as("bucket"))
      .join(cnt, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** m-row (bucket, log_ratio) table from a target corpus and the
    * raw pool. α > 0 keeps unseen buckets finite on both sides. */
  def logRatioTable(target: DataFrame, raw: DataFrame, textCol: String,
                    m: Int, alpha: Double = 1.0): DataFrame = {
    requireM(m)
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val t = hashedNgramCounts(target, textCol, m)
      .select(col("bucket"), col("cnt").as("t_cnt"))
    val r = hashedNgramCounts(raw, textCol, m)
      .select(col("bucket"), col("cnt").as("r_cnt"))
    val am = lit(alpha * m)
    val joined = t.join(r, Seq("bucket"))
    // totals via a 1-row aggregate broadcast-crossed back (the
    // entropy/MI house shape) — m-bounded, no single-partition window
    val tot = joined.agg(sum(col("t_cnt")).as("__T"),
      sum(col("r_cnt")).as("__Q"))
    joined.crossJoin(broadcast(tot)).select(col("bucket"),
      (log((col("t_cnt") + alpha) / (col("__T") + am))
        - log((col("r_cnt") + alpha) / (col("__Q") + am)))
        .as("log_ratio"))
  }

  /** Score `df`: adds `log_weight` = Σ_grams log_ratio[bucket(gram)].
    * Collects the m-row ratio table once (bounded by [[MaxBuckets]])
    * and scores in one shuffle-free codegen pass. */
  def importanceWeights(df: DataFrame, textCol: String,
                        ratios: DataFrame, m: Int): DataFrame = {
    requireM(m)
    val arr = new Array[Double](m)
    val rows = ratios.select(col("bucket").cast("long"),
      col("log_ratio").cast("double")).collect()
    require(rows.length == m,
      s"ratio table has ${rows.length} rows, expected m=$m " +
        "(build it with logRatioTable over the same m)")
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getDouble(1))
    val ratioLit = typedLit(arr.toSeq)
    // null text scores 0.0 like empty text does (a null gram array
    // would otherwise null the fold and make the row unselectable
    // under a NULLS-LAST sort — divergent from the SQL replay's
    // coalesce and from the empty-string row one byte away)
    df.withColumn("log_weight",
      coalesce(aggregate(bucketArr(col(textCol), m), lit(0.0),
        (acc, b) => acc + element_at(ratioLit, b.cast("int") + 1)),
        lit(0.0)))
  }

  /** Deterministic Gumbel-top-n resampling by importance weight —
    * the paper's sampler with md5-derived uniforms (q140's
    * discipline): key = round(log_w, 6) + Gumbel(u(id)), u(id) from
    * md5(seed ":" id); the rounding pins the FP boundary so the
    * draw replays bit-stably in SQL. Global top-n on (key desc, id)
    * → TakeOrderedAndProject. */
  def resampleGumbel(weighted: DataFrame, idCol: String,
                     weightCol: String, n: Int,
                     seed: Long = 42L): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val u = (conv(substring(md5(concat_ws(":", lit(seed.toString),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double")
      + lit(0.5)) / lit(4294967296.0)
    val key = round(col(weightCol), 6) - log(-log(u))
    weighted.orderBy(key.desc, col(idCol).asc).limit(n)
  }
}
