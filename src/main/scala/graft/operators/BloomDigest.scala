package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Shared Bloom-digest screen: ONE builder for every "is this key in
  * that (too-big-to-broadcast) set?" prefilter in the engine — the
  * streaming dedup screen (EventStream.screenAgainstBloom) and the
  * batch decontamination prefilter (Dedup.decontaminateBloom) probe
  * through the same pair of functions, so they stay plan-identical by
  * construction (r9 VERDICT item 3: the batch path used a Scala
  * closure UDF where the stream path had already moved to the native
  * expression).
  *
  * Mechanics: the build side collapses to DISTINCT non-null string
  * keys, aggregated into a Bloom filter over xxhash64(key) (~1.2 MB
  * per million keys at fpp 0.01); the probe side is Spark's native
  * `might_contain` (BloomFilterMightContain — the runtime-filter
  * expression, WITH codegen), so the predicate stays inside
  * whole-stage codegen and surrounding filters still push down, where
  * a closure UDF would be a per-row black box. Build and probe hash
  * identically (both sides xxhash64 over the string form); the
  * xxhash64-collision term adds a negligible constant to the fpp.
  * False positives only ever OVER-select (callers either confirm
  * exactly or document over-removal); false negatives are impossible.
  */
object BloomDigest {

  /** Native might_contain predicate: true iff `probe`'s value might
    * be in the distinct non-null key set of `keys(keyCol)`. Runs one
    * distinct + one bloomFilter aggregate at call time (plus a count
    * to size the filter); the digest ships as a plan literal. */
  def mightContain(keys: DataFrame, keyCol: String, fpp: Double,
                   probe: Column): Column = {
    val k = keys.select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull).distinct()
    mightContainPreDistinct(k, "__k", fpp, probe)
  }

  /** [[mightContain]] when the caller already holds a DISTINCT,
    * non-null key set (e.g. a cached shingle set that a later exact
    * confirm will reuse) — skips the redundant distinct shuffle. */
  def mightContainPreDistinct(keys: DataFrame, keyCol: String,
                              fpp: Double, probe: Column): Column = {
    val (bf, _) = build(keys, keyCol, fpp, preDistinct = true)
    predicate(serialize(bf), probe)
  }

  // ---- persisted digest (build once, reuse across sessions) ----------

  /** on-disk format tag; validated on every load/append so a foreign
    * table can never be probed or silently rewritten (the persisted-
    * index discipline of the minhash/embedding/gram families). */
  val Format = "graft-bloom-v1"

  /** Build the digest over the distinct non-null keys of
    * `keys(keyCol)` and persist it at `path` (a tiny single-row
    * parquet: format tag, fpp, capacity = keys the bit array was
    * sized for, inserted = keys put so far, digest bytes). At 100 TB
    * this turns the streaming screen's per-session corpus scan into
    * a one-time build: stream starts load MBs, not the corpus.
    * `capacity` > 0 sizes the bit array for that many TOTAL keys
    * (present + future [[append]]s — the growth headroom is a build-
    * time decision, exactly like the other persisted indexes);
    * default sizes for exactly the build keys. */
  def save(keys: DataFrame, keyCol: String, fpp: Double,
           path: String, capacity: Long = -1L): Unit = {
    val spark = keys.sparkSession
    val (bf, n) = build(keys, keyCol, fpp, capacity)
    require(capacity < 0L || n <= capacity,
      s"build keys $n exceed requested capacity $capacity")
    writeDigest(spark, path, fpp,
      capacity = if (capacity > 0L) capacity else math.max(n, 1L),
      inserted = n, bytes = serialize(bf))
  }

  /** native might_contain predicate over `probe` from a digest
    * persisted by [[save]]/[[append]]. One tiny parquet read at
    * plan-construction time; no corpus access. */
  def loadPredicate(spark: org.apache.spark.sql.SparkSession,
                    path: String, probe: Column): Column =
    predicate(readDigest(spark, path)._4, probe)

  /** Fold a batch of NEW keys into a persisted digest. A Bloom bit
    * array is a pure union of hash positions, so insertion order is
    * irrelevant and append ≡ rebuild BYTE-IDENTICALLY as long as the
    * (capacity, fpp) sizing params are unchanged — spec-pinned, the
    * same update-equals-rebuild contract as the other persisted
    * indexes. The batch's distinct key hashes collect to the driver
    * (batch-bounded, the admission-loop cost discipline) and the
    * digest rewrites via staged swap. The bit array NEVER grows:
    * past `capacity` total insertions the fpp degrades, so overfull
    * appends THROW (loud, like every other index validation) rather
    * than silently blunting the screen. `inserted` is an UPPER BOUND
    * on distinct keys: a replayed or overlapping batch re-counts
    * (the bit array itself is idempotent), which only ever trips the
    * capacity guard EARLY — the conservative direction. */
  def append(spark: org.apache.spark.sql.SparkSession, path: String,
             newKeys: DataFrame, keyCol: String): Unit = {
    val (fpp, capacity, inserted, bytes) = readDigest(spark, path)
    val bf = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val hashes = newKeys
      .select(xxhash64(col(keyCol).cast("string")).as("__h"))
      .filter(col(keyCol).isNotNull).distinct()
      .collect().map(_.getLong(0))
    val total = inserted + hashes.length
    if (total > capacity)
      throw new IllegalStateException(
        s"bloom digest at $path sized for $capacity keys would hold " +
          s"$total after this append — fpp would degrade past the " +
          "built contract; rebuild with save() at the larger size")
    hashes.foreach(bf.putLong)
    writeDigest(spark, path, fpp, capacity, total, serialize(bf))
  }

  private def build(keys: DataFrame, keyCol: String, fpp: Double,
                    capacity: Long = -1L,
                    preDistinct: Boolean = false)
  : (org.apache.spark.util.sketch.BloomFilter, Long) = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val k0 = keys.select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
    // `inserted` must count DISTINCT keys (it gates append capacity);
    // preDistinct callers guarantee it and skip the extra exchange
    val k = if (preDistinct) k0 else k0.distinct()
    val n = k.count()
    val sizeFor = if (capacity > 0L) capacity else math.max(n, 1L)
    (k.stat.bloomFilter(xxhash64(col("__k")), sizeFor, fpp), n)
  }

  private def serialize(
      bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    bf.writeTo(b)
    b.toByteArray
  }

  private def predicate(bytes: Array[Byte], probe: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(bytes, BinaryType),
        expression(xxhash64(probe.cast("string")))))
  }

  private def writeDigest(spark: org.apache.spark.sql.SparkSession,
                          path: String, fpp: Double, capacity: Long,
                          inserted: Long, bytes: Array[Byte]): Unit = {
    import spark.implicits._
    graft.streaming.Admission.swapWriteIndex(
      Seq((Format, fpp, capacity, inserted, bytes))
        .toDF("__fmt", "fpp", "capacity", "inserted", "bytes"), path)
  }

  private def readDigest(spark: org.apache.spark.sql.SparkSession,
                         path: String)
  : (Double, Long, Long, Array[Byte]) = {
    val r = spark.read.parquet(path)
      .select(col("__fmt"), col("fpp"), col("capacity"),
        col("inserted"), col("bytes")).head()
    require(r.getString(0) == Format,
      s"$path is not a $Format digest (found ${r.getString(0)})")
    (r.getDouble(1), r.getLong(2), r.getLong(3),
      r.getAs[Array[Byte]](4))
  }
}
