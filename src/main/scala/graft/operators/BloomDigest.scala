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
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val bf = keys.stat.bloomFilter(xxhash64(col(keyCol).cast("string")),
      math.max(keys.count(), 1L), fpp)
    val bytes = {
      val b = new java.io.ByteArrayOutputStream()
      bf.writeTo(b)
      b.toByteArray
    }
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(bytes, BinaryType),
        expression(xxhash64(probe.cast("string")))))
  }
}
