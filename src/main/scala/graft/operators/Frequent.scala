package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact heavy hitters at open-domain cardinality — the scale path
  * for `DDF.freqItems` (q38), whose one-exchange groupBy is right as
  * long as the DISTINCT-item table fits a shuffle comfortably. Over
  * an open token/URL/host domain at 100 TB it does not, and this is
  * the classical two-pass answer (Misra–Gries 1982 summaries +
  * exact confirm):
  *
  *  - pass 1, shuffle-free: each partition keeps a k-counter
  *    Misra–Gries summary (k = ⌈1/minShare⌉, amortized O(1) per
  *    row). Averaging argument: an item with global count
  *    > n·minShare has count_p > n_p·minShare in at least one
  *    partition, and per-partition MG retains every such item — so
  *    the union of partition summaries is a SUPERSET of the true
  *    heavy hitters. Per-PARTITION state is ≤ k entries; the
  *    candidate union (≤ partitions · k) is deduplicated
  *    DISTRIBUTED-side (distinct + localCheckpoint) — the driver
  *    never materializes it, so extreme partition counts cannot OOM
  *    the driver. Row counts ride the same pass.
  *  - pass 2: semi-join the candidate set back and count EXACTLY
  *    those items (combiners bound the exchange to ≤ partitions ·
  *    |candidates| rows), keep count > n·minShare. The candidate
  *    side broadcasts below a size bound and falls back to a shuffle
  *    join above it — still exact either way.
  *
  * The answer is EXACT and partition-independent — the candidate
  * superset varies with layout, the final filter by exact counts
  * does not (spec-pinned under repartitioning) — which is what makes
  * the full SQL oracle (q136) possible where a sketch-only answer
  * would be rows-only. Nulls are not items and are ignored.
  */
object Frequent {

  /** items of `colName` whose frequency strictly exceeds
    * `minShare` of the non-null rows; returns (colName, cnt) with
    * the column's original type.
    *
    * Two-scan SNAPSHOT CONTRACT: pass 1 derives `n` and the
    * candidate superset from one scan of `df`; pass 2 recounts the
    * candidates in a second, independent scan. The threshold
    * `cnt > n * minShare` is only meaningful when both scans observe
    * the same rows — i.e. `df` must be a deterministic plan over
    * stable input (the normal case: a file scan plus deterministic
    * transforms). A non-deterministic plan (rand-filtered, sampled)
    * or backing files rewritten between passes make the threshold
    * inconsistent with the counts; snapshot such inputs first
    * (persist or write out) before calling. Persisting
    * unconditionally here would pin a corpus-sized column in memory
    * at 100 TB scale — the contract is the scale-correct choice. */
  def heavyHitters(df: DataFrame, colName: String,
                   minShare: Double): DataFrame = {
    require(minShare > 0.0 && minShare < 1.0,
      s"minShare must be in (0,1), got $minShare")
    val k = math.ceil(1.0 / minShare).toInt
    require(k <= 100000,
      s"minShare = $minShare needs $k counters per partition — below " +
        "the useful heavy-hitter regime (per-task state and the " +
        "candidate table scale with k); use the exact groupBy " +
        "(DDF.freqItems) for fine thresholds")
    val spark = df.sparkSession
    val colType = df.schema(colName).dataType

    // pass 1: per-partition (rowCount, MG summary); no exchange
    val summaries = df.select(col(colName)).rdd
      .mapPartitions { it =>
        mgSummary(it, k)
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val n = summaries.map(_._1).fold(0L)(_ + _)
    def emptyResult: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField(colName, colType),
        StructField("cnt", LongType, nullable = false))))
    if (n == 0L) { summaries.unpersist(); return emptyResult }
    // candidate superset, deduplicated WITHOUT touching the driver;
    // localCheckpoint settles it so the MG pass can release
    val candDf = spark.createDataFrame(
        summaries.flatMap(_._2.iterator.map(Row(_))),
        StructType(Seq(StructField("__cand", colType))))
      .distinct().localCheckpoint()
    summaries.unpersist()
    // one stats pass sizes the broadcast decision by BYTES, not rows:
    // 1M long URLs can be hundreds of MB where 1M ints are a few —
    // a row-count gate would stress the driver before the shuffle
    // fallback engaged. String length is the estimator (chars ~ UTF-8
    // bytes for the domains that matter here) plus per-entry overhead.
    val candStats = candDf.select(count(lit(1)).as("c"),
      coalesce(sum(length(col("__cand").cast("string"))), lit(0L))
        .as("chars")).head()
    val nCand = candStats.getLong(0)
    if (nCand == 0L) return emptyResult
    val estBytes = candStats.getLong(1) * 2L + nCand * 24L

    // pass 2: exact counts of the candidate superset only. Broadcast
    // is the intended plan (the candidate table is k-bounded per
    // partition and tiny after dedup); an adversarially huge
    // candidate set falls back to a shuffle join — same answer.
    val candSide =
      if (estBytes <= (64L << 20)) broadcast(candDf) else candDf
    df.select(col(colName))
      .join(candSide, col(colName) === col("__cand"), "left_semi")
      .groupBy(col(colName))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(n) * lit(minShare))
  }

  /** one partition's Misra–Gries summary: (rowCount, candidate keys) */
  private def mgSummary(it: Iterator[Row], k: Int)
  : Iterator[(Long, Array[Any])] = {
    val counters = new java.util.HashMap[Any, Long](k * 2)
    var n = 0L
    it.foreach { row =>
      val v = row.get(0)
      if (v != null) {
        n += 1L
        if (counters.containsKey(v))
          counters.put(v, counters.get(v) + 1L)
        else if (counters.size < k) counters.put(v, 1L)
        else {
          // decrement-all: each such event cancels k+1 distinct
          // rows, so events ≤ n/(k+1) and total work stays O(n)
          val dead = new java.util.ArrayList[Any]()
          val eit = counters.entrySet().iterator()
          while (eit.hasNext) {
            val e = eit.next()
            if (e.getValue == 1L) dead.add(e.getKey)
            else e.setValue(e.getValue - 1L)
          }
          dead.forEach(counters.remove(_))
        }
      }
    }
    import scala.jdk.CollectionConverters._
    Iterator.single((n, counters.keySet().asScala.toArray))
  }
}
