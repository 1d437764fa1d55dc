package graft.ddf

import org.apache.spark.sql.DataFrame

/** reference: ddf_library/bases/data_saver.py — `ddf.save.*`. The
  * reference writes one file per fragment; Spark writes one file per
  * partition of the final stage, same contract.
  */
class Save(df: DataFrame) {
  private def w(mode: String, partitionBy: Seq[String] = Nil) = {
    val base = df.write.mode(mode)
    if (partitionBy.nonEmpty) base.partitionBy(partitionBy: _*) else base
  }
  def csv(path: String, mode: String = "overwrite",
          header: Boolean = true, partitionBy: Seq[String] = Nil): Unit =
    w(mode, partitionBy).option("header", header).csv(path)
  def json(path: String, mode: String = "overwrite",
           partitionBy: Seq[String] = Nil): Unit =
    w(mode, partitionBy).json(path)
  /** `partitionBy`: hive-style directory partitioning — the 100 TB
    * layout lever: a reader filtering on a partition column prunes
    * whole directories before any IO (PartitionFilters in the scan,
    * asserted in SourcesSpec). Choose low-cardinality columns
    * (language, source, date), never ids. */
  def parquet(path: String, mode: String = "overwrite",
              partitionBy: Seq[String] = Nil): Unit =
    w(mode, partitionBy).parquet(path)

  /** Range-clustered parquet write (engine ext) — the scan-locality
    * layout lever for HIGH-cardinality keys, complementing
    * `partitionBy` (low-cardinality directories): repartitionByRange +
    * sortWithinPartitions on the cluster key, so every output file
    * covers a narrow, non-overlapping key interval and parquet
    * min/max stats prune whole files/row-groups for range predicates.
    * One sampling pass + one shuffle-with-sort; file count = `nFiles`
    * (0 = let AQE size the shuffle — at scale, set it from
    * total-bytes / target-file-size). Range boundaries come from a
    * sampling job, so the LAYOUT is not rerun-stable (content is) —
    * use `shards` when byte-identical reruns matter more than
    * locality. */
  def clustered(path: String, clusterBy: Seq[String],
                nFiles: Int = 0, mode: String = "overwrite"): Unit = {
    require(clusterBy.nonEmpty, "clustered needs at least one column")
    val cols = clusterBy.map(org.apache.spark.sql.functions.col)
    val ranged = if (nFiles > 0) df.repartitionByRange(nFiles, cols: _*)
                 else df.repartitionByRange(cols: _*)
    ranged.sortWithinPartitions(cols: _*)
      .write.mode(mode).parquet(path)
  }

  /** [[graft.operators.ZOrder.saveZOrdered]] — two-column Morton
    * clustered parquet: files bound BOTH columns, so footer min/max
    * stats prune on either predicate (the multi-dimensional sibling
    * of [[clustered]], which bounds only its leading column). */
  def zordered(path: String, xCol: String, yCol: String,
               nFiles: Int = 0, mode: String = "overwrite"): Unit =
    graft.operators.ZOrder.saveZOrdered(df, xCol, yCol, path,
      nFiles = nFiles, mode = mode)

  /** ORC sink (engine ext, pairs with DDFContext.read.orc) — same
    * `partitionBy` hive-style directory layout as parquet. */
  def orc(path: String, mode: String = "overwrite",
          partitionBy: Seq[String] = Nil): Unit =
    w(mode, partitionBy).orc(path)

  /** Raw text sink (engine ext, pairs with DDFContext.read.text):
    * exactly one string column, one line per row. Same `partitionBy`
    * layout as the other sinks. */
  def text(path: String, mode: String = "overwrite",
           partitionBy: Seq[String] = Nil): Unit =
    w(mode, partitionBy).text(path)

  /** reference: bases/data_saver.py :: pickle — DOCUMENTED
    * DIVERGENCE: stored as parquet (see DDFContext.read.pickle). */
  def pickle(path: String, mode: String = "overwrite"): Unit =
    parquet(path, mode)

  /** Training-shard writer (DRIVER-EXT, SURVEY.md §2.12): exactly
    * `nShards` parquet files with rows DETERMINISTICALLY shuffled —
    * the standard last step of a training-data pipeline (a trainer
    * streaming shards in order must see a well-mixed sample, and a
    * re-run must produce identical shards for reproducibility).
    *
    * Mechanics: shard = pmod(xxhash64(seed, id), nShards), routed by
    * an IDENTITY partitioner through
    * `repartitionAndSortWithinPartitions` (one spill-backed shuffle-
    * with-sort, the TeraSort machinery), rows ordered inside each
    * shard by the same hash. Membership and order are pure functions
    * of (seed, id) — rerun-stable regardless of input partition
    * layout. `repartitionByRange` would NOT be: its range boundaries
    * come from a sampling pass seeded by the ephemeral RDD id, and a
    * `rand()` shuffle depends on partition layout. No skew by
    * construction (the hash is uniform); no driver materialization.
    * Rows whose ids hash-collide have unspecified relative order.
    * The DataFrame→RDD hop costs one encode pass — fine for a
    * terminal write. */
  def shards(path: String, idCol: String, nShards: Int,
             seed: Long = 42L, mode: String = "overwrite"): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    val spark = df.sparkSession
    val keyed = df.withColumn("__shuf", xxhash64(lit(seed), col(idCol)))
    val n = nShards
    val pairs = keyed.rdd.map { r =>
      val h = r.getLong(r.length - 1) // __shuf is the appended last col
      (((h % n + n) % n).toInt -> h, r)
    }
    val byShard = new org.apache.spark.Partitioner {
      def numPartitions: Int = n
      def getPartition(key: Any): Int = key.asInstanceOf[(Int, Long)]._1
    }
    val shuffled = pairs
      .repartitionAndSortWithinPartitions(byShard).map(_._2)
    spark.createDataFrame(shuffled, keyed.schema).drop("__shuf")
      .write.mode(mode).parquet(path)
  }

  /** bucketed + sorted managed table: repeated joins/aggregations on
    * `bucketCols` read co-located, pre-sorted buckets — no exchange,
    * no sort at query time. The 100 TB answer to the reference's
    * hash_partition-then-reuse pattern (etl/hash_partitioner.py),
    * persisted across jobs instead of per-plan. */
  def bucketedTable(name: String, bucketCols: Seq[String],
                    numBuckets: Int, mode: String = "overwrite"): Unit =
    w(mode).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
}
