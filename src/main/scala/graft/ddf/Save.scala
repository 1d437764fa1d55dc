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

  /** reference: bases/data_saver.py :: pickle — DOCUMENTED
    * DIVERGENCE: stored as parquet (see DDFContext.read.pickle). */
  def pickle(path: String, mode: String = "overwrite"): Unit =
    parquet(path, mode)

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
