package graft.ddf

import org.apache.spark.sql.DataFrame

/** reference: ddf_library/bases/data_saver.py — `ddf.save.*`. The
  * reference writes one file per fragment; Spark writes one file per
  * partition of the final stage, same contract.
  */
class Save(df: DataFrame) {
  private def w(mode: String) = df.write.mode(mode)
  def csv(path: String, mode: String = "overwrite",
          header: Boolean = true): Unit =
    w(mode).option("header", header).csv(path)
  def json(path: String, mode: String = "overwrite"): Unit =
    w(mode).json(path)
  def parquet(path: String, mode: String = "overwrite"): Unit =
    w(mode).parquet(path)

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
