package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy per-row stages (signatures,
  * distance math): a small single-file scan arrives as ONE partition,
  * which would serialize the expensive map stage no matter how many
  * cores exist. Widen up to the cluster's default parallelism — and
  * never shrink inputs that already have more splits (the 100 TB
  * case, where repartitioning down would be a regression).
  */
private[graft] object Partitioning {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
