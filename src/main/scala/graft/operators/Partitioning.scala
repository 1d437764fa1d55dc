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
    // deciding from df.rdd.getNumPartitions is a trap under AQE: for
    // any plan containing an exchange, Dataset.rdd FINALIZES the
    // adaptive plan, which materializes every query stage — i.e. the
    // "check" runs real jobs (r11 ProbeAdmit caught the admission
    // screen scanning the corpus for a throwaway broadcast during
    // planning). So: inspect the physical plan instead.
    //   - plan already shuffles -> its output width is
    //     spark.sql.shuffle.partitions (~ target here); leave it
    //     alone and let AQE size it.
    //   - broadcast-only plan -> streamed-side width is unknowable
    //     without executing; these are the batch-bounded screen
    //     shapes, so an explicit batch-sized repartition is cheap
    //     and parallelizes the hashing it exists for.
    //   - exchange-free plan (pure scan/project) -> Dataset.rdd is
    //     genuinely free (nothing adaptive to materialize); keep the
    //     exact width check so a 100 TB corpus scan that already has
    //     thousands of splits is NEVER needlessly reshuffled.
    val hasShuffle = df.queryExecution.sparkPlan.find(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange
        .ShuffleExchangeLike]).isDefined
    // a CACHED frame (InMemoryTableScan root) is deliberately NOT
    // treated as exchange-bearing: probing its width does build the
    // cache eagerly, but that materialization is exactly the work
    // every downstream action would reuse — early attribution, not
    // waste. Only an UNCACHED broadcast-bearing plan wastes work
    // when probed (its stages belong to the probe's execution alone).
    val hasExchange = hasShuffle || df.queryExecution.sparkPlan.find(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange
        .BroadcastExchangeLike]).isDefined
    if (hasShuffle) df
    else if (hasExchange) df.repartition(target)
    else if (df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}
