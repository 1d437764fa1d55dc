package graft

import graft.operators.Midrank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class MidrankSpec extends SparkTestBase {
  import spark.implicits._

  test("withMidranks equals the rank window identity, ties averaged") {
    // values 5,5,7,9,9,9,12 -> midranks 1.5,1.5,3,5,5,5,7
    val rows = Seq(5.0, 5.0, 7.0, 9.0, 9.0, 9.0, 12.0).toDF("v")
    val census = rows.groupBy($"v").agg(count(lit(1)).as("__t"))
    val got = Midrank.withMidranks(census, "v", "__t")
      .orderBy($"v").collect()
      .map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(got == Map(5.0 -> 1.5, 7.0 -> 3.0, 9.0 -> 5.0, 12.0 -> 7.0))
    // cross-check against the window formulation it replaces
    val win = rows
      .withColumn("__rk", rank().over(Window.orderBy($"v")))
      .withColumn("__t", count(lit(1)).over(Window.partitionBy($"v")))
      .withColumn("mid", $"__rk" + ($"__t" - 1) / 2.0)
      .select($"v", $"mid").distinct().collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got == win)
  }

  test("perRow joins every row its midrank; survives repartitioning") {
    val rows = Seq(("a", 3.0), ("b", 1.0), ("c", 3.0), ("d", 2.0))
      .toDF("id", "v").repartition(3)
    val got = Midrank.perRow(rows, "v", "r")
      .collect().map(r => r.getString(r.fieldIndex("id")) ->
        r.getDouble(r.fieldIndex("r"))).toMap
    assert(got == Map("a" -> 3.5, "b" -> 1.0, "c" -> 3.5, "d" -> 2.0))
  }

  test("perRow broadcast and shuffled join-backs agree; plans differ") {
    // auto-broadcast off: the mids frame is RDD-backed (no size
    // statistic) AND the row side is deliberately unsized here, so
    // any BroadcastHashJoin in the plan can only come from perRow's
    // census-count hint
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val rows = (1 to 500).map(i => (i.toString, (i % 23).toDouble))
        .toDF("id", "v").repartition(4)
      val bcast = Midrank.perRow(rows, "v", "r") // 23-row census
      val shuf = Midrank.perRow(rows, "v", "r", broadcastRowLimit = 0L)
      assert(bcast.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(!shuf.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      val key = (df: org.apache.spark.sql.DataFrame) =>
        df.collect().map(r => r.getString(r.fieldIndex("id")) ->
          r.getDouble(r.fieldIndex("r"))).toMap
      assert(key(bcast) == key(shuf))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("wide (string) value columns get the discounted broadcast " +
    "threshold; numeric values keep the full one") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // census = 40 distinct values; limit 320: numeric passes the
      // row check outright, a STRING value is discounted 16x
      // (320/16 = 20 < 40) and must fall back to the shuffled join
      val num = (1 to 200).map(i => (i.toString, (i % 40).toDouble))
        .toDF("id", "v").repartition(4)
      val str = (1 to 200).map(i => (i.toString, s"val_${i % 40}"))
        .toDF("id", "v").repartition(4)
      val numPlan = Midrank.perRow(num, "v", "r",
        broadcastRowLimit = 320L).queryExecution.executedPlan.toString
      val strPlan = Midrank.perRow(str, "v", "r",
        broadcastRowLimit = 320L).queryExecution.executedPlan.toString
      assert(numPlan.contains("BroadcastHashJoin"))
      assert(!strPlan.contains("BroadcastHashJoin"))
      // under the discounted limit the string census still broadcasts
      val strOk = Midrank.perRow(str, "v", "r",
        broadcastRowLimit = 3200L).queryExecution.executedPlan.toString
      assert(strOk.contains("BroadcastHashJoin"))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("empty census yields an empty frame, not a crash") {
    val empty = Seq.empty[Double].toDF("v")
      .groupBy($"v").agg(count(lit(1)).as("__t"))
    assert(Midrank.withMidranks(empty, "v", "__t").count() == 0)
  }

  test("rank-sum exactness: midranks are multiples of 0.5") {
    val n = 1000
    val rows = (1 to n).map(i => (i % 37).toDouble).toDF("v")
    val census = rows.groupBy($"v").agg(count(lit(1)).as("__t"))
    val mids = Midrank.withMidranks(census, "v", "__t").collect()
    assert(mids.forall(r => (r.getDouble(2) * 2) % 1 == 0))
    // Σ t·mid over all values = n(n+1)/2, binary-exact
    val total = mids.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(total == n.toLong * (n + 1) / 2.0)
  }
}
