package graft

import org.apache.spark.sql.functions._
import graft.operators.CountMin

/** Count-Min sketch: upper-bound guarantee vs the exact groupBy on
  * randomized skewed data, both hash families; linearity (append ≡
  * rebuild EXACTLY); param-stamp validation on the persisted face. */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private def mkItems(seed: Int, n: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val r = rng.nextDouble()
      if (r < 0.25) "hot_a"
      else if (r < 0.40) "hot_b"
      else s"tail_${rng.nextInt(500)}"
    }
  }

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("estimate >= exact for every key, both hash families") {
    val items = mkItems(201, 4000)
    val df = items.toDF("v")
    val exact = exactCounts(items)
    for (portable <- Seq(false, true)) {
      val sk = CountMin.sketch(df, "v", depth = 4, width = 64,
        portable = portable)
      val est = CountMin.estimate(sk, df, "v", depth = 4, width = 64,
          portable = portable)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.keySet == exact.keySet)
      exact.foreach { case (k, c) =>
        assert(est(k) >= c, s"portable=$portable key=$k: ${est(k)} < $c")
      }
      // width 64 over ~500 tail keys MUST collide somewhere — the
      // sketch is genuinely approximate in this regime, so at least
      // one estimate sits strictly above its true count
      assert(exact.exists { case (k, c) => est(k) > c },
        s"portable=$portable: no collisions at width 64 over " +
          s"${exact.size} keys — hash family is not spreading")
    }
  }

  test("wide sketch is exact; unseen keys estimate 0") {
    val items = mkItems(202, 3000)
    val df = items.toDF("v")
    val exact = exactCounts(items)
    val sk = CountMin.sketch(df, "v", depth = 4, width = 1 << 16)
    val probes = (exact.keySet.toSeq :+ "never_seen_key").toDF("v")
    val est = CountMin.estimate(sk, probes, "v", depth = 4,
        width = 1 << 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) => assert(est(k) == c, k) }
    assert(est("never_seen_key") == 0L)
  }

  test("sketch rows are partition-independent and depth*width-bounded") {
    val items = mkItems(203, 2000)
    def rows(parts: Int) =
      CountMin.sketch(items.toDF("v").repartition(parts), "v",
          depth = 3, width = 32)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .toSet
    val one = rows(1)
    assert(rows(7) == one)
    assert(one.size <= 3 * 32)
    // every occurrence increments all depth rows: per-d totals equal n
    (0 until 3).foreach { d =>
      assert(one.toSeq.filter(_._1 == d).map(_._3).sum
        == items.size.toLong)
    }
  }

  test("nulls are skipped like count(col)") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("v")
    val sk = CountMin.sketch(df, "v", depth = 2, width = 16)
    val est = CountMin.estimate(sk, Seq("a", "b").toDF("v"), "v",
        depth = 2, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 2L, "b" -> 1L))
  }

  test("append == rebuild EXACTLY: folded counters and estimates identical") {
    val items = mkItems(204, 3000)
    val (a, b) = items.splitAt(1200)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cms_spec").toString
    val path = dir + "/digest"
    CountMin.append(a.toDF("v"), "v", path, depth = 4, width = 128)
    CountMin.append(b.toDF("v"), "v", path, depth = 4, width = 128)
    val viaDigest = CountMin
      .estimateFromPath(spark, path, items.toDF("v"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = CountMin.estimate(
        CountMin.sketch(items.toDF("v"), "v", depth = 4, width = 128),
        items.toDF("v"), "v", depth = 4, width = 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDigest == oneShot)
    // linearity at the counter level, not just the estimates
    val folded = spark.read.parquet(path)
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    val direct = CountMin
      .sketch(items.toDF("v"), "v", depth = 4, width = 128)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(folded == direct)
  }

  test("persisted face refuses mixed params, foreign tables, bad stamps") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cms_guard").toString
    val mixed = dir + "/mixed"
    CountMin.append(Seq("x").toDF("v"), "v", mixed, depth = 4, width = 64)
    CountMin.append(Seq("y").toDF("v"), "v", mixed, depth = 4, width = 128)
    val e1 = intercept[IllegalArgumentException] {
      CountMin.estimateFromPath(spark, mixed, Seq("x").toDF("v"), "v")
    }
    assert(e1.getMessage.contains("mixes CMS params"))
    val foreign = dir + "/foreign"
    Seq((1, 2L, 3L)).toDF("d", "bucket", "cnt")
      .write.parquet(foreign)
    val e2 = intercept[IllegalArgumentException] {
      CountMin.estimateFromPath(spark, foreign, Seq("x").toDF("v"), "v")
    }
    assert(e2.getMessage.contains("missing param stamps"))
  }

  test("streaming face: per-micro-batch appends fold to the batch answer") {
    val items = mkItems(205, 2000)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cms_stream").toString
    // two parquet files -> the file stream drains them as batches
    items.take(900).toDF("v").coalesce(1)
      .write.parquet(s"$dir/in/p1")
    items.drop(900).toDF("v").coalesce(1)
      .write.parquet(s"$dir/in/p2")
    graft.streaming.EventStream.cmsDigestStream(
      spark.readStream.schema("v STRING").parquet(s"$dir/in/*"),
      "v", s"$dir/digest", s"$dir/ckpt", depth = 4, width = 128)
    val viaStream = CountMin
      .estimateFromPath(spark, s"$dir/digest", items.toDF("v"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = CountMin.estimate(
        CountMin.sketch(items.toDF("v"), "v", depth = 4, width = 128),
        items.toDF("v"), "v", depth = 4, width = 128)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaStream == oneShot)
  }

  test("param bounds throw early") {
    val df = Seq("a").toDF("v")
    intercept[IllegalArgumentException] {
      CountMin.sketch(df, "v", depth = 0)
    }
    intercept[IllegalArgumentException] {
      CountMin.sketch(df, "v", width = 1)
    }
  }
}
