package graft

import org.apache.spark.sql.functions._
import graft.operators.Frequent

/** Misra–Gries two-pass heavy hitters: exact vs the full groupBy on
  * randomized skewed data, partition-independent, null-blind. */
class FrequentSpec extends SparkTestBase {
  import spark.implicits._

  private def exactRef(items: Seq[String], minShare: Double)
  : Map[String, Long] = {
    val real = items.filter(_ != null)
    val n = real.size
    real.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > n * minShare).toMap
  }

  test("skewed randomized data equals the exact groupBy answer") {
    val rng = new scala.util.Random(136)
    for (round <- 1 to 3) {
      // zipf-ish: few hot items over a long uniform tail
      val hot = Vector("alpha", "beta", "gamma")
      val items = (1 to 5000).map { _ =>
        val r = rng.nextDouble()
        if (r < 0.22) hot(0)
        else if (r < 0.35) hot(1)
        else if (r < 0.42) hot(2)
        else s"tail_${rng.nextInt(2000)}"
      }
      val minShare = 0.05
      val want = exactRef(items, minShare)
      val got = Frequent.heavyHitters(items.toDF("v"), "v", minShare)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"round $round")
    }
  }

  test("partition-independent: same answer at 1, 7, and 32 partitions") {
    val rng = new scala.util.Random(137)
    val items = (1 to 4000).map { _ =>
      if (rng.nextDouble() < 0.3) "hot" else s"t_${rng.nextInt(500)}"
    }
    val answers = Seq(1, 7, 32).map { p =>
      Frequent.heavyHitters(items.toDF("v").repartition(p), "v", 0.1)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(answers.distinct.size == 1)
    assert(answers.head == exactRef(items, 0.1))
  }

  test("nulls are ignored; threshold is strict; non-string types work") {
    val d = Seq[Option[Long]](Some(1L), Some(1L), Some(1L), Some(2L),
      None, None).toDF("v")
    // n = 4 non-null; 1L has share 3/4, 2L exactly 1/4 -> strict > drops it
    val got = Frequent.heavyHitters(d, "v", 0.25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L))
  }

  test("empty input and all-null input return empty with the right schema") {
    val empty = Seq.empty[String].toDF("v")
    val e1 = Frequent.heavyHitters(empty, "v", 0.1)
    assert(e1.columns.toSeq == Seq("v", "cnt") && e1.count() == 0)
    val nulls = Seq[Option[String]](None, None).toDF("v")
    assert(Frequent.heavyHitters(nulls, "v", 0.1).count() == 0)
  }

  test("fine thresholds are rejected toward the exact path") {
    val e = intercept[IllegalArgumentException] {
      Frequent.heavyHitters(Seq("a").toDF("v"), "v", 1e-7)
    }
    assert(e.getMessage.contains("freqItems"))
  }
}
