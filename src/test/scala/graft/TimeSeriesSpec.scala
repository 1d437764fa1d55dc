package graft

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def series(vals: Double*) =
    vals.zipWithIndex.map { case (v, i) => ("k", i + 1, v) }
      .toDF("key", "t", "v")

  test("rollingZscore: trailing-exclusive window, hand z, null rules") {
    val got = TimeSeries.rollingZscore(series(10, 20, 10, 40),
        Seq("key"), Seq("t"), "v", window = 3)
      .orderBy($"t")
      .select($"roll_n", $"roll_mean", $"z").collect()
    assert(got(0).getLong(0) == 0 && got(0).isNullAt(2)) // no past
    assert(got(1).getLong(0) == 1 && got(1).isNullAt(2)) // < minPeriods
    // row 4 scored against [10, 20, 10]: mean 13.33, std 5.7735
    assert(math.abs(got(3).getDouble(1) - 40.0 / 3) < 1e-9)
    assert(math.abs(got(3).getDouble(2) - 4.61880) < 1e-4)
    // constant past: std 0 -> null z, never Infinity
    val const = TimeSeries.rollingZscore(series(10, 10, 10, 40),
        Seq("key"), Seq("t"), "v", window = 3)
      .orderBy($"t").select($"z").collect()
    assert(const(3).isNullAt(0))
  }

  test("rollingMadZ: interpolated median, MAD, robust z") {
    // row 5 scored against frame [1, 2, 3, 100]: median 2.5,
    // |dev| = [1.5, 0.5, 0.5, 97.5] -> MAD 1.0
    val got = TimeSeries.rollingMadZ(series(1, 2, 3, 100, 5),
        Seq("key"), Seq("t"), "v", window = 4)
      .orderBy($"t")
      .select($"roll_median", $"roll_mad", $"robust_z").collect()
    assert(got(4).getDouble(0) == 2.5)
    assert(got(4).getDouble(1) == 1.0)
    assert(math.abs(got(4).getDouble(2) - 0.6745 * 2.5) < 1e-9)
    // the mean-based z would be dragged far by the 100 outlier in
    // the baseline; the robust z still flags nothing extreme here
    assert(got(0).isNullAt(2)) // empty frame
  }

  test("cusum: prefix-min identity == the recursion, reset, mirror") {
    // target 10, slack 0: drifts 4, -6, 4 — the -6 RESETS the
    // statistic to 0 (max(0, ...)), the identity must reproduce that
    val got = TimeSeries.cusum(series(14, 4, 14), Seq("key"), Seq("t"),
        "v", target = 10.0, slack = 0.0, h = 3.0)
      .orderBy($"t").select($"cusum", $"alarm").collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(4.0, 0.0, 4.0))
    assert(got.map(_.getBoolean(1)).toSeq == Seq(true, false, true))
    // persistent small drift accumulates past h where any single
    // point would not: +2 per step
    val acc = TimeSeries.cusum(series(10, 10, 12, 12, 12, 8),
        Seq("key"), Seq("t"), "v", 10.0, 0.0, 3.0)
      .orderBy($"t").select($"cusum").collect().map(_.getDouble(0))
    assert(acc.toSeq == Seq(0.0, 0.0, 2.0, 4.0, 6.0, 4.0))
    // downward mirror: a dip below target accumulates there instead
    val down = TimeSeries.cusum(series(10, 6, 10), Seq("key"), Seq("t"),
        "v", 10.0, 0.0, 3.0, upward = false)
      .orderBy($"t").select($"cusum").collect().map(_.getDouble(0))
    assert(down.toSeq == Seq(0.0, 4.0, 4.0))
    intercept[IllegalArgumentException] {
      TimeSeries.cusum(series(1), Seq("key"), Seq("t"), "v", 0, 0, 0)
    }
  }

  test("ewma: adjusted weights over the bounded window") {
    val got = TimeSeries.ewma(series(1, 2, 3, 4), Seq("key"), Seq("t"),
        "v", alpha = 0.5, window = 3)
      .orderBy($"t").select($"ewma").collect().map(_.getDouble(0))
    assert(got(0) == 1.0)
    assert(math.abs(got(1) - (0.5 * 1 + 1 * 2) / 1.5) < 1e-12)
    assert(math.abs(got(2) - (0.25 * 1 + 0.5 * 2 + 1 * 3) / 1.75) < 1e-12)
    // window 3: row 4 forgets row 1 entirely
    assert(math.abs(got(3) - (0.25 * 2 + 0.5 * 3 + 1 * 4) / 1.75) < 1e-12)
    intercept[IllegalArgumentException] {
      TimeSeries.ewma(series(1), Seq("key"), Seq("t"), "v", 1.0, 3)
    }
  }

  test("ewma: null-leading rows yield null, not an ANSI crash") {
    // collect_list skips nulls -> the first row's frame is EMPTY;
    // pre-guard this threw INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    val df = Seq(("k", 1, None: Option[Double]), ("k", 2, Some(10.0)),
        ("k", 3, None), ("k", 4, Some(20.0)))
      .toDF("key", "t", "v")
    val got = TimeSeries.ewma(df, Seq("key"), Seq("t"), "v",
        alpha = 0.5, window = 2)
      .orderBy($"t").select($"ewma").collect()
    assert(got(0).isNullAt(0))              // empty frame -> null
    assert(got(1).getDouble(0) == 10.0)     // frame [10]
    assert(got(2).getDouble(0) == 10.0)     // null skipped: frame [10]
    assert(got(3).getDouble(0) == 20.0)     // window 2 from t=3: [20]
  }
}
