package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("backward as-of picks latest right row at-or-before left ts") {
    val quotes = Seq(("A", 1L, 10.0), ("A", 5L, 11.0), ("B", 3L, 20.0))
      .toDF("sym", "ts", "px")
    val trades = Seq(("A", 0L, 1), ("A", 1L, 2), ("A", 4L, 3),
      ("A", 7L, 4), ("B", 2L, 5), ("B", 9L, 6))
      .toDF("sym", "ts", "qty")
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", "ts",
        payload = Seq("px"))
      .select($"qty", $"asof_px").collect()
      .map(r => r.getInt(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got(1).isEmpty)          // before any quote
    assert(got(2).contains(10.0))   // equal ts matches
    assert(got(3).contains(10.0))
    assert(got(4).contains(11.0))
    assert(got(5).isEmpty)
    assert(got(6).contains(20.0))
  }

  test("forward as-of picks earliest right row at-or-after left ts") {
    val quotes = Seq(("A", 1L, 10.0), ("A", 5L, 11.0), ("B", 3L, 20.0))
      .toDF("sym", "ts", "px")
    val trades = Seq(("A", 0L, 1), ("A", 1L, 2), ("A", 4L, 3),
      ("A", 7L, 4), ("B", 2L, 5), ("B", 9L, 6))
      .toDF("sym", "ts", "qty")
    val got = AsOfJoin.forward(trades, quotes, Seq("sym"), "ts", "ts",
        payload = Seq("px"))
      .select($"qty", $"asof_px").collect()
      .map(r => r.getInt(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got(1).contains(10.0))   // next quote at ts=1
    assert(got(2).contains(10.0))   // equal ts matches
    assert(got(3).contains(11.0))
    assert(got(4).isEmpty)          // after the last quote
    assert(got(5).contains(20.0))
    assert(got(6).isEmpty)
  }
}
