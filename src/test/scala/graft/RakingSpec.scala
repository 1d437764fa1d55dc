package graft

import graft.operators.Raking
import org.apache.spark.sql.functions._

class RakingSpec extends SparkTestBase {
  import spark.implicits._

  // 2x2 fixture: counts deliberately OFF both marginals
  //         c=x  c=y   row share
  //  r=a     30   10   40%
  //  r=b     40   20   60%
  private def fixture = {
    val rows =
      Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(40)(("b", "x")) ++ Seq.fill(20)(("b", "y"))
    rows.zipWithIndex.map { case ((r, c), i) => (i.toLong, r, c) }
      .toDF("id", "r0", "c0")
  }

  test("cellCounts: one row per observed cell") {
    val got = Raking.cellCounts(fixture, "r0", "c0")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("a", "x") -> 30L, ("a", "y") -> 10L,
      ("b", "x") -> 40L, ("b", "y") -> 20L))
  }

  test("ipf converges: fitted fractions match BOTH target marginals") {
    val rowT = Map("a" -> 0.5, "b" -> 0.5)
    val colT = Map("x" -> 0.3, "y" -> 0.7)
    val f = Raking.ipfCellFractions(fixture, "r0", "c0", rowT, colT,
      iters = 30).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    val rowM = f.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val colM = f.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    rowT.foreach { case (k, t) => assert(math.abs(rowM(k) - t) < 1e-9) }
    colT.foreach { case (k, t) => assert(math.abs(colM(k) - t) < 1e-9) }
    assert(math.abs(f.values.sum - 1.0) < 1e-9)
  }

  test("identity fit: targets equal to observed marginals keep the mix") {
    val rowT = Map("a" -> 0.4, "b" -> 0.6)
    val colT = Map("x" -> 0.7, "y" -> 0.3)
    val f = Raking.ipfCellFractions(fixture, "r0", "c0", rowT, colT)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    // observed table already satisfies both marginals -> IPF is the
    // identity (weights 1 up to normalization)
    assert(math.abs(f(("a", "x")) - 0.30) < 1e-9)
    assert(math.abs(f(("b", "y")) - 0.20) < 1e-9)
  }

  test("rakeSelect: per-cell quotas honored, deterministic, " +
    "seed-sensitive, population-capped") {
    val rowT = Map("a" -> 0.5, "b" -> 0.5)
    val colT = Map("x" -> 0.5, "y" -> 0.5)
    val sel = Raking.rakeSelect(fixture, "id", "r0", "c0", rowT, colT,
      totalN = 40, iters = 30)
    val perCell = sel.groupBy($"r0", $"c0").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // Hamilton apportionment: totals hit totalN EXACTLY (populations
    // ample), each cell gets floor or floor+1 of its fitted share
    // (IPF preserves the table's odds ratio — symmetric targets do
    // NOT mean uniform cells)
    val fr = Raking.ipfCellFractions(fixture, "r0", "c0", rowT, colT,
      iters = 30).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(perCell.values.sum == 40L)
    fr.foreach { case (cell, f) =>
      val fl = math.floor(40.0 * f + 1e-9).toLong
      assert(perCell(cell) == fl || perCell(cell) == fl + 1, cell) }
    // and the fit is NOT uniform: the original 1.5 odds ratio survives
    val or = (fr(("a", "x")) * fr(("b", "y"))) /
      (fr(("a", "y")) * fr(("b", "x")))
    assert(math.abs(or - 1.5) < 1e-6)
    val again = Raking.rakeSelect(fixture, "id", "r0", "c0", rowT, colT,
      totalN = 40, iters = 30).select($"id").as[Long].collect().sorted
    assert(again.toSeq ==
      sel.select($"id").as[Long].collect().sorted.toSeq)
    val other = Raking.rakeSelect(fixture, "id", "r0", "c0", rowT, colT,
      totalN = 40, iters = 30, seed = 7L)
      .select($"id").as[Long].collect().sorted
    assert(other.toSeq != again.toSeq)
    // quota above a cell's population -> the whole cell, no error:
    // push 80% of mass onto the 10-row (a,y) cell
    val greedy = Raking.rakeSelect(fixture, "id", "r0", "c0",
      Map("a" -> 0.9, "b" -> 0.1), Map("x" -> 0.1, "y" -> 0.9),
      totalN = 90, iters = 30)
    val ay = greedy.filter($"r0" === "a" && $"c0" === "y").count()
    assert(ay == 10L) // capped at population
  }

  test("3-marginal fit: every marginal hits its target at 1e-9") {
    // lang x source x parity over 120 rows with deliberately skewed
    // joint counts
    val rows = (0 until 120).map { i =>
      (i.toLong,
        if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr",
        s"s${i % 3}",
        if (i % 5 < 3) 0 else 1) // INT third dim — string-cast contract
    }
    val df = rows.toDF("id", "lang", "src", "par")
    val targets = Seq(
      Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2),
      Map("s0" -> 0.4, "s1" -> 0.3, "s2" -> 0.3),
      Map("0" -> 0.7, "1" -> 0.3))
    val f = Raking.ipfCellFractionsN(df, Seq("lang", "src", "par"),
      targets, iters = 40).collect()
    val byDim = (0 to 2).map(d => f.groupBy(_.getString(d))
      .map { case (k, rs) => k -> rs.map(_.getDouble(5)).sum })
    targets.zipWithIndex.foreach { case (t, d) =>
      t.foreach { case (k, tv) =>
        assert(math.abs(byDim(d)(k) - tv) < 1e-9,
          s"dim $d key $k: ${byDim(d).get(k)} vs $tv") } }
    assert(math.abs(f.map(_.getDouble(5)).sum - 1.0) < 1e-9)
  }

  test("non-string stratification columns are string-cast; NULL " +
    "cells are refused with the contract message") {
    val ints = Seq((1L, 2020, "x"), (2L, 2021, "x"), (3L, 2020, "y"))
      .toDF("id", "year", "c0")
    val f = Raking.ipfCellFractionsN(ints, Seq("year", "c0"),
      Seq(Map("2020" -> 0.5, "2021" -> 0.5),
        Map("x" -> 0.5, "y" -> 0.5)), iters = 20).collect()
    assert(f.map(_.getString(0)).toSet == Set("2020", "2021"))
    val withNull = Seq((1L, Some("a"), "x"), (2L, None, "y"))
      .toDF("id", "r0", "c0")
    val e = intercept[IllegalArgumentException] {
      Raking.ipfCellFractionsN(withNull, Seq("r0", "c0"),
        Seq(Map("a" -> 1.0), Map("x" -> 0.5, "y" -> 0.5)))
    }
    assert(e.getMessage.contains("NULL value in stratification"))
  }

  test("hamiltonQuotas: FP overshoot corner trims the smallest " +
    "remainders instead of exceeding totalN") {
    // fracs crafted so every exact sits an ulp below an integer and
    // the bare floor(x + 1e-9) rounds all three UP: 1e9 * 0.333333334
    // = 333333334.00000006 -> q = 333333334 each, sum = 1000000002
    // > totalN. The trim branch must take the overshoot back from
    // the smallest-remainder cells and land on totalN exactly.
    val keys = Array(Array("a"), Array("b"), Array("c"))
    val fracs = Array(0.333333334, 0.333333334, 0.333333334)
    val totalN = 1000000000L
    val pre = fracs.map(f => math.floor(f * totalN + 1e-9).toLong).sum
    assume(pre > totalN, s"fixture no longer overshoots (pre=$pre)")
    val q = Raking.hamiltonQuotas(keys, fracs, totalN)
    assert(q.sum == totalN)
    // deterministic: the lexicographically-first smallest-remainder
    // cells absorb the trim
    assert(q.toSeq == Seq(333333333L, 333333333L, 333333334L))
    // and the normal bump branch still fills shortfalls exactly
    val q2 = Raking.hamiltonQuotas(
      Array(Array("a"), Array("b"), Array("c")),
      Array(1.0 / 3, 1.0 / 3, 1.0 / 3), 10L)
    assert(q2.sum == 10L && q2.max - q2.min <= 1)
  }

  test("rakeSelectByN: quota winners ranked by the priority column, " +
    "not the md5 draw") {
    val rows = (0 until 40).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", i.toDouble))
    val df = rows.toDF("id", "r0", "prio")
    val sel = Raking.rakeSelectByN(df, "id", Seq("r0"),
      Seq(Map("a" -> 0.5, "b" -> 0.5)), totalN = 10,
      priorityCol = "prio", iters = 10)
    val got = sel.select($"id").as[Long].collect().toSet
    // 5 per cell, highest priority = highest ids of each parity
    assert(got == Set(30L, 32L, 34L, 36L, 38L, 31L, 33L, 35L, 37L, 39L))
  }

  test("validation refuses bad targets") {
    intercept[IllegalArgumentException] {
      Raking.ipfCellFractions(fixture, "r0", "c0",
        Map("a" -> 0.4), Map("x" -> 0.5, "y" -> 0.5)) // b uncovered
    }
    intercept[IllegalArgumentException] {
      Raking.ipfCellFractions(fixture, "r0", "c0",
        Map("a" -> 0.4, "b" -> 0.4), Map("x" -> 0.5, "y" -> 0.5)) // sum!=1
    }
    intercept[IllegalArgumentException] {
      Raking.ipfCellFractions(fixture, "r0", "c0",
        Map("a" -> -0.5, "b" -> 1.5), Map("x" -> 0.5, "y" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Raking.ipfCellFractions(fixture, "r0", "c0",
        Map("a" -> 0.4, "b" -> 0.6), Map("x" -> 1.0, "y" -> 1e-12),
        iters = 0)
    }
    intercept[IllegalArgumentException] {
      Raking.rakeSelect(fixture, "id", "r0", "c0",
        Map("a" -> 0.5, "b" -> 0.5), Map("x" -> 0.5, "y" -> 0.5),
        totalN = 0)
    }
  }

  test("extra target keys for unobserved values are tolerated") {
    val f = Raking.ipfCellFractions(fixture, "r0", "c0",
      Map("a" -> 0.3, "b" -> 0.3, "ghost" -> 0.4),
      Map("x" -> 0.5, "y" -> 0.5), iters = 30).collect()
    // ghost mass is unreachable; the fit renormalizes over observed
    // cells and the COLUMN marginals (the last pass) still hit target
    val colM = f.map(r => r.getString(1) -> r.getDouble(4))
      .groupBy(_._1).map { case (k, m) => k -> m.map(_._2).sum }
    assert(math.abs(colM("x") - 0.5) < 1e-9)
    assert(math.abs(colM("y") - 0.5) < 1e-9)
  }
}
