package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ddf.DDF
import graft.ddf.DDF._

/** ETL-surface invariants on micro-fixtures (FIXTURES.md §B), covering
  * the pandas-vs-SQL semantic traps SURVEY.md §7 flags: SQL NULL
  * semantics, null group keys, positional ops, multiset set-ops. */
class DDFSpec extends SparkTestBase {
  import spark.implicits._

  private def people = DDF(Seq(
    (1, "ann", Some(20), Some("rio")),
    (2, "bob", None, Some("rio")),
    (3, "cat", Some(40), None),
    (4, "dan", Some(40), Some("oslo")),
    (5, "eve", None, Some("oslo"))
  ).toDF("id", "name", "age", "city"))

  test("select / drop / rename / cast") {
    assert(people.select(Seq("id", "age")).columns == Seq("id", "age"))
    assert(people.drop(Seq("city")).columns == Seq("id", "name", "age"))
    assert(people.rename("city", "town").columns.contains("town"))
    val casted = people.cast("age", "double")
    assert(casted.schema("age").dataType == DoubleType)
    assert(people.cast("id", "string").schema("id").dataType == StringType)
  }

  test("selectExpression assignment and plain forms") {
    val r = people.selectExpression("age2 = age * 2", "id + 1")
    assert(r.columns.contains("age2"))
    val got = r.toDF.filter($"id" === 1).select($"age2").head().getInt(0)
    assert(got == 40)
  }

  test("filter accepts pandas-query dialect") {
    assert(people.filter("(age == 40) and (city == 'oslo')").countRows() == 1)
    assert(people.filter("(age == 40) & (city == 'oslo')").countRows() == 1)
    // SQL 3-valued logic: NULL age rows are dropped, not matched
    assert(people.filter("age != 40").countRows() == 1)
  }

  test("sampleBy is stratified: fraction-1 strata kept, fraction-0 dropped") {
    val d = DDF((1 to 100).map(i => (if (i % 2 == 0) "a" else "b", i))
      .toDF("s", "v"))
    val r = d.sampleBy("s", Map("a" -> 1.0, "b" -> 0.0)).toDF
    assert(r.filter($"s" === "b").count() == 0)
    assert(r.filter($"s" === "a").count() == 50)
    // seeded: same seed, same rows
    val x = d.sampleBy("s", Map("a" -> 0.4, "b" -> 0.7), seed = 7L).toDF
    val y = d.sampleBy("s", Map("a" -> 0.4, "b" -> 0.7), seed = 7L).toDF
    assert(x.exceptAll(y).count() == 0 && y.exceptAll(x).count() == 0)
  }

  test("pandas-eval dialect: ** power and python ternary") {
    val d = DDF(Seq((1, 2.0), (2, 3.0)).toDF("id", "v"))
    val p = d.selectExpression(
      "sq = v ** 2", "cube = (v + 1) ** 2", "flag = 1 if v > 2.5 else 0")
      .toDF
    assert(p.filter($"id" === 1).head().getDouble(2) == 4.0)
    assert(p.filter($"id" === 2).head().getDouble(3) == 16.0)
    assert(p.filter($"id" === 1).select($"flag").head().getInt(0) == 0)
    assert(p.filter($"id" === 2).select($"flag").head().getInt(0) == 1)
    assert(d.filter("v ** 2 > 5").countRows() == 1)
  }

  test("pandas-eval dialect: ** is right-associative, literals masked") {
    val d = DDF(Seq((1, 2.0)).toDF("id", "v"))
    // python: 2 ** 3 ** 2 == 2 ** (3 ** 2) == 512, not (2**3)**2 == 64
    val r = d.selectExpression("p = v ** 3 ** 2").toDF
    assert(r.head().getDouble(2) == 512.0)
    // 4-deep chain folds right-to-left too: 2^(2^(2^2)) = 2^16
    val r4 = d.selectExpression("p = v ** v ** v ** v").toDF
    assert(r4.head().getDouble(2) == 65536.0)
    // parenthesized left still overrides: (2**3)**2 = 64
    val rp = d.selectExpression("p = (v ** 3) ** 2").toDF
    assert(rp.head().getDouble(2) == 64.0)
    // '**' or ' if ... else ' INSIDE a string literal is untouched
    val s = DDF(Seq((1, "a ** b")).toDF("id", "t"))
    assert(s.filter("t == 'a ** b'").countRows() == 1)
    assert(s.filter("t == 'x if y else z'").countRows() == 0)
  }

  test(".str accessors: contains is regex by default, replace literal") {
    // pandas .str.contains(pat) defaults to regex=True → 'a|b' is an
    // ALTERNATION (ann/bob/cat/dan match), not the 3-char literal
    assert(people.filter("name.str.contains('a|b')").countRows() == 4)
    assert(
      people.filter("name.str.contains('a|b', regex=False)").countRows() == 0)
    assert(people.filter("name.str.contains('^a')").countRows() == 1)
    // .str.replace defaults to regex=False (pandas >= 2.0): literal
    val lit = people.selectExpression("x = name.str.replace('a|b', 'Z')")
      .toDF.filter($"id" === 1).select($"x").head().getString(0)
    assert(lit == "ann")
    val re = people
      .selectExpression("x = name.str.replace('a|b', 'Z', regex=True)")
      .toDF.filter($"id" === 1).select($"x").head().getString(0)
    assert(re == "Znn")
    // startswith stays literal; len composes in predicates
    assert(people.filter("name.str.startswith('a')").countRows() == 1)
    assert(people.filter("name.str.len() == 3").countRows() == 5)
    // case=False: regex and literal paths; kwarg order-insensitive
    assert(people.filter("name.str.contains('A|B', case=False)")
      .countRows() == 4)
    assert(people
      .filter("name.str.contains('ANN', regex=False, case=False)")
      .countRows() == 1)
    assert(people.filter("name.str.startswith('A', case=False)")
      .countRows() == 1)
    // nested call in an argument still matches the accessor rewrite
    val nested = people
      .selectExpression("x = name.str.replace(concat('a', 'n'), 'Z')")
      .toDF.filter($"id" === 1).select($"x").head().getString(0)
    assert(nested == "Zn")
    // case=False on the regex replace path prepends (?i): 'ann' → 'Z'
    val ciRep = people
      .selectExpression("x = name.str.replace('ANN', 'Z', regex=True, case=False)")
      .toDF.filter($"id" === 1).select($"x").head().getString(0)
    assert(ciRep == "Z")
    // slice → substring (0-based → 1-based), 1-arg form runs to end
    assert(people.selectExpression("x = name.str.slice(0, 2)")
      .toDF.filter($"id" === 1).select($"x").head().getString(0) == "an")
    assert(people.selectExpression("x = name.str.slice(1)")
      .toDF.filter($"id" === 1).select($"x").head().getString(0) == "nn")
    // split on a (regex) pattern
    assert(people.selectExpression("x = city.str.split('i')")
      .toDF.filter($"id" === 1).select($"x").head().getSeq[String](0)
      == Seq("r", "o"))
    // extract: group 1, NULL (pandas NaN) when the pattern misses
    val ext = people.selectExpression("x = name.str.extract('a(n+)')").toDF
    assert(ext.filter($"id" === 1).select($"x").head().getString(0) == "nn")
    assert(ext.filter($"id" === 2).select($"x").head().isNullAt(0))
    // pad/zfill never truncate; side/fillchar kwargs resolve through
    // the literal mask; get is NULL out of range
    def s1(expr: String): org.apache.spark.sql.Row =
      people.selectExpression(s"x = $expr").toDF
        .filter($"id" === 1).select($"x").head()
    assert(s1("name.str.pad(5)").getString(0) == "  ann")
    assert(s1("name.str.pad(5, side='right', fillchar='_')")
      .getString(0) == "ann__")
    assert(s1("name.str.pad(2)").getString(0) == "ann") // no truncation
    assert(s1("name.str.zfill(5)").getString(0) == "00ann")
    assert(s1("name.str.get(1)").getString(0) == "n")
    assert(s1("name.str.get(9)").isNullAt(0))
  }

  test("pandas-eval dialect: in / not in lists and @list params") {
    assert(people.filter("age in [20, 40]").countRows() == 3)
    // pandas semantics, not SQL 3VL: NULL ages are KEPT by `not in`
    // (ages 20, null, 40, 40, null → 20 + the two nulls = 3)
    assert(people.filter("age not in [40]").countRows() == 3)
    assert(people.filter("city in ['rio']").countRows() == 2)
    assert(people.filter("age in @ages",
      Map("ages" -> Seq(20, 40))).countRows() == 3)
    assert(people.filter("city in @cities",
      Map("cities" -> Seq("rio", "oslo"))).countRows() == 4)
    assert(people.filter("age not in @ages",
      Map("ages" -> Seq(40))).countRows() == 3)
    // empty lists fold to constants (pandas: all-false / all-true),
    // inline and via @var, instead of the `IN ()` parse error
    assert(people.filter("age in []").countRows() == 0)
    assert(people.filter("age not in []").countRows() == 5)
    assert(people.filter("age in @xs", Map("xs" -> Seq.empty[Int]))
      .countRows() == 0)
    assert(people.filter("age not in @xs", Map("xs" -> Seq.empty[Int]))
      .countRows() == 5)
    // accessor left operands rewrite before the in-list rewrite, so
    // the null-guard references the translated call
    assert(people.filter("name.str.len() not in [3]").countRows() == 0)
  }

  test("pandas-eval dialect: isnull/notnull and .dt accessors") {
    assert(people.filter("age.isnull()").countRows() == 2)
    assert(people.filter("age.notnull()").countRows() == 3)
    assert(people.filter("city.isna() or age.notna()").countRows() == 3)
    val ev = DDF(Seq(
      (1, java.sql.Timestamp.valueOf("2024-03-15 10:30:00")),
      (2, java.sql.Timestamp.valueOf("2023-11-02 23:05:09"))
    ).toDF("id", "ts"))
    assert(ev.filter("ts.dt.year == 2024").countRows() == 1)
    assert(ev.filter("ts.dt.month == 11 and ts.dt.hour == 23")
      .countRows() == 1)
    val y = ev.selectExpression("y = ts.dt.year").toDF
      .filter($"id" === 2).select($"y").head().getInt(0)
    assert(y == 2023)
    // pandas numbering Monday=0..Sunday=6 (Spark weekday(), NOT SQL
    // dayofweek()'s Sunday=1): 2024-03-15 is a Friday → 4,
    // 2023-11-02 is a Thursday → 3; .dt.weekday is the pandas alias
    assert(ev.filter("ts.dt.dayofweek == 4").countRows() == 1)
    assert(ev.filter("ts.dt.weekday == 3").countRows() == 1)
  }

  test("pandas-eval dialect: @var params inline as SQL literals") {
    val r = people.filter("age == @target and city == @town",
      Map("target" -> 40, "town" -> "oslo"))
    assert(r.countRows() == 1)
    // '@' inside a string literal is untouched; unknown @name throws
    assert(people.filter("city != '@town'").countRows() == 4)
    intercept[IllegalArgumentException] {
      people.filter("age == @missing", Map.empty)
    }
  }

  test("fillna VALUE / MEAN / MEDIAN / MODE") {
    val v = people.fillna(Seq("age"), FillWithValue, 0L)
    assert(v.toDF.agg(sum($"age")).head().getLong(0) == 100L)
    val mean = people.fillna(Seq("age"), FillWithMean)
    // mean of (20,40,40) = 100/3
    val got = mean.toDF.filter($"id" === 2).select($"age").head().getDouble(0)
    assert(math.abs(got - 100.0 / 3) < 1e-9)
    val med = people.fillna(Seq("age"), FillWithMedian)
    assert(med.toDF.filter($"id" === 2).select($"age").head().getDouble(0) == 40.0)
    // the 100 TB option: approx_percentile sketch instead of the
    // sort-based exact median — same fill on this data
    val medA = people.fillna(Seq("age"), FillWithMedian, approxMedian = true)
    assert(medA.toDF.filter($"id" === 2).select($"age").head().getDouble(0) == 40.0)
    val mode = people.fillna(Seq("city"), FillWithMode)
    val filled = mode.toDF.filter($"id" === 3).select($"city").head().getString(0)
    assert(Set("rio", "oslo").contains(filled)) // bimodal: either is valid
  }

  test("dropna rows: any / all / thresh") {
    assert(people.dropna(Seq("age", "city"), "any").countRows() == 2)
    assert(people.dropna(Seq("age", "city"), "all").countRows() == 5)
    // thresh = keep rows with >= 1 non-null among (age, city)
    assert(people.dropna(Seq("age", "city"), thresh = 1).countRows() == 5)
    assert(people.dropna(Seq("age", "city"), thresh = 2).countRows() == 2)
  }

  test("dropna column mode drops columns containing nulls") {
    val r = people.dropna(removeColumns = true)
    assert(r.columns == Seq("id", "name"))
  }

  test("replace on subset") {
    val r = people.replace(Map("rio" -> "lima"), Seq("city"))
    assert(r.toDF.filter($"city" === "lima").count() == 2)
    // null untouched
    assert(r.toDF.filter($"city".isNull).count() == 1)
  }

  test("groupBy null keys form their own group (SQL, not pandas)") {
    val g = people.groupBy(Seq("city")).agg(("n", "count", "*"))
    assert(g.countRows() == 3)
    assert(g.toDF.filter($"city".isNull).select($"n").head().getLong(0) == 1)
  }

  test("groupBy agg functions incl list/set are sorted") {
    val g = people.groupBy(Seq("city"))
      .agg(("ages", "list", "age"), ("aset", "set", "age"))
      .toDF.filter($"city" === "oslo").select($"ages", $"aset").head()
    assert(g.getSeq[Int](0) == Seq(40)) // null dropped by collect_list
    assert(g.getSeq[Int](1) == Seq(40))
  }

  test("distinct keep=first/last via orderCols") {
    val d = DDF(Seq((1, "a"), (2, "a"), (3, "b")).toDF("id", "k"))
    val first = d.distinct(Seq("k"), "first", Seq("id")).toDF
      .orderBy($"k").collect().map(_.getInt(0)).toSeq
    assert(first == Seq(1, 3))
    val last = d.distinct(Seq("k"), "last", Seq("id")).toDF
      .orderBy($"k").collect().map(_.getInt(0)).toSeq
    assert(last == Seq(2, 3))
  }

  test("join: suffix disambiguation, modes, empty side") {
    val l = DDF(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "x"))
    val r = DDF(Seq((2, "B"), (3, "C"), (4, "D")).toDF("kk", "x"))
    val inner = l.join(r, Seq("k"), Seq("kk"))
    assert(inner.columns.toSet == Set("k", "kk", "x_l", "x_r"))
    assert(inner.countRows() == 2)
    val left = l.join(r, Seq("k"), Seq("kk"), "left")
    assert(left.countRows() == 3)
    assert(left.toDF.filter($"k" === 1 && $"x_r".isNull).count() == 1)
    val right = l.join(r, Seq("k"), Seq("kk"), "right")
    assert(right.countRows() == 3)
    val full = l.join(r, Seq("k"), Seq("kk"), "full")
    assert(full.countRows() == 4)
    // same-named keys collapse to one column
    val r2 = DDF(Seq((2, 9.0)).toDF("k", "w"))
    val same = l.join(r2, Seq("k"), Seq("k"))
    assert(same.columns.count(_ == "k") == 1 && same.countRows() == 1)
    // empty side
    val empty = DDF(Seq.empty[(Int, String)].toDF("kk", "x"))
    assert(l.join(empty, Seq("k"), Seq("kk")).countRows() == 0)
    assert(l.join(empty, Seq("k"), Seq("kk"), "left").countRows() == 3)
  }

  test("right/full join with identical key names keeps unmatched keys") {
    val l = DDF(Seq((1, "a"), (2, "b")).toDF("k", "lv"))
    val r = DDF(Seq((2, "x"), (3, "y")).toDF("k", "rv"))
    val right = l.join(r, Seq("k"), Seq("k"), "right").toDF
    assert(right.columns.count(_ == "k") == 1)
    // unmatched right row (k=3) must keep its key, not null it out
    assert(right.orderBy($"k").collect().map(_.getInt(0)).toSeq ==
      Seq(2, 3))
    assert(right.filter($"k" === 3 && $"lv".isNull && $"rv" === "y")
      .count() == 1)
    val full = l.join(r, Seq("k"), Seq("k"), "full").toDF
    assert(full.orderBy($"k").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 2, 3))
    // inner/left keep prior semantics: left key wins
    val inner = l.join(r, Seq("k"), Seq("k"), "inner").toDF
    assert(inner.columns.count(_ == "k") == 1 && inner.count() == 1)
  }

  test("semi and anti joins") {
    val l = DDF(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "x"))
    val r = DDF(Seq((2, "z"), (3, "z")).toDF("k", "z"))
    assert(l.semiJoin(r, Seq("k")).countRows() == 2)
    assert(l.antiJoin(r, Seq("k")).countRows() == 1)
    assert(l.semiJoin(r, Seq("k")).columns == Seq("k", "x"))
  }

  test("multiset intersect_all / except_all arithmetic") {
    val a = DDF(Seq("x", "x", "x", "y", "y", "z").toDF("v"))
    val b = DDF(Seq("x", "x", "y", "w").toDF("v"))
    assert(a.intersectAll(b).countRows() == 3) // 2x + 1y
    assert(a.exceptAll(b).countRows() == 3)    // 1x + 1y + 1z
    assert(a.intersect(b).countRows() == 2)    // {x, y}
    assert(a.subtract(b).countRows() == 1)     // {z}
  }

  test("union is positional, unionByName aligns") {
    val a = DDF(Seq((1, "a")).toDF("id", "v"))
    val bSwapped = DDF(Seq(("b", 2)).toDF("v", "id"))
    assert(a.unionByName(bSwapped).toDF.orderBy($"id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("addColumn zips by row position with suffixes") {
    val a = DDF(Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v")
      .repartition(2).sortWithinPartitions($"id"))
    val b = DDF(Seq(10.0, 20.0, 30.0).toDF("w").coalesce(1))
    val sortedA = a.sort(Seq("id"))
    val z = sortedA.addColumn(b).toDF.orderBy($"id").collect()
    assert(z.length == 3)
    assert(z.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // clash suffixes
    val c = DDF(Seq(7).toDF("id"))
    val zz = DDF(Seq(8).toDF("id")).addColumn(c)
    assert(zz.columns.toSet == Set("id_l", "id_r"))
  }

  test("sample / split / take invariants") {
    val d = DDF(spark.range(1000).toDF("id"))
    val s = d.sample(0.1, seed = 7)
    assert(s.countRows() > 20 && s.countRows() < 250)
    val n = d.sampleN(17, seed = 7)
    assert(n.countRows() == 17)
    val (tr, te) = d.split(0.8, seed = 7)
    assert(tr.countRows() + te.countRows() == 1000)
    assert(d.take(5).countRows() == 5)
  }

  test("repartition family preserves content") {
    val d = DDF(spark.range(100).toDF("id"))
    assert(d.hashPartition(Seq("id"), 8).countRows() == 100)
    assert(d.hashPartition(Seq("id"), 8).numOfPartitions() == 8)
    assert(d.rangePartition(Seq("id"), 5).countRows() == 100)
    assert(d.repartition(3).numOfPartitions() == 3)
    assert(d.coalesce(1).numOfPartitions() == 1)
  }

  test("describeNumeric / freqItems / crossTab") {
    val d = DDF(Seq(1.0, 2.0, 3.0, 4.0).toDF("x"))
    val desc = d.describeNumeric(Seq("x")).toDF.head()
    assert(desc.getString(0) == "x" && desc.getLong(1) == 4L)
    assert(desc.getDouble(2) == 2.5)
    val f = DDF(Seq("a", "a", "a", "b").toDF("v")).freqItems("v", 0.5)
    assert(f.toDF.collect().map(_.getString(0)).toSeq == Seq("a"))
    val ct = DDF(Seq(("r", "x"), ("r", "y"), ("s", "x")).toDF("a", "b"))
      .crossTab("a", "b")
    assert(ct.countRows() == 2)
  }

  test("correlation / covariance") {
    val d = DDF(Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y"))
    assert(math.abs(d.correlation("x", "y") - 1.0) < 1e-12)
    assert(math.abs(d.covariance("x", "y") - 2.0) < 1e-12)
  }

  test("approx_count_distinct within 3 sigma of exact (default rsd 5%)") {
    val d = DDF(spark.range(20000).select(($"id" % 3731).as("k")))
    val row = d.groupBy(Nil).agg(
      ("exact", "count_distinct", "k"),
      ("approx", "approx_count_distinct", "k")).toDF.head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("explode flattens list column") {
    val d = DDF(Seq((1, Seq("a", "b")), (2, Seq("c"))).toDF("id", "xs"))
    assert(d.explodeCol("xs").countRows() == 3)
  }

  test("pivot: wide-format conditional aggregation, absent cell = null") {
    val d = DDF(Seq(("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0),
      ("a", "x", 4.0)).toDF("k", "p", "v"))
    val wide = d.groupBy(Seq("k")).pivot("p", Seq("x", "y"))(
      ("s", "sum", "v")).toDF
    assert(wide.columns.toSeq == Seq("k", "x", "y"))
    val rows = wide.collect().map(r =>
      r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(rows("a") == (Some(5.0), Some(2.0)))
    assert(rows("b") == (Some(3.0), None)) // (b, y) never occurs
    // inferred-values path finds the same columns
    assert(d.groupBy(Seq("k")).pivot("p")(("s", "sum", "v"))
      .columns.toSet == Set("k", "x", "y"))
  }

  test("iqrFilterApprox: sketch fences agree with exact on few values") {
    // few distinct values per group -> the sketch is exact-rank, so
    // nearest-element quartiles give the same keep/drop verdicts as
    // the interpolated exact path on this fixture's clear outlier
    val d = DDF(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 2.0),
      ("b", 10.0), ("b", 10.0), ("b", 11.0), ("b", 9.0), ("b", 1000.0))
      .toDF("k", "v"))
    val exact = d.iqrFilter("v", by = Seq("k"), k = 1.5).toDF
      .collect().map(r => (r.getString(0), r.getDouble(1))).sorted
    val approx = d.iqrFilterApprox("v", by = Seq("k"), k = 1.5).toDF
      .collect().map(r => (r.getString(0), r.getDouble(1))).sorted
    assert(approx === exact)
    assert(!approx.contains(("b", 1000.0)))
  }

  test("grouped stats with empty by: whole-frame one-row broadcast") {
    val d = DDF(Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(Tuple1(_)).toDF("v"))
    val z = d.zscore("v").toDF.select($"v", $"zscore").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(z(3.0)) < 1e-9) // mean 3
    assert(math.abs(z(5.0) - 2.0 / math.sqrt(2.5)) < 1e-9)
    assert(d.iqrFilter("v").countRows() == 5)
    val w = d.winsorize("v", pLo = 0.25, pHi = 0.75, out = "w").toDF
      .select($"w").collect().map(_.getDouble(0)).sorted
    assert(w === Array(2.0, 2.0, 3.0, 4.0, 4.0))
  }

  test("zscore and iqrFilter: per-group window statistics") {
    val d = DDF(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 10.0), ("b", 1000.0)).toDF("k", "v"))
    val z = d.zscore("v", by = Seq("k")).toDF
      .filter($"k" === "a").select($"v", $"zscore").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(z(1.0) + 1.0) < 1e-9) // mean 2, stddev 1
    assert(math.abs(z(2.0)) < 1e-9)
    assert(math.abs(z(3.0) - 1.0) < 1e-9)
    // group a: symmetric, nothing trimmed; group b: quartiles of
    // [10,10,1000]: q1=10 q3=505 iqr=495 -> hi fence 1247.5, all kept
    assert(d.iqrFilter("v", by = Seq("k")).countRows() == 6)
    // tighter k trims the 1000 outlier
    assert(d.iqrFilter("v", by = Seq("k"), k = 0.5).countRows() == 5)
    // winsorize CLIPS instead of dropping: row count intact, the
    // group-b outlier lands on the p75 of [10,10,1000] = 505
    val wz = d.winsorize("v", by = Seq("k"), pLo = 0.25, pHi = 0.75,
      out = "w").toDF
    assert(wz.count() == 6)
    val bw = wz.filter($"k" === "b").select($"w")
      .collect().map(_.getDouble(0)).sorted
    assert(bw === Array(10.0, 10.0, 505.0))
    // in-place default: the value column itself is replaced
    val ip = d.winsorize("v", by = Seq("k"), pLo = 0.25, pHi = 0.75)
      .toDF.filter($"k" === "b").select($"v")
      .collect().map(_.getDouble(0)).max
    assert(ip == 505.0)
    // approx scale path: same count, bands are REAL group elements
    // (nearest-rank, not interpolated), so the b-outlier clips to an
    // actual value of the group and a/b stay within group ranges
    val ap = d.winsorizeApprox("v", by = Seq("k"), pLo = 0.25,
      pHi = 0.75, out = "w").toDF
    assert(ap.count() == 6)
    val apB = ap.filter($"k" === "b").select($"w")
      .collect().map(_.getDouble(0))
    assert(apB.forall(w => w >= 10.0 && w <= 1000.0))
    assert(apB.forall(w => Set(10.0, 1000.0).contains(w)))
  }

  test("ntileBucket: equal-size buckets, earlier buckets one larger") {
    val d = DDF(Seq(10, 20, 30, 40, 50, 60, 70).map(v => Tuple1(v))
      .toDF("v"))
    val got = d.ntileBucket("v", 4).toDF.collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == Map(10 -> 1, 20 -> 1, 30 -> 2, 40 -> 2, 50 -> 3,
      60 -> 3, 70 -> 4))
    // partitioned: each group gets its own quantile edges
    val g = DDF(Seq(("a", 1), ("a", 2), ("b", 100), ("b", 200))
      .toDF("k", "v"))
    val parts = g.ntileBucket("v", 2, partitionBy = Seq("k")).toDF
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(parts == Map(("a", 1) -> 1, ("a", 2) -> 2,
      ("b", 100) -> 1, ("b", 200) -> 2))
  }

  test("ntileGlobal equals the global ntile window, row for row") {
    import org.apache.spark.sql.expressions.Window
    // 2k rows, many duplicate values, unique tie-break id — the range
    // path's global rank must reproduce the one-task window exactly
    val base = (1 to 2000).map(i => (i.toLong, (i * 31) % 97))
      .toDF("id", "v").repartition(7)
    Seq(3, 8, 11).foreach { k =>
      val got = DDF(base).ntileGlobal("v", k, out = "b",
        tieCols = Seq("id")).toDF
      val w = Window.orderBy($"v".asc, $"id".asc)
      val want = base.withColumn("b", ntile(k).over(w))
      assert(got.count() == 2000)
      assert(got.exceptAll(want).count() == 0, s"k=$k diverged")
      assert(want.exceptAll(got).count() == 0, s"k=$k diverged")
    }
    // n < k: every row its own bucket (SQL ntile degenerate case)
    val tiny = DDF((1 to 3).map(i => (i.toLong, i)).toDF("id", "v"))
      .ntileGlobal("v", 5, out = "b", tieCols = Seq("id")).toDF
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(tiny == Map(1 -> 1, 2 -> 2, 3 -> 3))
  }

  test("pNN aggregates reject out-of-range or zero-padded suffixes") {
    val d = DDF(Seq(("a", 1.0)).toDF("k", "v"))
    for (bad <- Seq("p150", "p007", "p101", "p00", "p01"))
      withClue(bad) {
        val e = intercept[IllegalArgumentException] {
          d.groupBy(Seq("k")).agg(("x", bad, "v"))
        }
        assert(e.getMessage.contains("p0..p100"))
      }
  }

  test("pNN aggregates: exact linear-interpolation percentiles") {
    val d = DDF(Seq(("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 10.0))
      .toDF("k", "v"))
    val r = d.groupBy(Seq("k")).agg(
      ("p50", "p50", "v"), ("p25", "p25", "v"), ("p100", "p100", "v"))
      .toDF.collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2),
        x.getDouble(3))).toMap
    assert(r("a") == ((2.0, 1.5, 4.0))) // (n-1)*q interpolation on [1,2,4]
    assert(r("b") == ((10.0, 10.0, 10.0)))
    intercept[RuntimeException] {
      graft.ddf.GroupedDDF.aggExpr("pxx", "v")
    }
  }

  test("apNN aggregates: sketch percentiles track the exact pNN") {
    // at accuracy 10000 on small groups the sketch returns an exact
    // member of the group (approx_percentile picks a real value, so
    // it brackets the interpolated pNN within one element)
    val li = DDF(spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_returnflag".as("k"), $"l_quantity".as("v")))
    val r = li.groupBy(Seq("k")).agg(
      ("ap", "ap50", "v"), ("ex", "p50", "v"),
      ("lo", "p25", "v"), ("hi", "p75", "v"))
      .toDF.collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (ap, lo, hi) = (x.getDouble(1), x.getDouble(3), x.getDouble(4))
      assert(ap >= lo && ap <= hi,
        s"ap50 $ap outside the exact p25..p75 band [$lo, $hi]")
    }
    intercept[RuntimeException] {
      graft.ddf.GroupedDDF.aggExpr("ap05", "v")
    }
  }

  test("fluent pipeline delegates equal the direct operator calls") {
    import graft.functions.{TextFunctions => TF}
    import graft.operators.{Budget, Dedup}
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("quality", TF.qualityScore($"text"))
      .withColumn("n_tok", TF.tokenCount($"text"))
    val evalSet = raw.filter($"doc_id" % 97 === 0)
    val fluent = DDF(raw).filter("quality >= 0.5")
      .dedupExact(Seq("text"), "doc_id")
      .decontaminate(DDF(evalSet), "doc_id", "text", minOverlap = 2)
      .capPerGroup(Seq("source"), "doc_id", 20)
      .tokenBudget("lang", "doc_id", "quality", "n_tok", 5000L)
      .packSequences("lang", "doc_id", "n_tok", 2048L)
      .toDF.select($"doc_id", $"bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val direct = Budget.packSequences(
        Budget.tokenBudgetSelect(
          Budget.capPerGroup(
            Dedup.decontaminate(
              Dedup.exact(raw.filter($"quality" >= 0.5),
                Seq("text"), "doc_id"),
              evalSet, "doc_id", "text", minOverlap = 2),
            Seq("source"), "doc_id", 20),
          "lang", "doc_id", "quality", "n_tok", 5000L),
        "lang", "doc_id", "n_tok", 2048L)
      .select($"doc_id", $"bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(fluent == direct && fluent.nonEmpty)
    // incremental-screen delegates (r6) equal the operator calls
    val batch = raw.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 500000).as("doc_id"), $"text")
    val hist = raw.select($"doc_id", $"text")
    assert(DDF(batch).dedupExactAgainst(DDF(hist), Seq("text"))
      .toDF.collect().map(_.getLong(0)).toSet ==
      Dedup.exactAgainst(batch, hist, Seq("text"))
        .collect().map(_.getLong(0)).toSet)
    assert(DDF(batch).dedupPairsAgainst(DDF(hist), "doc_id", "text",
        threshold = 0.6).toDF.count() ==
      Dedup.minhashPairsAgainst(batch, hist, "doc_id", "text",
        threshold = 0.6).count())
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val embBatch = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 10000).as("vec_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    assert(DDF(embBatch).dedupEmbeddingPairsAgainst(DDF(emb), "vec_id",
        "embedding", dim = 64).toDF.count() ==
      Dedup.embeddingPairsAgainst(embBatch, emb, "vec_id", "embedding",
        dim = 64).count())
  }

  test("retrieval/join delegates equal the direct operator calls") {
    import graft.operators.{Dedup, RangeJoin, Search}
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val evalSet = docs.filter($"doc_id" % 97 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(DDF(docs).searchBm25("doc_id", "text", "dup spark", 5).toDF)
      == rows(Search.bm25(docs, "doc_id", "text", "dup spark", 5)))
    val qs = Seq((1L, "dup"), (2L, "vector")).toDF("qid", "qtext")
    assert(rows(DDF(docs)
        .searchBm25Batch("doc_id", "text", DDF(qs), "qid", "qtext", 3).toDF)
      == rows(Search.bm25Batch(docs, "doc_id", "text", qs, "qid", "qtext", 3)))
    assert(rows(DDF(docs)
        .decontaminateBloom(DDF(evalSet), "doc_id", "text", minOverlap = 2)
        .toDF)
      == rows(Dedup.decontaminateBloom(docs, evalSet, "doc_id", "text",
        minOverlap = 2)))
    val pts = docs.select($"doc_id", $"n_chars")
    val ivs = Seq((1L, 100L, 200L), (2L, 150L, 400L))
      .toDF("iid", "lo", "hi")
    assert(rows(DDF(pts).rangeJoin("n_chars", DDF(ivs), "lo", "hi").toDF)
      == rows(RangeJoin.pointInInterval(pts, "n_chars", ivs, "lo", "hi")))
    val wts = Seq(("spark", 1.0), ("dup", -2.0)).toDF("token", "weight")
    assert(rows(DDF(docs).classifyText("doc_id", "text", DDF(wts), 0.2).toDF)
      == rows(graft.operators.Classifier
        .linearTextScore(docs, "doc_id", "text", wts, 0.2)))
    // r10 delegates
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), $"text", $"embedding")
    val hq = corpus.filter($"doc_id" < 3)
      .select($"doc_id".as("qid"), $"text".as("qtext"),
        $"embedding".as("qvec"))
    assert(rows(DDF(corpus).searchHybridRrf("doc_id", "text",
        "embedding", DDF(hq), "qid", "qtext", "qvec", k = 3,
        kEach = 5).toDF)
      == rows(Search.hybridRrf(corpus, "doc_id", "text", "embedding",
        hq, "qid", "qtext", "qvec", 3, kEach = 5)))
    assert(rows(DDF(docs).containmentPairs("doc_id", "text",
        threshold = 0.9).toDF)
      == rows(Dedup.containmentPairs(docs, "doc_id", "text",
        threshold = 0.9)))
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    assert(rows(DDF(edges).labelPropagation("src", "dst", 2).toDF)
      == rows(graft.operators.LabelProp
        .labelPropagation(edges, "src", "dst", 2)))
    val vocab = Seq("the", "a", "##s").toDF("piece")
    assert(rows(DDF(docs).wordpieceEncode("text", DDF(vocab))
        .toDF.select($"doc_id", $"wp_tokens"))
      == rows(graft.operators.WordPiece.encode(docs, "text", vocab)
        .select($"doc_id", $"wp_tokens")))
    // r10 second-half delegates
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00")))
      .toDF("uid", "t")
    assert(rows(DDF(ev).sessionize("uid", "t", 1800L).toDF)
      == rows(graft.operators.EventAnalytics.sessions(ev, "uid", "t",
        1800L)))
    val log = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "A"),
      (1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "B"))
      .toDF("k", "t", "a")
    assert(rows(DDF(log).scd2("k", "t", Seq("a")).toDF)
      == rows(graft.operators.Scd.scd2(log, "k", "t", Seq("a"))))
    assert(rows(DDF(log).scd2("k", "t", Seq("a"))
        .snapshotAt(lit(java.sql.Timestamp.valueOf(
          "2024-01-01 12:00:00"))).toDF)
      == rows(graft.operators.Scd.snapshotAt(
        graft.operators.Scd.scd2(log, "k", "t", Seq("a")),
        lit(java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))))
    val tedges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    assert(rows(DDF(tedges).triangleCensus("src", "dst").toDF)
      == rows(graft.operators.GraphMetrics
        .clusteringCoefficients(tedges, "src", "dst")))
    val keyed = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
    assert(rows(DDF(keyed).sortedNeighborPairs("id", "k", 3).toDF)
      == rows(graft.operators.Blocking.sortedNeighborPairs(keyed,
        "id", "k", 3)))
    val vals = Seq("x", "y", "x").toDF("v")
    assert(rows(DDF(vals).cmsEstimate(
        DDF(vals).cmsSketch("v", 2, 16), "v", 2, 16).toDF)
      == rows(graft.operators.CountMin.estimate(
        graft.operators.CountMin.sketch(vals, "v", 2, 16),
        vals, "v", 2, 16)))
    assert(rows(DDF(tedges).kCore("src", "dst", 2).toDF)
      == rows(graft.operators.GraphMetrics.kCore(tedges, "src",
        "dst", 2)))
    val nums = Seq(123.0, 45.0, 6.0).toDF("v")
    assert(rows(DDF(nums).benford("v").toDF)
      == rows(graft.operators.AbTest.benford(nums, "v")))
    assert(rows(DDF(nums).histogram("v", 3).toDF)
      == rows(graft.operators.Profile.histogram(nums, "v", 3)))
    val mix = Seq((1L, "en", 10L), (2L, "en", 10L), (3L, "de", 10L))
      .toDF("id", "lang", "tok")
    assert(rows(DDF(mix).remixToTarget("lang", "id", "tok",
        Map("en" -> 0.5, "de" -> 0.5)).toDF)
      == rows(graft.operators.Budget.remixToTarget(mix, "lang", "id",
        "tok", Map("en" -> 0.5, "de" -> 0.5))))
    val ref = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val bat = Seq((2L, "a b c x")).toDF("doc_id", "text")
    assert(rows(DDF(bat).noveltyScore("doc_id", "text", DDF(ref)).toDF)
      == rows(graft.operators.Dedup.noveltyScore(bat, "doc_id",
        "text", ref)))
    // r11 wrappers delegate verbatim
    val ts = Seq(("k", 1, 10.0), ("k", 2, 12.0), ("k", 3, 40.0))
      .toDF("g", "t", "v")
    assert(rows(DDF(ts).rollingZscore(Seq("g"), Seq("t"), "v", 2).toDF)
      == rows(graft.operators.TimeSeries.rollingZscore(ts, Seq("g"),
        Seq("t"), "v", 2)))
    assert(rows(DDF(ts).ewma(Seq("g"), Seq("t"), "v", 0.5, 3).toDF)
      == rows(graft.operators.TimeSeries.ewma(ts, Seq("g"), Seq("t"),
        "v", 0.5, 3)))
    assert(rows(DDF(ts).cusum(Seq("g"), Seq("t"), "v", 10, 0, 5).toDF)
      == rows(graft.operators.TimeSeries.cusum(ts, Seq("g"), Seq("t"),
        "v", 10, 0, 5)))
    import graft.operators.Expect
    assert(rows(DDF(ts).expect(Seq(Expect.NotNull("g"),
        Expect.InRange("v", 0, 100))).toDF)
      == rows(Expect.check(ts, Seq(Expect.NotNull("g"),
        Expect.InRange("v", 0, 100)))))
    assert(rows(DDF(ts).joinCardinality(DDF(ts), Seq("g"), Seq("g")).toDF)
      == rows(graft.operators.Profile.joinCardinality(ts, ts,
        Seq("g"), Seq("g"))))
    val txt = Seq((1L, "a b a b")).toDF("doc_id", "text")
    assert(rows(DDF(txt).zipfFit("doc_id", "text").toDF)
      == rows(graft.operators.Vocabulary.zipfFit(txt, "doc_id", "text")))
    assert(rows(DDF(txt).collocations("doc_id", "text", 1L).toDF)
      == rows(graft.operators.Vocabulary.collocations(txt, "doc_id",
        "text", 1L)))
    val cat = Seq(("en", "web"), ("de", "web"), ("en", "book"))
      .toDF("lang", "src")
    assert(rows(DDF(cat).entropy("lang").toDF)
      == rows(graft.operators.Profile.entropy(cat, "lang")))
    assert(rows(DDF(cat).mutualInformation("lang", "src").toDF)
      == rows(graft.operators.Profile.mutualInformation(cat, "lang",
        "src")))
    val sc = Seq((0.9, true), (0.2, false)).toDF("s", "y")
    assert(rows(DDF(sc).rocAuc("s", "y").toDF)
      == rows(graft.operators.Classifier.rocAuc(sc, "s", "y")))
    assert(rows(DDF(sc).calibration("s", "y", 4).toDF)
      == rows(graft.operators.Classifier.calibration(sc, "s", "y", 4)))
    def t0(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev2 = Seq((1L, t0(0), 1L, "click", 0.0),
      (1L, t0(5), 2L, "purchase", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    assert(rows(DDF(ev2).attribution("user_id", "ts", "event_id",
        "event_type", "purchase", Seq("click"), 10L).toDF)
      == rows(graft.operators.EventAnalytics.attribution(ev2, "user_id",
        "ts", "event_id", "event_type", "purchase", Seq("click"), 10L)))
    assert(rows(DDF(ev2).stationaryDistribution("user_id", "ts",
        "event_type", 3).toDF)
      == rows(graft.operators.EventAnalytics.stationaryDistribution(ev2,
        "user_id", "ts", "event_type", 3)))
    assert(rows(DDF(tedges).linkPrediction("src", "dst").toDF)
      == rows(graft.operators.GraphMetrics.linkPrediction(tedges,
        "src", "dst")))
  }

  test("gopherFlags and gopherRepetition fluent faces delegate " +
    "to the operators (r15)") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val docs = Seq((1L, (1 to 60).map(i => f"w$i%02d").mkString(" ")),
      (2L, "a b a b a b a b a b a b")).toDF("doc_id", "text")
    val flagged = DDF(docs).gopherFlags("text").toDF
    assert(flagged.columns.contains("gopher"))
    assert(rows(flagged.select($"doc_id", $"gopher"))
      == rows(docs.select($"doc_id",
        graft.functions.TextFunctions.gopherFlags($"text").as("gopher"))))
    val rep = DDF(docs).gopherRepetition("doc_id", "text").toDF
    assert(rep.columns.contains("rep_pass") && rep.count() == 2)
    // doc 2 is one repeated bigram — every repetition rule trips
    assert(!rep.filter($"doc_id" === 2).head().getAs[Boolean]("rep_pass"))
    assert(rep.filter($"doc_id" === 1).head().getAs[Boolean]("rep_pass"))
  }

  test("c4Clean and dropCommonLines fluent faces delegate to the " +
    "operators (r15)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A good first sentence with words.\nshort.\ncommon footer line"),
      (2L, "Another good sentence with many words.\ncommon footer line"),
      (3L, "A third good sentence with words here.\ncommon footer line")
    ).toDF("doc_id", "text")
    val c4 = DDF(docs).c4Clean("text").toDF
    assert(c4.columns.toSeq == Seq("doc_id", "text", "c4"))
    // line rules applied in place; flags derive from the ORIGINAL text
    val r1 = c4.filter($"doc_id" === 1).head()
    assert(r1.getString(1) == "A good first sentence with words.")
    val common = DDF(docs).dropCommonLines("doc_id", "text", 2L).toDF
    val m = common.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "A good first sentence with words.\nshort.")
    assert(m(2L) == "Another good sentence with many words.")
  }

  test("empty DataFrame no-ops cleanly through operators") {
    val empty = DDF(spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("id", IntegerType),
        StructField("v", StringType)))))
    assert(empty.filter("id > 0").countRows() == 0)
    assert(empty.groupBy(Seq("v")).agg(("n", "count", "*")).countRows() == 0)
    assert(empty.distinct(Seq("v")).countRows() == 0)
    assert(empty.sort(Seq("id")).countRows() == 0)
    assert(empty.fillna(Seq("v"), FillWithValue, "x").countRows() == 0)
  }
}
