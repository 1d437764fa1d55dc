package graft

import graft.operators.Linkage
import graft.operators.Linkage.FieldSpec

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private val name = FieldSpec("name", 0.9, 0.1)  // +3.1699 / -3.1699
  private val city = FieldSpec("city", 0.8, 0.4)  // +1.0 / -0.415

  test("weights: agreement log2(m/u), disagreement log2((1-m)/(1-u))") {
    assert(math.abs(name.agreeWeight - math.log(9.0) / math.log(2.0))
      < 1e-12)
    assert(math.abs(city.agreeWeight - 1.0) < 1e-12)
    assert(math.abs(city.disagreeWeight
      - math.log(0.2 / 0.6) / math.log(2.0)) < 1e-12)
    intercept[IllegalArgumentException] { FieldSpec("x", 0.4, 0.5) }
    intercept[IllegalArgumentException] { FieldSpec("x", 1.0, 0.5) }
  }

  test("blocked pairs, score arithmetic, null = no evidence") {
    val a = Seq(
      (1L, 10, "ann", "rome"),
      (2L, 10, "bob", "oslo"),
      (3L, 20, "cat", null.asInstanceOf[String])
    ).toDF("id", "blk", "name", "city")
    val b = Seq(
      (101L, 10, "ann", "rome"),   // both agree with a1
      (102L, 10, "ann", "oslo"),   // name agrees a1, city disagrees
      (103L, 20, "cat", "lima"),   // a3's city null -> weight 0
      (104L, 30, "ann", "rome")    // different block: never paired
    ).toDF("id", "blk", "name", "city")
    val got = Linkage.linkPairs(a, "id", b, "id", Seq("blk"),
        Seq(name, city))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getDouble(3)))).toMap
    // block 10: a1,a2 x b101,b102 = 4 pairs; block 20: 1 pair; 104 none
    assert(got.size == 5)
    assert(math.abs(got((1L, 101L))._2
      - (name.agreeWeight + city.agreeWeight)) < 1e-9)
    assert(got((1L, 101L))._1 == 2)
    assert(math.abs(got((1L, 102L))._2
      - (name.agreeWeight + city.disagreeWeight)) < 1e-9)
    assert(math.abs(got((2L, 102L))._2
      - (name.disagreeWeight + city.agreeWeight)) < 1e-9)
    // null city: exactly the name weight, agreement count 1
    assert(got((3L, 103L)) == ((1, name.agreeWeight)))
    intercept[IllegalArgumentException] {
      Linkage.linkPairs(a, "id", b, "id", Nil, Seq(name))
    }
  }

  test("fuzzy fields: Jaro-Winkler agreement catches transpositions") {
    // exact equality calls 'martha'/'marhta' a DISAGREEMENT; the
    // jw >= 0.9 comparator reads it as agreement-grade evidence
    val fuzzy = FieldSpec("name", 0.9, 0.1, jwThreshold = Some(0.9))
    val a = Seq((1L, 1, "martha")).toDF("id", "blk", "name")
    val b = Seq((9L, 1, "marhta"), (8L, 1, "zzzzzz"))
      .toDF("id", "blk", "name")
    val got = Linkage.linkPairs(a, "id", b, "id", Seq("blk"),
        Seq(fuzzy))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(math.abs(got(9L) - fuzzy.agreeWeight) < 1e-9)
    assert(math.abs(got(8L) - fuzzy.disagreeWeight) < 1e-9)
    // the exact comparator on the same pair disagrees both
    val exact = Linkage.linkPairs(a, "id", b, "id", Seq("blk"),
        Seq(FieldSpec("name", 0.9, 0.1)))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(math.abs(exact(9L) - fuzzy.disagreeWeight) < 1e-9)
    intercept[IllegalArgumentException] {
      FieldSpec("name", 0.9, 0.1, jwThreshold = Some(1.5))
    }
  }

  test("classify: three-way decision on the score") {
    val a = Seq((1L, 1, "x"), (2L, 1, "y")).toDF("id", "blk", "name")
    val b = Seq((9L, 1, "x")).toDF("id", "blk", "name")
    val d = Linkage.classify(a, "id", b, "id", Seq("blk"),
        Seq(name), lower = -1.0, upper = 2.0)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(d(1L) == "link")      // +3.17 >= 2
    assert(d(2L) == "non_link")  // -3.17 < -1
    val rev = Linkage.classify(a, "id", b, "id", Seq("blk"),
        Seq(name), lower = -5.0, upper = 5.0)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(rev(1L) == "review" && rev(2L) == "review")
  }
}
