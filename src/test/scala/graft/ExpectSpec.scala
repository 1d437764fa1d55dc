package graft

import graft.operators.Expect
import graft.operators.Expect._

class ExpectSpec extends SparkTestBase {
  import spark.implicits._

  test("every constraint type counts its violations; fused null rules") {
    val df = Seq(
      (Some(1L), Some(10.0), "A", "ok1"),
      (Some(2L), Some(99.0), "Z", "ok2"),   // range + set violations
      (None, None, "A", "bad value"),        // null id; nulls skipped
      (Some(2L), Some(20.0), "B", "ok3")     // dup id
    ).toDF("id", "qty", "flag", "txt")
    val got = Expect.check(df, Seq(
        NotNull("id"),
        Unique(Seq("id")),
        InRange("qty", 0.0, 50.0),
        InSet("flag", Seq("A", "B")),
        Matches("txt", "ok[0-9]"),
        ForeignKey("id", Seq(1L, 2L).toDF("k"), "k")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("not_null(id)") == ((1L, 4L, false)))
    // ids: 1, 2, null, 2 -> 3 distinct (null counts as a value), 1 excess
    assert(got("unique(id)") == ((1L, 4L, false)))
    // qty 99 violates; the NULL qty is skipped, not a violation
    assert(got("in_range(qty,0.0,50.0)") == ((1L, 4L, false)))
    assert(got("in_set(flag)") == ((1L, 4L, false)))
    // full-match semantics: "bad value" fails, "ok1".."ok3" pass
    assert(got("matches(txt)") == ((1L, 4L, false)))
    // FK: null key skipped; 1 and 2 both resolve
    assert(got("foreign_key(id->k)") == ((0L, 4L, true)))
  }

  test("two FKs on one column vs different refs stay distinguishable") {
    val df = Seq(1L, 2L, 3L).toDF("id")
    val refA = Seq(1L, 2L, 3L).toDF("a")
    val refB = Seq(1L, 2L).toDF("b")
    val got = Expect.check(df, Seq(
        ForeignKey("id", refA, "a"), ForeignKey("id", refB, "b")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(got.size == 2) // names must not collide
    assert(got("foreign_key(id->a)") == ((0L, true)))
    assert(got("foreign_key(id->b)") == ((1L, false)))
  }

  test("N-FK suite runs as one batched job, not one per FK") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "pid")
    val refA = Seq(1L, 2L, 3L).toDF("a")
    val refB = Seq(10L, 20L).toDF("b")
    val refC = Seq(1L).toDF("c")
    val suite = Seq(NotNull("id"), ForeignKey("id", refA, "a"),
      ForeignKey("pid", refB, "b"), ForeignKey("id", refC, "c"))
    var census: org.apache.spark.sql.DataFrame = null
    // check() runs its jobs EAGERLY inside
    val jobs = countJobs { census = Expect.check(df, suite) }
    // census is driver-local rows; this collect is job-free
    assert(census.collect().length == 4)
    // check()'s internals: 1 fused local agg + 1 batched FK union
    // (NOT 3 per-FK counts)
    assert(jobs <= 2, s"expected <=2 jobs for a 3-FK suite, saw $jobs")
  }

  test("clean table passes everything; all-FK suite still totals") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val ref = Seq(1L, 2L, 3L).toDF("k")
    val all = Expect.check(df, Seq(NotNull("id"), Unique(Seq("id", "s")),
        ForeignKey("id", ref, "k"))).collect()
    assert(all.forall(_.getBoolean(3)))
    assert(all.forall(_.getLong(2) == 2L))
    // suite of ONLY foreign keys: total comes from its own count
    val fkOnly = Expect.check(df, Seq(ForeignKey("id", ref, "k")))
      .collect().head
    assert(fkOnly.getLong(2) == 2L && fkOnly.getBoolean(3))
    intercept[IllegalArgumentException] { Expect.check(df, Nil) }
  }
}
