package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** BASELINE.md's failure contract for the bench gate: a failed query
  * scores −1, never its time-to-fail. In r8 the swallowed exception
  * recorded wall time instead, and 15 broken queries read as ~0.05 s
  * "speedups" in the artifact. */
class BenchContractSpec extends SparkTestBase {

  test("timeOne records -1 for a throwing query, not time-to-fail") {
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("deliberately broken")
    assert(Bench.timeOne(spark, "/nowhere", boom) == -1.0)
  }

  test("timeOne records -1 when the plan fails at execution, not analysis") {
    // failure inside the job, after a DataFrame was happily returned
    val lateBoom: (SparkSession, String) => DataFrame = (s, _) => {
      import s.implicits._
      Seq(1, 0).toDF("d").selectExpr("10 / d") // ANSI: divide by zero
    }
    assert(Bench.timeOne(spark, "/nowhere", lateBoom) == -1.0)
  }

  test("timeOne records a positive wall time for a working query") {
    val ok: (SparkSession, String) => DataFrame = (s, _) => {
      import s.implicits._
      Seq(1, 2, 3).toDF("x")
    }
    val dt = Bench.timeOne(spark, "/nowhere", ok)
    assert(dt > 0.0)
  }
}
