package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys (SURVEY.md §4: the
  * reference's `balancer` rebalances fragment sizes; the shared-
  * nothing equivalent is key salting). AQE's skew-join split handles
  * oversized partitions after the fact; explicit salting additionally
  * splits a single hot KEY across `salt` reducers, which AQE cannot.
  *
  * left rows get a random salt in [0, salt); right rows are replicated
  * once per salt value; the join runs on (keys..., salt). Inner and
  * left joins preserve semantics exactly; right/full would need the
  * mirrored construction.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, mode: String = "inner",
                 seed: Long = 42L): DataFrame = {
    require(mode == "inner" || mode == "left" || mode == "left_outer",
      "salted join preserves semantics for inner/left modes")
    val l = left.withColumn("__salt", (rand(seed) * salt).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt", mode).drop("__salt")
  }
}
