package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row
  * with `right.ts <= left.ts` within the same key (DuckDB/kdb ASOF
  * LEFT JOIN semantics). Absent in both the reference and Spark's
  * builtin joins (SURVEY.md §2.3 lists it as an engine extension).
  *
  * Implementation is the single-shuffle union trick, not a range
  * join: tag both sides, union, and run one window pass per key
  * ordered by (ts, side) where right rows sort before left rows at
  * equal timestamps; `last(payload, ignoreNulls)` over the running
  * frame fills each left row with the latest preceding right payload.
  * Cost: ONE hash shuffle of |L|+|R| rows + a per-key sort — no
  * n x m candidate explosion, no broadcast requirement, AQE-skew
  * splittable; the natural 100 TB plan for event-stream enrichment.
  */
object AsOfJoin {

  /** @param payload right columns carried onto left rows (renamed
    *                `asof_<name>`); right rows missing → nulls. */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(keyCols.map(col) ++ Seq(col("__ts"), col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        payload.map(p => lit(null).cast(
          right.schema(p).dataType).as(s"asof_$p")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(keyCols.map(col) ++ Seq(col("__ts"), col("__side")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"asof_$p")): _*)
    // right sorts before left at equal ts => ties satisfy ts_r <= ts_l
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r)) { (d, p) =>
      d.withColumn(s"asof_$p", last(col(s"asof_$p"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }

  /** Forward as-of join — for each left row, the EARLIEST right row
    * with `right.ts >= left.ts` per key (the "next event after"
    * direction: next price tick, next maintenance window). Same
    * single-shuffle union trick as [[backward]], traversed in
    * descending timestamp order; right still sorts before left at
    * equal timestamps so ties satisfy `ts_r >= ts_l`. Identical
    * scale shape: one hash shuffle + per-key sort, no candidate
    * explosion. */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTs: String, rightTs: String,
              payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(keyCols.map(col) ++ Seq(col("__ts"), col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        payload.map(p => lit(null).cast(
          right.schema(p).dataType).as(s"asof_$p")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(keyCols.map(col) ++ Seq(col("__ts"), col("__side")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(p => col(p).as(s"asof_$p")): _*)
    // desc traversal: right first at equal ts => ties give ts_r >= ts_l
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r)) { (d, p) =>
      d.withColumn(s"asof_$p", last(col(s"asof_$p"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
