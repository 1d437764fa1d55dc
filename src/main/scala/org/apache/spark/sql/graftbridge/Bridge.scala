package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column <-> catalyst Expression bridge. Spark 4 wraps
  * Columns around ColumnNodes and gates the Expression accessors as
  * private[sql]; this shim (in an org.apache.spark.sql subpackage)
  * re-exports exactly the two conversions the engine's native
  * expressions need. No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** register a catalyst expression builder as a SQL function */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** build a DataFrame from an InternalRow RDD without the external
    * Row boxing round-trip (`df.rdd` + `createDataFrame` box every
    * column per row and re-validate the schema — measured ~2x the
    * whole positional-zip cost). The InternalRow path is what Spark's
    * own sources use; re-exported here for the one operator that
    * genuinely needs RDD row order (Zip.withRowIndex). */
  def internalCreateDataFrame(spark: SparkSession,
                              rdd: org.apache.spark.rdd.RDD[
                                org.apache.spark.sql.catalyst.InternalRow],
                              schema: org.apache.spark.sql.types.StructType)
  : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
