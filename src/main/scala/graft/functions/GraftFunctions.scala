package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * DataFrame API. Two registration paths share one builder table
  * ([[graft.GraftExtensions.builders]]):
  *
  *  - config-time: `spark.sql.extensions=graft.GraftExtensions`
  *  - runtime (already-built session): `registerAll(spark)`
  */
object GraftFunctions {

  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.types.{IntegerType, StringType}

  private[graft] def arity(name: String, es: Seq[Expression],
                           lo: Int, hi: Int): Unit =
    require(es.length >= lo && es.length <= hi,
      s"$name expects $lo${if (hi != lo) s"..$hi" else ""} arguments, " +
        s"got ${es.length}")

  private[graft] def literalInt(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name: expected an integer literal, got $other")
  }

  private[graft] def literalLong(name: String, e: Expression): Long =
    e match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
      case other => throw new IllegalArgumentException(
        s"$name: expected an integer literal, got $other")
    }

  private[graft] def literalString(name: String, e: Expression): String =
    e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType)
        if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$name: expected a string literal, got $other")
    }

  def registerAll(spark: SparkSession): Unit =
    graft.GraftExtensions.builders.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}
