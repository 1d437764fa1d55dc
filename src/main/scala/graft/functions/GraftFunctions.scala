package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge
import graft.expressions.VectorExpressions._
import graft.operators.Geo.PointInPolygon

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * DataFrame API — the engine behaves like a Spark extension, not just
  * a Scala library. */
object GraftFunctions {

  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.types.IntegerType

  private def arity(name: String, es: Seq[Expression],
                    lo: Int, hi: Int): Unit =
    require(es.length >= lo && es.length <= hi,
      s"$name expects $lo${if (hi != lo) s"..$hi" else ""} arguments, " +
        s"got ${es.length}")

  private def literalInt(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name: expected an integer literal, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "dot_product",
      es => { arity("dot_product", es, 2, 2); DotProduct(es(0), es(1)) })
    Bridge.registerFunction(spark, "cosine_sim",
      es => { arity("cosine_sim", es, 2, 2); CosineSimilarity(es(0), es(1)) })
    Bridge.registerFunction(spark, "simhash64",
      es => { arity("simhash64", es, 1, 1); SimHash64(es.head) })
    // minhash_sig(shingles[, k]) — k minhash slots, default 64
    Bridge.registerFunction(spark, "minhash_sig",
      es => {
        arity("minhash_sig", es, 1, 2)
        val k = if (es.length == 2) literalInt("minhash_sig", es(1)) else 64
        MinHashSignature(es.head,
          TextFunctions.hashCoeffs(k), TextFunctions.MersennePrime)
      })
    Bridge.registerFunction(spark, "point_in_polygon",
      es => { arity("point_in_polygon", es, 3, 3)
        PointInPolygon(es(0), es(1), es(2)) })
    Bridge.registerFunction(spark, "jaccard_sim",
      es => { arity("jaccard_sim", es, 2, 2)
        graft.expressions.TextExpressions.JaccardSim(es(0), es(1)) })
    // word_shingles(text[, n]) — word n-grams, default n=3
    Bridge.registerFunction(spark, "word_shingles",
      es => {
        arity("word_shingles", es, 1, 2)
        val n = if (es.length == 2) literalInt("word_shingles", es(1)) else 3
        graft.expressions.TextExpressions.WordShingles(es(0), n)
      })
    Bridge.registerFunction(spark, "hyperplane_codes",
      es => {
        arity("hyperplane_codes", es, 4, 5)
        val seed = if (es.length == 5)
          literalInt("hyperplane_codes", es(4)).toLong else 42L
        graft.expressions.VectorExpressions.HyperplaneCodes(es.head,
          literalInt("hyperplane_codes", es(1)),
          literalInt("hyperplane_codes", es(2)),
          literalInt("hyperplane_codes", es(3)), seed)
      })
  }
}
