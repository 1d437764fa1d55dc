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

  def registerAll(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "dot_product",
      es => DotProduct(es(0), es(1)))
    Bridge.registerFunction(spark, "cosine_sim",
      es => CosineSimilarity(es(0), es(1)))
    Bridge.registerFunction(spark, "simhash64",
      es => SimHash64(es.head))
    Bridge.registerFunction(spark, "minhash_sig",
      es => MinHashSignature(es.head,
        TextFunctions.hashCoeffs(64), TextFunctions.MersennePrime))
    Bridge.registerFunction(spark, "point_in_polygon",
      es => PointInPolygon(es(0), es(1), es(2)))
    Bridge.registerFunction(spark, "jaccard_sim",
      es => graft.expressions.TextExpressions.JaccardSim(es(0), es(1)))
    Bridge.registerFunction(spark, "word_shingles",
      es => graft.expressions.TextExpressions.WordShingles(es(0), 3))
  }
}
