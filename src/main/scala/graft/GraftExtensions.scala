package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extension entry point (SURVEY.md §7 custom-operator tier —
  * `SparkSessionExtensions` registration):
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * injects every graft native SQL function into each new session at
  * build time, so the engine behaves as a first-class Spark extension
  * — no imperative `GraftFunctions.registerAll(spark)` call needed
  * (that path remains for already-built sessions; both share the same
  * builders). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}

object GraftExtensions {
  import graft.expressions.VectorExpressions._
  import graft.expressions.TextExpressions.{JaccardSim, JaroWinkler, UnicodeNormalize, WordShingles}
  import graft.functions.{GraftFunctions, TextFunctions}
  import graft.operators.Geo.PointInPolygon

  /** single source of truth for the SQL-surface builders, shared by
    * the extension injection and GraftFunctions.registerAll */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "dot_product" -> (es => { GraftFunctions.arity("dot_product", es, 2, 2)
        DotProduct(es(0), es(1)) }),
      "cosine_sim" -> (es => { GraftFunctions.arity("cosine_sim", es, 2, 2)
        CosineSimilarity(es(0), es(1)) }),
      "simhash64" -> (es => { GraftFunctions.arity("simhash64", es, 1, 1)
        SimHash64(es.head) }),
      "minhash_sig" -> (es => {
        GraftFunctions.arity("minhash_sig", es, 1, 2)
        val k = if (es.length == 2)
          GraftFunctions.literalInt("minhash_sig", es(1)) else 64
        MinHashSignature(es.head,
          TextFunctions.hashCoeffs(k), TextFunctions.MersennePrime)
      }),
      "point_in_polygon" -> (es => {
        GraftFunctions.arity("point_in_polygon", es, 3, 3)
        PointInPolygon(es(0), es(1), es(2)) }),
      "jaccard_sim" -> (es => { GraftFunctions.arity("jaccard_sim", es, 2, 2)
        JaccardSim(es(0), es(1)) }),
      "jaro_winkler" -> (es => {
        GraftFunctions.arity("jaro_winkler", es, 2, 2)
        JaroWinkler(es(0), es(1)) }),
      "unicode_normalize" -> (es => {
        GraftFunctions.arity("unicode_normalize", es, 1, 2)
        val form = if (es.length == 2)
          GraftFunctions.literalString("unicode_normalize", es(1)) else "NFC"
        UnicodeNormalize(es.head, form)
      }),
      "word_shingles" -> (es => {
        GraftFunctions.arity("word_shingles", es, 1, 2)
        val n = if (es.length == 2)
          GraftFunctions.literalInt("word_shingles", es(1)) else 3
        WordShingles(es(0), n)
      }),
      "hyperplane_codes" -> (es => {
        GraftFunctions.arity("hyperplane_codes", es, 4, 5)
        val seed = if (es.length == 5)
          GraftFunctions.literalInt("hyperplane_codes", es(4)).toLong else 42L
        HyperplaneCodes(es.head,
          GraftFunctions.literalInt("hyperplane_codes", es(1)),
          GraftFunctions.literalInt("hyperplane_codes", es(2)),
          GraftFunctions.literalInt("hyperplane_codes", es(3)), seed)
      }),
      // z_value2(x, xLo, xHi, y, yLo, yHi [, bits]) — the Morton
      // z-value ZOrder.saveZOrdered clusters on; the builder calls
      // the same catalyst-expression core the Column API wraps, so
      // SQL and Scala surfaces share one arithmetic source of truth.
      // Bounds must be integer literals (they bake into the plan
      // exactly as the Scala surface's Long params do).
      "z_value2" -> (es => {
        GraftFunctions.arity("z_value2", es, 6, 7)
        val bits = if (es.length == 7)
          GraftFunctions.literalInt("z_value2", es(6)) else 16
        graft.operators.ZOrder.zValue2Expr(es(0),
          GraftFunctions.literalLong("z_value2", es(1)),
          GraftFunctions.literalLong("z_value2", es(2)),
          es(3),
          GraftFunctions.literalLong("z_value2", es(4)),
          GraftFunctions.literalLong("z_value2", es(5)), bits)
      }))
}
