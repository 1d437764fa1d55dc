package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 SCALAR quantization for embedding columns — the simplest
  * point on the ANN compression curve (4x smaller than float32 at
  * near-zero recall cost on real embeddings), complementing the
  * 16-64x PQ stack ([[Pq]]): scalar codes keep per-DIMENSION
  * resolution, so they survive use cases PQ degrades (fine ranking,
  * downstream dot-products on reconstructed vectors), while PQ wins
  * when scan bytes dominate. The serving pattern at 100 TB: store
  * int8 codes + the tiny per-dimension (lo, hi) model, scan codes,
  * reconstruct on the fly inside the distance kernel.
  *
  * DRIVER-EXT (reference `/root/reference/` is empty; no file:line
  * citation possible — SURVEY.md §0 protocol). Everything here is
  * deterministic closed-form arithmetic, so the full encode →
  * reconstruct pipeline is SQL-replayable and sits under the DuckDB
  * hash gate (q194), unlike the k-means-trained PQ codebooks.
  *
  * Scale shape: the fit is ONE posexplode + partial-agg groupBy on
  * the dimension index (dim rows out, corpus never collected); the
  * encode/decode are per-row `transform` expressions over a
  * broadcast-literal model (dim doubles — bytes, not an index).
  * Codes are `array<int>` in [0, 255]; parquet stores them compact
  * and the [[Pq]] packed-binary trick applies if 1-byte-per-element
  * storage must be exact on the wire. */
object Quantize {

  /** Per-dimension affine model: code c reconstructs to
    * lo(d) + c/255 * (hi(d) - lo(d)); a degenerate dimension
    * (hi == lo) always codes 0 and reconstructs exactly. */
  case class SqModel(dim: Int, lo: Array[Double], hi: Array[Double]) {
    require(lo.length == dim && hi.length == dim,
      s"model arrays must have length $dim, got ${lo.length}/${hi.length}")
  }

  /** Fit per-dimension (min, max) over the corpus. Nulls and
    * wrong-length vectors are refused (a silently skipped row would
    * shift the ranges). One scan, dim-bounded result. */
  def fitScalarQuantizer(df: DataFrame, vecCol: String, dim: Int)
  : SqModel = {
    require(dim > 0, s"dim must be positive, got $dim")
    // non-finite elements would poison the ranges (a single NaN makes
    // min/max NaN, every code null) — refuse loudly, same discipline
    // as the null/length check. The refusal census is FUSED into the
    // stats scan (the Expect.check pattern): a bad row's vector is
    // nulled, so posexplode_outer lands it in the null-dimension
    // group of the SAME aggregation — one scan, one job, where a
    // separate limit-probe used to run first.
    val isBad = col(vecCol).isNull || size(col(vecCol)) =!= dim ||
      exists(col(vecCol), x => isnan(x) ||
        x === Float.PositiveInfinity || x === Float.NegativeInfinity)
    val census = df
      .select(when(!isBad, col(vecCol)).as("__v"))
      .select(posexplode_outer(col("__v")).as(Seq("__d", "__x")))
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("__n"),
        min(col("__x").cast("double")).as("__lo"),
        max(col("__x").cast("double")).as("__hi"))
      .collect()
    val bad = census.filter(_.isNullAt(0)).map(_.getLong(1)).sum
    require(bad == 0,
      s"fitScalarQuantizer: $vecCol contains $bad null, " +
        s"non-$dim-length, or non-finite vectors — fix the input " +
        "rather than silently skewing ranges")
    val stats = census.filterNot(_.isNullAt(0))
      .map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    require(stats.length == dim,
      s"fitScalarQuantizer: saw ${stats.length} dimensions, expected $dim")
    SqModel(dim, stats.map(_._2), stats.map(_._3))
  }

  private def litArr(a: Array[Double]): Column =
    array(a.map(lit(_)): _*)

  /** Encode column expression: element-wise
    * round((x - lo) / (hi - lo) * 255) clamped to [0, 255], degenerate
    * dims code 0. Exposed as a Column so it fuses into scans. */
  def encodeExpr(vec: Column, model: SqModel): Column = {
    val lo = litArr(model.lo); val hi = litArr(model.hi)
    zip_with(vec, sequence(lit(0), lit(model.dim - 1)), (x, i) => {
      val l = element_at(lo, i + 1); val h = element_at(hi, i + 1)
      when(h > l,
        least(lit(255), greatest(lit(0),
          round((x.cast("double") - l) / (h - l) * 255).cast("int"))))
        .otherwise(lit(0))
    })
  }

  /** Reconstruction column expression: lo + c/255 * (hi - lo). */
  def decodeExpr(codes: Column, model: SqModel): Column = {
    val lo = litArr(model.lo); val hi = litArr(model.hi)
    zip_with(codes, sequence(lit(0), lit(model.dim - 1)), (c, i) => {
      val l = element_at(lo, i + 1); val h = element_at(hi, i + 1)
      l + c.cast("double") / 255.0 * (h - l)
    })
  }

  /** Corpus with `outCol` = int8 codes (array<int> in [0,255]). */
  def quantize(df: DataFrame, vecCol: String, model: SqModel,
               outCol: String = "q8"): DataFrame =
    df.withColumn(outCol, encodeExpr(col(vecCol), model))

  /** Corpus with `outCol` = reconstructed array<double> vectors. */
  def dequantize(df: DataFrame, codeCol: String, model: SqModel,
                 outCol: String = "vec_rec"): DataFrame =
    df.withColumn(outCol, decodeExpr(col(codeCol), model))

  /** Brute-force cosine top-k over RECONSTRUCTED vectors — the
    * recall probe for an int8-quantized corpus (spec-gated against
    * exact search in QuantizeSpec; at serving scale the scan reads
    * 1/4 the bytes of the float corpus). */
  def sqTopK(encodedCorpus: DataFrame, queries: DataFrame,
             idCol: String, codeCol: String, vecCol: String,
             model: SqModel, k: Int): DataFrame =
    Similarity.bruteForceTopK(
      dequantize(encodedCorpus, codeCol, model, "__rec")
        .select(col(idCol), col("__rec").as(vecCol)),
      queries, idCol, vecCol, k)
}
