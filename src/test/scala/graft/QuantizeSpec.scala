package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quantize, Similarity}

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("fit + encode: hand values, clamping, degenerate dims") {
    val df = Seq(
      (1L, Seq(0f, 10f, 7f)),
      (2L, Seq(5f, 20f, 7f)),
      (3L, Seq(2.5f, 15f, 7f))).toDF("id", "v")
    val m = Quantize.fitScalarQuantizer(df, "v", 3)
    assert(m.lo.toSeq == Seq(0.0, 10.0, 7.0))
    assert(m.hi.toSeq == Seq(5.0, 20.0, 7.0))
    val codes = Quantize.quantize(df, "v", m).orderBy($"id")
      .select($"q8").as[Seq[Int]].collect()
    assert(codes(0) == Seq(0, 0, 0))
    assert(codes(1) == Seq(255, 255, 0)) // degenerate dim codes 0
    assert(codes(2) == Seq(128, 128, 0)) // 127.5 rounds half-up
    // degenerate dim reconstructs EXACTLY; others within step/2
    val rec = Quantize.dequantize(
        Quantize.quantize(df, "v", m), "q8", m)
      .orderBy($"id").select($"vec_rec").as[Seq[Double]].collect()
    assert(rec.forall(_.apply(2) == 7.0))
    df.select($"v").as[Seq[Float]].collect().zip(rec).foreach {
      case (orig, r) =>
        orig.zip(r).zipWithIndex.foreach { case ((o, e), d) =>
          val step = (m.hi(d) - m.lo(d)) / 255.0
          assert(math.abs(o - e) <= step / 2 + 1e-9,
            s"dim $d: |$o - $e| > ${step / 2}")
        }
    }
  }

  test("fit refuses nulls and wrong-length vectors") {
    val bad = Seq((1L, Seq(1f, 2f)), (2L, Seq(3f))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Quantize.fitScalarQuantizer(bad, "v", 2)
    }
    val withNull = Seq((1L, Some(Seq(1f, 2f))), (2L, None))
      .toDF("id", "v")
    intercept[IllegalArgumentException] {
      Quantize.fitScalarQuantizer(withNull, "v", 2)
    }
  }

  test("fit: refusal census fused into the stats scan — 1 job") {
    val df = Seq((1L, Seq(0f, 10f)), (2L, Seq(5f, 20f)))
      .toDF("id", "v")
    val jobs = countJobs { Quantize.fitScalarQuantizer(df, "v", 2) }
    assert(jobs == 1, s"expected the fused single job, saw $jobs")
  }

  test("int8 recall: near-exact top-k on the testdata embeddings") {
    // int8 keeps per-dimension resolution (range/255 error), far
    // below the distances that separate random 64-d vectors — so
    // unlike PQ's 15/50 at 32 bits, 512-bit scalar codes should hold
    // nearly all of exact recall@5 (measured 50/50; gate with slack).
    val m = Quantize.fitScalarQuantizer(emb, "embedding", 64)
    val enc = Quantize.quantize(emb, "embedding", m)
      .select($"vec_id", $"q8")
    val q = emb.filter($"vec_id" < 10).select($"vec_id", $"embedding")
    val approx = Quantize.sqTopK(enc, q, "vec_id", "q8", "embedding",
        m, k = 5)
      .select($"query_id", $"neighbor_id")
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id")
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    info(s"int8 recall@5: $hits/50")
    assert(hits >= 46, s"int8 recall@5 only $hits/50")
  }
}
