package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq

class PqSpec extends SparkTestBase {
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("encode: nearest-centroid argmin, ties keep the lowest index") {
    // m=2 subspaces of dsub=1, ksub=2 centroids each:
    //   sub0: centroids {0.0, 10.0}; sub1: centroids {-1.0, 1.0}
    val model = Pq.PqModel(2, 1, 2, Array(0.0, 10.0, -1.0, 1.0))
    val df = Seq(
      (1L, Seq(1f, 2f)),   // sub0 -> 0 (|1-0|<|1-10|), sub1 -> 1
      (2L, Seq(9f, -2f)),  // sub0 -> 1, sub1 -> 0
      (3L, Seq(5f, 0f))    // EXACT ties both subs -> lowest index 0
    ).toDF("id", "v")
    val got = Pq.encode(df, "v", model).orderBy($"id")
      .select($"pq_code").as[Seq[Int]].collect()
    assert(got(0) == Seq(0, 1))
    assert(got(1) == Seq(1, 0))
    assert(got(2) == Seq(0, 0))
  }

  test("encode packed: m bytes, same codes as the array form") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 8, dsub = 8,
      ksub = 16)
    val both = Pq.encode(
      Pq.encode(emb, "embedding", model, out = "arr"),
      "embedding", model, out = "bin", packed = true)
    val rows = both.select($"arr", $"bin").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val arr = r.getSeq[Int](0)
      val bin = r.getAs[Array[Byte]](1)
      assert(bin.length == 8) // m bytes: the 32x-storage-cut claim
      assert(arr == bin.map(_ & 0xff).toSeq)
    }
  }

  test("a vector ON a centroid encodes to it with ADC distance 0") {
    val model = Pq.PqModel(2, 2, 2, Array(
      0.0, 0.0, /**/ 4.0, 4.0, // sub0 centroids 0, 1
      1.0, 1.0, /**/ 9.0, 9.0 // sub1 centroids 0, 1
    ))
    val df = Seq((7L, Seq(4f, 4f, 1f, 1f))).toDF("id", "v")
    val enc = Pq.encode(df, "v", model)
    assert(enc.select($"pq_code").as[Seq[Int]].head() == Seq(1, 0))
    val adc = Pq.adcTopK(enc, df.select($"id", $"v"), "id", "pq_code",
      "v", model, k = 1)
    assert(adc.select($"adc").as[Double].head() == 0.0)
  }

  test("fit is deterministic and partition-layout independent") {
    val a = Pq.fit(emb, "vec_id", "embedding", m = 4, dsub = 16, ksub = 8)
    val b = Pq.fit(emb, "vec_id", "embedding", m = 4, dsub = 16, ksub = 8)
    val c = Pq.fit(emb.repartition(13), "vec_id", "embedding",
      m = 4, dsub = 16, ksub = 8)
    assert(a.centroids.sameElements(b.centroids))
    assert(a.centroids.sameElements(c.centroids))
    // the TRUNCATION regime (corpus larger than fitCap) must pick the
    // SAME rows regardless of layout — the id-ordered prefix, not
    // whichever fitCap rows a partition order serves first
    val t1 = Pq.fit(emb, "vec_id", "embedding", m = 4, dsub = 16,
      ksub = 8, fitCap = 100)
    val t2 = Pq.fit(emb.repartition(17), "vec_id", "embedding",
      m = 4, dsub = 16, ksub = 8, fitCap = 100)
    assert(t1.centroids.sameElements(t2.centroids))
    // and the truncated fit differs from the full fit (it really
    // trained on the 100-row prefix, not all 500)
    assert(!t1.centroids.sameElements(a.centroids))
  }

  test("adcTopK recall floor vs exact L2, packed == unpacked") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 8, dsub = 8,
      ksub = 16)
    val q = emb.filter($"vec_id" < 10).select($"vec_id", $"embedding")
    val enc = Pq.encode(emb, "embedding", model).cache()
    val approx = Pq.adcTopK(enc, q, "vec_id", "pq_code", "embedding",
      model, k = 5).select($"query_id", $"neighbor_id")
    val exact = Pq.exactL2TopK(emb, q, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id")
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    // measured on the RANDOM sf0.001 embeddings (PQ's worst case — no
    // cluster structure to quantize): recall@5 rises monotonically in
    // code bits, 15/50 at 32 bits (m=8,ksub=16), 20 at 64
    // (m=16,ksub=16), 29 at 96 (m=16,ksub=64), 30 at 128
    // (m=32,ksub=16) — BENCH_NOTES r10 `pq` table. Gates sit under
    // the measured values with slack, mirroring the IVF discipline.
    assert(hits >= 10, s"ADC recall@5 too low at 32-bit codes: $hits/50")
    val model96 = Pq.fit(emb, "vec_id", "embedding", m = 16, dsub = 4,
      ksub = 64)
    val hits96 = Pq.adcTopK(Pq.encode(emb, "embedding", model96), q,
        "vec_id", "pq_code", "embedding", model96, k = 5)
      .select($"query_id", $"neighbor_id")
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits96 >= 22 && hits96 > hits,
      s"more code bits must buy recall: 96-bit $hits96 vs 32-bit $hits")
    // the packed (binary) code path scores identically
    val encP = Pq.encode(emb, "embedding", model, packed = true)
    val approxP = Pq.adcTopK(encP, q, "vec_id", "pq_code", "embedding",
        model, k = 5)
      .select($"query_id", $"rank", $"neighbor_id", $"adc")
    val approxA = Pq.adcTopK(enc, q, "vec_id", "pq_code", "embedding",
        model, k = 5)
      .select($"query_id", $"rank", $"neighbor_id", $"adc")
    assert(approxP.except(approxA).isEmpty && approxA.except(approxP).isEmpty)
    enc.unpersist()
  }

  test("ivfPq: routing + residual coding, measured gates, determinism") {
    val q = emb.filter($"vec_id" < 10).select($"vec_id", $"embedding")
    val exact = Pq.exactL2TopK(emb, q, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id").cache()
    val model = Pq.fitIvfPq(emb, "vec_id", "embedding", nCells = 8,
      m = 8, dsub = 8, ksub = 16)
    val enc = Pq.encodeIvfPq(emb, "vec_id", "embedding", model).cache()
    // encode shape: every row routed to a legal cell, m codes each
    assert(enc.filter($"cell" < 0 || $"cell" >= 8).count() == 0)
    assert(enc.filter(size($"pq_code") =!= 8).count() == 0)
    def hitsAt(np: Int): Long =
      Pq.ivfPqTopK(enc, q, "vec_id", "cell", "pq_code", "embedding",
          model, k = 5, nProbe = np)
        .select($"query_id", $"neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    // measured on the RANDOM sf0.001 embeddings: 16/17/16/18 at
    // np=1/2/4/8 vs 15 for same-bits RAW PQ — the np=1 point already
    // holds ~the full-probe recall while scanning 1/8 of the corpus
    // (random data spreads neighbors across cells; the residual
    // codes' higher fidelity compensates). Gates sit under the
    // measured points; strict np-monotonicity is NOT pinned (the
    // curve is flat-with-noise here by the same randomness).
    val h1 = hitsAt(1)
    val h8 = hitsAt(8)
    assert(h1 >= 11, s"np=1 recall collapsed: $h1/50")
    assert(h8 >= 14 && h8 >= h1, s"full probe recall: $h8/50 (np=1 $h1)")
    // residual coding must not LOSE to raw coding at the same bits
    // when every cell is probed (measured: 18 vs 15)
    val raw = Pq.fit(emb, "vec_id", "embedding", m = 8, dsub = 8,
      ksub = 16)
    val hRaw = Pq.adcTopK(Pq.encode(emb, "embedding", raw), q,
        "vec_id", "pq_code", "embedding", raw, k = 5)
      .select($"query_id", $"neighbor_id")
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(h8 >= hRaw, s"residual full-probe $h8 < raw $hRaw")
    // the whole stack is deterministic: same fit, same answer
    val model2 = Pq.fitIvfPq(emb, "vec_id", "embedding", nCells = 8,
      m = 8, dsub = 8, ksub = 16)
    assert(model.coarse.sameElements(model2.coarse))
    assert(model.pq.centroids.sameElements(model2.pq.centroids))
    enc.unpersist(); exact.unpersist()
  }

  test("clustered fixture: recall ceiling brackets the random floor") {
    // VERDICT r10 item 5: every PQ/IVF-PQ recall gate was pinned on
    // RANDOM embeddings, so this fixture measures the CLUSTERED face:
    // a fixed-seed mixture of 20 Gaussians in 64-d (sigma 0.05 vs
    // unit-scale center spread). What it measured (r11) refined the
    // "favorable ceiling" hypothesis into three pinned facts:
    //   1. cluster-MEMBERSHIP recall is perfect (50/50): whole-space
    //      quantization resolves which component a vector belongs to
    //      — the semantic-retrieval notion of correct.
    //   2. fine recall@5 WITHIN a tight cluster is HARDER than
    //      random (11/50 vs 15/50 at the same 32 bits): the true
    //      top-5 hide among ~100 near-equidistant cluster-mates and
    //      raw PQ's quantization error is centroid-scale, far above
    //      the sigma-scale gaps that order them.
    //   3. RESIDUAL coding exists for exactly this: with coarse
    //      cells aligned to the components (nCells=32 >= 20), IVF-PQ
    //      lifts fine recall to 19/50 — and np=1 already holds ALL
    //      of np=8's recall (every true neighbor shares the query's
    //      cell), i.e. 1/32 of the scan buys the full achievable
    //      recall on clustered data. The random fixture showed the
    //      opposite np behavior; together they bracket reality.
    val rng = new scala.util.Random(1105)
    val dim = 64; val nCenters = 20
    val centers = Array.fill(nCenters, dim)(rng.nextGaussian().toFloat)
    val pts = (0 until 2000).map { i =>
      val c = centers(i % nCenters)
      (i.toLong, c.map(x => x + 0.05f * rng.nextGaussian().toFloat).toSeq)
    }
    val cemb = pts.toDF("vec_id", "embedding").repartition(4).cache()
    val q = cemb.filter($"vec_id" < 10).select($"vec_id", $"embedding")
    val exact = Pq.exactL2TopK(cemb, q, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id").cache()
    // raw PQ at the same 32-bit operating point the random floor
    // measured 15/50 on: clustered data must lift it far higher
    val model = Pq.fit(cemb, "vec_id", "embedding", m = 8, dsub = 8,
      ksub = 16)
    val hits = Pq.adcTopK(Pq.encode(cemb, "embedding", model), q,
        "vec_id", "pq_code", "embedding", model, k = 5)
      .select($"query_id", $"neighbor_id")
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    info(s"clustered 32-bit ADC recall@5: $hits/50 (random floor: 15)")
    // cluster-membership recall: did the answers land in the right
    // mixture component, the semantic-retrieval notion of correct?
    val memb = Pq.adcTopK(Pq.encode(cemb, "embedding", model), q,
        "vec_id", "pq_code", "embedding", model, k = 5)
      .filter($"neighbor_id" % 20 === $"query_id" % 20).count()
    info(s"clustered 32-bit ADC cluster-membership@5: $memb/50")
    assert(memb >= 45, s"cluster-membership recall only $memb/50")
    // IVF-PQ residual coding on the same fixture
    val ivf = Pq.fitIvfPq(cemb, "vec_id", "embedding", nCells = 32,
      m = 8, dsub = 8, ksub = 16)
    val enc = Pq.encodeIvfPq(cemb, "vec_id", "embedding", ivf).cache()
    def hitsAt(np: Int): Long =
      Pq.ivfPqTopK(enc, q, "vec_id", "cell", "pq_code", "embedding",
          ivf, k = 5, nProbe = np)
        .select($"query_id", $"neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    val h1 = hitsAt(1); val h8 = hitsAt(8)
    info(s"clustered IVF-PQ recall@5: np=1 $h1/50, np=8 $h8/50")
    // gates under the measured points (19/19) with slack
    assert(h1 >= 14, s"clustered np=1 residual recall only $h1/50")
    assert(h8 >= h1, s"full probe lost to np=1: $h8 < $h1")
    assert(h1 > hits,
      s"residual coding must beat raw PQ on clustered data: $h1 vs $hits")
    enc.unpersist(); exact.unpersist(); cemb.unpersist()
  }

  test("ADC fails loud on dimension/model mismatches") {
    import graft.expressions.VectorExpressions
    // unsafe array reads have no bounds checks, so a short vector or
    // foreign codes would otherwise score silently wrong
    val model = Pq.PqModel(2, 2, 2,
      Array(0.0, 0.0, 4.0, 4.0, 1.0, 1.0, 9.0, 9.0))
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val shortQ = Seq((Seq(1f, 2f), Seq(0, 1))).toDF("v", "code")
    val e1 = intercept[Exception] {
      shortQ.select(VectorExpressions.pqAdc($"v", $"code", 2, 2, 2,
        model.centroids)).collect()
    }
    assert(msgChain(e1).contains("dims"))
    val shortCodes = Seq((Seq(1f, 2f, 3f, 4f), Seq(0))).toDF("v", "code")
    val e2 = intercept[Exception] {
      shortCodes.select(VectorExpressions.pqAdc($"v", $"code", 2, 2, 2,
        model.centroids)).collect()
    }
    assert(msgChain(e2).contains("codes"))
    val foreignCodes = Seq((Seq(1f, 2f, 3f, 4f), Seq(0, 7)))
      .toDF("v", "code")
    val e3 = intercept[Exception] {
      foreignCodes.select(VectorExpressions.pqAdc($"v", $"code", 2, 2, 2,
        model.centroids)).collect()
    }
    assert(msgChain(e3).contains("out of range"))
  }

  test("model persistence: round-trip, format gate, shape gates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqm").toString
    val model = Pq.fit(emb, "vec_id", "embedding", m = 4, dsub = 16,
      ksub = 8)
    Pq.saveModel(spark, model, s"$dir/pq")
    val back = Pq.loadModel(spark, s"$dir/pq")
    assert(back.m == 4 && back.dsub == 16 && back.ksub == 8)
    assert(back.centroids.sameElements(model.centroids))
    // IVF-PQ: both spaces round-trip through one file
    val ivf = Pq.fitIvfPq(emb, "vec_id", "embedding", nCells = 4,
      m = 4, dsub = 16, ksub = 8)
    Pq.saveIvfPqModel(spark, ivf, s"$dir/ivfpq")
    val ivfBack = Pq.loadIvfPqModel(spark, s"$dir/ivfpq")
    assert(ivfBack.nCells == 4 && ivfBack.dim == 64)
    assert(ivfBack.coarse.sameElements(ivf.coarse))
    assert(ivfBack.pq.centroids.sameElements(ivf.pq.centroids))
    // a future/unknown format version must throw, not encode wrongly
    spark.read.parquet(s"$dir/pq")
      .withColumn("__fmt", lit(99))
      .write.mode("overwrite").parquet(s"$dir/badfmt")
    val eFmt = intercept[IllegalArgumentException] {
      Pq.loadModel(spark, s"$dir/badfmt")
    }
    assert(eFmt.getMessage.contains("format"))
    // an incomplete codebook (missing rows) must throw
    spark.read.parquet(s"$dir/pq")
      .filter($"cidx" =!= 3)
      .write.mode("overwrite").parquet(s"$dir/short")
    val eShort = intercept[IllegalArgumentException] {
      Pq.loadModel(spark, s"$dir/short")
    }
    assert(eShort.getMessage.contains("incomplete"))
    // not-a-model parquet must be rejected by column check
    emb.limit(2).write.mode("overwrite").parquet(s"$dir/notmodel")
    val eCols = intercept[IllegalArgumentException] {
      Pq.loadModel(spark, s"$dir/notmodel")
    }
    assert(eCols.getMessage.contains("missing columns"))
  }

  test("encoded-corpus persistence: digest pairing, mismatch refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqi").toString
    val model = Pq.fit(emb, "vec_id", "embedding", m = 8, dsub = 8,
      ksub = 16)
    val dg = Pq.codebookDigest(model)
    Pq.saveEncoded(Pq.encode(emb, "embedding", model)
      .select($"vec_id", $"pq_code"), s"$dir/enc", dg)
    // round-trip serves identically
    val back = Pq.loadEncoded(spark, s"$dir/enc", dg)
    val q = emb.filter($"vec_id" < 5).select($"vec_id", $"embedding")
    val a = Pq.adcTopK(back, q, "vec_id", "pq_code", "embedding",
      model, k = 3).collect().map(_.toSeq).toSet
    val b = Pq.adcTopK(Pq.encode(emb, "embedding", model), q, "vec_id",
      "pq_code", "embedding", model, k = 3).collect().map(_.toSeq).toSet
    assert(a == b)
    // a same-SHAPE model trained differently has a different digest,
    // and loading under it is refused — PqAdc's range check alone
    // cannot catch this (codes are in range, geometry is wrong)
    val other = Pq.fit(emb, "vec_id", "embedding", m = 8, dsub = 8,
      ksub = 16, fitCap = 100)
    assert(Pq.codebookDigest(other) != dg)
    val e = intercept[IllegalArgumentException] {
      Pq.loadEncoded(spark, s"$dir/enc", Pq.codebookDigest(other))
    }
    assert(e.getMessage.contains("wrong codebook")
      || e.getMessage.contains("built by codebook"))
    // a plain parquet without stamps is refused
    emb.limit(3).write.parquet(s"$dir/plain")
    val e2 = intercept[IllegalArgumentException] {
      Pq.loadEncoded(spark, s"$dir/plain", dg)
    }
    assert(e2.getMessage.contains("missing __fmt"))
    // ivfpq digest covers both halves
    val ivf = Pq.fitIvfPq(emb, "vec_id", "embedding", nCells = 4,
      m = 8, dsub = 8, ksub = 16)
    assert(Pq.codebookDigest(ivf) != Pq.codebookDigest(ivf.pq))
  }

  test("quantization error shrinks as ksub grows (training works)") {
    def mse(ksub: Int): Double = {
      val model = Pq.fit(emb, "vec_id", "embedding", m = 8, dsub = 8,
        ksub = ksub)
      // ADC(v, encode(v)) IS the squared reconstruction error of v
      Pq.encode(emb, "embedding", model)
        .select(graft.expressions.VectorExpressions.pqAdc(
          $"embedding", $"pq_code", model.m, model.dsub, model.ksub,
          model.centroids).as("err"))
        .agg(avg($"err")).as[Double].head()
    }
    val coarse = mse(2)
    val fine = mse(16)
    assert(fine < coarse,
      s"MSE should shrink with codebook size: ksub16=$fine ksub2=$coarse")
  }
}
