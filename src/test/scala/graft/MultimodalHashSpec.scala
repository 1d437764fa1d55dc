package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.multimodal.Multimodal

/** Perceptual image-hash pins: real javax.imageio decode, the two
  * classic fingerprints (aHash mean-threshold, dHash gradient), their
  * invariance properties (resolution, global brightness scale), and
  * the composition with [[graft.operators.Dedup.signaturePairs]] —
  * image near-dup rides the text-simhash band machinery. */
class MultimodalHashSpec extends SparkTestBase {
  import spark.implicits._

  /** render a gw-pattern image at pixel size side×side: column x is
    * white iff pattern(x * cells / side) — block patterns survive
    * area-average pooling exactly. */
  private def png(pattern: Seq[Boolean], side: Int,
                  white: Int = 0xffffff, black: Int = 0x000000)
      : Array[Byte] = {
    val cells = pattern.length
    val img = new java.awt.image.BufferedImage(side, side,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until side; y <- 0 until side)
      img.setRGB(x, y,
        if (pattern(x * cells / side)) white else black)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private val mediaSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType)))

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, b) => Row(i, b) }),
      mediaSchema)

  private def hashes(rows: Seq[(Long, Array[Byte])],
                     kind: String): Map[Long, Long] =
    Multimodal.imageHashes(mediaDf(rows), kind)
      .as[(Long, Long)].collect().toMap

  private val p3 = Seq(true, true, false, false, true, false, true, false)
  private val p5 = Seq(true, false, false, false, false, true, true, true)

  test("aHash: identical content equal, different patterns differ, garbage dropped") {
    val rows = Seq(1L -> png(p3, 32), 2L -> png(p3, 32), 3L -> png(p5, 32),
      4L -> "not an image".getBytes)
    val h = hashes(rows, "ahash")
    assert(h.keySet == Set(1L, 2L, 3L), "garbage must be dropped")
    assert(h(1L) == h(2L), "identical images must hash equal")
    assert(h(1L) != h(3L), "different patterns must differ")
  }

  test("aHash: resolution-invariant and brightness-scale-invariant") {
    val h = hashes(Seq(
      1L -> png(p3, 32), 2L -> png(p3, 64), // same pattern, 2x pixels
      3L -> png(p3, 32, white = 0xc8c8c8, black = 0x323232), // dimmed
      4L -> png(p5, 64)), "ahash")
    assert(h(1L) == h(2L), "8x8 pooling must absorb resolution")
    assert(h(1L) == h(3L), "mean threshold must absorb brightness scale")
    assert(h(1L) != h(4L))
  }

  test("dHash: hand-computed gradient on a left-dark right-bright ramp") {
    // 9 vertical cells with strictly increasing luminance: every
    // left<right comparison is true -> all 64 bits set
    val img = new java.awt.image.BufferedImage(36, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 36; y <- 0 until 16) {
      val cell = x * 9 / 36
      val v = 20 + cell * 25
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val h = hashes(Seq(1L -> out.toByteArray), "dhash")
    assert(h(1L) == -1L, s"all-ascending ramp must set all 64 bits, got ${h(1L).toBinaryString}")
  }

  test("pHash (r18): exactly brightness-shift-invariant (DC excluded " +
    "by construction), within hamming 6 of the original under JPEG " +
    "recompression and rescaling; garbage dropped") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    (0 until 5).foreach { cls =>
      val orig = Multimodal.syntheticImage(cls)
      val h = hashes(Seq(
        0L -> Multimodal.pngBytes(orig),
        1L -> Multimodal.jpegBytes(orig, 0.4f),
        2L -> Multimodal.pngBytes(Multimodal.rescaled(orig, 40, 40)),
        3L -> Multimodal.pngBytes(
          Multimodal.syntheticImage(cls, bright = 20))), "phash")
      assert(ham(h(0L), h(1L)) <= 6, s"jpeg cls=$cls")
      assert(ham(h(0L), h(2L)) <= 6, s"rescale cls=$cls")
      // uniform +20 moves ONLY the DC coefficient (no clipping in
      // this scene): the 63 non-DC bits are IDENTICAL
      assert(h(0L) == h(3L), s"brightness cls=$cls")
    }
    assert(hashes(Seq(9L -> "not an image".getBytes), "phash").isEmpty)
  }

  test("pHash vs aHash failure case (r18): scenes whose 8x8 cell " +
    "means collide under aHash stay >= 20 bits apart under pHash") {
    // classes 3 and 4 of the synthetic scene family: the gradient
    // dominates every 8x8 cell mean, so aHash cannot see the
    // rectangle move — pHash's low-frequency DCT bits can
    val imgs = Seq(
      3L -> Multimodal.pngBytes(Multimodal.syntheticImage(3)),
      4L -> Multimodal.pngBytes(Multimodal.syntheticImage(4)))
    val a = hashes(imgs, "ahash"); val p = hashes(imgs, "phash")
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    assert(ham(a(3L), a(4L)) <= 2)   // aHash: (near-)collision
    assert(ham(p(3L), p(4L)) >= 20)  // pHash: clean separation
  }

  test("pHash rides signatureDedup unchanged (r18): recompressed + " +
    "rescaled variants collapse to one survivor per scene") {
    val media = (0 until 5).flatMap { cls =>
      val orig = Multimodal.syntheticImage(cls)
      Seq(
        (cls * 10L) -> Multimodal.pngBytes(orig),
        (cls * 10L + 1) -> Multimodal.jpegBytes(orig, 0.4f),
        (cls * 10L + 2) -> Multimodal.pngBytes(
          Multimodal.rescaled(orig, 40, 40)))
    }
    val hashed = Multimodal.imageHashes(mediaDf(media), "phash")
      .withColumnRenamed("media_id", "id")
    val kept = graft.operators.Dedup.signatureDedup(
        hashed, "id", "img_hash", maxDistance = 6)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(0L, 10L, 20L, 30L, 40L))
  }

  test("near-dup: one flipped cell stays within hamming reach; signaturePairs finds it") {
    val flipped = p3.updated(7, true) // flip one of 8 cells
    val rows = Seq(1L -> png(p3, 32), 2L -> png(flipped, 32),
      3L -> png(p5, 32))
    val h = hashes(rows, "ahash")
    // one flipped column of 8 changes at most that column's 8 bits
    // plus mean-shift effects; measured: small
    val d12 = java.lang.Long.bitCount(h(1L) ^ h(2L))
    val d13 = java.lang.Long.bitCount(h(1L) ^ h(3L))
    assert(d12 <= 16 && d12 < d13,
      s"near-dup $d12 must be closer than distinct $d13")
    val sig = Multimodal.imageHashes(mediaDf(rows), "ahash")
    val pairs = graft.operators.Dedup.signaturePairs(sig, "media_id",
        "img_hash", maxDistance = d12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 1L)),
      s"signaturePairs must surface the planted near-dup, got $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((3L, 1L)))
  }

  test("signature screen: against == brute-force cross hamming, both paths") {
    val rnd = new scala.util.Random(7L)
    // random corpus signatures + planted near-dups in the batch
    val corpusSigs = (0L until 40L).map(i => (i, rnd.nextLong()))
    val batchSigs = (0 until 12).map { i =>
      val (cid, cs) = corpusSigs(rnd.nextInt(corpusSigs.length))
      // flip up to 5 bits: some within maxDistance 3, some beyond
      val flips = i % 6
      val mutated = (0 until flips).foldLeft(cs)((s, j) =>
        s ^ (1L << rnd.nextInt(64)))
      (1000L + i, mutated)
    }
    val truth = (for {
      (bId, bs) <- batchSigs; (cId, cs) <- corpusSigs
      if java.lang.Long.bitCount(bs ^ cs) <= 3
    } yield (bId, cId)).toSet
    assert(truth.nonEmpty)
    val corpusDf = corpusSigs.toDF("id", "sig")
    val batchDf = batchSigs.toDF("id", "sig")
    val direct = graft.operators.Dedup.signaturePairsAgainst(
        batchDf, corpusDf, "id", "sig", maxDistance = 3)
      .select("id_b", "id_c").as[(Long, Long)].collect().toSet
    assert(direct == truth,
      s"missing=${truth -- direct} extra=${direct -- truth}")
    // parquet round-trip: the ingestion-cadence path answers identically
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sig_index").toString
    graft.operators.Dedup.signatureIndex(corpusDf, "id", "sig",
      maxDistance = 3).write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val viaIndex = graft.operators.Dedup.signaturePairsAgainstIndex(
        batchDf, idx, "id", "sig", maxDistance = 3)
      .select("id_b", "id_c").as[(Long, Long)].collect().toSet
    assert(viaIndex == truth)
    // param mismatch and param-less indexes refuse
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Dedup.signaturePairsAgainstIndex(
        batchDf, idx, "id", "sig", maxDistance = 2).collect() }
    assert(e1.getMessage.contains("__max_distance"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Dedup.signaturePairsAgainstIndex(batchDf,
        idx.drop("__fmt", "__max_distance"), "id", "sig",
        maxDistance = 3).collect() }
    assert(e2.getMessage.contains("no embedded __param"))
  }

  test("signature index: update == rebuild exactly, replay is a no-op") {
    val a = Seq((1L, 11L), (2L, 22L)).toDF("id", "sig")
    val b = Seq((3L, 33L), (4L, 44L)).toDF("id", "sig")
    import graft.operators.Dedup
    val rebuilt = Dedup.signatureIndex(a.union(b), "id", "sig", 3)
      .collect().map(_.toString).sorted.toSeq
    val updated = Dedup.signatureIndexUpdate(
        Dedup.signatureIndex(a, "id", "sig", 3), b, "id", "sig", 3)
      .collect().map(_.toString).sorted.toSeq
    assert(updated == rebuilt, "update must equal rebuild row-for-row")
    val replayed = Dedup.signatureIndexUpdate(
        Dedup.signatureIndexUpdate(
          Dedup.signatureIndex(a, "id", "sig", 3), b, "id", "sig", 3),
        b, "id", "sig", 3)
      .collect().map(_.toString).sorted.toSeq
    assert(replayed == rebuilt, "replaying a batch must be a no-op")
  }

  test("signature screen: hot buckets are refused, other chunks still match") {
    import graft.operators.Dedup
    // 50 corpus rows share signature 0 (a blank-media pile): the
    // pile makes every key-0 bucket hot at cap 10. The probe
    // (5<<16 | 1) is hamming-3 from the pile but only meets it in
    // hot buckets (chunks 2,3 at key 0); the clean neighbour
    // (5<<16 | 2, hamming 2) shares the UNPOLLUTED (chunk1, key 5)
    // bucket, so the cap drops exactly the pile
    val clean = (5L << 16) | 2L
    val corpusDf = ((0L until 50L).map(i => (i, 0L)) :+ (99L, clean))
      .toDF("id", "sig")
    val batchDf = Seq((1000L, (5L << 16) | 1L)).toDF("id", "sig")
    val got = Dedup.signaturePairsAgainst(batchDf, corpusDf, "id", "sig",
        maxDistance = 3, maxBucketSize = 10)
      .select("id_c").as[Long].collect().toSet
    assert(got == Set(99L), s"got $got")
    // uncapped, the pile is found too (hamming(probe, 0) = 3)
    val uncapped = Dedup.signaturePairsAgainst(batchDf, corpusDf, "id",
        "sig", maxDistance = 3, maxBucketSize = 1000)
      .select("id_c").as[Long].collect().toSet
    assert(uncapped.size == 51)
  }

  test("signatureDedup: component closure, min-id and keep-best faces") {
    import graft.operators.Dedup
    // transitive chain at maxDistance 1: 0~1~3 but hamming(0,3)=2 —
    // only the CC closure collapses all three to one survivor
    val df = Seq((1L, 0L, 0.1), (2L, 1L, 0.9), (3L, 3L, 0.5),
      (9L, 0xFF00L, 0.2)).toDF("id", "sig", "score")
    val minKept = Dedup.signatureDedup(df, "id", "sig", maxDistance = 1)
      .select("id").as[Long].collect().sorted.toSeq
    assert(minKept == Seq(1L, 9L), s"got $minKept")
    // keep-best: the chain's survivor is the top-score member (id 2),
    // which the pairwise min-id rule could never pick
    val bestKept = Dedup.signatureDedup(df, "id", "sig",
        maxDistance = 1, keepCol = "score")
      .select("id").as[Long].collect().sorted.toSeq
    assert(bestKept == Seq(2L, 9L), s"got $bestKept")
  }

  test("signature screen plan: equi broadcast joins, map-side census, no loops") {
    import graft.operators.Dedup
    val corpus = spark.range(1000).select(col("id"),
      xxhash64(col("id")).as("sig"))
    val batch = spark.range(10).select((col("id") + 100000L).as("id"),
      xxhash64(col("id")).bitwiseXOR(lit(1L)).as("sig"))
    val plan = Dedup.signaturePairsAgainst(batch, corpus, "id", "sig",
      maxDistance = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") &&
      !plan.contains("BroadcastNestedLoop"),
      "the screen must never plan a loop join")
    assert(plan.contains("BroadcastHashJoin"),
      "batch chunks must broadcast into the index buckets")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "the hot-bucket census must partial-agg map-side")
    assert(!"\\bWindow\\b".r.findFirstIn(plan).isDefined)
  }

  test("signaturePairs == simhashPairs on the text-simhash column") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely unrelated text about spark plans"),
      (4L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val direct = graft.operators.Dedup.simhashPairs(docs, "id", "text",
      maxDistance = 8).select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val sig = docs.select(col("id"),
      graft.functions.TextFunctions.simhash(col("text")).as("sh"))
    val viaFace = graft.operators.Dedup.signaturePairs(sig, "id", "sh",
      maxDistance = 8).select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(direct == viaFace, "the public face must be the same machinery")
    assert(direct.exists { case (a, b, _) => Set(a, b) == Set(1L, 4L) })
  }

  // ---- r14: perceptual AUDIO hash (band-energy transitions) -------

  /** synthesize a WAV: 17 duration-proportional windows, band b's
    * tone amplitude HIGH (0.2) or LOW (0.025) per window according
    * to `hi(t, b)` — the energy image the hash reads, planted
    * directly. */
  private def toneWav(hi: (Int, Int) => Boolean, rate: Float,
                      gain: Double = 1.0,
                      seconds: Double = 0.85): Array[Byte] = {
    val bands = Seq(400.0, 800.0, 1600.0, 3200.0)
    val n = (rate * seconds).toInt
    val samples = new Array[Short](n)
    for (i <- 0 until n) {
      val t = (i.toLong * 17 / n).toInt
      val tau = i / rate.toDouble
      var x = 0.0
      for (b <- bands.indices) {
        val a = if (hi(t, b)) 0.2 else 0.025
        x += a * math.sin(2 * math.Pi * bands(b) * tau)
      }
      samples(i) = math.max(-32767, math.min(32767,
        math.round(x * gain * 32767))).toShort
    }
    Multimodal.wavBytes(samples, rate)
  }

  /** phase-alternating pattern per (group, band): every window
    * transition is decisive (0.2 vs 0.025 — a 64× energy margin), so
    * the hash is a pure function of the group with no tie flutter. */
  private def groupPattern(g: Int)(t: Int, b: Int): Boolean =
    (t + ((g >> b) & 1)) % 2 == 0

  private def audioHash(rows: Seq[(Long, Array[Byte])]): Map[Long, Long] =
    Multimodal.audioHashes(mediaDf(rows)).as[(Long, Long)]
      .collect().toMap

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("audioHash: gain-invariant EXACTLY, resample-robust, groups " +
    "distinct, silence hashes to 0, garbage/short/narrow dropped") {
    val g0 = toneWav(groupPattern(0), 8000f)
    val g0Gain = toneWav(groupPattern(0), 8000f, gain = 0.35)
    val g0Rate = toneWav(groupPattern(0), 16000f)
    val g1 = toneWav(groupPattern(1), 8000f)
    val g5 = toneWav(groupPattern(5), 8000f)
    val silent = Multimodal.wavBytes(new Array[Short](8000), 8000f)
    val short = Multimodal.wavBytes(new Array[Short](100), 8000f)
    val narrow = toneWav(groupPattern(0), 4000f) // Nyquist < top band
    val garbage = "not audio at all".getBytes("UTF-8")
    val h = audioHash(Seq(
      (1L, g0), (2L, g0Gain), (3L, g0Rate), (4L, g1), (5L, g5),
      (6L, silent), (7L, short), (8L, narrow), (9L, garbage)))
    // gain: exact (every energy scales by gain^2, comparisons frozen)
    assert(h(2L) == h(1L), "gain must not change the hash")
    // resample: the 64x planted margins swamp leakage differences
    assert(hamming(h(3L), h(1L)) <= 2,
      s"resampled copy drifted ${hamming(h(3L), h(1L))} bits")
    // distinct groups differ in exactly the planted band phases
    assert(h(1L) != h(4L) && h(1L) != h(5L) && h(4L) != h(5L))
    assert(h(6L) == 0L, "silence is the all-zero signature")
    assert(!h.contains(7L), "too-short clip must be dropped")
    assert(!h.contains(8L), "sub-8kHz clip must be dropped")
    assert(!h.contains(9L), "non-audio payload must be dropped")
  }

  test("audioHash NON-goal is executable (r15): a trimmed copy is NOT " +
    "a near-dup — time-shift invariance is out of contract") {
    // trim one window's worth of leading samples: windows are
    // duration-proportional to the WHOLE clip, so every boundary
    // re-phases and the energy image no longer matches. The kernel
    // is deliberately NOT shift-robust (chromaprint's overlapping
    // sliding windows would be — the documented extension); this pin
    // keeps the contract executable rather than a scaladoc promise.
    val full = toneWav(groupPattern(0), 8000f)
    val fullSamples = (8000f * 0.85).toInt
    val oneWindow = fullSamples / 17
    val trimmedSamples = new Array[Short](fullSamples - oneWindow)
    // re-render rather than byte-slice (WAV header carries lengths):
    // same tone program, one window shorter, starting mid-pattern
    for (i <- trimmedSamples.indices) {
      val src = i + oneWindow
      val t = (src.toLong * 17 / fullSamples).toInt
      val tau = src / 8000.0
      var x = 0.0
      for (b <- Seq(400.0, 800.0, 1600.0, 3200.0).zipWithIndex) {
        val a = if (groupPattern(0)(t, b._2)) 0.2 else 0.025
        x += a * math.sin(2 * math.Pi * b._1 * tau)
      }
      trimmedSamples(i) = math.max(-32767,
        math.min(32767, math.round(x * 32767))).toShort
    }
    val trimmed = Multimodal.wavBytes(trimmedSamples, 8000f)
    val h = audioHash(Seq((1L, full), (2L, trimmed)))
    val d = hamming(h(1L), h(2L))
    // far outside any dedup screen radius (the audio screens run at
    // maxDistance 3-8); gain/resample copies sit at <= 2 bits
    assert(d > 8, s"trimmed copy unexpectedly near: $d bits")
  }

  // ---- shift-tolerant frame fingerprints (r16) -------------------------

  /** absolute-time slot-pattern WAV: each 31.25 ms slot (= one frame
    * subwindow at frameMs=500/16) sets each band decisively hi/lo by
    * a seeded hash bit, XOR-paired so every 16-slot frame has exactly
    * 8 hi + 8 lo per band (the mean threshold is always decisive).
    * `trimSlots` drops leading slots while keeping ABSOLUTE phase, so
    * a trimmed render equals the base render's suffix up to sample
    * quantization. */
  private def slotWav(seed: Int, seconds: Double, rate: Float,
                      gain: Double = 1.0, trimSlots: Int = 0): Array[Byte] = {
    val bands = Seq(400.0, 800.0, 1600.0, 3200.0)
    val slotSamples = (rate * 0.03125).toInt
    val n = (rate * seconds).toInt - trimSlots * slotSamples
    val samples = new Array[Short](n)
    for (i <- 0 until n) {
      val abs = i + trimSlots * slotSamples
      val slot = abs / slotSamples
      val tau = abs / rate.toDouble
      var x = 0.0
      for (b <- bands.indices) {
        // full-avalanche mix (Murmur3 finalizer): a bare affine*K hash
        // nearly ALTERNATES its high bits with `pair` (131·K mod 2^44
        // sits by 2^43), which made the pattern quasi-seed-independent
        // and every clip a near-dup of every other (caught live, r16)
        var z = seed * 0x9E3779B97F4A7C15L + b * 0xC2B2AE3D27D4EB4FL +
          (slot / 2) * 0x165667B19E3779F9L
        z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
        val hi = ((z & 1L) == 1L) ^ (slot % 2 == 1)
        x += (if (hi) 0.2 else 0.025) * math.sin(2 * math.Pi * bands(b) * tau)
      }
      samples(i) = math.max(-32767, math.min(32767,
        math.round(x * gain * 32767))).toShort
    }
    Multimodal.wavBytes(samples, rate)
  }

  private def frames(rows: Seq[(Long, Array[Byte])]) =
    Multimodal.audioFrameHashes(mediaDf(rows))

  test("audioFrameHashes: a hop-aligned trim yields BIT-IDENTICAL " +
    "frames at the shifted index; audioAlignPairs recovers the pair " +
    "with the exact offset (the r15 non-goal, closed)") {
    val rate = 8000f
    val baseBytes = slotWav(7, 2.0, rate)               // 13 frames
    // byte-true suffix: decode-slice the SAME samples (2 hops = 2000)
    val basePcm = {
      val n = (rate * 2.0).toInt
      val s = new Array[Short](n)
      val dec = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(baseBytes))
      val buf = dec.readAllBytes()
      for (i <- 0 until n)
        s(i) = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort
      s
    }
    val trimmed = Multimodal.wavBytes(basePcm.drop(2000), rate)
    val f = frames(Seq((1L, baseBytes), (2L, trimmed)))
    val m = f.as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(m(1L).size == 13 && m(2L).size == 11)
    (0 until 11).foreach { j =>
      assert(m(2L)(j) == m(1L)(j + 2), s"frame $j not shift-identical")
    }
    val pairs = Multimodal.audioAlignPairs(f)
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 2, 11L)))
  }

  test("audioAlignPairs: gain-scaled re-rendered trim matches within " +
    "the Hamming tolerance; unrelated seeds never pair; sub-minMatches " +
    "overlaps are refused") {
    val f = frames(Seq(
      (1L, slotWav(7, 2.0, 8000f)),
      (2L, slotWav(7, 2.0, 8000f, gain = 0.35, trimSlots = 12)), // 3 hops
      (3L, slotWav(8, 2.0, 8000f)),                              // unrelated
      (4L, slotWav(9, 0.75, 8000f))))                            // 3 frames
    val got = Multimodal.audioAlignPairs(f)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3, 10L)),
      s"unexpected alignment set: $got")
    // demand more matches than the 10-frame overlap can give: silent
    val none = Multimodal.audioAlignPairs(f, minMatches = 11)
      .as[(Long, Long, Int, Long)].collect()
    assert(none.isEmpty)
  }

  test("audioAlignPairs frame-table semantics: hamming radius is " +
    "exact, offset votes pick the best alignment, hot hashes are " +
    "census-refused") {
    import spark.implicits._
    def fdf(rows: Seq[(Long, Int, Long)]) =
      rows.toDF("media_id", "frame_idx", "frame_hash")
    val h = Seq(0x1111222233334444L, 0x5555666677778888L,
      0x9999aaaabbbbccccL, 0xdeadbeefcafef00dL)
    // id 2 = id 1 shifted by 1 with 2 bits flipped per frame
    val t = fdf(
      h.zipWithIndex.map { case (v, i) => (1L, i, v) } ++
        h.take(3).zipWithIndex.map { case (v, i) =>
          (2L, i, v ^ 0x3L) })
    val at2 = Multimodal.audioAlignPairs(t, maxDistance = 2,
      minMatches = 2).as[(Long, Long, Int, Long)].collect().toSeq
    assert(at2 == Seq((1L, 2L, 0, 3L)))
    // radius 1 cannot reach the 2-bit flips
    assert(Multimodal.audioAlignPairs(t, maxDistance = 1,
      minMatches = 2).count() == 0)
    // best-offset argmax: 3 votes at offset 1 beat 2 votes at 0
    val multi = fdf(
      Seq((1L, 0, 10L), (1L, 1, 20L), (1L, 2, 30L), (1L, 3, 40L),
        (2L, 0, 20L), (2L, 1, 30L), (2L, 2, 40L),
        (3L, 0, 10L), (3L, 1, 20L)))
    val best = Multimodal.audioAlignPairs(multi, maxDistance = 0,
        minMatches = 2).as[(Long, Long, Int, Long)].collect().toSet
    assert(best == Set((1L, 2L, 1, 3L), (1L, 3L, 0, 2L)))
    // hot-hash census: a hash carried by > maxHashFreq frames
    // (silence, jingles) never generates candidates
    val hot = fdf((0 until 40).map(i => (i.toLong, 0, 77L)) ++
      Seq((100L, 0, 5L), (100L, 1, 6L), (101L, 0, 5L), (101L, 1, 6L)))
    val screened = Multimodal.audioAlignPairs(hot, maxDistance = 0,
      minMatches = 2, maxHashFreq = 10)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(screened == Set((100L, 101L, 0, 2L)))
  }

  test("audio near-dup rides the generic signature machinery " +
    "unchanged: pairs via signaturePairs, screen via " +
    "signaturePairsAgainst") {
    // two dup groups (gain/rate variants) + one loner
    val rows = Seq(
      (10L, toneWav(groupPattern(0), 8000f)),
      (11L, toneWav(groupPattern(0), 16000f, gain = 0.5)),
      (20L, toneWav(groupPattern(3), 8000f)),
      (21L, toneWav(groupPattern(3), 8000f, gain = 0.25)),
      (30L, toneWav(groupPattern(6), 8000f)))
    val sigs = Multimodal.audioHashes(mediaDf(rows))
    val pairs = graft.operators.Dedup.signaturePairs(sigs, "media_id",
        "audio_hash", maxDistance = 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L), (20L, 21L)))
    // screen face: a resampled batch copy finds its corpus source
    val batch = mediaDf(Seq((99L, toneWav(groupPattern(0), 16000f))))
    val hits = graft.operators.Dedup.signaturePairsAgainst(
        Multimodal.audioHashes(batch), sigs, "media_id", "audio_hash",
        maxDistance = 4)
      .select($"id_b", $"id_c").as[(Long, Long)].collect().toSet
    assert(hits == Set((99L, 10L), (99L, 11L)))
  }
}
