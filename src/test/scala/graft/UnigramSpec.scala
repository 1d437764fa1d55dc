package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram

/** Unigram-LM tokenizer pins (Kudo 2018). Load-bearing tests are the
  * RANDOMIZED equality of the Viterbi encoder against exhaustive
  * segmentation enumeration (an independent reference sharing no code
  * with the DP), and the EXACT distributed == driver-cutover training
  * equality that the micro-unit fixed-point accumulation exists to
  * guarantee — the BpeSpec clean-room discipline. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  /** exhaustive reference: enumerate EVERY segmentation (vocab pieces
    * plus single-code-point fallback), return (best score, min piece
    * count among best). */
  private def bruteBest(w: String, scores: Map[String, Double],
                        fallback: Double): (Double, Int) = {
    val cps = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.result()
    }
    val n = cps.length
    var best = Double.NegativeInfinity
    var bestCnt = Int.MaxValue
    def rec(pos: Int, acc: Double, cnt: Int): Unit = {
      if (pos == n) {
        if (acc > best || (acc == best && cnt < bestCnt)) {
          best = acc; bestCnt = cnt
        }
      } else {
        var end = pos + 1
        while (end <= n) {
          val piece = cps.slice(pos, end).mkString
          val s = scores.get(piece) match {
            case Some(x) => Some(x)
            case None => if (end == pos + 1) Some(fallback) else None
          }
          s.foreach(x => rec(end, acc + x, cnt + 1))
          end += 1
        }
      }
    }
    rec(0, 0.0, 0)
    (best, bestCnt)
  }

  private def scoreOf(pieces: Seq[String], scores: Map[String, Double],
                      fallback: Double): Double =
    pieces.map(p => scores.getOrElse(p,
      { assert(p.codePointCount(0, p.length) == 1,
          s"fallback piece '$p' is not a single code point"); fallback }))
      .sum

  test("viterbiWord == exhaustive enumeration, randomized") {
    val rnd = new scala.util.Random(20260815L)
    val alpha = "abcde"
    for (_ <- 1 to 300) {
      val w = (1 to (1 + rnd.nextInt(9)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      // random vocab: substrings of w plus noise pieces
      val subs = (for {
        i <- 0 until w.length; l <- 1 to math.min(4, w.length - i)
      } yield w.substring(i, i + l)).distinct
      val vocab = rnd.shuffle(subs).take(1 + rnd.nextInt(subs.length))
        .map(p => p -> -(1.0 + rnd.nextInt(20))).toMap
      val fb = -50.0
      val got = Unigram.viterbiWord(w, vocab, maxLen = 4, fallback = fb)
      assert(got.mkString == w, s"lossless violated for '$w': $got")
      val gotScore = scoreOf(got, vocab, fb)
      val (wantScore, wantCnt) = bruteBest(w, vocab, fb)
      assert(math.abs(gotScore - wantScore) < 1e-9,
        s"word '$w' vocab $vocab: viterbi $gotScore != brute $wantScore ($got)")
      assert(got.length == wantCnt,
        s"word '$w': tie-break pieces ${got.length} != min count $wantCnt")
    }
  }

  test("bigram-face arithmetic: chars -10, bigrams -15 => ceil(len/2) pieces") {
    val scores = Map("a" -> -10.0, "b" -> -10.0, "c" -> -10.0,
      "ab" -> -15.0, "bc" -> -15.0, "ba" -> -15.0, "ca" -> -15.0,
      "cb" -> -15.0, "ac" -> -15.0, "aa" -> -15.0, "bb" -> -15.0,
      "cc" -> -15.0)
    for (w <- Seq("a", "ab", "abc", "abca", "cbacb", "aabbcc")) {
      val got = Unigram.viterbiWord(w, scores, 2, -100.0)
      assert(got.length == (w.length + 1) / 2, s"'$w' -> $got")
      assert(got.count(_.length == 1) == w.length % 2, s"'$w' -> $got")
      assert(got.mkString == w)
    }
  }

  test("char fallback is the full code point (surrogate-safe) and lossless") {
    val scores = Map("ab" -> -1.0)
    val w = "ab😀ab" // emoji between two known pieces
    val got = Unigram.viterbiWord(w, scores, 2, -99.0)
    assert(got == Seq("ab", "😀", "ab"))
    assert(got.mkString == w)
  }

  test("encode: null -> null, empty -> empty, duplicate vocab rows take max") {
    val vocab = Seq(("ab", -5.0), ("ab", -1.0), ("a", -10.0), ("b", -10.0))
      .toDF("piece", "log_prob")
    val df = Seq((1L, "ab ab"), (2L, ""), (3L, null: String))
      .toDF("id", "text")
    val out = Unigram.encode(df, "text", vocab).orderBy("id")
      .select("ug_tokens").collect()
    // max(-1) for "ab" beats a+b (-20): whole piece chosen
    assert(out(0).getSeq[String](0) == Seq("ab", "ab"))
    assert(out(1).getSeq[String](0) == Seq.empty[String])
    assert(out(2).isNullAt(0))
    val cnt = Unigram.tokenCount(df, "text", vocab).orderBy("id")
      .select("ug_count").collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(cnt.toSeq == Seq(2, 0, -1)) // size(null) = -1, Spark semantics
  }

  test("seedCandidates: hand-computed counts, repartition-invariant") {
    val df = Seq("aa ab", "aa", "aa").toDF("text")
    // words: aa freq 3, ab freq 1. substrings maxLen 2, positional:
    // aa: a(pos1), a(pos2), aa -> a:2 per word * 3 = 6 ; aa: 3
    // ab: a:1, b:1, ab:1
    val want = Map("a" -> 7L, "aa" -> 3L, "b" -> 1L, "ab" -> 1L)
    for (p <- Seq(1, 7)) {
      val got = Unigram.seedCandidates(df.repartition(p), "text",
          maxPieceLen = 2, seedSize = 10)
        .as[(String, Long)].collect().toMap
      assert(got == want, s"partitions=$p: $got")
    }
    // top-k tie-break: cnt desc then piece asc
    val top2 = Unigram.seedCandidates(df, "text", 2, 2)
      .as[(String, Long)].collect().toSeq
    assert(top2 == Seq(("a", 7L), ("aa", 3L)))
  }

  test("wordExpectations: hand-computed lattice posterior, micro-units") {
    val scores = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -1.0)
    val got = Unigram.wordExpectations("ab", 1000L, scores, 2).toMap
    // paths: [ab] mass e^-1, [a,b] mass e^-2; Z = e^-1 + e^-2
    val pAb = math.exp(-1.0) / (math.exp(-1.0) + math.exp(-2.0))
    val pSplit = 1.0 - pAb
    assert(got("ab") == math.round(pAb * 1000L * 1e6))
    assert(got("a") == math.round(pSplit * 1000L * 1e6))
    assert(got("b") == math.round(pSplit * 1000L * 1e6))
  }

  private val corpus = Seq(
    "the cat sat on the mat", "the dog sat on the log",
    "a cat and a dog", "the the the cat", "dog dog log mat",
    "seasons in the sun", "cats sat on mats", "and on and on")

  test("train: distributed == driver-cutover EXACT equality") {
    val df = corpus.toDF("text")
    val local = Unigram.train(df, "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 64, emIters = 2,
      driverCutover = 1L << 20)
    assert(Unigram.lastTrainPathDiag == "local")
    val dist = Unigram.train(df.repartition(7), "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 64, emIters = 2, driverCutover = 0L)
    assert(Unigram.lastTrainPathDiag == "distributed")
    val a = local.orderBy("piece").as[(String, Double)].collect().toSeq
    val b = dist.orderBy("piece").as[(String, Double)].collect().toSeq
    assert(a == b, "micro-unit accumulation must make the paths identical")
  }

  test("train: alphabet always kept, multi-cp pieces respect vocabSize") {
    val df = corpus.toDF("text")
    val vocab = Unigram.train(df, "text", vocabSize = 12,
      maxPieceLen = 4, seedSize = 64, emIters = 1)
      .as[(String, Double)].collect()
    val pieces = vocab.map(_._1).toSet
    val chars = corpus.flatMap(_.split("\\s+")).flatMap(_.toSeq)
      .map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"alphabet missing: ${chars -- pieces}")
    val multi = pieces.filter(_.length > 1)
    assert(multi.size <= math.max(0, 12 - chars.size))
    // probabilities normalize
    val tot = vocab.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(tot - 1.0) < 1e-6, s"sum exp(log_prob) = $tot")
  }

  test("EM does not decrease corpus marginal likelihood") {
    val df = corpus.toDF("text")
    // vocabSize large enough that pruning keeps everything: the
    // comparison is EM-only (fixed model family)
    val v0 = Unigram.train(df, "text", vocabSize = 500,
      maxPieceLen = 4, seedSize = 64, emIters = 0)
      .as[(String, Double)].collect().toMap
    val v2 = Unigram.train(df, "text", vocabSize = 500,
      maxPieceLen = 4, seedSize = 64, emIters = 2)
      .as[(String, Double)].collect().toMap
    def loglik(scores: Map[String, Double]): Double = {
      val words = corpus.flatMap(_.toLowerCase.split("\\s+"))
        .filter(_.nonEmpty)
      words.map { w =>
        // forward pass, clean-room
        val n = w.length
        val a = Array.fill(n + 1)(Double.NegativeInfinity)
        a(0) = 0.0
        for (i <- 1 to n; l <- 1 to math.min(4, i)) {
          scores.get(w.substring(i - l, i)).foreach { s =>
            if (a(i - l) > Double.NegativeInfinity) {
              val c = a(i - l) + s
              a(i) = if (a(i) == Double.NegativeInfinity) c
                else math.max(a(i), c) + math.log1p(
                  math.exp(math.min(a(i), c) - math.max(a(i), c)))
            }
          }
        }
        a(n)
      }.sum
    }
    val l0 = loglik(v0); val l2 = loglik(v2)
    // tolerance absorbs the micro-unit (1e-6 relative) rounding noise
    assert(l2 >= l0 - 1e-3, s"EM decreased likelihood: $l0 -> $l2")
  }

  test("seedCandidates plan: distributed top-k, no single-partition funnel") {
    val df = corpus.toDF("text")
    val plan = Unigram.seedCandidates(df, "text", maxPieceLen = 4,
      seedSize = 50).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "the seed top-k must be a distributed TakeOrderedAndProject")
    assert(!"\\bWindow\\b".r.findFirstIn(plan).isDefined,
      "no window rank (a global window would funnel one task)")
    assert(!plan.contains("Exchange SinglePartition"),
      "no single-partition exchange in the seed pass")
  }

  test("saveVocab/loadVocab: exact round-trip, stamp and corruption refusal") {
    val df = corpus.toDF("text")
    val fitted = Unigram.train(df, "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 64, emIters = 1)
    val p = java.nio.file.Files
      .createTempDirectory("graft_ug_spec").toString
    Unigram.saveVocab(fitted, p, vocabSize = 40, maxPieceLen = 4)
    val back = Unigram.loadVocab(spark, p, vocabSize = 40, maxPieceLen = 4)
    assert(back.orderBy("piece").as[(String, Double)].collect().toSeq ==
      fitted.orderBy("piece").as[(String, Double)].collect().toSeq,
      "persisted vocab must round-trip exactly")
    // param mismatch refused with a message naming both sides
    val e1 = intercept[IllegalArgumentException] {
      Unigram.loadVocab(spark, p, vocabSize = 40, maxPieceLen = 6) }
    assert(e1.getMessage.contains("maxPieceLen"))
    val e2 = intercept[IllegalArgumentException] {
      Unigram.loadVocab(spark, p, vocabSize = 99, maxPieceLen = 4) }
    assert(e2.getMessage.contains("vocabSize"))
    // a param-less parquet is not a model file
    val raw = java.nio.file.Files
      .createTempDirectory("graft_ug_spec_raw").toString
    fitted.write.mode("overwrite").parquet(raw)
    val e3 = intercept[IllegalArgumentException] {
      Unigram.loadVocab(spark, raw, vocabSize = 40, maxPieceLen = 4) }
    assert(e3.getMessage.contains("missing columns"))
  }

  test("train + encode round-trips losslessly, OOV chars included") {
    val df = corpus.toDF("text")
    val vocab = Unigram.train(df, "text", vocabSize = 60,
      maxPieceLen = 4, seedSize = 64, emIters = 1)
    val probe = Seq((1L, "The CAT saw zebras 😀 leap"))
      .toDF("id", "text") // z/Z and the emoji are OOV
    val enc = Unigram.encode(probe, "text", vocab).collect()(0)
      .getSeq[String](2)
    assert(enc.mkString == "thecatsawzebras😀leap")
  }

  test("marker mode (r18): pre-tokenization shapes — dummy prefix, " +
    "one ▁ per whitespace char, trailing-space token, tab/newline " +
    "normalize, JVM == column twin") {
    val cases = Seq(
      "it is" -> Seq("▁it", "▁is"),
      "it  is" -> Seq("▁it", "▁▁is"),     // multi-space preserved
      " a" -> Seq("▁▁a"),                  // leading space + dummy
      "a " -> Seq("▁a", "▁"),              // trailing space token
      "a\tb\nc" -> Seq("▁a", "▁b", "▁c"),  // tab/newline -> marker
      "" -> Seq("▁"),                      // empty: the bare dummy
      "MiXeD Case" -> Seq("▁mixed", "▁case"))
    cases.foreach { case (in, want) =>
      assert(Unigram.markerWordsJvm(in).toSeq == want, s"jvm: '$in'")
    }
    val got = cases.map(_._1).zipWithIndex.map { case (s, i) =>
      (i.toLong, s) }.toDF("id", "text")
      .select($"id", graft.functions.TextFunctions
        .markerTokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i.toLong) == want, s"column twin case $i") }
    // null text -> null (no phantom dummy token)
    assert(Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(graft.functions.TextFunctions.markerTokens($"text"))
      .head().isNullAt(0))
  }

  test("marker mode: train + encode round-trips losslessly INCLUDING " +
    "space multiplicity; ▁ enters the alphabet; markerDecode is the " +
    "exact inverse") {
    val docs = (corpus ++ Seq("double  space  here", " leading",
      "trailing ", "tabs\there")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
    val vocab = Unigram.train(docs, "text", vocabSize = 80,
      maxPieceLen = 5, seedSize = 128, emIters = 1, marker = true)
    val pieces = vocab.select($"piece").as[String].collect().toSet
    assert(pieces.contains("▁")) // the marker is alphabet
    assert(pieces.exists(p => p.startsWith("▁") && p.length > 1),
      "no ▁-prefixed multi-char piece learned")
    val enc = Unigram.encode(docs, "text", vocab, marker = true)
    val bad = enc.select($"text",
        Unigram.markerDecode($"ug_tokens").as("rt"),
        regexp_replace(graft.expressions.TextExpressions
          .rootLower($"text"), "\\s", " ").as("want"))
      .filter($"rt" =!= $"want").collect()
    assert(bad.isEmpty, bad.mkString("; "))
    // and an OOV probe round-trips too (char fallback + markers)
    val probe = Seq((1L, "NEW  zebras 😀  twice ")).toDF("id", "text")
    val rt = Unigram.encode(probe, "text", vocab, marker = true)
      .select(Unigram.markerDecode($"ug_tokens")).head().getString(0)
    assert(rt == "new  zebras 😀  twice ")
  }

  test("marker mode: persistence stamps the mode; serving the vocab " +
    "in the other mode is refused") {
    val df = corpus.toDF("text")
    val vocab = Unigram.train(df, "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 64, emIters = 1, marker = true)
    val p = java.nio.file.Files
      .createTempDirectory("ug_marker_vocab").toString
    Unigram.saveVocab(vocab, p, vocabSize = 40, maxPieceLen = 4,
      marker = true)
    val back = Unigram.loadVocab(spark, p, vocabSize = 40,
      maxPieceLen = 4, marker = true)
    assert(back.collect().toSet == vocab.collect().toSet)
    intercept[IllegalArgumentException] {
      Unigram.loadVocab(spark, p, vocabSize = 40, maxPieceLen = 4,
        marker = false)
    }
  }

  test("pruneMode loss vs expected: the two published rules disagree " +
    "on the designed fixture, loss path is cutover-invariant") {
    // 'ab' carries the most posterior MASS (10 occurrences, and the
    // 6+6 standalone a's and b's keep the split segmentation live
    // but subdominant) — the expected-count rule keeps it. Removing
    // it is still CHEAP (the [a, b] alternative costs ~1 nat per
    // occurrence), while 'cd''s characters exist ONLY inside it, so
    // its removal forces two floored-alphabet pieces — a ~30-nat
    // per-occurrence gap × 4 occurrences. The likelihood-loss rule
    // therefore keeps 'cd'. vocabSize = 4 alphabet + 1 multi slot.
    val words = Seq.fill(6)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(10)("ab") ++ Seq.fill(4)("cd")
    val df = words.map(Tuple1(_)).toDF("text")
    def multiPieces(mode: String, cutover: Long = 1L << 20): Set[String] =
      Unigram.train(df, "text", vocabSize = 5, maxPieceLen = 2,
          seedSize = 64, emIters = 2, driverCutover = cutover,
          pruneMode = mode)
        .collect().map(_.getString(0)).filter(_.length > 1).toSet
    val expected = multiPieces("expected")
    val loss = multiPieces("loss")
    assert(expected == Set("ab"),
      s"expected-count rule should keep the mass leader, got $expected")
    assert(loss == Set("cd"),
      s"likelihood-loss rule should keep the irreplaceable piece, got $loss")
    // exact-integer Viterbi counts: distributed == driver cutover
    assert(multiPieces("loss", cutover = 0L) == loss)
    intercept[IllegalArgumentException] {
      Unigram.train(df, "text", vocabSize = 5, pruneMode = "both")
    }
  }
}
