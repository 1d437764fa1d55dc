package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def tdf(xs: (Int, String)*) = xs.toDF("id", "txt")

  test("tokens: empty, whitespace, unicode, punctuation-only") {
    val d = tdf(1 -> "Hello  World", 2 -> "", 3 -> "   ", 4 -> "¡héllo!",
      5 -> "...")
    val got = d.select($"id", TF.tokens($"txt").as("t")).collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(got(1) == Seq("hello", "world"))
    assert(got(2).isEmpty && got(3).isEmpty)
    assert(got(4) == Seq("¡héllo!"))
    assert(got(5) == Seq("..."))
  }

  test("tokenCount and bpeish count") {
    val d = tdf(1 -> "a b c", 2 -> "don't stop!")
    val got = d.select($"id", TF.tokenCount($"txt"),
      TF.bpeishTokenCount($"txt")).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(1) == ((3, 3)))
    // don't stop! -> [don][']​[t][stop][!] = 5 bpe-ish units, 2 ws tokens
    assert(got(2)._1 == 2 && got(2)._2 == 5)
  }

  test("word shingles: short docs yield empty, no partial shingles") {
    val d = tdf(1 -> "a b c d", 2 -> "a b", 3 -> "")
    val got = d.select($"id", TF.wordShingles($"txt", 3).as("s")).collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(got(1) == Seq("a b c", "b c d"))
    assert(got(2).isEmpty && got(3).isEmpty)
  }

  test("char shingles") {
    val got = tdf(1 -> "AB cd").select(TF.charShingles($"txt", 2))
      .head().getSeq[String](0)
    assert(got == Seq("ab", "b ", " c", "cd"))
  }

  test("jaccard") {
    val d = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = d.select(TF.jaccard($"x", $"y")).head().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("x", "y")
    assert(empty.select(TF.jaccard($"x", $"y")).head().getDouble(0) == 0.0)
  }

  test("native jaccard expression == column-math formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(40).select(TF.wordShingles(col("text"), 3).as("sh"))
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .select(TF.jaccard($"a.sh", $"b.sh").as("fast"),
        TF.jaccardHof($"a.sh", $"b.sh").as("spec"))
    assert(pairs.filter($"fast" =!= $"spec").count() == 0)
    // duplicate elements behave as sets in both formulations
    val dup = Seq((Seq("a", "a", "b"), Seq("a", "c", "c"))).toDF("x", "y")
    val both = dup.select(TF.jaccard($"x", $"y"), TF.jaccardHof($"x", $"y"))
      .head()
    assert(both.getDouble(0) == both.getDouble(1))
  }

  test("fingerprint: deterministic, order-sensitive, whitespace-robust") {
    val d = tdf(1 -> "the quick fox", 2 -> "the  QUICK   fox",
      3 -> "fox quick the")
    val fp = d.select($"id", TF.fingerprint($"txt")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fp(1) == fp(2)) // case/whitespace normalized
    assert(fp(1) != fp(3)) // order matters
  }

  test("langId picks each language's marker-heavy text") {
    val d = tdf(
      1 -> "the cat and the dog are in that house with this",
      2 -> "el perro y la casa de los que por una como",
      3 -> "le chat est dans les maisons pour une avec sur",
      4 -> "der hund und die katze ist nicht ein mit auf",
      5 -> "这是一个中文的句子我们在这里")
    val got = d.select($"id", TF.langId($"txt")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got == Map(1 -> "en", 2 -> "es", 3 -> "fr", 4 -> "de", 5 -> "zh"))
  }

  // the synthetic documents table uses English DB-jargon vocabulary for
  // EVERY lang label, so the label is not recoverable from content; pin
  // the deterministic property instead: marker-bearing text -> en.
  test("langId classifies the synthetic English-vocabulary docs as en") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").rlike("(^| )the( |$)"))
    val n = docs.count()
    val en = docs.filter(TF.langId(col("text")) === "en").count()
    assert(n > 0 && en == n, s"$en of $n 'the'-bearing docs classified en")
  }

  test("chunkTokens: sliding windows cover all tokens, overlap honored") {
    import spark.implicits._
    val d = tdf(
      1 -> (1 to 40).map(i => s"w$i").mkString(" "),
      2 -> "a b c", 3 -> "   ",
      4 -> (1 to 33).map(i => s"t$i").mkString(" "))
    val r = d.select($"id", TF.chunkTokens($"txt", 32, 8).as("c"))
      .as[(Int, Seq[String])].collect().toMap
    // 40 tokens, step 24: windows [1..32], [25..40]
    assert(r(1) == Seq((1 to 32).map(i => s"w$i").mkString(" "),
      (25 to 40).map(i => s"w$i").mkString(" ")))
    assert(r(2) == Seq("a b c"))     // short doc: one whole chunk
    assert(r(3) == Seq())            // whitespace-only: no chunks
    // 33 tokens: tail window is mostly overlap but still emitted
    assert(r(4).map(_.split(" ").length) == Seq(32, 9))
    // overlap 0 partitions exactly
    val e = d.filter($"id" === 1)
      .select(TF.chunkTokens($"txt", 10).as("c")).as[Seq[String]].head()
    assert(e.map(_.split(" ").length) == Seq(10, 10, 10, 10))
  }

  test("redactPii: email/ssn/ipv4 placeholders, order-stable") {
    val d = tdf(
      1 -> "mail me at jane.doe+x@sub.example.co.uk today",
      2 -> "server 192.168.001.1 and 10.0.0.7 up",
      3 -> "ssn 123-45-6789 on file",
      4 -> "mixed: a@b.io 1.2.3.4 987-65-4321",
      5 -> "no pii here, just 3.14 and v1.2 and a-b-c")
    val r = d.select($"id", TF.redactPii($"txt").as("red"))
      .as[(Int, String)].collect().toMap
    assert(r(1) == "mail me at <EMAIL> today")
    assert(r(2) == "server <IPV4> and <IPV4> up")
    assert(r(3) == "ssn <SSN> on file")
    assert(r(4) == "mixed: <EMAIL> <IPV4> <SSN>")
    // near-misses survive: short decimals, version strings, a-b-c
    assert(r(5) == "no pii here, just 3.14 and v1.2 and a-b-c")
  }

  test("qualityScore in [0,1], penalizes junk") {
    val d = tdf(1 -> ("the data of this table is in the file and it " * 4),
      2 -> "!!!???!!!...", 3 -> "")
    val q = d.select($"id", TF.qualityScore($"txt")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1) > q(2) && q(1) > q(3))
  }

  test("native word-shingle expression == column-math formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(TF.wordShingles(col("text"), 3).as("a"),
        TF.wordShinglesHof(col("text"), 3).as("b"))
      .filter($"a" =!= $"b").count()
    assert(diff == 0)
    // unicode + mixed whitespace edge
    val edge = tdf(1 -> " Ä  b\tC d ").select(
      TF.wordShingles($"txt", 2).as("a"), TF.wordShinglesHof($"txt", 2).as("b"))
      .head()
    assert(edge.getSeq[String](0) == edge.getSeq[String](1))
  }

  test("native simhash expression == column-math formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val diff = docs.select(TF.simhash(col("text")).as("a"),
        TF.simhashHof(col("text")).as("b"))
      .filter($"a" =!= $"b").count()
    assert(diff == 0)
  }

  test("native portable simhash == column-math md5 formulation") {
    // the md5 nibble-packing in SimHashMd5.compute must equal
    // conv(substring(md5,1,15),16,10)'s value bit for bit — the hof
    // re-derives it through Spark's own md5/conv chain
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val diff = docs.select(TF.simhashPortable(col("text")).as("a"),
        TF.simhashPortableHof(col("text")).as("b"))
      .filter($"a" =!= $"b").count()
    assert(diff == 0)
    // 60-bit contract: no portable fingerprint sets bits 60..63
    val high = docs.select(TF.simhashPortable(col("text")).as("a"))
      .filter(shiftright($"a", 60) =!= 0L).count()
    assert(high == 0)
  }

  test("native minhash expression == column-math formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
      .select(TF.wordShingles(col("text"), 3).as("sh"))
      .filter(size($"sh") > 0)
    val diff = docs.select(TF.minhashSignature($"sh", 16).as("a"),
        TF.minhashSignatureHof($"sh", 16).as("b"))
      .filter($"a" =!= $"b").count()
    assert(diff == 0)
  }

  test("minhash agreement tracks true jaccard") {
    // superset doc whose EXTRA shingles include small base hashes —
    // the case that collapsed the pre-fix mixed-width hash family
    // (31-bit base hashes under a 2^61-1 modulus are nearly monotone,
    // so every hash function picked the same global-min shingle:
    // 3/64 agreement at true jaccard 0.75)
    val c0 = (1 to 20).map(k => s"w$k").mkString(" ")
    val sup = c0 + " " + (21 to 26).map(k => s"w$k").mkString(" ")
    val sigs = Seq(c0, sup).toDF("text")
      .select(TF.minhashSignature(TF.wordShingles($"text", 3), 64).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val agree = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    // true jaccard = 18/24 = 0.75; E[agree] = 48, sd ~ 3.5
    assert(agree >= 34 && agree <= 62, s"agreement $agree/64 is not ~0.75")
  }

  test("hammingDistance and simhashChunks") {
    val d = Seq((0L, -1L), (5L, 4L)).toDF("a", "b")
    val got = d.select(TF.hammingDistance($"a", $"b")).collect()
      .map(_.getInt(0)).toSeq
    assert(got == Seq(64, 1))
    val chunks = Seq(Tuple1(0x0123456789abcdefL)).toDF("s")
      .select(TF.simhashChunks($"s", 4)).head().getSeq[org.apache.spark.sql.Row](0)
    assert(chunks.map(_.getLong(1)) == Seq(0xcdefL, 0x89abL, 0x4567L, 0x0123L))
  }

  test("repetitionRatio and lineDedup (Gopher/C4-style rules)") {
    val d = Seq(
      (1L, "a b c a b c a b c"),      // 7 3-gram slots, 3 distinct
      (2L, "one two three four"),     // no repeats
      (3L, "x y"),                    // shorter than n -> 0
      (4L, "l1\nl2\nl1\nl3")).toDF("id", "text")
    val rep = d.select($"id", TF.repetitionRatio($"text", 3)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rep(1L) - (1.0 - 3.0 / 7.0)) < 1e-12)
    assert(rep(2L) == 0.0 && rep(3L) == 0.0)
    val ld = d.filter($"id" === 4)
      .select(TF.lineDedup($"text")).head().getString(0)
    assert(ld == "l1\nl2\nl3")
  }

  test("normalizeUrl: canonical recipe, non-URLs pass through") {
    import graft.functions.UrlFunctions.normalizeUrl
    val cases = Seq(
      // scheme+host lowercase, www/default-port/fragment stripped,
      // tracking params dropped, survivors sorted, trailing slash cut
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag"
        -> "https://example.com/a/b?a=1&b=2",
      "http://example.com:80/" -> "http://example.com",
      // non-default port and path case survive
      "http://Example.com:8080/PaTh/" -> "http://example.com:8080/PaTh",
      // all params tracking → no '?'
      "https://example.com/?utm_campaign=z&gclid=1" -> "https://example.com",
      "  https://example.com  " -> "https://example.com",
      "not a url" -> "not a url")
    val got = cases.map(_._1).toDF("u")
      .select(normalizeUrl($"u")).collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("byCanonicalUrl dedups on the canonical form, exact() policy") {
    import graft.operators.Dedup
    val d = Seq(
      (1L, "https://www.a.com/x/?b=2&a=1", 0.2),
      (2L, "HTTPS://A.COM:443/x?a=1&b=2#f", 0.9), // same canonical as 1
      (3L, "https://a.com/y", 0.5)
    ).toDF("doc_id", "url", "q")
    assert(Dedup.byCanonicalUrl(d, "url", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(Dedup.byCanonicalUrl(d, "url", "doc_id", keepCol = "q")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // helper column dropped, schema unchanged
    assert(Dedup.byCanonicalUrl(d, "url", "doc_id").columns.toSeq ==
      Seq("doc_id", "url", "q"))
  }

  test("normalizeUnicode: forms, identity fast path, null, codegen") {
    import graft.functions.{TextFunctions => TF}
    val composed = "caf\u00e9 nfc\u00f1"          // U+00E9, U+00F1
    val decomposed = "cafe\u0301 nfcn\u0303"      // e+U+0301, n+U+0303
    val d = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val nfc = d.select($"id", TF.normalizeUnicode($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // both encodings collapse to the composed form under NFC
    assert(nfc(1L) == composed && nfc(2L) == composed)
    assert(nfc(3L) == "plain ascii")
    assert(nfc(4L) == null)
    // NFD goes the other way; NFKC folds compatibility chars (ﬁ → fi)
    val nfd = d.filter($"id" === 1)
      .select(TF.normalizeUnicode($"t", "NFD")).head().getString(0)
    assert(nfd == decomposed)
    val nfkc = Seq("\ufb01le").toDF("t")
      .select(TF.normalizeUnicode($"t", "NFKC")).head().getString(0)
    assert(nfkc == "file")
    // idempotent, and equal whole-stage-codegen vs interpreted
    val twice = d.filter($"id" === 2).select(
      TF.normalizeUnicode(TF.normalizeUnicode($"t"))).head().getString(0)
    assert(twice == composed)
    // plan pin over a codegen-able source (a local Seq collapses to
    // LocalTableScan and bypasses codegen entirely)
    val plan = spark.range(4)
      .select(TF.normalizeUnicode(concat(lit("caf\u00e9 "), $"id")).as("n"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix is executedPlan.toString's WholeStageCodegen marker
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }

  test("vocabulary: counts, doc_freq, minCount, ordering") {
    import graft.operators.Vocabulary
    val d = Seq((1L, "a b a c"), (2L, "a b"), (3L, "c c C")).toDF("id", "txt")
    val v = Vocabulary.vocabulary(d, "id", "txt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a: 3 occurrences in 2 docs; c: 4 (lowercased) in 2 docs; b: 2 in 2
    assert(v.toSeq == Seq(("a", 3L, 2L), ("c", 4L, 2L), ("b", 2L, 2L))
      .sortBy { case (t, n, _) => (-n, t) }, s"got ${v.toSeq}")
    val pruned = Vocabulary.vocabulary(d, "id", "txt", minCount = 3)
      .select("token").as[String].collect().toSet
    assert(pruned == Set("a", "c"))
  }

  test("jaroWinkler: DuckDB-pinned values, threshold gate, codegen") {
    import graft.expressions.TextExpressions.jaroWinkler
    // every constant below was PROBED against DuckDB
    // jaro_winkler_similarity in r11 — bit-for-bit the oracle's values
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // textbook + boost
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964), // no prefix
      ("crate", "trace", 0.7333333333333334),     // prefix 0
      ("dwayne", "duane", 0.8400000000000001),
      ("ax", "az", 0.6666666666666666),  // jaro <= 0.7: NO boost
      ("ab", "ba", 0.0),                 // window 0: no matches
      ("a", "a", 1.0),
      ("a", "b", 0.0),
      ("abc", "", 0.0),
      ("", "", 0.0))                     // DuckDB: both-empty is 0
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(jaroWinkler($"a", $"b")).collect()
      .map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b, want), g) =>
      assert(g == want, s"jw($a, $b): got $g want $want")
    }
    // null propagates
    assert(Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(jaroWinkler($"a", $"b")).head().isNullAt(0))
    // SQL surface + whole-stage codegen
    graft.functions.GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT jaro_winkler('martha', 'marhta')")
      .head().getDouble(0) == 0.9611111111111111)
    val plan = spark.range(4)
      .select(jaroWinkler(concat(lit("ab"), $"id"), lit("ab0")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }

  test("collocations: bigram PMI hand values, minCount floor") {
    import graft.operators.Vocabulary
    val d = Seq((1L, "a b a b c")).toDF("id", "txt")
    // bigrams: (a,b) x2, (b,a), (b,c); tokens: a2 b2 c1; B=4, N=5
    val got = Vocabulary.collocations(d, "id", "txt", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(got.length == 1)
    val (w1, w2, c, pmi) = got.head
    assert((w1, w2, c) == (("a", "b", 2L)))
    assert(math.abs(pmi
      - math.log((2.0 / 4) / ((2.0 / 5) * (2.0 / 5)))) < 1e-12)
    // minCount 1 exposes the rest
    assert(Vocabulary.collocations(d, "id", "txt", minCount = 1)
      .count() == 3)
    // single-token docs contribute no bigrams and don't crash
    assert(Vocabulary.collocations(Seq((1L, "solo")).toDF("id", "txt"),
      "id", "txt", minCount = 1).count() == 0)
  }

  test("zipfFit: recovers the exponent of an exact power law") {
    import graft.operators.Vocabulary
    // token ti appears round(1000 / i) times, i = 1..50 — freq ∝
    // rank^-1 by construction, so OLS on (ln rank, ln freq) must
    // recover slope ~ -1 with near-perfect fit (integer rounding of
    // the counts is the only deviation)
    val text = (1 to 50).flatMap { i =>
      Seq.fill(math.round(1000.0 / i).toInt)(f"t$i%02d")
    }.mkString(" ")
    val df = Seq((1L, text)).toDF("id", "txt")
    val r = Vocabulary.zipfFit(df, "id", "txt").collect().head
    assert(r.getLong(0) == 50L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 0.02,
      s"slope ${r.getDouble(1)}")
    assert(r.getDouble(3) > 0.999, s"r2 ${r.getDouble(3)}")
    // minCount trims the tail BEFORE ranking: vocab shrinks and the
    // fit runs on the trimmed set
    val trimmed = Vocabulary.zipfFit(df, "id", "txt", minCount = 100L)
      .collect().head
    assert(trimmed.getLong(0) == 10L) // 1000/i >= 100 for i <= 10
    assert(math.abs(trimmed.getDouble(1) - (-1.0)) < 0.02)
  }

  test("gopherFlags: every rule flips on its hand-built violator") {
    import org.apache.spark.sql.Row
    val good = ("the cat and dog sat with all of that fine crew " +
      "and they have been well fed onto mats ") * 3 // 60 words, clean
    val rows = Seq(
      (1L, good),
      (2L, "the of and " * 3),                        // 9 words: word_count fails
      (3L, ("a b c d " * 15) + "the of"),             // mean word len 1.13 < 3
      (4L, good + (" #tag" * 30)),                    // symbol ratio > 0.1
      (5L, (1 to 10).map(i => s"- bullet $i with the of and that")
        .mkString("\n")),                             // 100% bullet lines
      (6L, (1 to 10).map(i => s"line $i with the of and trailing dots ...")
        .mkString("\n")),                             // 100% ellipsis lines
      (7L, good + (" 123456" * 40)),                  // alpha-word ratio < 0.8
      (8L, "spark row hash " * 20))                   // zero gopher stopwords
      .toDF("id", "text")
    val f = rows.select(col("id"),
      TF.gopherFlags(col("text"), minWords = 20).as("g"))
      .orderBy("id").select("g.*").collect()
    def flags(r: Row): Seq[Boolean] = (0 to 7).map(r.getBoolean)
    assert(flags(f(0)).forall(identity), s"good doc must pass: ${f(0)}")
    assert(!f(1).getBoolean(0) && !f(1).getBoolean(7)) // word_count_ok
    assert(!f(2).getBoolean(1), s"mean_word_len must fail: ${f(2)}")
    assert(!f(3).getBoolean(2), s"symbol_ratio must fail: ${f(3)}")
    assert(!f(4).getBoolean(3), s"bullet must fail: ${f(4)}")
    assert(!f(5).getBoolean(4), s"ellipsis must fail: ${f(5)}")
    assert(!f(6).getBoolean(5), s"alpha_word must fail: ${f(6)}")
    assert(!f(7).getBoolean(6), s"stopword must fail: ${f(7)}")
    // each violator fails ONLY its own rule (plus pass) unless noted
    assert(f(4).getBoolean(7) == false && f(4).getBoolean(0))
  }

  test("c4CleanLines: terminal punctuation, min words, javascript " +
    "rule — retained lines only, order preserved (r15)") {
    import spark.implicits._
    val text = Seq(
      "This line has enough words and ends well.",
      "short.",                                      // < 5 words
      "This line has no terminal punctuation at all", // no end mark
      "Please enable JavaScript to view this page.",  // javascript
      "  A trimmed line with five words here!  ",     // trims, keeps
      "\"A quoted line with enough words here.\""     // ends in quote
    ).mkString("\n")
    val got = Seq(text).toDF("t")
      .select(TF.c4CleanLines($"t").as("c")).head().getString(0)
    assert(got == Seq(
      "This line has enough words and ends well.",
      "A trimmed line with five words here!",
      "\"A quoted line with enough words here.\"").mkString("\n"))
    // null text -> empty
    assert(Seq(null.asInstanceOf[String]).toDF("t")
      .select(TF.c4CleanLines($"t")).head().getString(0) == "")
  }

  test("CRLF twins behave like LF ones in gopherFlags' line rules " +
    "and lineDedup (the r16 \\r?\\n rule)") {
    import spark.implicits._
    val lf = "line one...\nline two\nline one...\nbody text here"
    val crlf = lf.replace("\n", "\r\n")
    val flags = Seq(lf, crlf).toDF("t")
      .select(TF.gopherFlags($"t").as("g")).select("g.*").collect()
    assert(flags(0) == flags(1)) // every rule identical on the twin
    val dedup = Seq(lf, crlf).toDF("t")
      .select(TF.lineDedup($"t")).as[String].collect()
    assert(dedup(0) == "line one...\nline two\nbody text here")
    assert(dedup(1) == dedup(0)) // CRLF dedups AND normalizes to LF
  }

  test("c4CleanLines: CRLF documents clean like LF ones (ADVICE " +
    "r15 — trim() strips only spaces, the \\r must die at the split)") {
    import spark.implicits._
    val lines = Seq(
      "This line has enough words and ends well.",
      "short.",
      "Another keeper line with plenty of words here!")
    def clean(sep: String): String =
      Seq(lines.mkString(sep)).toDF("t")
        .select(TF.c4CleanLines($"t")).head().getString(0)
    val want = Seq(lines(0), lines(2)).mkString("\n")
    assert(clean("\n") == want)
    // pre-fix, CRLF left '\r' on every line, the [.!?"]$ rule failed
    // for all of them, and whole pages cleaned to empty
    assert(clean("\r\n") == want)
  }

  test("c4PageFlags: sentence floor, lorem ipsum, curly brace, " +
    "null fail-safe (r15)") {
    import spark.implicits._
    def flags(t: String) = {
      val df = Seq(t).toDF("t")
      df.select(TF.c4PageFlags($"t", TF.c4CleanLines($"t")).as("f"))
        .select("f.*").head()
    }
    val good = (1 to 3).map(i =>
      s"Sentence number $i has exactly enough words.").mkString("\n")
    val g = flags(good)
    assert(g.getBoolean(0) && g.getBoolean(1) && g.getBoolean(2) &&
      g.getBoolean(3))
    val few = flags("Only one good sentence lives right here.")
    assert(!few.getBoolean(0) && !few.getBoolean(3))
    val lorem = flags(good + "\nAlso some Lorem Ipsum filler text here.")
    assert(!lorem.getBoolean(1) && !lorem.getBoolean(3))
    val brace = flags(good + "\nfunction f() { return 1; }")
    assert(!brace.getBoolean(2) && !brace.getBoolean(3))
    val n = flags(null)
    assert(!n.getBoolean(0) && !n.getBoolean(1) && !n.getBoolean(2) &&
      !n.getBoolean(3))
  }
}
