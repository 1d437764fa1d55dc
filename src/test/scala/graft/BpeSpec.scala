package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer/encoder pins. The load-bearing tests are the
  * RANDOMIZED equalities against `Naive` — an independent plain-Scala
  * reimplementation written from the algorithm statement (Sennrich
  * 2016), sharing no code with the distributed path — per the
  * repo-wide lesson that planted fixtures can mask a degenerate
  * estimator for rounds (the r7 minhash fix). */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** clean-room single-machine BPE: word counts → iterate (count
    * adjacent pairs weighted by word freq, argmax with freq desc /
    * left asc / right asc tie-break, merge leftmost-first). */
  private object Naive {
    def wordCounts(texts: Seq[String]): Map[String, Long] =
      texts.flatMap(t => t.trim.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).map { case (w, o) => w -> o.size.toLong }

    def symbols(w: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      (out += Bpe.EndOfWord).result()
    }

    def mergeOne(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }

    def train(texts: Seq[String], numMerges: Int,
              minFreq: Long): Seq[(Int, String, String, Long)] = {
      var tbl = wordCounts(texts).toSeq
        .map { case (w, f) => (symbols(w), f) }
        .filter(_._1.length >= 2)
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var rank = 0
      var done = false
      while (rank < numMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- tbl; i <- 0 until syms.length - 1)
          counts(syms(i) -> syms(i + 1)) =
            counts.getOrElse(syms(i) -> syms(i + 1), 0L) + f
        if (counts.isEmpty) done = true
        else {
          val ((l, r), f) = counts.minBy { case ((l, r), f) => (-f, l, r) }
          if (f < minFreq) done = true
          else {
            merges += ((rank, l, r, f))
            rank += 1
            tbl = tbl.map { case (s, fr) => (mergeOne(s, l, r), fr) }
              .filter(_._1.length >= 2)
          }
        }
      }
      merges.result()
    }

    /** encode by replaying merges IN RANK ORDER — the semantic
      * definition the production rank-greedy loop must equal. */
    def encode(text: String,
               merges: Seq[(Int, String, String, Long)]): Seq[String] =
      text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .filter(_.nonEmpty).toSeq.flatMap { w =>
          var syms = symbols(w)
          for ((_, l, r, _) <- merges.sortBy(_._1))
            syms = mergeOne(syms, l, r)
          syms
        }
  }

  private def trained(df: org.apache.spark.sql.DataFrame, n: Int,
                      minFreq: Long = 2L) =
    Bpe.train(df, "text", n, minFreq = minFreq)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  test("hand-computed micro corpus") {
    // "ab ab ab": one word, freq 3, syms (a, b, </w>). Pairs (a,b)=3
    // and (b,</w>)=3 tie on freq; left-asc breaks to (a,b). Then
    // (ab,</w>)=3 merges and the word retires at one symbol.
    val df = Seq("ab ab", "ab").toDF("text")
    assert(trained(df, 10) ==
      Seq((0, "a", "b", 3L), (1, "ab", "</w>", 3L)))
  }

  test("randomized: BOTH train paths == clean-room naive train") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val lexicon = Seq.fill(30)(
        (1 + rnd.nextInt(6)).times(() => ('a' + rnd.nextInt(4)).toChar)
          .mkString).distinct
      val texts = Seq.fill(60)(
        Seq.fill(5 + rnd.nextInt(15))(lexicon(rnd.nextInt(lexicon.size)))
          .mkString(" "))
      val expected = Naive.train(texts, 25, minFreq = 2L)
      // repartition(7): the argmax tie-break must make the merge
      // sequence independent of physical layout. driverCutover = 0
      // forces the distributed loop; the default takes the collected
      // local path — both must equal the naive reference exactly.
      val df = texts.toDF("text").repartition(7)
      val dist = Bpe.train(df, "text", 25, minFreq = 2L,
          driverCutover = 0L)
        .collect().map(r => (r.getInt(0), r.getString(1),
          r.getString(2), r.getLong(3))).toSeq
      assert(dist == expected, s"trial $trial (distributed)")
      assert(trained(df, 25) == expected, s"trial $trial (local)")
    }
  }

  test("mid-loop driver cutover: exact continuation of the merge loop") {
    // 6 distinct words; retirement shrinks the working set as words
    // fully merge, so with cutover = 4 (< the seed count) the loop
    // starts distributed and MUST finish locally mid-run — and the
    // merge table must still equal the clean-room trainer exactly.
    val texts = Seq("aa aa aa bb bb bb cc cc cc dd dd ee ee ff ff",
      "aa bb cc dd ee ff")
    val expected = Naive.train(texts, 20, minFreq = 2L)
    val df = texts.toDF("text").repartition(5)
    val got = Bpe.train(df, "text", 20, minFreq = 2L,
        checkpointEvery = 1, driverCutover = 4L)
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq
    assert(Bpe.lastTrainPathDiag == "distributed+midCutover",
      s"cutover did not engage (path=${Bpe.lastTrainPathDiag})")
    assert(got == expected)
    // sanity on the diagnostic's other values: cutover 0 stays
    // distributed, a big cutover goes straight local — same answer
    assert(Bpe.train(df, "text", 20, minFreq = 2L, driverCutover = 0L)
      .collect().length == expected.length)
    assert(Bpe.lastTrainPathDiag == "distributed")
    assert(trained(df, 20) == expected)
    assert(Bpe.lastTrainPathDiag == "local")
  }

  private implicit class Times(n: Int) {
    def times[A](f: () => A): Seq[A] = Seq.fill(n)(f())
  }

  test("randomized: rank-greedy encode == replay-in-rank-order encode") {
    val rnd = new scala.util.Random(13)
    val lexicon = Seq.fill(40)(
      (1 + rnd.nextInt(7)).times(() => ('a' + rnd.nextInt(5)).toChar)
        .mkString).distinct
    val texts = Seq.fill(50)(
      Seq.fill(4 + rnd.nextInt(12))(lexicon(rnd.nextInt(lexicon.size)))
        .mkString(" "))
    val train = texts.toDF("text")
    val merges = Bpe.train(train, "text", 30)
    val mergesLocal = merges.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // encode UNSEEN text too: new words exercise partial merges
    val fresh = Seq.fill(10)(
      Seq.fill(6)((1 + rnd.nextInt(8)).times(() =>
        ('a' + rnd.nextInt(5)).toChar).mkString).mkString(" "))
    val all = (texts.take(10) ++ fresh).zipWithIndex
      .map { case (t, i) => (i, t) }.toDF("id", "text")
    val got = Bpe.encode(all, "text", merges)
      .select($"id", $"bpe_tokens").as[(Int, Seq[String])]
      .collect().toMap
    for ((t, i) <- (texts.take(10) ++ fresh).zipWithIndex)
      assert(got(i) == Naive.encode(t, mergesLocal), s"doc $i")
  }

  test("encode round-trips the text and counts match") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val merges = Bpe.train(docs, "text", 40)
    val enc = Bpe.encode(docs, "text", merges)
      .select($"doc_id", $"text", $"bpe_tokens")
      .as[(Long, String, Seq[String])].collect()
    for ((_, text, toks) <- enc) {
      val rebuilt = toks.mkString("").replace(Bpe.EndOfWord, " ").trim
      val norm = text.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == norm)
      // every word contributes at least one token, at most its length+1
      assert(toks.count(_.endsWith(Bpe.EndOfWord)) ==
        norm.split(" ").count(_.nonEmpty))
    }
    val counted = Bpe.tokenCount(docs, "text", merges)
      .select($"doc_id", $"bpe_count").as[(Long, Int)].collect().toMap
    for ((id, _, toks) <- enc) assert(counted(id) == toks.size)
  }

  test("minFreq stops early; numMerges=0 and empty corpus are empty") {
    // all words distinct singletons → every pair freq 1 → minFreq=2
    // learns nothing
    val singletons = Seq("abc", "def", "ghi").toDF("text")
    assert(trained(singletons, 10, minFreq = 2L).isEmpty)
    // minFreq=1 learns from them fine
    assert(trained(singletons, 10, minFreq = 1L).nonEmpty)
    assert(trained(Seq("ab ab").toDF("text"), 0).isEmpty)
    assert(trained(Seq.empty[String].toDF("text"), 5).isEmpty)
    assert(trained(Seq("", "   ").toDF("text"), 5).isEmpty)
  }

  test("unicode: surrogate pairs are single symbols") {
    // U+1F600 is a surrogate pair in UTF-16; a char-level split would
    // produce broken halves that can never re-merge into valid text
    val emoji = new String(Character.toChars(0x1F600))
    val df = Seq(s"$emoji$emoji a", s"$emoji$emoji a").toDF("text")
    val merges = Bpe.train(df, "text", 5, minFreq = 2L)
    // no learned unit is a LONE surrogate half (the char-split bug)
    val units = merges.select($"left", $"right").as[(String, String)]
      .collect().flatMap(p => Seq(p._1, p._2))
    assert(units.forall(u => !(u.length == 1 && u.charAt(0).isSurrogate)))
    val enc = Bpe.encode(df.limit(1), "text", merges)
      .select($"bpe_tokens").as[Seq[String]].head()
    assert(enc.mkString("").replace(Bpe.EndOfWord, " ").trim
      == s"$emoji$emoji a")
    // the emoji survived as a unit somewhere in the token stream
    assert(enc.exists(_.contains(emoji)))
  }

  test("fluent DDF delegates match the operator surface") {
    import graft.ddf.DDF
    val docs = Seq("ab ab ba", "ab ba ba").toDF("text")
    val viaOp = Bpe.train(docs, "text", 5)
    val d = DDF(docs)
    val viaDdf = d.bpeTrain("text", 5)
    assert(viaDdf.toDF.collect().toSeq == viaOp.collect().toSeq)
    val enc = d.bpeEncode("text", viaDdf).toDF
      .select($"bpe_tokens").as[Seq[String]].collect()
    val cnt = d.bpeTokenCount("text", viaDdf).toDF
      .select($"bpe_count").as[Int].collect()
    assert(enc.map(_.size).toSeq == cnt.toSeq)
  }

  test("seedPairCounts argmax IS train's first merge (q132's claim)") {
    val rng = new scala.util.Random(4177)
    val words = Vector("ab", "abc", "bcd", "aa", "ba", "cab", "dab")
    val docs = (0 until 40)
      .map(_ => (0 until (1 + rng.nextInt(8)))
        .map(_ => words(rng.nextInt(words.length))).mkString(" "))
      .toDF("text")
    val top = Bpe.seedPairCounts(docs, "text")
      .orderBy($"f".desc, $"l".asc, $"r".asc).limit(1)
      .collect().head
    val first = Bpe.train(docs, "text", numMerges = 1, minFreq = 1L)
      .collect().head
    assert((top.getString(0), top.getString(1), top.getLong(2))
      == (first.getString(1), first.getString(2), first.getLong(3)))
  }

  test("null and empty text encode to null and empty") {
    val merges = Bpe.train(Seq("ab ab").toDF("text"), "text", 5)
    val df = Seq((1, "ab"), (2, ""), (3, null)).toDF("id", "text")
    val out = Bpe.encode(df, "text", merges)
      .select($"id", $"bpe_tokens").as[(Int, Seq[String])]
      .collect().toMap
    assert(out(1) == Seq("ab</w>"))
    assert(out(2) == Seq.empty)
    assert(out(3) == null)
  }

  // ---- SentencePiece ▁-marker mode (r18, VERDICT r17 item 6) ------------

  /** clean-room marker-mode pre-tokenizer + trainer: same loop as
    * [[Naive.train]] but words carry their ▁ prefixes (one per
    * ASCII-whitespace char, dummy leading space) and symbol sequences
    * have NO end-of-word sentinel. */
  private object NaiveMarker {
    def words(t: String): Seq[String] =
      "▁+[^▁]*".r.findAllIn(
        (" " + t.toLowerCase(java.util.Locale.ROOT))
          .replaceAll("\\s", "▁")).toSeq

    def symbols(w: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.result()
    }

    def train(texts: Seq[String], numMerges: Int,
              minFreq: Long): Seq[(Int, String, String, Long)] = {
      var tbl = texts.flatMap(words).groupBy(identity)
        .map { case (w, o) => (symbols(w), o.size.toLong) }.toSeq
        .filter(_._1.length >= 2)
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var rank = 0
      var done = false
      while (rank < numMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- tbl; i <- 0 until syms.length - 1)
          counts(syms(i) -> syms(i + 1)) =
            counts.getOrElse(syms(i) -> syms(i + 1), 0L) + f
        if (counts.isEmpty) done = true
        else {
          val ((l, r), f) = counts.minBy { case ((l, r), f) => (-f, l, r) }
          if (f < minFreq) done = true
          else {
            merges += ((rank, l, r, f))
            rank += 1
            tbl = tbl.map { case (s, fr) => (Naive.mergeOne(s, l, r), fr) }
              .filter(_._1.length >= 2)
          }
        }
      }
      merges.result()
    }
  }

  test("marker mode: hand-computed micro corpus, no </w> sentinel") {
    // words are "▁ab" ×3; syms (▁, a, b). Pairs (▁,a)=3 and (a,b)=3
    // tie on freq; UTF-8 left-asc breaks to (a,b) — 'a' (0x61) sorts
    // before '▁' (0xE2 0x96 0x81). Then (▁,ab)=3 merges and the word
    // retires. No merge ever touches </w> (marker mode has none).
    val df = Seq("ab ab", "ab").toDF("text")
    val got = Bpe.train(df, "text", 10, marker = true)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == Seq((0, "a", "b", 3L), (1, "▁", "ab", 3L)))
    assert(got.forall(m => !m._2.contains(Bpe.EndOfWord)
      && !m._3.contains(Bpe.EndOfWord)))
  }

  test("marker randomized: BOTH train paths == clean-room naive, " +
      "multi-space preserved") {
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 3) {
      val lexicon = Seq.fill(25)(
        (1 + rnd.nextInt(6)).times(() => ('a' + rnd.nextInt(4)).toChar)
          .mkString).distinct
      // random 1-3 space separators: marker mode must count "▁▁word"
      // and "▁word" as DIFFERENT words (space multiplicity is signal)
      val texts = Seq.fill(50)(
        Seq.fill(4 + rnd.nextInt(12))(lexicon(rnd.nextInt(lexicon.size)))
          .mkString(" " * (1 + rnd.nextInt(3))))
      val expected = NaiveMarker.train(texts, 25, minFreq = 2L)
      val df = texts.toDF("text").repartition(7)
      val dist = Bpe.train(df, "text", 25, minFreq = 2L,
          driverCutover = 0L, marker = true)
        .collect().map(r => (r.getInt(0), r.getString(1),
          r.getString(2), r.getLong(3))).toSeq
      assert(dist == expected, s"trial $trial (distributed)")
      val local = Bpe.train(df, "text", 25, minFreq = 2L, marker = true)
        .collect().map(r => (r.getInt(0), r.getString(1),
          r.getString(2), r.getLong(3))).toSeq
      assert(local == expected, s"trial $trial (local)")
    }
  }

  test("marker encode: markerDecode round-trips incl. multi-space; " +
      "piece stream is space-lossless") {
    import graft.operators.Unigram
    val texts = Seq("The  quick brown", "fox corp fox  fox",
      " lead space", "trail space ", "tab\there")
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val merges = Bpe.train(df, "text", 30, minFreq = 1L, marker = true)
    val out = Bpe.encode(df, "text", merges, marker = true)
      .select($"id", $"bpe_tokens",
        Unigram.markerDecode($"bpe_tokens").as("rt"))
      .as[(Int, Seq[String], String)].collect()
    for ((i, toks, rt) <- out) {
      // exact inverse of the normalizer: ROOT-lower, every ASCII
      // whitespace char → one space (multiplicity preserved)
      val norm = texts(i).toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s", " ")
      assert(rt == norm, s"doc $i")
      // markers are conserved exactly: total ▁ chars across pieces =
      // dummy prefix + one per whitespace char (NOT one per word —
      // "▁▁fox" may encode as ["▁","▁fox"], two ▁-initial pieces for
      // one word, so ▁-prefix counting is not a word count)
      assert(toks.map(_.count(_ == '▁')).sum ==
        1 + texts(i).count(_.toString.matches("\\s")),
        s"doc $i marker conservation")
      assert(toks.forall(!_.contains(Bpe.EndOfWord)), s"doc $i sentinel")
    }
    val counted = Bpe.tokenCount(df, "text", merges, marker = true)
      .select($"id", $"bpe_count").as[(Int, Int)].collect().toMap
    for ((i, toks, _) <- out) assert(counted(i) == toks.size)
  }

  test("marker stamp: mode mismatch refused both ways; unstamped " +
      "table passes as caller-asserted") {
    val df = Seq("ab ab", "ab").toDF("text")
    val mk = Bpe.train(df, "text", 5, marker = true)
    val ws = Bpe.train(df, "text", 5)
    val e1 = intercept[IllegalArgumentException] {
      Bpe.encode(df, "text", mk) // marker table, word-split serve
    }
    assert(e1.getMessage.contains("__marker"))
    val e2 = intercept[IllegalArgumentException] {
      Bpe.encode(df, "text", ws, marker = true)
    }
    assert(e2.getMessage.contains("__marker"))
    // pre-r18 tables have no stamp column: accepted as asserted
    val unstamped = ws.drop("__marker")
    assert(Bpe.encode(df, "text", unstamped).select($"bpe_tokens")
      .as[Seq[String]].head().nonEmpty)
  }

  test("marker seedPairCounts argmax IS marker train's first merge") {
    val rng = new scala.util.Random(991)
    val words = Vector("ab", "abc", "bcd", "aa", "ba", "cab", "dab")
    val docs = (0 until 40)
      .map(_ => (0 until (1 + rng.nextInt(8)))
        .map(_ => words(rng.nextInt(words.length)))
        .mkString(" " * (1 + rng.nextInt(2))))
      .toDF("text")
    val top = Bpe.seedPairCounts(docs, "text", marker = true)
      .orderBy($"f".desc, $"l".asc, $"r".asc).limit(1)
      .collect().head
    val first = Bpe.train(docs, "text", numMerges = 1, minFreq = 1L,
        marker = true)
      .collect().head
    assert((top.getString(0), top.getString(1), top.getLong(2))
      == (first.getString(1), first.getString(2), first.getLong(3)))
  }

  // ---- byte-level (GPT-2) mode (r18) ------------------------------------

  /** clean-room byte-level reference: independent reconstruction of
    * the bytes→unicode rule + the same published pre-tokenizer
    * pattern, feeding [[Naive]]'s loop shape. */
  private object NaiveByte {
    val b2c: Map[Int, Char] = {
      val printable = ((0x21 to 0x7E) ++ (0xA1 to 0xAC) ++
        (0xAE to 0xFF)).toSet
      var n = 0
      (0 until 256).map { b =>
        if (printable(b)) b -> b.toChar
        else { val c = (0x100 + n).toChar; n += 1; b -> c }
      }.toMap
    }

    def words(t: String): Seq[String] = {
      val m = java.util.regex.Pattern.compile(Bpe.ByteLevelPattern)
        .matcher(t)
      val out = Seq.newBuilder[String]
      while (m.find()) out += m.group()
      out.result()
    }

    def symbols(w: String): Vector[String] =
      w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => b2c(b & 0xFF).toString).toVector

    def train(texts: Seq[String], numMerges: Int,
              minFreq: Long): Seq[(Int, String, String, Long)] = {
      var tbl = texts.flatMap(words).groupBy(identity)
        .map { case (w, o) => (symbols(w), o.size.toLong) }.toSeq
        .filter(_._1.length >= 2)
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var rank = 0
      var done = false
      while (rank < numMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- tbl; i <- 0 until syms.length - 1)
          counts(syms(i) -> syms(i + 1)) =
            counts.getOrElse(syms(i) -> syms(i + 1), 0L) + f
        if (counts.isEmpty) done = true
        else {
          val ((l, r), f) = counts.minBy { case ((l, r), f) => (-f, l, r) }
          if (f < minFreq) done = true
          else {
            merges += ((rank, l, r, f))
            rank += 1
            tbl = tbl.map { case (s, fr) => (Naive.mergeOne(s, l, r), fr) }
              .filter(_._1.length >= 2)
          }
        }
      }
      merges.result()
    }
  }

  test("byte-level: bytes→unicode table anchors and bijection") {
    assert(Bpe.byteToChar(0x20) == 'Ġ') // space → Ġ
    assert(Bpe.byteToChar(0x0A) == 'Ċ') // newline → Ċ
    assert(Bpe.byteToChar('A'.toInt) == 'A')
    assert(Bpe.byteToChar(0xFF) == 'ÿ')
    assert(Bpe.byteToChar.distinct.length == 256) // bijection
    assert(Bpe.byteToChar.count(_ >= 0x100) == 68) // 68 excluded bytes
    assert(Bpe.byteToChar.toSeq == (0 until 256).map(NaiveByte.b2c))
  }

  test("byte-level: GPT-2 pre-tokenizer textbook cases incl. the " +
      "whitespace lookahead") {
    def w(t: String) = Bpe.byteLevelWordsJvm(t).toSeq
    assert(w("Hello world") == Seq("Hello", " world"))
    // the \s+(?!\S) lookahead: a 2-space run keeps its LAST space
    // attached to the following word
    assert(w("it's  ok ") == Seq("it", "'s", " ", " ok", " "))
    assert(w("abc123!? x") == Seq("abc", "123", "!?", " x"))
    assert(w("héllo 中文") ==
      Seq("héllo", " 中文")) // \p{L} is not ASCII-bound
    // only a literal SPACE attaches to a following word; a newline
    // stays its own token (first \n via the lookahead branch, the
    // second via plain \s+)
    assert(w("a\n\nb") == Seq("a", "\n", "\n", "b"))
    assert(w("") == Seq.empty)
  }

  test("byte-level randomized: BOTH train paths == clean-room naive, " +
      "case PRESERVED") {
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 3) {
      val lexicon = Seq.fill(25)(
        (1 + rnd.nextInt(6)).times(() => {
          val c = ('a' + rnd.nextInt(4)).toChar
          if (rnd.nextBoolean()) c.toUpper else c
        }).mkString).distinct
      val texts = Seq.fill(50)(
        Seq.fill(4 + rnd.nextInt(12))(lexicon(rnd.nextInt(lexicon.size)))
          .mkString(" "))
      val expected = NaiveByte.train(texts, 25, minFreq = 2L)
      // mixed case must survive: at least one merge carries an
      // upper-case char in some trial corpus (sanity that the mode
      // really is cased)
      val df = texts.toDF("text").repartition(7)
      val dist = Bpe.train(df, "text", 25, minFreq = 2L,
          driverCutover = 0L, byteLevel = true)
        .collect().map(r => (r.getInt(0), r.getString(1),
          r.getString(2), r.getLong(3))).toSeq
      assert(dist == expected, s"trial $trial (distributed)")
      val local = Bpe.train(df, "text", 25, minFreq = 2L,
          byteLevel = true)
        .collect().map(r => (r.getInt(0), r.getString(1),
          r.getString(2), r.getLong(3))).toSeq
      assert(local == expected, s"trial $trial (local)")
    }
  }

  test("byte-level encode: byteDecode round-trips EXACTLY (cased, " +
      "multi-byte UTF-8, controls), fail-soft on corrupt pieces") {
    val texts = Seq("MiXeD CaSe text", "café 中文",
      "emoji 😀!", "tabs\tand\nnewlines", "", "x")
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val merges = Bpe.train(df, "text", 30, minFreq = 1L,
      byteLevel = true)
    val out = Bpe.encode(df, "text", merges, byteLevel = true)
      .select($"id", $"bpe_tokens",
        Bpe.byteDecode($"bpe_tokens").as("rt"))
      .as[(Int, Seq[String], String)].collect()
    for ((i, toks, rt) <- out) {
      assert(rt == texts(i), s"doc $i") // EXACT — no lowering
      assert(toks.forall(!_.contains(Bpe.EndOfWord)), s"doc $i sentinel")
    }
    val counted = Bpe.tokenCount(df, "text", merges, byteLevel = true)
      .select($"id", $"bpe_count").as[(Int, Int)].collect().toMap
    for ((i, toks, _) <- out) assert(counted(i) == toks.size)
    // corrupt piece stream (char outside the byte alphabet) → null,
    // and a torn multi-byte sequence → null, neither throws
    val bad = Seq(Seq("ok", "中"), Seq("Ã")).toDF("p")
      .select(Bpe.byteDecode($"p").as("rt")).as[String].collect()
    assert(bad.forall(_ == null))
  }

  test("byte-level stamp: cross-mode serving refused in all " +
      "directions") {
    val df = Seq("ab ab", "ab").toDF("text")
    val bl = Bpe.train(df, "text", 5, byteLevel = true)
    val ws = Bpe.train(df, "text", 5)
    val mk = Bpe.train(df, "text", 5, marker = true)
    for ((tbl, m, b) <- Seq((bl, false, false), (ws, false, true),
        (mk, false, true), (bl, true, false))) {
      val e = intercept[IllegalArgumentException] {
        Bpe.encode(df, "text", tbl, marker = m, byteLevel = b)
      }
      assert(e.getMessage.contains("__"))
    }
    intercept[IllegalArgumentException] {
      Bpe.encode(df, "text", bl, marker = true, byteLevel = true)
    }
  }

  test("byte-level seedPairCounts argmax IS train's first merge") {
    val rng = new scala.util.Random(313)
    val words = Vector("ab", "Abc", "bcd", "aa", "Ba", "cab", "dab")
    val docs = (0 until 40)
      .map(_ => (0 until (1 + rng.nextInt(8)))
        .map(_ => words(rng.nextInt(words.length))).mkString(" "))
      .toDF("text")
    val top = Bpe.seedPairCounts(docs, "text", byteLevel = true)
      .orderBy($"f".desc, $"l".asc, $"r".asc).limit(1)
      .collect().head
    val first = Bpe.train(docs, "text", numMerges = 1, minFreq = 1L,
        byteLevel = true)
      .collect().head
    assert((top.getString(0), top.getString(1), top.getLong(2))
      == (first.getString(1), first.getString(2), first.getLong(3)))
  }

  // ---- WordPiece (the greedy longest-match sibling) ---------------------

  test("wordpiece: BERT textbook cases, longest-first, whole-word unk") {
    import graft.operators.WordPiece
    val vocab = Seq("un", "##aff", "##able", "hello", "abc", "ab",
      "##d", "a").toDF("piece")
    val df = Seq((1, "unaffable hello"), (2, "abcd"), (3, "xyz"),
      (4, "ab")).toDF("id", "text")
    val out = WordPiece.encode(df, "text", vocab)
      .select($"id", $"wp_tokens").as[(Int, Seq[String])].collect().toMap
    assert(out(1) == Seq("un", "##aff", "##able", "hello"))
    // longest-first: "abc" beats "ab"/"a"; then "##d" continues
    assert(out(2) == Seq("abc", "##d"))
    // no piece matches at position 0 -> WHOLE word unk, no partials
    assert(out(3) == Seq("[UNK]"))
    assert(out(4) == Seq("ab"))
    // a matchable prefix whose REMAINDER dead-ends is unk too:
    // "az" matches "a" then needs "##z" which is absent
    val out2 = WordPiece.encode(Seq((9, "az")).toDF("id", "text"),
        "text", vocab)
      .select($"wp_tokens").as[Seq[String]].head()
    assert(out2 == Seq("[UNK]"))
  }

  test("wordpiece: randomized equality vs independent recursive model") {
    import graft.operators.WordPiece
    val rnd = new scala.util.Random(7)
    (1 to 40).foreach { _ =>
      val alphabet = "abc"
      def randWord(n: Int) =
        (1 to n).map(_ => alphabet(rnd.nextInt(3))).mkString
      val vocab = (1 to 12).flatMap { _ =>
        val p = randWord(1 + rnd.nextInt(3))
        Seq(p, "##" + randWord(1 + rnd.nextInt(2)))
      }.distinct.toSet
      val w = randWord(1 + rnd.nextInt(6))
      val got = WordPiece.encodeWord(w, vocab, "[UNK]", "##", 200)
      // reference replays the same COMMITTING greedy loop
      def greedyRef(w: String): Seq[String] = {
        var start = 0; val out = Seq.newBuilder[String]
        while (start < w.length) {
          val m = (w.length to (start + 1) by -1).iterator.map { e =>
            val p = (if (start == 0) "" else "##") + w.substring(start, e)
            (p, e)
          }.find(pe => vocab.contains(pe._1))
          m match {
            case None => return Seq("[UNK]")
            case Some((p, e)) => out += p; start = e
          }
        }
        out.result()
      }
      assert(got == greedyRef(w), s"w=$w vocab=$vocab")
    }
  }

  /** clean-room WordPiece trainer reference: per-iteration full
    * recount (no incremental index — the independence that matters),
    * same published score `(f / cl) / cr` in the same association
    * order, same tie-break. */
  private object NaiveWp {
    def symbols(w: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val c = new String(Character.toChars(cp))
        out += (if (i == 0) c else "##" + c)
        i += Character.charCount(cp)
      }
      out.result()
    }

    def train(texts: Seq[String], numMerges: Int, minFreq: Long)
    : Seq[(String, String, String, Double, Long)] = {
      var tbl = Naive.wordCounts(texts).toSeq
        .map { case (w, f) => (symbols(w), f) } // 1-symbol words KEPT
      val merges =
        Seq.newBuilder[(String, String, String, Double, Long)]
      var rank = 0
      var done = false
      while (rank < numMerges && !done) {
        val sc = scala.collection.mutable.Map.empty[String, Long]
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- tbl) {
          syms.foreach(s => sc(s) = sc.getOrElse(s, 0L) + f)
          for (i <- 0 until syms.length - 1)
            pc(syms(i) -> syms(i + 1)) =
              pc.getOrElse(syms(i) -> syms(i + 1), 0L) + f
        }
        // minFreq = candidate filter, not a stop test (matches
        // production: a rare-but-high-score pair must not halt
        // training while eligible pairs remain)
        val eligible = pc.filter { case (_, f) => f >= minFreq }
        if (eligible.isEmpty) done = true
        else {
          val ((l, r), f) = eligible.minBy { case ((l, r), f) =>
            (-(f.toDouble / sc(l).toDouble / sc(r).toDouble), -f, l, r) }
          val score = f.toDouble / sc(l).toDouble / sc(r).toDouble
          merges += ((l + r.stripPrefix("##"), l, r, score, f))
          rank += 1
          tbl = tbl.map { case (s, fr) =>
            (Naive.mergeOne(s, l, r).map(x =>
              if (x == l + r) l + r.stripPrefix("##") else x), fr) }
        }
      }
      merges.result()
    }
  }

  private def wpTrained(df: org.apache.spark.sql.DataFrame, n: Int,
                        minFreq: Long = 2L, cutover: Long = 1L << 20) = {
    import graft.operators.WordPiece
    WordPiece.train(df, "text", n, minFreq = minFreq,
        driverCutover = cutover)
      .collect().map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getLong(3))).toSeq
  }

  test("wordpiece train: hand-computed micro corpus — alphabet then " +
      "the one merge, likelihood score exact") {
    val df = Seq("ab ab", "ab").toDF("text")
    // word "ab" ×3 → syms (a, ##b); counts a:3, ##b:3; pair
    // (a,##b):3 → score (3/3)/3 = 1/3; after the merge every word is
    // one symbol — no pairs, loop ends. Alphabet UTF-8 order: '#'
    // (0x23) sorts before 'a'.
    assert(wpTrained(df, 10, minFreq = 1L) == Seq(
      (0, "##b", None, 3L),
      (1, "a", None, 3L),
      (2, "ab", Some(1.0 / 3.0), 3L)))
  }

  test("wordpiece train: likelihood beats raw frequency (the " +
      "criterion delta vs BPE)") {
    // (x,##y) is MORE frequent (10 > 9) but x and y also occur alone
    // 20× each, so its score 10/30/30 loses to (a,##b)'s 9/9/9 —
    // BPE would merge xy first, WordPiece must merge ab first
    val texts = Seq.fill(10)("xy") ++ Seq.fill(9)("ab") ++
      Seq.fill(20)("x") ++ Seq.fill(20)("y")
    val df = texts.mkString(" ").split(" ").grouped(12)
      .map(_.mkString(" ")).toSeq.toDF("text")
    val merges = wpTrained(df, 1, minFreq = 1L).filter(_._3.isDefined)
    assert(merges.map(_._2) == Seq("ab"))
    // same corpus under BPE's raw-frequency rule: (y,</w>) wins at
    // freq 30 (word-final y across "xy"-less words) — NOT ab
    val bpe = Bpe.train(df, "text", 1, minFreq = 1L)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(bpe == Seq(("y", "</w>")))
  }

  test("wordpiece train: minFreq filters CANDIDATES, it does not " +
      "halt — a rare top-score pair is skipped, not terminal") {
    // (q,##z) scores 1.0 (unique everything) but f=1; (a,##b) is
    // f=5 at score 0.1. Under minFreq=2 the rare pair is INELIGIBLE
    // and training must continue with ab — a stop-test
    // implementation would learn nothing here.
    val texts = Seq("qz") ++ Seq.fill(5)("ab") ++
      Seq.fill(5)("a") ++ Seq.fill(5)("b")
    val df = texts.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    for (cut <- Seq(0L, 1L << 20)) {
      val merged = wpTrained(df, 3, minFreq = 2L, cutover = cut)
        .filter(_._3.isDefined).map(_._2)
      assert(merged.contains("ab") && !merged.contains("qz"),
        s"cutover=$cut got $merged")
    }
  }

  test("wordpiece train randomized: BOTH paths == clean-room naive " +
      "(merge sequence AND scores)") {
    val rnd = new scala.util.Random(59)
    for (trial <- 0 until 3) {
      val lexicon = Seq.fill(25)(
        (1 + rnd.nextInt(5)).times(() => ('a' + rnd.nextInt(4)).toChar)
          .mkString).distinct
      val texts = Seq.fill(50)(
        Seq.fill(4 + rnd.nextInt(10))(lexicon(rnd.nextInt(lexicon.size)))
          .mkString(" "))
      val expected = NaiveWp.train(texts, 20, minFreq = 2L)
      val df = texts.toDF("text").repartition(7)
      for ((cut, label) <- Seq(0L -> "distributed",
          (1L << 20) -> "local")) {
        val got = wpTrained(df, 20, minFreq = 2L, cutover = cut)
          .filter(_._3.isDefined)
          .map(t => (t._2, t._3.get, t._4))
        assert(got == expected.map(t => (t._1, t._4, t._5)),
          s"trial $trial ($label)")
        assert(graft.operators.WordPiece.lastTrainPathDiag == label)
      }
    }
  }

  test("wordpiece train: the vocab encodes its own corpus with ZERO " +
      "[UNK] and reassembles every word (single-char words included)") {
    import graft.operators.WordPiece
    val df = Seq("a ab abc bced zz", "ab abc a zz bced").toDF("text")
    val vocab = WordPiece.train(df, "text", 8, minFreq = 2L)
    val enc = WordPiece.encode(df, "text", vocab)
      .select($"text", $"wp_tokens").as[(String, Seq[String])].collect()
    for ((text, toks) <- enc) {
      assert(!toks.contains("[UNK]"), s"<$text>")
      // greedy pieces reassemble the lowered text word-by-word
      val rebuilt = toks.foldLeft(Seq.empty[String]) { (acc, p) =>
        if (p.startsWith("##")) acc.init :+ (acc.last + p.drop(2))
        else acc :+ p
      }
      assert(rebuilt == text.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty).toSeq, s"<$text>")
    }
  }

  test("wordpiece seedPairScores argmax IS train's first merge") {
    import graft.operators.WordPiece
    val rng = new scala.util.Random(733)
    val words = Vector("ab", "abc", "bcd", "aa", "ba", "cab", "a")
    val docs = (0 until 40)
      .map(_ => (0 until (1 + rng.nextInt(8)))
        .map(_ => words(rng.nextInt(words.length))).mkString(" "))
      .toDF("text")
    val top = WordPiece.seedPairScores(docs, "text")
      .orderBy($"score".desc, $"f".desc, $"l".asc, $"r".asc).limit(1)
      .collect().head
    val first = WordPiece.train(docs, "text", 1, minFreq = 1L)
      .collect().filter(r => !r.isNullAt(2)).head
    assert(top.getString(0) + top.getString(1).stripPrefix("##")
      == first.getString(1))
    assert(top.getDouble(5) == first.getDouble(2))
  }

  test("wordpiece: maxInputChars guard, counts, null text") {
    import graft.operators.WordPiece
    val vocab = Seq("a", "##a").toDF("piece")
    val long = "a" * 300
    val df = Seq((1, s"aa $long"), (2, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = WordPiece.encode(df, "text", vocab)
      .select($"id", $"wp_tokens").as[(Int, Seq[String])].collect().toMap
    assert(out(1) == Seq("a", "##a", "[UNK]")) // overlong word -> unk
    assert(out(2) == null)
    val cnt = WordPiece.tokenCount(df.filter($"id" === 1), "text", vocab)
      .select($"wp_count").as[Int].head()
    assert(cnt == 3)
  }
}
