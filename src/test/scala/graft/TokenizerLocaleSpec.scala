package graft

import org.apache.spark.sql.functions._
import graft.expressions.TextExpressions
import graft.functions.{TextFunctions => TF}
import graft.operators.{Bpe, Unigram}

/** r15 (VERDICT r14 item 5): one shared ROOT-locale lowering path for
  * the tokenizer trilogy. The hazard being pinned: Spark `lower()`
  * lowers non-ASCII strings through `String.toLowerCase()` under the
  * JVM DEFAULT locale, while the three encoders lower with
  * Locale.ROOT — on a tr-TR JVM the train side used to map 'I' to
  * dotless 'ı' and the encode side to 'i', so the trained vocab and
  * the encoded words disagreed. The trainers now count words through
  * [[TF.tokensRoot]] (the RootLower native expression); these pins
  * hold the contract under an actually-flipped tr-TR default locale.
  *
  * The default-locale flips below are brief and restored in finally;
  * the driver-side pins use expression `compute` directly (no Spark
  * job), and the one end-to-end train is a 3-row driver-cutover
  * fixture. */
class TokenizerLocaleSpec extends SparkTestBase {
  import spark.implicits._

  private def underLocale[A](tag: String)(body: => A): A = {
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.forLanguageTag(tag))
    try body finally java.util.Locale.setDefault(prev)
  }

  test("the hazard is real: default-locale lowering diverges from " +
    "ROOT under tr-TR, and RootLower stays ROOT") {
    underLocale("tr-TR") {
      // the divergence the caveat documented: 'I' with any non-ASCII
      // neighbour lowers to dotless ı under the default locale
      assert("İSTANBUL I".toLowerCase() != "İSTANBUL I".toLowerCase(
        java.util.Locale.ROOT))
      // the shared expression is locale-pinned: driver-side compute
      // equals ROOT lowering even while the default is tr-TR
      val got = TextExpressions.RootLower(
          org.apache.spark.sql.catalyst.expressions.Literal("İSTANBUL I"))
        .compute(org.apache.spark.unsafe.types.UTF8String
          .fromString("İSTANBUL I"))
        .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      assert(got == "İSTANBUL I".toLowerCase(java.util.Locale.ROOT))
      assert(got.contains("i")) // dotted, never ı
      assert(!got.contains("ı"))
    }
  }

  test("train == encode words under a tr-TR default locale " +
    "(Bpe end-to-end, Unigram seed words)") {
    underLocale("tr-TR") {
      // capital 'I' + a non-ASCII char in the SAME word defeats the
      // UTF8String ASCII fast path, forcing lower() through the JVM
      // default locale — exactly the word class that used to shear
      val docs = Seq("IŞIK IŞIK IŞIK", "IŞIK IŞIK", "IŞIK")
        .toDF("text")
      val merges = Bpe.train(docs, "text", numMerges = 3, minFreq = 2L)
        .collect()
      // every learned unit must be built from ROOT-lowered symbols:
      // 'i' (dotted) — a tr-TR train side would have produced 'ı'
      val units = merges.flatMap(r => Seq(r.getString(1), r.getString(2)))
      assert(units.nonEmpty)
      assert(units.forall(!_.contains("ı")),
        s"train side lowered under tr-TR: ${units.mkString(", ")}")
      // encode with the trained table: the word the encoder sees is
      // the word the trainer counted, so pieces concatenate back to
      // the ROOT-lowered word (round-trip losslessness)
      val enc = Bpe.encode(docs, "text", Bpe.train(docs, "text", 3, 2L))
        .select(concat_ws("", col("bpe_tokens")).as("joined"))
        .collect().map(_.getString(0))
      val expected = "işik" // "IŞIK".toLowerCase(ROOT): dotted i
      enc.zip(Seq(3, 2, 1)).foreach { case (j, n) =>
        assert(j.replace(Bpe.EndOfWord, "") == expected * n,
          s"encode round-trip diverged: $j")
      }
      // Unigram's corpus pass rides the same tokensRoot
      val seeds = Unigram.seedCandidates(docs, "text", maxPieceLen = 2)
        .collect().map(_.getString(0))
      assert(seeds.nonEmpty && seeds.forall(!_.contains("ı")),
        s"unigram seed pass lowered under tr-TR: ${seeds.mkString(", ")}")
    }
  }

  test("tokensRoot == tokens on ROOT-like locales (oracle parity)") {
    val df = Seq("The Quick BROWN fox", "MiXeD Case TEXT").toDF("text")
    val a = df.select(TF.tokens(col("text")).as("t")).collect()
      .map(_.getSeq[String](0))
    val b = df.select(TF.tokensRoot(col("text")).as("t")).collect()
      .map(_.getSeq[String](0))
    assert(a.toSeq == b.toSeq)
  }
}
