package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions: single-pass replacements for the
  * tokenize→transform→distinct HOF chains (one regex split + one
  * LinkedHashSet per row instead of per-element lambda evaluation). */
object TextExpressions {

  /** distinct word n-gram shingles of lower(trim(text)) split on
    * whitespace; empty array when fewer than n tokens. Output order is
    * first-occurrence — identical to array_distinct over the ordered
    * n-gram sequence. */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    def compute(v: UTF8String): Any = {
      val toks = v.toLowerCase.trim()
        .toString.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) return new GenericArrayData(Array.empty[Any])
      val seen = new java.util.LinkedHashSet[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
    // compute-reference pattern: children stay codegen'd; the kernel
    // (regex split + LinkedHashSet) is one virtual call — it would be
    // the same JVM code if emitted inline.
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
      val ref = ctx.addReferenceObj("shingles", this,
        classOf[WordShingles].getName)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  /** Jaccard similarity of two string arrays as sets:
    * |A ∩ B| / |A ∪ B|, 0.0 when the union is empty — identical to
    * size(array_intersect)/size(array_union) with the empty-guard, in
    * one hash-set pass per pair instead of per-element lambdas. */
  case class JaccardSim(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    def compute(x: org.apache.spark.sql.catalyst.util.ArrayData,
                y: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
      val setA = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i < x.numElements()) {
        if (!x.isNullAt(i)) setA.add(x.getUTF8String(i))
        i += 1
      }
      val setB = new java.util.HashSet[UTF8String]()
      var inter = 0
      var j = 0
      while (j < y.numElements()) {
        if (!y.isNullAt(j)) {
          val s = y.getUTF8String(j)
          if (setB.add(s) && setA.contains(s)) inter += 1
        }
        j += 1
      }
      val union = setA.size() + setB.size() - inter
      if (union == 0) 0.0 else inter.toDouble / union
    }
    override def nullSafeEval(a: Any, b: Any): Any = compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
      val ref = ctx.addReferenceObj("jaccard", this, classOf[JaccardSim].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
  }

  def jaccardSim(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))

  /** Jaro–Winkler string similarity as a native codegen'd expression
    * — the record-linkage fuzzy comparator (Spark ships only
    * levenshtein, an edit DISTANCE with no length normalization and
    * no prefix emphasis; JW is what census/linkage practice uses for
    * person/org names). Semantics pinned BYTE-FOR-BYTE against
    * DuckDB's `jaro_winkler_similarity` (rapidfuzz lineage), probed
    * in r11, so linkage oracles replay exactly:
    *   - either side empty → 0.0 (yes, even both-empty);
    *   - match window floor(max(l1,l2)/2) − 1, clamped ≥ 0;
    *   - jaro = mean of m/l1, m/l2, (m − t)/m with t = half the
    *     out-of-order matched pairs;
    *   - Winkler prefix boost (≤ 4 chars, p = 0.1) applied ONLY when
    *     jaro > 0.7 (probed: 'ax'/'az' stays 2/3 despite the shared
    *     prefix).
    * Comparison is over UTF-16 code units — identical to DuckDB for
    * BMP text; surrogate pairs count as two units (documented
    * divergence for astral-plane text). */
  case class JaroWinkler(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    def compute(x: UTF8String, y: UTF8String): Double = {
      val a = x.toString; val b = y.toString
      val l1 = a.length; val l2 = b.length
      if (l1 == 0 || l2 == 0) return 0.0
      val window = math.max(math.max(l1, l2) / 2 - 1, 0)
      val matchedA = new Array[Boolean](l1)
      val matchedB = new Array[Boolean](l2)
      var m = 0
      var i = 0
      while (i < l1) {
        val lo = math.max(0, i - window)
        val hi = math.min(l2 - 1, i + window)
        var j = lo
        var found = false
        while (j <= hi && !found) {
          if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
            matchedA(i) = true; matchedB(j) = true; m += 1
            found = true
          }
          j += 1
        }
        i += 1
      }
      if (m == 0) return 0.0
      var t = 0
      var k = 0
      i = 0
      while (i < l1) {
        if (matchedA(i)) {
          while (!matchedB(k)) k += 1
          if (a.charAt(i) != b.charAt(k)) t += 1
          k += 1
        }
        i += 1
      }
      val jaro = (m.toDouble / l1 + m.toDouble / l2 +
        (m - t / 2.0) / m) / 3.0
      if (jaro <= 0.7) return jaro
      var prefix = 0
      while (prefix < math.min(4, math.min(l1, l2)) &&
        a.charAt(prefix) == b.charAt(prefix)) prefix += 1
      jaro + prefix * 0.1 * (1.0 - jaro)
    }
    override def nullSafeEval(a: Any, b: Any): Any =
      compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
      val ref = ctx.addReferenceObj("jw", this, classOf[JaroWinkler].getName)
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** Unicode normalization (java.text.Normalizer) as a native
    * codegen'd expression — Spark ships no normalization function, and
    * a training pipeline that dedups on text MUST normalize first or
    * composed/decomposed encodings of the same glyphs ("café" NFC vs
    * NFD) count as distinct documents. Forms: NFC/NFD/NFKC/NFKD.
    * Fast path: `isNormalized` (one scan, overwhelmingly true for
    * ASCII/already-NFC corpora) returns the input UTF8String
    * untouched — no String round-trip on the common case. */
  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression {
    private val nf = java.text.Normalizer.Form.valueOf(form.toUpperCase(
      java.util.Locale.ROOT))
    override def dataType: DataType = StringType
    def compute(v: UTF8String): Any = {
      val s = v.toString
      if (java.text.Normalizer.isNormalized(s, nf)) v
      else UTF8String.fromString(java.text.Normalizer.normalize(s, nf))
    }
    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
      val ref = ctx.addReferenceObj("unicodeNorm", this,
        classOf[UnicodeNormalize].getName)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  def unicodeNormalize(text: Column, form: String): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(text), form))

  /** Locale.ROOT lowercase (r15, VERDICT r14 item 5): Spark's
    * `lower()` lowers non-ASCII through `String.toLowerCase()` under
    * the JVM DEFAULT locale, so a tr-TR JVM maps 'I' → dotless 'ı'
    * while the tokenizer encoders (Unigram/Bpe/WordPiece `encode`)
    * lower with Locale.ROOT — train and encode could disagree on the
    * same machine. This expression is the shared ROOT-locale lowering
    * both sides now ride ([[graft.functions.TextFunctions.tokensRoot]]
    * on the train side), deleting that caveat instead of documenting
    * it in three places. Codegen'd like [[UnicodeNormalize]] — no
    * CodegenFallback in the train path. */
  case class RootLower(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    def compute(v: UTF8String): Any =
      UTF8String.fromString(
        v.toString.toLowerCase(java.util.Locale.ROOT))
    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
      val ref = ctx.addReferenceObj("rootLower", this,
        classOf[RootLower].getName)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  def rootLower(text: Column): Column =
    Bridge.column(RootLower(Bridge.expression(text)))

  /** First `nHex` hex chars of md5(input) read as a base-16 integer —
    * EXACTLY `conv(substring(md5(x), 1, nHex), 16, 10).cast("long")`
    * (and DuckDB's `CAST('0x' || substr(md5(x), 1, nHex) AS BIGINT)`),
    * the engine's portable-hash chain, without materializing the hex
    * string or round-tripping conv's decimal-string output: the SQL
    * spelling is md5 → hex encode → substring → base-16 parse →
    * decimal format → decimal parse, six allocating nodes per call —
    * this is one digest plus bit math (the [[graft.expressions
    * .VectorExpressions.SimHashMd5]] kernel, generalized). It matters
    * because DSIR / n-gram-LM / LangId / CountMin hash EVERY gram of
    * every document through the chain, and inside higher-order-
    * function lambdas (bucketArr et al.) the chain evaluates
    * INTERPRETED, paying all six nodes per gram (r19 measurement:
    * the gram-hash projection dominates those fits).
    * `nHex` ≤ 15 keeps the value inside a positive long (≤ 60 bits).
    * Value-identical to the SQL chain — pinned in Md5PrefixSpec —
    * so every DuckDB oracle replaying the chain stays green.
    * MessageDigest is not thread-safe → one per thread. */
  case class Md5Prefix(child: Expression, nHex: Int)
      extends UnaryExpression {
    require(nHex >= 1 && nHex <= 15,
      s"nHex must be in [1, 15] to fit a positive long, got $nHex")
    override def dataType: DataType = LongType
    @transient private lazy val md =
      new ThreadLocal[java.security.MessageDigest] {
        override def initialValue(): java.security.MessageDigest =
          java.security.MessageDigest.getInstance("MD5")
      }
    def compute(v: UTF8String): Long = {
      val d = md.get()
      d.reset()
      val digest = d.digest(v.getBytes)
      // nHex hex chars = the first nHex NIBBLES of the digest,
      // big-endian (hex encoding emits high nibble first)
      val full = nHex >> 1
      var h = 0L
      var j = 0
      while (j < full) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
      if ((nHex & 1) == 1) h = (h << 4) | ((digest(full) & 0xf0L) >>> 4)
      h
    }
    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
      val ref = ctx.addReferenceObj("md5Prefix", this,
        classOf[Md5Prefix].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }
    override protected def withNewChildInternal(c: Expression) =
      copy(child = c)
  }

  def md5Prefix(text: Column, nHex: Int): Column =
    Bridge.column(Md5Prefix(Bridge.expression(text), nHex))
}
