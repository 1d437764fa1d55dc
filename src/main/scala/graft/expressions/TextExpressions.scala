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
}
