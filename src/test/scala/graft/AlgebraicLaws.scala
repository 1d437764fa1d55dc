package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Test.Parameters
import graft.ddf.DDF

/** ScalaCheck algebraic laws over the DDF surface (SURVEY.md §5):
  * multiset arithmetic of the set operators, filter partitioning,
  * sort idempotence — checked against a Scala reference model on
  * arbitrary small inputs. */
object AlgebraicLaws extends Properties("graft.ddf") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private lazy val spark = SparkTestBase.spark
  import scala.jdk.CollectionConverters._

  private def toDDF(xs: List[Int]): DDF = {
    val rows = xs.map(x => org.apache.spark.sql.Row(x)).asJava
    DDF(spark.createDataFrame(rows,
      new org.apache.spark.sql.types.StructType()
        .add("v", org.apache.spark.sql.types.IntegerType)))
  }
  private def counts(xs: List[Int]): Map[Int, Int] =
    xs.groupBy(identity).view.mapValues(_.size).toMap

  private val smallList = Gen.listOfN(12, Gen.choose(0, 5))

  property("union preserves multiset cardinality") =
    Prop.forAll(smallList, smallList) { (a, b) =>
      toDDF(a).union(toDDF(b)).countRows() == a.size + b.size
    }

  property("exceptAll is multiset difference") =
    Prop.forAll(smallList, smallList) { (a, b) =>
      val want = counts(a).map { case (k, n) =>
        math.max(0, n - counts(b).getOrElse(k, 0))
      }.sum
      toDDF(a).exceptAll(toDDF(b)).countRows() == want
    }

  property("intersectAll is multiset min") =
    Prop.forAll(smallList, smallList) { (a, b) =>
      val want = counts(a).map { case (k, n) =>
        math.min(n, counts(b).getOrElse(k, 0))
      }.sum
      toDDF(a).intersectAll(toDDF(b)).countRows() == want
    }

  property("subtract is set difference, distinct is set size") =
    Prop.forAll(smallList, smallList) { (a, b) =>
      toDDF(a).subtract(toDDF(b)).countRows() ==
        (a.toSet -- b.toSet).size &&
      toDDF(a).dropDuplicates().countRows() == a.toSet.size
    }

  property("filter partitions the input") =
    Prop.forAll(smallList, Gen.choose(0, 5)) { (a, pivot) =>
      val d = toDDF(a)
      d.filter(s"v < $pivot").countRows() +
        d.filter(s"v >= $pivot").countRows() == a.size
    }

  property("sort is idempotent and content-preserving") =
    Prop.forAll(smallList) { a =>
      val once = toDDF(a).sort(Seq("v")).collect().map(_.getInt(0)).toSeq
      val twice = toDDF(a).sort(Seq("v")).sort(Seq("v")).collect()
        .map(_.getInt(0)).toSeq
      once == twice && once == a.sorted
    }

  // ---- exact similarity joins vs a Scala reference model ----------------

  private val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")
  private val doc = Gen.choose(3, 9).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))
  private val corpus = Gen.choose(3, 8)
    .flatMap(n => Gen.listOfN(n, doc))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def refShingles(text: String, n: Int): Set[String] =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      .sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

  private def refJaccardPairs(docs: Seq[(Long, String)], n: Int,
                              t: Double): Set[(Long, Long)] = {
    val sh = docs.map { case (id, txt) => id -> refShingles(txt, n) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= t
    } yield (a, b)).toSet
  }

  private def toDDFOpt(xs: List[Option[Int]]): DDF = {
    val rows = xs.map(x =>
      org.apache.spark.sql.Row(x.map(Int.box).orNull)).asJava
    DDF(spark.createDataFrame(rows,
      new org.apache.spark.sql.types.StructType()
        .add("v", org.apache.spark.sql.types.IntegerType)))
  }
  private val optList =
    Gen.listOfN(10, Gen.option(Gen.choose(0, 5)))

  // pandas semantics: `in` keeps only non-null members; `not in`
  // keeps nulls AND non-members; empty lists fold to none/all
  property("in / not in lists follow pandas null semantics") =
    Prop.forAll(optList, Gen.choose(0, 3).flatMap(
        n => Gen.listOfN(n, Gen.choose(0, 5)))) { (vs, lst) =>
      val d = toDDFOpt(vs)
      val listStr = lst.mkString("[", ", ", "]")
      val wantIn = vs.count(_.exists(lst.contains))
      val wantNot = vs.count(_.forall(x => !lst.contains(x)))
      d.filter(s"v in $listStr").countRows() == wantIn &&
        d.filter(s"v not in $listStr").countRows() == wantNot &&
        d.filter("v in @xs", Map("xs" -> lst)).countRows() == wantIn &&
        d.filter("v not in @xs", Map("xs" -> lst)).countRows() == wantNot
    }

  property("** chains fold right-associatively (python semantics)") =
    Prop.forAll(Gen.choose(1, 3), Gen.choose(1, 3), Gen.choose(1, 3)) {
      (a, b, c) =>
        val got = toDDF(List(1))
          .selectExpression(s"x = $a ** $b ** $c").toDF
          .select("x").head().getDouble(0)
        got == math.pow(a, math.pow(b, c))
    }

  property("hashSplit partitions for every fraction") =
    Prop.forAll(smallList, Gen.oneOf(0.0, 0.1, 0.25, 0.5, 0.9, 1.0)) {
      (a, f) =>
        // distinct ids: membership is a function of the value, so
        // duplicates would land together and double-count one side
        val xs = a.distinct
        val (l, r) = toDDF(xs).hashSplit("v", f)
        val ls = l.collect().map(_.getInt(0)).toSet
        val rs = r.collect().map(_.getInt(0)).toSet
        ls.intersect(rs).isEmpty && (ls ++ rs) == xs.toSet
    }

  property("ntileBucket sizes differ by at most one, order-monotone") =
    Prop.forAll(Gen.listOfN(11, Gen.choose(0, 100)), Gen.choose(2, 5)) {
      (a, k) =>
        val rows = a.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        import spark.implicits._
        val d = DDF(rows.toDF("id", "v"))
          .ntileBucket("v", k, tieCols = Seq("id")).toDF
          .collect().map(r => (r.getInt(1), r.getLong(0), r.getInt(2)))
        val sizes = d.groupBy(_._3).view.mapValues(_.size).values.toList
        val spread = sizes.max - sizes.min
        // monotone: the (v, id) tie-broken order gives non-decreasing buckets
        val monotone = d.sortBy(t => (t._1, t._2)).map(_._3)
          .sliding(2).forall(p => p.length < 2 || p(0) <= p(1))
        spread <= 1 && sizes.sum == a.size && monotone
    }

  property("jaccardPairsExact matches the reference model") =
    Prop.forAll(corpus, Gen.oneOf(0.2, 0.4, 0.6)) { (docs, t) =>
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        docs.map { case (i, s) => org.apache.spark.sql.Row(i, s) }.asJava,
        new org.apache.spark.sql.types.StructType()
          .add("id", org.apache.spark.sql.types.LongType)
          .add("text", org.apache.spark.sql.types.StringType))
      val got = graft.operators.Dedup
        .jaccardPairsExact(df, "id", "text", shingleLen = 2, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == refJaccardPairs(docs, 2, t)
    }

  property("rangeJoin matches the brute-force inequality join") =
    Prop.forAll(
      Gen.listOfN(8, Gen.choose(-20, 20)),
      Gen.listOfN(5, Gen.zip(Gen.choose(-20, 20), Gen.choose(0, 15))),
      Gen.oneOf(0.0, 0.5, 3.0, 100.0)) { (ps, ivs, w) =>
      import spark.implicits._
      val points = ps.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toDouble) }.toDF("pid", "v")
      val intervals = ivs.zipWithIndex
        .map { case ((lo, len), i) => (i.toLong, lo.toDouble, (lo + len).toDouble) }
        .toDF("iid", "lo", "hi")
      val want = (for {
        (v, pi) <- ps.zipWithIndex; ((lo, len), ii) <- ivs.zipWithIndex
        if v >= lo && v <= lo + len
      } yield (pi.toLong, ii.toLong)).toSet
      val got = graft.operators.RangeJoin
        .pointInInterval(points, "v", intervals, "lo", "hi", w)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      got.length == got.toSet.size && got.toSet == want
    }

  property("intervalOverlap matches the brute-force overlap join") =
    Prop.forAll(
      Gen.listOfN(6, Gen.zip(Gen.choose(-20, 20), Gen.choose(0, 12))),
      Gen.listOfN(6, Gen.zip(Gen.choose(-20, 20), Gen.choose(0, 12))),
      Gen.oneOf(0.0, 0.5, 3.0, 100.0)) { (as, bs, w) =>
      import spark.implicits._
      val a = as.zipWithIndex.map { case ((lo, len), i) =>
        (i.toLong, lo.toDouble, (lo + len).toDouble) }.toDF("aid", "alo", "ahi")
      val b = bs.zipWithIndex.map { case ((lo, len), i) =>
        (i.toLong, lo.toDouble, (lo + len).toDouble) }.toDF("bid", "blo", "bhi")
      val want = (for {
        ((alo, al), ai) <- as.zipWithIndex
        ((blo, bl), bi) <- bs.zipWithIndex
        if alo <= blo + bl && blo <= alo + al
      } yield (ai.toLong, bi.toLong)).toSet
      val got = graft.operators.RangeJoin
        .intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", w)
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // exact pair set AND no duplicates — the canonical-bucket rule
      got.length == got.toSet.size && got.toSet == want
    }

  property("winsorize preserves count, stays in range, (0,1) is identity") =
    Prop.forAll(Gen.listOfN(9, Gen.zip(Gen.oneOf("a", "b"),
        Gen.choose(-50, 50)))) { rows =>
      import spark.implicits._
      val df = rows.map { case (k, v) => (k, v.toDouble) }.toDF("k", "v")
      val wz = DDF(df).winsorize("v", by = Seq("k"), pLo = 0.1, pHi = 0.9,
        out = "w").toDF.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      val byK = rows.groupBy(_._1).view
        .mapValues(g => (g.map(_._2).min.toDouble, g.map(_._2).max.toDouble))
      val inRange = wz.forall { case (k, _, w) =>
        val (mn, mx) = byK(k); w >= mn && w <= mx }
      val ident = DDF(df).winsorize("v", by = Seq("k"), pLo = 0.0,
          pHi = 1.0, out = "w").toDF.collect()
        .forall(r => r.getDouble(1) == r.getDouble(2))
      wz.length == rows.size && inRange && ident
    }

  property("bm25 is invariant to corpus row order") =
    Prop.forAll(corpus) { docs =>
      import scala.jdk.CollectionConverters._
      def run(d: Seq[(Long, String)]) = {
        val df = spark.createDataFrame(
          d.map { case (i, s) => org.apache.spark.sql.Row(i, s) }.asJava,
          new org.apache.spark.sql.types.StructType()
            .add("id", org.apache.spark.sql.types.LongType)
            .add("text", org.apache.spark.sql.types.StringType))
        graft.operators.Search.bm25(df, "id", "text", "aa bb", k = 3)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
      run(docs) == run(docs.reverse)
    }

  property("exactAgainst drops exactly the corpus-present keys") =
    Prop.forAll(smallList, smallList) { (b, c) =>
      // reference model: keep every batch row (multiset!) whose key
      // is absent from the corpus — the screen never dedups the batch
      // internally, that is exact()'s job
      val want = b.count(x => !c.contains(x))
      toDDF(b).dedupExactAgainst(toDDF(c), Seq("v")).countRows() == want
    }

  property("exactAgainst is idempotent; empty corpus is neutral") =
    Prop.forAll(smallList, smallList) { (b, c) =>
      val bd = toDDF(b); val cd = toDDF(c)
      val once = bd.dedupExactAgainst(cd, Seq("v"))
      once.dedupExactAgainst(cd, Seq("v")).countRows() == once.countRows() &&
      bd.dedupExactAgainst(toDDF(Nil), Seq("v")).countRows() == b.size
    }

  private val rankedList: Gen[List[Long]] =
    Gen.someOf(0L to 9L).map(_.toList).suchThat(_.nonEmpty)
      .map(ids => new scala.util.Random(ids.sum).shuffle(ids))

  property("rrfFuse is symmetric in its two lists") =
    Prop.forAll(rankedList, rankedList) { (a, b) =>
      import scala.jdk.CollectionConverters._
      def list(ids: List[Long], rc: String) =
        spark.createDataFrame(
          ids.zipWithIndex.map { case (id, i) =>
            org.apache.spark.sql.Row(1L, id, i + 1) }.asJava,
          new org.apache.spark.sql.types.StructType()
            .add("__qid", org.apache.spark.sql.types.LongType)
            .add("__id", org.apache.spark.sql.types.LongType)
            .add(rc, org.apache.spark.sql.types.IntegerType))
      def fuse(x: org.apache.spark.sql.DataFrame,
               y: org.apache.spark.sql.DataFrame) =
        graft.operators.Search.rrfFuse(x, y, k = 20)
          .select("__id", "rrf_score", "rank")
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
          .toSet
      fuse(list(a, "r_a"), list(b, "r_b")) ==
        fuse(list(b, "r_b"), list(a, "r_a"))
    }

  property("z-value interleave is exactly invertible (Scala model)") =
    Prop.forAll(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)) { (x, y) =>
      import org.apache.spark.sql.functions.lit
      // identity scaling at [0, 65535]: xs == x, so deinterleaving the
      // z-value must recover (x, y) bit for bit
      val z = spark.range(1).select(graft.operators.ZOrder
          .zValue2(lit(x), 0, 65535, lit(y), 0, 65535).as("z"))
        .head().getLong(0)
      val xBack = (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val yBack = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      xBack == x && yBack == y
    }

  property("CMS never undercounts and is exact when wide") =
    Prop.forAll(Gen.listOfN(60, Gen.choose(0, 8))) { xs =>
      import org.apache.spark.sql.functions.col
      val df = toDDF(xs).toDF.select(col("v").cast("string").as("v"))
      val exact = counts(xs).map { case (k, n) => k.toString -> n.toLong }
      val narrow = graft.operators.CountMin.estimate(
          graft.operators.CountMin.sketch(df, "v", 3, 4),
          df, "v", 3, 4)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val wide = graft.operators.CountMin.estimate(
          graft.operators.CountMin.sketch(df, "v", 3, 1 << 14),
          df, "v", 3, 1 << 14)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.forall { case (k, n) => narrow(k) >= n && wide(k) == n }
    }

  property("sessions partition the events: counts and spans add up") =
    Prop.forAll(Gen.listOfN(40, Gen.choose(0L, 5000L))) { offs =>
      import org.apache.spark.sql.functions.col
      import scala.jdk.CollectionConverters._
      val rows = offs.map(o => org.apache.spark.sql.Row(
        1L, new java.sql.Timestamp(1700000000000L + o * 1000L))).asJava
      val df = spark.createDataFrame(rows,
        new org.apache.spark.sql.types.StructType()
          .add("u", org.apache.spark.sql.types.LongType)
          .add("t", org.apache.spark.sql.types.TimestampType))
      val s = graft.operators.EventAnalytics.sessions(df, "u", "t", 600L)
        .collect()
      val nEvents = s.map(_.getLong(4)).sum
      // every event lands in exactly one session; session indexes
      // are 1..k dense; total in-session span <= the full span
      val idxs = s.map(_.getLong(1)).sorted
      nEvents == offs.size &&
        idxs.sameElements(1L to s.length.toLong) &&
        s.map(_.getLong(5)).sum <= (offs.max - offs.min) * 1000000L
    }

  property("scd2 intervals are gapless, non-overlapping, exactly one current") =
    Prop.forAll(Gen.listOfN(12, Gen.zip(Gen.choose(0, 9), Gen.oneOf("A", "B", "C")))) { evs =>
      import scala.jdk.CollectionConverters._
      // listOfN(12) is never empty, so the interval table exists
      val rows = evs.map { case (d, a) =>
        org.apache.spark.sql.Row(1L,
          new java.sql.Timestamp(1700000000000L + d * 86400000L), a)
      }.asJava
      val df = spark.createDataFrame(rows,
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.LongType)
          .add("t", org.apache.spark.sql.types.TimestampType)
          .add("a", org.apache.spark.sql.types.StringType))
      val iv = graft.operators.Scd.scd2(df, "k", "t", Seq("a"))
        .collect().sortBy(_.getTimestamp(1).getTime)
      val gapless = iv.sliding(2).forall {
        case Array(x, y) => x.getTimestamp(2) == y.getTimestamp(1)
        case _           => true
      }
      val oneCurrent = iv.count(_.getBoolean(3)) == 1 &&
        iv.last.isNullAt(2)
      val collapsed = iv.sliding(2).forall {
        case Array(x, y) => x.getString(4) != y.getString(4)
        case _           => true
      }
      gapless && oneCurrent && collapsed
    }
}
