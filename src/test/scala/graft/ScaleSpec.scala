package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import graft.ddf.DDF
import graft.functions.GraftFunctions
import graft.operators.Skew

/** scale-path machinery: salting, bucketing, SQL registration, melt */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // one hot key (90% of rows) + uniform tail
    val left = spark.range(10000)
      .select(when($"id" % 10 =!= 0, lit(1L)).otherwise($"id").as("k"),
        $"id".as("payload"))
    val right = Seq((1L, "hot"), (7L, "cold"), (42L, "x")).toDF("k", "v")
    val plain = left.join(right, Seq("k"), "inner")
    val salted = Skew.saltedJoin(left, right, Seq("k"), salt = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // left mode keeps unmatched rows
    val saltedLeft = Skew.saltedJoin(left, right, Seq("k"), 8, "left")
    assert(saltedLeft.count() == left.count())
  }

  test("hybrid salted join: multiset equality in every hotness " +
    "regime, bounded hot set refused past maxHotKeys") {
    val left = spark.range(10000)
      .select(when($"id" % 10 =!= 0, lit(1L)).otherwise($"id").as("k"),
        $"id".as("payload"))
    val right = Seq((1L, "hot"), (7L, "cold"), (42L, "x"),
      (100L, "tail"), (4990L, "tail2")).toDF("k", "v")
    val plain = left.join(right, Seq("k"), "inner")
    def sameMultiset(got: org.apache.spark.sql.DataFrame): Unit = {
      assert(got.exceptAll(plain).count() == 0)
      assert(plain.exceptAll(got).count() == 0)
    }
    // auto threshold (10000 / shuffle partitions): only key 1 is hot
    sameMultiset(Skew.saltedJoin(left, right, Seq("k"), salt = 8))
    // explicit threshold admitting nothing: degenerates to the plain
    // join (zero replication — the None branch)
    sameMultiset(Skew.saltedJoin(left, right, Seq("k"), salt = 8,
      hotKeyThreshold = 1000000L))
    // explicit low threshold: EVERY key hot (the all-salted regime)
    sameMultiset(Skew.saltedJoin(left, right, Seq("k"), salt = 8,
      hotKeyThreshold = 1L, maxHotKeys = 100000))
    // left mode, hybrid regime
    val sl = Skew.saltedJoin(left, right, Seq("k"), 8, "left")
    assert(sl.count() == left.count())
    // a threshold admitting more keys than maxHotKeys is refused
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, right, Seq("k"), salt = 8,
        hotKeyThreshold = 1L, maxHotKeys = 10)
    }
  }

  test("hybrid salted join STRUCTURE: cold right rows keep ONE copy, " +
    "hot rows replicate exactly salt-fold; hot left rows spread, " +
    "cold left rows ride salt 0") {
    val left = spark.range(1000)
      .select(when($"id" < 900, lit(0L)).otherwise($"id").as("k"),
        $"id".as("payload"))
    val right = spark.range(50).select($"id".as("k"),
      concat(lit("v"), $"id").as("v"))
    // hand-built hot frame: key 0 only (the __hk naming contract)
    val hot = Seq((0L, true)).toDF("__hk0", "__hot")
    val (l, r) = Skew.saltSides(left, right, Seq("k"), hot,
      salt = 4, seed = 42L)
    // right: hot key 0 appears exactly salt times, every cold key once
    val rCounts = r.groupBy($"k").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rCounts(0L) == 4L)
    assert(rCounts.filter(_._1 != 0L).values.forall(_ == 1L))
    assert(r.count() == 49L + 4L)
    // left: row count unchanged; hot rows spread over >1 salt value,
    // cold rows all on salt 0
    assert(l.count() == 1000L)
    assert(l.filter($"k" === 0L).select($"__salt").distinct().count() > 1)
    assert(l.filter($"k" =!= 0L).filter($"__salt" =!= 0).count() == 0)
    // and the assembled join still equals the plain join
    val plain = left.join(right, Seq("k"), "inner")
    val hybrid = Skew.saltedJoin(left, right, Seq("k"), salt = 4,
      hotKeyThreshold = 500L)
    assert(hybrid.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(hybrid).count() == 0)
  }

  test("hybrid salted join: hot NULL-key group is salt-spread (the " +
    "classic skew cause), answers preserved; salt=1 degenerates to " +
    "the plain join") {
    val left = spark.range(1000)
      .select(when($"id" < 900, lit(null).cast("long"))
        .otherwise($"id").as("k"), $"id".as("payload"))
    val right = Seq((950L, "x"), (999L, "y")).toDF("k", "v")
    val plain = left.join(right, Seq("k"), "inner")
    val hybrid = Skew.saltedJoin(left, right, Seq("k"), salt = 8,
      hotKeyThreshold = 500L)
    assert(hybrid.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(hybrid).count() == 0)
    // left mode: null-key rows survive exactly once each
    val lj = Skew.saltedJoin(left, right, Seq("k"), salt = 8,
      mode = "left", hotKeyThreshold = 500L)
    assert(lj.count() == 1000L)
    assert(lj.filter($"k".isNull).count() == 900L)
    // the null group really is flagged hot and spread across salts
    val hot = Seq((Option.empty[java.lang.Long], true))
      .toDF("__hk0", "__hot")
    val (lNull, _) = Skew.saltSides(left, right, Seq("k"), hot,
      salt = 8, seed = 42L)
    assert(lNull.filter($"k".isNull)
      .select($"__salt").distinct().count() > 1)
    // salt=1: plain join, no __salt machinery
    val s1 = Skew.saltedJoin(left, right, Seq("k"), salt = 1)
    assert(s1.columns.toSeq == plain.columns.toSeq)
    assert(s1.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(s1).count() == 0)
  }

  test("salted RIGHT and FULL outer joins (r14): multiset equality " +
    "vs the plain join in every hotness regime, null keys and " +
    "unmatched rows on both sides") {
    // left: hot key 1, hot null group, near-unique tail (mostly
    // unmatched); right: hot key 2 (right-side skew — the mirrored
    // census's reason to exist), its own null group, a tail that
    // half-overlaps the left ids and half sits above them
    val left = spark.range(6000)
      .select(when($"id" % 3 === 0, lit(1L))
        .when($"id" % 3 === 1, lit(null).cast("long"))
        .otherwise($"id").as("k"), $"id".as("lp"))
    val right = spark.range(4000)
      .select(when($"id" % 2 === 0, lit(2L))
        .when($"id" % 7 === 1, lit(null).cast("long"))
        .otherwise($"id" + 3000).as("k"), ($"id" + 100000).as("rp"))
    for (mode <- Seq("right", "full")) {
      val plain = left.join(right, Seq("k"), mode)
      def same(got: org.apache.spark.sql.DataFrame, regime: String): Unit = {
        assert(got.exceptAll(plain).count() == 0,
          s"$mode/$regime emitted extra rows")
        assert(plain.exceptAll(got).count() == 0,
          s"$mode/$regime lost rows")
      }
      same(Skew.saltedJoin(left, right, Seq("k"), salt = 8, mode),
        "auto")
      same(Skew.saltedJoin(left, right, Seq("k"), salt = 8, mode,
        hotKeyThreshold = 10000000L), "none-hot")
      same(Skew.saltedJoin(left, right, Seq("k"), salt = 8, mode,
        hotKeyThreshold = 1L, maxHotKeys = 100000), "all-hot")
      // salt=1 degenerates to the plain join for the new modes too
      same(Skew.saltedJoin(left, right, Seq("k"), salt = 1, mode),
        "salt1")
    }
    // full mode refuses mismatched key dtypes loudly (the positional
    // union cannot upcast the way a plain join would)
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left,
        right.withColumn("k", $"k".cast("int")), Seq("k"),
        salt = 8, mode = "full")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, right, Seq("k"), salt = 8, mode = "cross")
    }
  }

  test("bucketed tables join without an exchange") {
    val a = spark.range(1000).select($"id", ($"id" * 2).as("x"))
    val b = spark.range(1000).select($"id", ($"id" * 3).as("y"))
    DDF(a).save.bucketedTable("graft_buck_a", Seq("id"), 4)
    DDF(b).save.bucketedTable("graft_buck_b", Seq("id"), 4)
    try {
      withoutBroadcast {
        val j = spark.table("graft_buck_a").join(
          spark.table("graft_buck_b"), Seq("id"))
        assert(j.count() == 1000)
        val plan = j.queryExecution.executedPlan
        val exchanges = collectAll(plan).count(_.isInstanceOf[Exchange])
        assert(exchanges == 0, s"expected no exchange:\n$plan")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_buck_a")
      spark.sql("DROP TABLE IF EXISTS graft_buck_b")
    }
  }

  private def withoutBroadcast[T](f: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  private def collectAll(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    expanded +: expanded.children.flatMap(collectAll)
  }

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.registerAll(spark)
    Seq((Seq(1f, 0f), Seq(1f, 0f))).toDF("a", "b")
      .createOrReplaceTempView("graft_vecs")
    val cos = spark.sql("SELECT cosine_sim(a, b) AS c FROM graft_vecs")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val sh = spark.sql("SELECT simhash64(array('a','b')) AS s").head().getLong(0)
    val sh2 = spark.sql("SELECT simhash64(array('a','b')) AS s").head().getLong(0)
    assert(sh == sh2)
    assert(spark.sql("SELECT size(minhash_sig(array('x','y'))) AS n")
      .head().getInt(0) == 64)
    assert(spark.sql(
      "SELECT jaccard_sim(array('a','b'), array('b','c')) AS j")
      .head().getDouble(0) == 1.0 / 3)
    assert(spark.sql("SELECT word_shingles('a b c d') AS s")
      .head().getSeq[String](0) == Seq("a b c", "b c d"))
  }

  test("SQL functions validate arity and literal args") {
    GraftFunctions.registerAll(spark)
    // word_shingles honors an explicit n instead of silently using 3
    assert(spark.sql("SELECT word_shingles('a b c d', 2) AS s")
      .head().getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(spark.sql("SELECT size(minhash_sig(array('x','y'), 16)) AS n")
      .head().getInt(0) == 16)
    intercept[Exception] {
      spark.sql("SELECT jaccard_sim(array('a'), array('b'), array('c'))")
        .collect()
    }
    intercept[Exception] {
      spark.sql("SELECT word_shingles('a b', 2, 3)").collect()
    }
  }

  test("spark.sql.extensions entry point works in a fresh session") {
    import org.apache.spark.sql.SparkSession
    val old = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // spark.sql.extensions is a STATIC conf, read from the
      // SparkContext at JVM-first-session time — unreachable from a
      // shared test context. withExtensions exercises the same
      // injection path (Builder.applyExtensions); the string-config
      // leg is the reflective-instantiation test below.
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      assert(s2 ne old) // a genuinely new session, extensions applied
      val v = s2.sql(
        "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
        .head().getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
      assert(s2.sql("SELECT word_shingles('a b c', 2) AS s")
        .head().getSeq[String](0) == Seq("a b", "b c"))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("GraftExtensions instantiates reflectively and injects builders") {
    // the path Spark takes for spark.sql.extensions=graft.GraftExtensions
    val f = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    f(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
    // both registration paths share one builder table
    assert(graft.GraftExtensions.builders.map(_._1).toSet ==
      Set("dot_product", "cosine_sim", "simhash64", "minhash_sig",
        "point_in_polygon", "jaccard_sim", "jaro_winkler",
        "word_shingles", "hyperplane_codes", "unicode_normalize",
        "z_value2"))
  }

  test("z_value2 on the SQL surface matches the Column API bit for bit") {
    GraftFunctions.registerAll(spark)
    // identity scaling: interleave(10, 6) = 108 (SourcesSpec's case)
    assert(spark.sql(
      "SELECT z_value2(10L, 0, 65535, 6L, 0, 65535) AS z")
      .head().getLong(0) == 108L)
    // custom bits + clamp below lo
    assert(spark.sql(
      "SELECT z_value2(-5L, 0, 65535, 0L, 0, 65535, 8) AS z")
      .head().getLong(0) == 0L)
    // bounds must be literals (they bake into the plan)
    val e = intercept[Exception] {
      spark.sql("SELECT z_value2(1L, length('ab'), 9, 1L, 0, 9)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("unicode_normalize on the SQL surface: forms + literal guard") {
    GraftFunctions.registerAll(spark)
    // decomposed e+U+0301 composes under default NFC
    assert(spark.sql("SELECT unicode_normalize('café') AS n")
      .head().getString(0) == "café")
    assert(spark.sql("SELECT unicode_normalize('café', 'NFD') AS n")
      .head().getString(0) == "café")
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', length('ab'))").collect()
    }
    assert(e.getMessage.contains("string literal"))
  }

  test("minhash_sig of an empty array is the non-null sentinel") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT minhash_sig(array()) AS s").head().getSeq[Long](0)
    assert(r.length == 64 && r.forall(_ == Long.MaxValue))
  }

  test("bruteForceTopK pre-reduces via WindowGroupLimit before shuffle") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = graft.operators.Similarity.bruteForceTopK(
      emb, emb.filter($"vec_id" < 3), "vec_id", "embedding", k = 5)
    r.count()
    // string check: the partial WindowGroupLimit lives inside an AQE
    // shuffle stage subtree that collectAll does not descend into
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"no WindowGroupLimit in:\n$plan")
  }

  test("hash-keyed exact dedup shuffles once, keyed on the 8-byte hash") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val r = graft.operators.Dedup.exact(docs, Seq("text"), "doc_id")
    r.count()
    val plan = r.queryExecution.executedPlan.toString
    // the single exchange partitions on xxhash64(text), not raw text;
    // the window adds no second exchange because HashPartitioning(__h)
    // satisfies ClusteredDistribution(__h, text)
    val exchanges = "Exchange (hash|range)partitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected one exchange:\n$plan")
    assert(plan.contains("xxhash64"), s"shuffle not hash-keyed:\n$plan")
  }

  test("q51 embedding dedup executes no cartesian/nested-loop join") {
    // the operator checkpoints its result, so assert over every plan
    // that actually EXECUTES during the query, via a listener
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.synchronized {
        plans += qe.executedPlan.toString }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val emb = spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
      val planted = emb.select($"vec_id", $"embedding")
        .union(emb.filter($"vec_id" < 50)
          .select(($"vec_id" + 10000).as("vec_id"),
            transform($"embedding", x => x * lit(2.0f)).as("embedding")))
      val n = graft.operators.Dedup.embeddingPairs(planted, "vec_id",
        "embedding", dim = 64, threshold = 0.95).count()
      assert(n == 50)
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (plans.synchronized(plans.isEmpty) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val all = plans.synchronized(plans.toList)
      assert(all.nonEmpty)
      all.foreach { p =>
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"), s"cartesian in:\n$p")
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("decontaminate broadcasts the eval shingle set, never self-joins") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val evalSet = docs.filter($"doc_id" % 97 === 0)
    val r = graft.operators.Dedup.decontaminate(docs, evalSet,
      "doc_id", "text", shingleLen = 3, minOverlap = 2)
    r.count()
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingle set not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"cartesian in:\n$plan")
  }

  test("span dedup and vocabulary aggregate without a window node") {
    // both ops reduce hot keys via partial aggregation — a Window over
    // the span/token key would pile a boilerplate key into one
    // partition. Pin: no Window in the executed plan, aggregation only.
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val sd = graft.operators.Dedup
      .dedupSpansGlobal(docs, "doc_id", "text", spanTokens = 8)
    sd.count()
    val sdPlan = sd.queryExecution.executedPlan.toString
    assert(!sdPlan.contains("Window"), s"window in span dedup:\n$sdPlan")
    val v = graft.operators.Vocabulary.vocabulary(docs, "doc_id", "text")
    v.count()
    val vPlan = v.queryExecution.executedPlan.toString
    assert(!vPlan.contains("Window"), s"window in vocabulary:\n$vPlan")
    // two-stage shape: doc×token then token (plus the final order) —
    // partial aggregation keeps per-occurrence rows off the wire
    assert(vPlan.contains("partial"), s"no partial agg in:\n$vPlan")
  }

  test("melt reshapes wide to long") {
    val d = DDF(Seq((1, 10.0, 20.0), (2, 30.0, 40.0)).toDF("id", "a", "b"))
    val m = d.melt(Seq("id"), Seq("a", "b")).toDF
    assert(m.count() == 4)
    assert(m.columns.toSeq == Seq("id", "variable", "value"))
    assert(m.filter($"id" === 1 && $"variable" === "b").head()
      .getDouble(2) == 20.0)
  }
}
