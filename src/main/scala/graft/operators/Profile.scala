package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiler (DRIVER-EXT, SURVEY.md §2.12) — the data-quality
  * census run before a corpus enters a pipeline: per column, null
  * count, exact distinct count, and min/max rendered as strings (one
  * uniform output schema across column types).
  *
  * Shape at 100 TB: ONE aggregation over ONE scan. Multiple exact
  * distinct counts make Catalyst plan an Expand (k× row multiplier
  * before the partial aggregate) — the standard cost of multi-column
  * exact distincts; swap `count_distinct` for
  * `approx_count_distinct` when ±2% is acceptable and the Expand is
  * not (that variant stays a plain single-pass aggregate). The wide
  * 1-row aggregate is then stacked to long format driver-free.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // user column names are quoted on resolve and never interpolated
    // into parsed SQL text; internal aliases key on the POSITION, so
    // quotes/dots/spaces/hyphens in a name cannot break or inject
    def in(c: String) = df.col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val dist = if (exactDistinct) count_distinct(in(c))
                 else approx_count_distinct(in(c))
      Seq(
        sum(when(in(c).isNull, 1L).otherwise(0L)).as(s"__p${i}n"),
        dist.as(s"__p${i}d"),
        min(in(c)).cast("string").as(s"__p${i}lo"),
        max(in(c)).cast("string").as(s"__p${i}hi"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col_name"),
      col(s"__p${i}n").as("n_null"),
      col(s"__p${i}d").as("n_distinct"),
      col(s"__p${i}lo").as("min_val"),
      col(s"__p${i}hi").as("max_val")) }
    wide.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }

  /** Profile DRIFT between two snapshots of the same table — the
    * monitoring census that catches a producer change before it
    * corrupts a pipeline (the events-loader incident class: a schema
    * or distribution shift shows up here as a drifted column row).
    * Runs [[profile]] on both sides (one scan each) and full-outer
    * joins the two 1-row-per-column results — columns present on one
    * side only surface with nulls on the other. `drifted` flags any
    * change in null count, distinct count, or min/max rendering.
    * Cost: two profile aggregations + a column-count-sized join. */
  def diff(before: DataFrame, after: DataFrame, cols: Seq[String],
           exactDistinct: Boolean = true): DataFrame = {
    // a side that carries NONE of the requested columns must still
    // yield an (empty) profile — this is the exact situation the
    // detector exists for (a producer renamed everything), and
    // crashing on it would mask the drift it should report
    def side(df: DataFrame): DataFrame = {
      val present = cols.filter(df.columns.contains)
      if (present.nonEmpty) profile(df, present, exactDistinct)
      else df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("col_name",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_null",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_distinct",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("min_val",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("max_val",
            org.apache.spark.sql.types.StringType))))
    }
    val b = side(before)
      .select(col("col_name"), col("n_null").as("n_null_before"),
        col("n_distinct").as("n_distinct_before"),
        col("min_val").as("min_before"), col("max_val").as("max_before"))
    val a = side(after)
      .select(col("col_name"), col("n_null").as("n_null_after"),
        col("n_distinct").as("n_distinct_after"),
        col("min_val").as("min_after"), col("max_val").as("max_after"))
    b.join(a, Seq("col_name"), "full_outer")
      .withColumn("drifted",
        !(col("n_null_before") <=> col("n_null_after"))
          || !(col("n_distinct_before") <=> col("n_distinct_after"))
          || !(col("min_before") <=> col("min_after"))
          || !(col("max_before") <=> col("max_after")))
  }

  // ---- persisted HLL cardinality digests --------------------------------
  // The distinct-count sibling of the persisted Bloom membership
  // digest (EventStream.screenAgainstBloom's family): per-cycle
  // corpus cardinality telemetry WITHOUT rescanning history. The
  // digest file is APPEND-ONLY — each batch appends one Datasketches
  // HLL sketch row per column, and estimation unions the rows at read
  // time (sketch union is the associative merge HLL exists for), so
  // cycle cost is one batch scan + a few-KB append, never a corpus
  // read. Same `__fmt`+params storage discipline as every other
  // persisted digest; the sketch internals are not SQL-replayable,
  // so the gate face is the BOUNDED query (q192: exact distincts +
  // within_bound TRUE under the hash gate) with the numeric error
  // floor pinned in the spec.

  private[graft] val HllDigestFormat = 1

  /** One (col_name, sketch) row per column — Datasketches HLL,
    * `lgConfigK` buckets exponent (12 → ±~1.6% typical). */
  def hllDigest(df: DataFrame, cols: Seq[String],
                lgConfigK: Int = 12): DataFrame = {
    require(cols.nonEmpty, "hllDigest needs at least one column")
    def in(c: String) = df.col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.map { case (c, i) =>
      hll_sketch_agg(in(c).cast("string"), lit(lgConfigK)).as(s"__h$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col_name"), col(s"__h$i").as("sketch")) }
    wide.select(explode(array(rows: _*)).as("__h")).select(col("__h.*"))
  }

  /** Append this frame's per-column sketches to the digest at `path`
    * (creating it on first use), stamped with the format version and
    * `lgConfigK` — mixed-parameter appends are rejected at read. */
  def appendHllDigest(df: DataFrame, cols: Seq[String], path: String,
                      lgConfigK: Int = 12): Unit =
    hllDigest(df, cols, lgConfigK)
      .withColumn("__fmt", lit(HllDigestFormat))
      .withColumn("__lgK", lit(lgConfigK))
      .coalesce(1).write.mode("append").parquet(path)

  /** Distinct-count estimates from a digest: validates the stamps,
    * unions each column's appended sketches, estimates. Returns
    * (col_name, n_distinct_est). */
  def hllEstimates(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(df.columns.contains("__fmt") && df.columns.contains("__lgK"),
      "not an HLL digest: missing __fmt/__lgK stamps — write with " +
        "Profile.appendHllDigest")
    val stamps = df.select(col("__fmt"), col("__lgK")).distinct().collect()
    stamps.foreach { r =>
      require(r.getInt(0) == HllDigestFormat,
        s"HLL digest format ${r.getInt(0)} != v$HllDigestFormat — rebuild")
    }
    require(stamps.map(_.getInt(1)).distinct.length == 1,
      s"HLL digest mixes lgConfigK values " +
        s"${stamps.map(_.getInt(1)).distinct.mkString(",")} — " +
        "union would silently degrade; rebuild at one precision")
    df.groupBy(col("col_name"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("n_distinct_est"))
  }

  /** Set-overlap telemetry between two corpora from their HLL
    * digests ALONE — inclusion–exclusion over sketch unions:
    * |A∩B| ≈ max(0, |A| + |B| − |A∪B|), where |A∪B| is the union of
    * both digests' sketches (exactly the merge HLL guarantees).
    * Neither corpus is scanned — this is the "how much does the new
    * crawl overlap the old corpus" dashboard number for MBs of
    * digest instead of TBs of text. Returns one row per column
    * PRESENT IN BOTH digests: (col_name, est_a, est_b, est_union,
    * est_intersect). The intersection estimate inherits ±ε from
    * three HLL reads, amplified when the true overlap is small
    * relative to the sets — a telemetry signal, not a screen (the
    * Bloom/exact screens exist for decisions). Both digests must
    * carry the same lgConfigK (unioning mixed precisions silently
    * degrades — refused, the digest discipline). */
  def hllOverlap(spark: org.apache.spark.sql.SparkSession,
                 pathA: String, pathB: String): DataFrame = {
    def read(path: String): DataFrame = {
      val df = spark.read.parquet(path)
      require(df.columns.contains("__fmt") && df.columns.contains("__lgK"),
        s"$path is not an HLL digest: missing __fmt/__lgK stamps")
      df
    }
    val a = read(pathA); val b = read(pathB)
    val ks = a.select(col("__lgK")).union(b.select(col("__lgK")))
      .distinct().collect().map(_.getInt(0))
    require(ks.length == 1,
      s"digests carry different lgConfigK values ${ks.mkString(",")} " +
        "— cross-precision union degrades; rebuild at one precision")
    def est(df: DataFrame, out: String): DataFrame =
      df.groupBy(col("col_name"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as(out))
    val u = est(a.select(col("col_name"), col("sketch"))
      .union(b.select(col("col_name"), col("sketch"))), "est_union")
    est(a, "est_a").join(est(b, "est_b"), Seq("col_name"))
      .join(u, Seq("col_name"))
      .withColumn("est_intersect",
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
  }

  /** Shannon ENTROPY of a categorical column, in bits (log2), with
    * the normalized variant (entropy / log2(k), 1 = uniform over the
    * observed support, null when k = 1) — the concentration scalar
    * for monitoring a corpus mix ("how evenly are languages/sources
    * represented"), complementing [[gini]] (magnitude concentration)
    * and [[jsDrift]] (movement between snapshots). Null categories
    * are dropped (declare missingness with Expect.NotNull; folding
    * it into the distribution hides it). One partial-agg groupBy +
    * a one-row total; returns (n, n_categories, entropy_bits,
    * entropy_norm). */
  def entropy(df: DataFrame, colName: String): DataFrame = {
    val counts = df.filter(col(colName).isNotNull)
      .groupBy(col(colName)).agg(count(lit(1)).as("__c"))
    counts.agg(sum(col("__c")).as("__n"),
        count(lit(1)).as("n_categories"),
        sum(col("__c") * log(col("__c").cast("double"))).as("__clogc"))
      .select(col("__n").as("n"), col("n_categories"),
        // H = log2(n) - (1/n) Σ c·log2 c  (exact rearrangement that
        // avoids a second pass for p = c/n)
        ((log(col("__n").cast("double")) - col("__clogc") / col("__n"))
          / math.log(2.0)).as("entropy_bits"),
        when(col("n_categories") > 1,
          (log(col("__n").cast("double")) - col("__clogc") / col("__n"))
            / log(col("n_categories").cast("double"))).as("entropy_norm"))
  }

  /** MUTUAL INFORMATION between two categorical columns, in bits —
    * the association strength that catches what correlation cannot
    * (non-linear, non-ordinal dependence): near-zero means the
    * columns are independent, near min(H(a), H(b)) means one
    * determines the other. The feature-leakage detector: a "feature"
    * with high MI against the label column is a leak suspect. Rows
    * with a null on either side are dropped (both marginals must
    * describe the same row set or the identity I = H(a) + H(b) −
    * H(a,b) silently breaks). One joint partial-agg groupBy; the
    * marginals REUSE the joint counts (two tiny re-aggregations of
    * the category-pair table, not two more corpus scans). Returns
    * one row: (n, h_a_bits, h_b_bits, h_ab_bits, mi_bits,
    * npmi — MI / min(H(a), H(b)), null when either entropy is 0). */
  def mutualInformation(df: DataFrame, colA: String,
                        colB: String): DataFrame = {
    val joint = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).as("__c"))
    def hOf(counts: DataFrame): Column =
      (log(col("__n").cast("double")) - col("__clogc") / col("__n")) /
        math.log(2.0)
    def ent(counts: DataFrame, out: String): DataFrame =
      counts.agg(sum(col("__c")).as("__n"),
          sum(col("__c") * log(col("__c").cast("double"))).as("__clogc"))
        .select(col("__n"), hOf(counts).as(out))
    val ha = ent(joint.groupBy(col("__a")).agg(sum(col("__c")).as("__c")),
      "h_a_bits").select(col("__n"), col("h_a_bits"))
    val hb = ent(joint.groupBy(col("__b")).agg(sum(col("__c")).as("__c")),
      "h_b_bits").select(col("h_b_bits"))
    val hab = ent(joint, "h_ab_bits").select(col("h_ab_bits"))
    broadcast(ha).crossJoin(broadcast(hb)).crossJoin(broadcast(hab))
      .select(col("__n").as("n"), col("h_a_bits"), col("h_b_bits"),
        col("h_ab_bits"),
        (col("h_a_bits") + col("h_b_bits") - col("h_ab_bits"))
          .as("mi_bits"))
      .withColumn("mi_norm",
        when(least(col("h_a_bits"), col("h_b_bits")) > 0.0,
          col("mi_bits") / least(col("h_a_bits"), col("h_b_bits"))))
  }

  /** JOIN-CARDINALITY pre-flight: the exact row count `a JOIN b` on
    * the given keys WOULD produce, plus the skew diagnostics that
    * predict whether it should run at all — computed WITHOUT running
    * the join. At 100 TB this is the difference between launching a
    * 10^13-row fan-out and catching it in a count-table join of
    * distinct-key size: join_rows = Σ_k cnt_a(k)·cnt_b(k) over two
    * partial-aggregated count tables; max_key_rows is the single
    * hottest key's contribution (the AQE-skew-split / salting
    * decision number). Null keys never match in SQL and are reported
    * separately, not folded into the product. Returns ONE row:
    * (n_a, n_b, n_null_key_a, n_null_key_b, distinct_a, distinct_b,
    * matching_keys, join_rows, max_key_rows). */
  def joinCardinality(a: DataFrame, b: DataFrame,
                      keysA: Seq[String], keysB: Seq[String]): DataFrame = {
    require(keysA.nonEmpty && keysA.length == keysB.length,
      s"key lists must be non-empty and same length, got " +
        s"${keysA.length}/${keysB.length}")
    def side(df: DataFrame, keys: Seq[String], cnt: String)
    : (DataFrame, DataFrame) = {
      val anyNull = keys.map(k => df(k).isNull).reduce(_ || _)
      val stats = df.agg(count(lit(1)).as(s"n_$cnt"),
        sum(when(anyNull, 1L).otherwise(0L)).as(s"n_null_key_$cnt"))
      val counts = df.filter(!anyNull)
        .groupBy(keys.zipWithIndex.map { case (k, i) =>
          df(k).as(s"__k$i") }: _*)
        .agg(count(lit(1)).as(s"__c$cnt"))
      (stats, counts)
    }
    val (sa, ca) = side(a, keysA, "a")
    val (sb, cb) = side(b, keysB, "b")
    val keyCols = keysA.indices.map(i => s"__k$i")
    // DOUBLE product, deliberately: two hot keys of ~3e9 rows each
    // make cnt_a x cnt_b overflow long — the exact 100 TB regime this
    // pre-flight exists to warn about, and the same silent-wrap class
    // ADVICE r10 flagged in chiSquareIndependence. A join size beyond
    // 2^53 loses integer exactness in double but NEVER wraps — for a
    // "should this join run" number, magnitude-safe beats exact.
    val prod = ca.join(cb, keyCols)
      .select((col("__ca").cast("double") * col("__cb")).as("__rows"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("matching_keys"),
        coalesce(sum(col("__rows")), lit(0.0)).as("join_rows"),
        coalesce(max(col("__rows")), lit(0.0)).as("max_key_rows"))
    val dist = ca.agg(count(lit(1)).as("distinct_a"))
      .crossJoin(cb.agg(count(lit(1)).as("distinct_b")))
    broadcast(sa).crossJoin(broadcast(sb)).crossJoin(broadcast(dist))
      .crossJoin(broadcast(prod))
      .select(col("n_a"), col("n_b"), col("n_null_key_a"),
        col("n_null_key_b"), col("distinct_a"), col("distinct_b"),
        col("matching_keys"), col("join_rows"), col("max_key_rows"))
  }

  /** Jensen–Shannon drift between two snapshots' distributions of a
    * categorical column — the NUMERIC companion to [[diff]]'s
    * boolean flags: how FAR did the distribution move, in bits,
    * bounded [0, 1] (log base 2), symmetric, and defined even when a
    * category exists on one side only (KL alone is infinite there —
    * the mixture M = (P+Q)/2 is positive wherever either side is,
    * and a zero-probability term contributes exactly 0). The weekly
    * "did the language/source mix shift and by how much" dashboard
    * number. One partial-agg groupBy per side + a category-sized
    * full-outer join; only counts move. Returns one row:
    * (n_before, n_after, n_categories, jsd_bits). */
  def jsDrift(before: DataFrame, after: DataFrame,
              colName: String): DataFrame = {
    def dist(df: DataFrame, cnt: String): DataFrame =
      df.filter(col(colName).isNotNull)
        .groupBy(col(colName).as("__c"))
        .agg(count(lit(1)).as(cnt))
    val joined = dist(before, "__nb").join(dist(after, "__na"),
        Seq("__c"), "full_outer")
      .select(col("__c"), coalesce(col("__nb"), lit(0L)).as("__nb"),
        coalesce(col("__na"), lit(0L)).as("__na"))
    val tot = joined.agg(sum(col("__nb")).as("__tb"),
      sum(col("__na")).as("__ta"), count(lit(1)).as("__k"))
    val terms = joined.crossJoin(broadcast(tot))
      .withColumn("__p", col("__nb") / col("__tb").cast("double"))
      .withColumn("__q", col("__na") / col("__ta").cast("double"))
      .withColumn("__m", (col("__p") + col("__q")) / 2.0)
      .withColumn("__t",
        when(col("__p") > 0,
          col("__p") * log(2.0, col("__p") / col("__m")) / 2.0)
          .otherwise(0.0)
          + when(col("__q") > 0,
            col("__q") * log(2.0, col("__q") / col("__m")) / 2.0)
          .otherwise(0.0))
    terms.agg(max(col("__tb")).as("n_before"),
      max(col("__ta")).as("n_after"),
      max(col("__k")).as("n_categories"),
      round(sum(col("__t")), 6).as("jsd_bits"))
  }

  /** Gini concentration of a non-negative numeric column —
    * G = (2·Σ i·x_(i)) / (n·Σ x) − (n+1)/n over the ascending sort —
    * the "what share of tokens/bytes/spend sits in the top sliver"
    * inequality scalar every corpus-mix report carries. The global
    * rank i comes from the range-partitioned sort-rank machinery
    * (Blocking.withSortRank — parallel TeraSort shape, no one-task
    * window); ties take an arbitrary-but-valid order, which the
    * formula is invariant to (equal values commute in Σ i·x).
    * Returns one row: (n, total, gini). Negative values are
    * rejected — the statistic is undefined there. */
  def gini(df: DataFrame, colName: String): DataFrame = {
    val v = col(colName).cast("double")
    val vals = df.filter(v.isNotNull && !isnan(v))
      .select(v.as("__v"),
        monotonically_increasing_id().as("__id"))
    val neg = vals.filter(col("__v") < 0).limit(1).count()
    require(neg == 0L,
      s"gini is undefined over negative values (column $colName)")
    val ranked = Blocking.withSortRank(vals, "__v", "__id")
    ranked.agg(count(lit(1)).as("n"),
        sum(col("__v")).as("__s"),
        sum(col("rnk") * col("__v")).as("__is"))
      .select(col("n"), round(col("__s"), 4).as("total"),
        when(col("n") > 0 && col("__s") > 0,
          round(lit(2.0) * col("__is") / (col("n") * col("__s"))
            - (col("n") + lit(1.0)) / col("n"), 6)).as("gini"))
  }

  /** Equi-width histogram of a numeric column: `bins` buckets over
    * [lo, hi] (derived from one min/max aggregation when not given),
    * every bin emitted INCLUDING empty ones — (bin, bin_lo, bin_hi,
    * n). Values land in floor((v − lo) / w) with the top edge closed
    * (v = hi joins the last bin); rows with null/NaN or outside
    * [lo, hi] are dropped. One scan + one partial-agg groupBy on the
    * bin id; the bin spine is a `bins`-row literal frame, so empty
    * bins cost nothing at any scale. */
  def histogram(df: DataFrame, colName: String, bins: Int,
                lo: Double = Double.NaN,
                hi: Double = Double.NaN): DataFrame = {
    require(bins >= 1 && bins <= 100000,
      s"bins must be in [1,100000], got $bins")
    val v = col(colName).cast("double")
    val (blo, bhi) =
      if (lo.isNaN || hi.isNaN) {
        val r = df.filter(v.isNotNull && !isnan(v))
          .agg(min(v), max(v)).head()
        if (r.isNullAt(0)) (0.0, 1.0) else (r.getDouble(0), r.getDouble(1))
      } else (lo, hi)
    require(blo <= bhi, s"lo $blo > hi $bhi")
    val w = if (bhi > blo) (bhi - blo) / bins else 1.0
    val counted = df
      .filter(v.isNotNull && !isnan(v) && v >= blo && v <= bhi)
      .select(least(floor((v - lit(blo)) / w), lit(bins - 1L))
        .cast("int").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    import spark.implicits._
    val spine = (0 until bins)
      .map(i => (i, blo + i * w, if (i == bins - 1) bhi else blo + (i + 1) * w))
      .toDF("bin", "bin_lo", "bin_hi")
    spine.join(counted, Seq("bin"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  // ---- persisted KLL quantile digests -----------------------------------
  // The DISTRIBUTION sibling of the HLL cardinality digest: per-cycle
  // percentile telemetry (latency p99s, token-count medians, price
  // drift) without rescanning history. Datasketches KLL (Karnin,
  // Lang & Liberty 2016) is the mergeable quantile sketch with a
  // PROVEN rank-error bound (~1.65% at k=200, 99% confidence) —
  // unlike t-digest there is no data-order caveat. Spark exposes no
  // KLL SQL aggregate, so the build uses the Misra–Gries per-
  // partition shape (Frequent.scala): one sketch per (partition,
  // column) built in a shuffle-FREE mapPartitions pass, merged on
  // the driver — driver state ≤ partitions · cols · ~3 KB, bounded
  // by topology, never by rows. The digest file is append-only
  // (one row per column per cycle); estimation heapifies and merges
  // at read — KLL merge is the associative operation the sketch is
  // built around. Same `__fmt`+param discipline as every digest;
  // quantile estimates gate rows-only with the rank-error floor
  // spec-pinned, plus the BOUNDED sibling q217 under the hash gate
  // (the emitted row carries estimate vs exact so the gate sees the
  // error numerically).

  private[graft] val KllDigestFormat = 1

  private def kllSketchRows(df: DataFrame, cols: Seq[String],
                            k: Int): Seq[(String, Array[Byte])] = {
    import org.apache.datasketches.kll.KllDoublesSketch
    require(cols.nonEmpty, "kllDigest needs at least one column")
    require(k >= 8 && k <= 65535, s"KLL k must be in [8,65535], got $k")
    val nc = cols.length
    val proj = df.select(cols.map(c =>
      col("`" + c.replace("`", "``") + "`").cast("double")): _*)
    val partSketches = proj.rdd.mapPartitions { it =>
      val sks = Array.fill(nc)(KllDoublesSketch.newHeapInstance(k))
      it.foreach { row =>
        var i = 0
        while (i < nc) {
          if (!row.isNullAt(i)) sks(i).update(row.getDouble(i))
          i += 1
        }
      }
      Iterator(sks.map(_.toByteArray))
    }.collect()
    val merged = Array.fill(nc)(KllDoublesSketch.newHeapInstance(k))
    partSketches.foreach { bts =>
      var i = 0
      while (i < nc) {
        merged(i).merge(KllDoublesSketch.heapify(
          org.apache.datasketches.memory.Memory.wrap(bts(i))))
        i += 1
      }
    }
    cols.indices.map(i => (cols(i), merged(i).toByteArray))
  }

  /** Append one cycle's per-column KLL sketches (values cast to
    * double; nulls skipped) to the digest at `path`, stamped with
    * format + k — mixed-k appends are refused at read (merging
    * different-k KLLs silently degrades to the smaller guarantee). */
  def appendKllDigest(df: DataFrame, cols: Seq[String], path: String,
                      k: Int = 200): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    kllSketchRows(df, cols, k).toDF("col_name", "sketch")
      .withColumn("__fmt", lit(KllDigestFormat))
      .withColumn("__k", lit(k))
      .coalesce(1).write.mode("append").parquet(path)
  }

  /** Row-count threshold above which [[kllQuantiles]] merges the
    * digest DISTRIBUTED (per-column `reduceByKey` over the sketch
    * rows — KLL merge is associative and commutative, so the reduce
    * tree is exact) instead of collecting every appended row to the
    * driver. Below it the driver merge is strictly cheaper: a digest
    * row is ~3 KB, so 4096 rows is ~12 MB — well under any driver
    * budget — while the distributed path costs a shuffle. Above it
    * (a year of hourly cycles x a wide schema: 8760 cycles x 50 cols
    * = 438k rows, ~1.3 GB) the driver merge becomes the bottleneck
    * the digest exists to avoid; after the reduce only one merged
    * row PER COLUMN comes back, bounded by schema width, never by
    * cycle count. Spec-pinned (KllMergePathSpec): on sub-k digests —
    * where KLL retains every value and merge involves no randomized
    * compaction — the two paths produce IDENTICAL quantiles; past
    * compaction scale they agree within the sketch's rank-error
    * bound (merge trees of different shapes are equally valid KLL
    * states, not byte-equal ones). */
  val kllDistributedMergeThreshold = 4096

  /** Quantile estimates from a digest: validates the stamps, merges
    * each column's appended sketches, reads the INCLUSIVE quantile
    * at each rank in `qs`. Returns (col_name, q, value_est) — one
    * row per column per requested rank; columns whose sketches saw
    * no values (all-null) are omitted. Digests larger than
    * `mergeThreshold` rows merge distributed (see
    * [[kllDistributedMergeThreshold]]). */
  def kllQuantiles(spark: org.apache.spark.sql.SparkSession,
                   path: String, qs: Seq[Double],
                   mergeThreshold: Int = kllDistributedMergeThreshold)
  : DataFrame = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"ranks must be in [0,1], got ${qs.mkString(",")}")
    val df = spark.read.parquet(path)
    require(df.columns.contains("__fmt") && df.columns.contains("__k"),
      "not a KLL digest: missing __fmt/__k stamps — write with " +
        "Profile.appendKllDigest")
    val stamps = df.select(col("__fmt"), col("__k")).distinct().collect()
    stamps.foreach { r =>
      require(r.getInt(0) == KllDigestFormat,
        s"KLL digest format ${r.getInt(0)} != v$KllDigestFormat — rebuild")
    }
    require(stamps.map(_.getInt(1)).distinct.length == 1,
      s"KLL digest mixes k values " +
        s"${stamps.map(_.getInt(1)).distinct.mkString(",")} — " +
        "merge would degrade to the weaker guarantee; rebuild at one k")
    val k = stamps(0).getInt(1)
    val sketchRows = df.select(col("col_name"), col("sketch"))
    // cols x cycles rows: driver merge below the threshold (cheaper
    // than a shuffle), per-column reduceByKey above it — an
    // unbounded-cycles append-only digest must not funnel every
    // appended row through the driver (VERDICT r10 item 3)
    val byCol: Seq[(String, Array[Byte])] =
      if (sketchRows.count() <= mergeThreshold)
        sketchRows.collect()
          .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
          .groupBy(_._1).toSeq.map { case (c, rows) =>
            val m = KllDoublesSketch.newHeapInstance(k)
            rows.foreach { case (_, b) =>
              m.merge(KllDoublesSketch.heapify(
                org.apache.datasketches.memory.Memory.wrap(b)))
            }
            (c, m.toByteArray)
          }
      else
        sketchRows.rdd
          .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
          .reduceByKey { (a, b) =>
            val m = KllDoublesSketch.newHeapInstance(k)
            m.merge(KllDoublesSketch.heapify(
              org.apache.datasketches.memory.Memory.wrap(a)))
            m.merge(KllDoublesSketch.heapify(
              org.apache.datasketches.memory.Memory.wrap(b)))
            m.toByteArray
          }.collect().toSeq // one row per COLUMN survives the reduce
    import spark.implicits._
    byCol.sortBy(_._1).flatMap { case (c, b) =>
      val m = KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(b))
      if (m.isEmpty) Nil
      else qs.map(q => (c, q,
        m.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)))
    }.toDF("col_name", "q", "value_est")
  }
}
