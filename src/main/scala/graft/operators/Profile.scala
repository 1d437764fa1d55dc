package graft.operators

import org.apache.spark.sql.DataFrame
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
  // persisted digest; estimates are gated rows-only (q160 emits
  // estimate vs exact vs relative error — the sketch internals are
  // not SQL-replayable) with the error floor pinned in the spec.

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
}
