package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
  * point-frequency digest that completes the sketch family: Bloom
  * answers "seen at all?" (BloomDigest), HLL answers "how many
  * distinct?" (Profile.hllDigest), Misra–Gries answers "which keys
  * are heavy?" (Frequent.heavyHitters); CMS answers "about how often
  * did THIS key occur?" without storing keys at all.
  *
  * Representation: the sketch is a plain DataFrame of
  * (d, bucket, cnt) rows — depth rows of width counters, at most
  * depth·width rows REGARDLESS of corpus size. Build is ONE
  * partial aggregation over one scan (each input row expands to
  * `depth` (d, bucket) pairs map-side, combined before the
  * shuffle), so the shuffle carries ≤ depth·width rows per
  * partition, never the corpus. Estimation is min over the d
  * counters a key hashes to: an UPPER BOUND on the true count
  * (every occurrence of the key increments all d of its counters;
  * collisions only ever add), with error ≤ εN at probability
  * 1−δ for width = e/ε, depth = ln(1/δ).
  *
  * Counters are LINEAR in the input: sketch(A ⊎ B) =
  * sketch(A) + sketch(B) cell for cell. The persisted digest
  * ([[append]]/[[estimateFromPath]]) leans on exactly that —
  * appends just add partial-count rows and estimation sums by
  * (d, bucket) at read, so append ≡ rebuild EXACTLY (not
  * approximately: the merged counters are identical integers —
  * spec-pinned), and per-cycle telemetry cost is one batch scan
  * plus a few-KB file, never a history rescan.
  *
  * Two hash families, both seeded per-row-of-depth:
  *  - default: `xxhash64(d, key)` — engine-fast, codegen'd.
  *  - portable: first 8 hex chars of `md5(key ":" d)` parsed as an
  *    integer (the q45/q140 replay discipline) — bit-for-bit
  *    reproducible in DuckDB SQL, which makes the ENTIRE
  *    build→estimate chain oracle-checkable, rare for a sketch.
  * Both are uniform enough for the CMS guarantee; the family is a
  * digest parameter, stamped and validated like every other
  * persisted-index param.
  */
object CountMin {

  val Format = "graft-cms-v1"

  /** Bucket column for `key` (already cast to string) at depth row
    * `d` under the chosen family. Non-negative, < width. */
  private def bucket(key: Column, d: Column, width: Int,
                     portable: Boolean): Column =
    if (portable)
      // native kernel, value-identical to the SQL chain
      // conv(substring(md5(..),1,8),16,10).cast("long") (Md5PrefixSpec)
      graft.expressions.TextExpressions.md5Prefix(
        concat(key, lit(":"), d.cast("string")), 8) % width
    else pmod(xxhash64(d, key), lit(width.toLong))

  private def checkParams(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16,
      s"depth must be in [1,16], got $depth (ln(1/δ) — 4 gives " +
        "δ≈2%, more is rarely useful)")
    require(width >= 2 && width <= (1 << 24),
      s"width must be in [2, 2^24], got $width (e/ε counters)")
  }

  /** Build the sketch over `df(colName)`: (d, bucket, cnt), one row
    * per NON-EMPTY counter (absent cell ≡ 0 — estimation treats a
    * missing join hit as zero, which is exact: nothing hashed
    * there). Nulls are skipped, mirroring count(col) semantics. */
  def sketch(df: DataFrame, colName: String, depth: Int = 4,
             width: Int = 1024, portable: Boolean = false): DataFrame = {
    checkParams(depth, width)
    val key = col(colName).cast("string")
    val pairs = (0 until depth).map { d =>
      struct(lit(d).as("d"),
        bucket(key, lit(d), width, portable).as("bucket"))
    }
    df.filter(col(colName).isNotNull)
      .select(explode(array(pairs: _*)).as("__cell"))
      .groupBy(col("__cell.d").as("d"), col("__cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the DISTINCT non-null keys of
    * `keys(keyCol)`: (keyCol, est). `est` ≥ the true count always
    * (CMS never undercounts); missing counters read as 0. The
    * sketch side is depth·width-bounded so it broadcasts — the key
    * side streams through untouched, no corpus shuffle. Params must
    * match the build call; they are not discoverable from the rows,
    * which is why the persisted face stamps them. */
  def estimate(sketchDf: DataFrame, keys: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024,
               portable: Boolean = false): DataFrame = {
    checkParams(depth, width)
    val key = col(keyCol).cast("string")
    val probes = keys.select(col(keyCol)).filter(col(keyCol).isNotNull)
      .distinct()
      .select(col(keyCol), posexplode(array(
        (0 until depth).map(d =>
          bucket(key, lit(d), width, portable)): _*))
        .as(Seq("d", "bucket")))
    probes.join(broadcast(sketchDf), Seq("d", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---- persisted digest (append-only, linear merge) ---------------------

  /** Append one batch's partial counters to the digest at `path`
    * (creating it on first use), stamped with the format tag and
    * every estimation-relevant param. Append-only like the HLL
    * digest: no read-modify-write, no swap, concurrent-append-safe
    * at the filesystem's append granularity; estimation sums the
    * partials by (d, bucket) at read — exact by linearity. */
  def append(df: DataFrame, colName: String, path: String,
             depth: Int = 4, width: Int = 1024,
             portable: Boolean = false): Unit =
    sketch(df, colName, depth, width, portable)
      .withColumn("__fmt", lit(Format))
      .withColumn("__depth", lit(depth))
      .withColumn("__width", lit(width))
      .withColumn("__portable", lit(portable))
      .coalesce(1).write.mode("append").parquet(path)

  /** Point estimates from a persisted digest for the distinct keys
    * of `keys(keyCol)` — validates the stamps (foreign tables and
    * mixed-param appends throw: summing counters hashed under
    * different (depth, width, family) would silently estimate
    * garbage), folds the appended partials, then runs [[estimate]]
    * with the STAMPED params so caller and digest cannot drift. */
  def estimateFromPath(spark: SparkSession, path: String,
                       keys: DataFrame, keyCol: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(Seq("__fmt", "__depth", "__width", "__portable")
      .forall(df.columns.contains),
      s"$path is not a $Format digest: missing param stamps — " +
        "write with CountMin.append")
    val stamps = df.select(col("__fmt"), col("__depth"), col("__width"),
      col("__portable")).distinct().collect()
    stamps.foreach { r =>
      require(r.getString(0) == Format,
        s"$path digest format ${r.getString(0)} != $Format — rebuild")
    }
    require(stamps.length == 1,
      s"$path mixes CMS params " +
        stamps.map(r => s"(depth=${r.getInt(1)}, width=${r.getInt(2)}, " +
          s"portable=${r.getBoolean(3)})").mkString(", ") +
        " — counters from different hash spaces cannot merge; rebuild")
    val (depth, width, portable) =
      (stamps(0).getInt(1), stamps(0).getInt(2), stamps(0).getBoolean(3))
    val folded = df.groupBy(col("d"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    estimate(folded, keys, keyCol, depth, width, portable)
  }
}
