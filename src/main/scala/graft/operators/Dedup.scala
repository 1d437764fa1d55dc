package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication suite for training-data pipelines (DRIVER-EXT,
  * SURVEY.md §2.12). Four families:
  *
  *  - exact: one hash aggregation on the dedup key
  *  - MinHash + LSH: shingle → signature → band-bucket join →
  *    Jaccard-verify (the standard near-dup pipeline; candidate
  *    generation is a self-join on (band, bucket) so the shuffle key
  *    cardinality scales with corpus size, never all-pairs)
  *  - SimHash: 64-bit signature + pigeonhole chunk join for
  *    Hamming-distance candidates
  *  - embedding cosine: hyperplane-LSH bucketing + cosine-verify
  *
  * All stages are DataFrame ops: narrow signature computation, then
  * shuffles keyed on bucket ids only. At 100 TB the all-pairs
  * verification happens only inside buckets; skewed buckets should be
  * handled by AQE skew-split (bucket sizes are data-dependent).
  */
object Dedup {

  /** exact dedup on `cols`: keep the row with min `idCol` per group —
    * deterministic canonical representative, unlike dropDuplicates. */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(cols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** candidate near-dup pairs by MinHash LSH, verified by exact
    * Jaccard on word `shingleLen`-grams. Returns (id_a, id_b, jaccard)
    * with id_a < id_b and jaccard >= threshold. */
  /** `maxBucketSize`: band buckets larger than this are skipped during
    * candidate generation. Oversized buckets arise from high-frequency
    * shingles dominating a band's minima and contribute m^2 mostly-
    * false candidates; true near-dup pairs (which agree on most bands,
    * including selective rare-shingle ones) still surface from small
    * buckets. This is the standard LSH-dedup skew guard at corpus
    * scale. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   shingleLen: Int = 3, threshold: Double = 0.8,
                   seed: Long = 42L,
                   maxBucketSize: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    val sh = Partitioning.spread(df.select(col(idCol).as("id"),
        wordShingles(col(textCol), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0))
      .cache() // reused for banding and for verification joins
    // band rows carry ONLY (id, band, bucket): the shingle payload
    // would otherwise be duplicated `bands` times through the shuffle
    val banded = sh
      .select(col("id"),
        explode(minhashBands(minhashSignature(col("sh"), numHashes, seed),
          bands, rows)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // pairs generated per bucket from a collected id array (one hash
    // aggregation) instead of a bucket self-join: no join-row blowup,
    // and the size guard is a cheap filter on the aggregated row.
    // Near-identical docs share most bands, so pairs are dedup'd
    // BEFORE the (expensive) jaccard verification.
    val cand = banded
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1), i ->
          |  transform(slice(ids, i + 1, size(ids) - i), y ->
          |    struct(least(element_at(ids, i), y) AS a,
          |           greatest(element_at(ids, i), y) AS b))))""".stripMargin))
        .as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** full MinHash dedup: pairs → connected components (min-id label
    * propagation) → keep each component's min id. Iterative DataFrame
    * joins with localCheckpoint to cut lineage (GraphFrames CC
    * pattern); converges in O(log(component diameter)) rounds. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16,
                   shingleLen: Int = 3, threshold: Double = 0.8,
                   maxIter: Int = 10): DataFrame = {
    val pairs = minhashPairs(df, idCol, textCol, numHashes, bands,
      shingleLen, threshold).select(col("id_a"), col("id_b"))
    val reps = connectedComponentMinLabel(pairs, maxIter)
    val toDrop = reps.filter(col("id") =!= col("rep")).select(col("id"))
    df.join(toDrop.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }

  /** min-label propagation over an undirected edge list (id_a, id_b):
    * returns (id, rep) where rep = min id in the component. */
  def connectedComponentMinLabel(pairs: DataFrame,
                                 maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("rep", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(labels,
          edges("dst") === labels("id"))
        .groupBy(edges("src").as("id"))
        .agg(min(col("rep")).as("nbr_rep"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("nbr_rep"), col("rep"))).as("rep"))
        .localCheckpoint()
      val changed = updated.join(labels.withColumnRenamed("rep", "old"),
        Seq("id")).filter(col("rep") =!= col("old")).limit(1).count()
      labels = updated
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDistance.
    * Pigeonhole: split 64 bits into maxDistance+1 chunks; any pair
    * within distance k must agree on >= 1 chunk. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDistance: Int = 3): DataFrame = {
    val chunks = maxDistance + 1
    val sh = Partitioning.spread(df.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sim"))).cache()
    val chunked = sh.select(col("id"),
        explode(simhashChunks(col("sim"), chunks)).as("ck"))
      .select(col("id"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val cand = chunked.select(col("chunk"), col("key"), col("id").as("id_a"))
      .join(chunked.select(col("chunk"), col("key"), col("id").as("id_b")),
        Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sim").as("sim_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sim").as("sim_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDistance(col("sim_a"), col("sim_b")).as("hamming"))
      .filter(col("hamming") <= maxDistance)
  }

  /** n-gram Jaccard dedup without LSH (exact all-pairs within a
    * blocking key to bound cost; block = shared rarest shingle could
    * be used — here the caller provides the blocking column). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, shingleLen: Int = 3,
                   threshold: Double = 0.5): DataFrame = {
    val sh = Partitioning.spread(
      df.select(col(idCol).as("id"), col(blockCol).as("blk"),
        wordShingles(col(textCol), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0))
    val a = sh.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .distinct()
  }

  /** embedding near-dup pairs: hyperplane-LSH bucket join + exact
    * cosine verification. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, threshold: Double = 0.95,
                     nBits: Int = 12, seed: Long = 42L): DataFrame = {
    val sig = Partitioning.spread(
      df.select(col(idCol).as("id"), col(vecCol).as("v")))
      .withColumn("bucket",
        VectorFunctions.hyperplaneSignature(col("v"), nBits, dim, seed))
      .cache()
    val cand = sig.select(col("bucket"), col("id").as("id_a"))
      .join(sig.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(sig.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
