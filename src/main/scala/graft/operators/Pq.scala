package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions

/** Product quantization (Jégou/Douze/Schmid, PAMI 2011) for embedding
  * columns (DRIVER-EXT, SURVEY.md §2.12 similarity search) — the
  * storage/scan-compression half of large-scale ANN, complementing
  * [[Similarity]]'s IVF routing half:
  *
  *  - '''fit''': split the `m*dsub`-dim space into `m` subspaces and
  *    learn `ksub` centroids per subspace by k-means on a BOUNDED
  *    sample (never the full corpus — subquantizer quality saturates
  *    far below 100k points, and a full-corpus fit would re-scan
  *    100 TB per Lloyd round).
  *  - '''encode''': per vector, the index of the nearest centroid in
  *    each subspace — `m` small ints in place of `m*dsub` floats. At
  *    ksub=256 that is 1 byte per subspace: a 256-dim float32
  *    embedding (1 KiB) becomes 32 bytes, a 32x cut in what an ANN
  *    scan READS — the term that dominates at corpus scale, where the
  *    search is IO-bound on the embedding column.
  *  - '''adcTopK''': asymmetric distance computation — exact query
  *    vector vs quantized corpus, squared L2 summed subspace-wise.
  *    Same broadcast-queries / map-side-WindowGroupLimit shape as
  *    [[Similarity.bruteForceTopK]]: the corpus (now codes, 32-64x
  *    smaller) is scanned once per query batch and never collected.
  *
  * Determinism: the fit sorts its bounded sample by the id column and
  * uses spread deterministic init + fixed Lloyd rounds, so the same
  * (corpus, params) always yields the same codebooks regardless of
  * partition layout — encode/search results are rerun-stable and the
  * codebook can be treated as a persisted model artifact (PqSpec pins
  * fit-twice equality). Approximation quality is measured, not
  * assumed: q145 emits ADC-vs-exact recall as its output row, and the
  * q146 variant with literal codebooks is fully SQL-oracled.
  */
object Pq {

  /** Flattened codebooks: centroid j-th component of centroid `cidx`
    * in subspace `s` lives at `((s*ksub)+cidx)*dsub + j`. */
  case class PqModel(m: Int, dsub: Int, ksub: Int,
                     centroids: Array[Double]) {
    require(centroids.length == m * ksub * dsub,
      s"codebook length ${centroids.length} != m*ksub*dsub")
    /** bits per stored code vector (packed form rounds up to bytes) */
    def codeBits: Int = m * (32 - Integer.numberOfLeadingZeros(ksub - 1))
  }

  /** Fit `m` subquantizers of `ksub` centroids each by Lloyd k-means
    * on a bounded sample of the corpus.
    *
    * Determinism contract: the bounded sample is the id-ORDERED
    * prefix — `sort(idCol).limit(fitCap)` plans as
    * TakeOrderedAndProject (per-partition top-fitCap heaps + one
    * k-row merge, never a full sort), so WHICH rows train the
    * codebook is a pure function of the row set, independent of
    * partition layout even when the corpus exceeds `fitCap` (PqSpec
    * pins the truncation regime). At fitCap <= 100k rows the driver
    * work is trivial (100k * 256 dims = ~100 MB transient). One
    * caveat rides Spark's own semantics: `fitFraction < 1` row
    * SELECTION is per-partition Bernoulli, so a fractional sample is
    * layout-dependent before the ordered truncation ever runs — at
    * 100 TB either accept that (any uniform sample trains equally
    * well; only rerun-identity is lost) or pre-filter
    * deterministically (e.g. on a hash of the id) and leave
    * fitFraction at 1. Init takes the `ksub` evenly spaced sample
    * rows per subspace (deterministic, spread); `iters` fixed Lloyd
    * rounds; an emptied cluster keeps its previous centroid. */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
          m: Int, dsub: Int, ksub: Int, seed: Long = 42L,
          fitFraction: Double = 1.0, fitCap: Int = 100000,
          iters: Int = 10): PqModel = {
    require(m >= 1 && dsub >= 1 && ksub >= 1, "m, dsub, ksub must be >= 1")
    val sampled = corpus
      .select(col(idCol).cast("string").as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
    val rows = (if (fitFraction < 1.0)
        sampled.sample(withReplacement = false, fitFraction, seed)
      else sampled)
      .sort(col("__id"))
      .limit(fitCap)
      .collect()
      .sortBy(_.getString(0))
      .map(_.getSeq[Double](1).toArray)
    val n = rows.length
    require(n >= ksub, s"fit sample has $n rows, need >= ksub ($ksub)")
    require(rows.head.length >= m * dsub,
      s"vectors have ${rows.head.length} dims, need >= ${m * dsub}")

    val centroids = new Array[Double](m * ksub * dsub)
    var s = 0
    while (s < m) {
      // deterministic spread init: the ksub evenly spaced sample rows
      var c = 0
      while (c < ksub) {
        val src = rows(((c.toLong * n) / ksub).toInt)
        var j = 0
        while (j < dsub) {
          centroids((s * ksub + c) * dsub + j) = src(s * dsub + j)
          j += 1
        }
        c += 1
      }
      var it = 0
      while (it < iters) {
        val sums = Array.ofDim[Double](ksub, dsub)
        val counts = new Array[Long](ksub)
        var i = 0
        while (i < n) {
          val v = rows(i)
          var best = 0
          var bestD = Double.MaxValue
          var cc = 0
          while (cc < ksub) {
            val base = (s * ksub + cc) * dsub
            var d = 0.0
            var j = 0
            while (j < dsub) {
              val diff = v(s * dsub + j) - centroids(base + j)
              d += diff * diff
              j += 1
            }
            if (d < bestD) { bestD = d; best = cc }
            cc += 1
          }
          counts(best) += 1
          var j = 0
          while (j < dsub) {
            sums(best)(j) += v(s * dsub + j)
            j += 1
          }
          i += 1
        }
        var cc = 0
        while (cc < ksub) {
          if (counts(cc) > 0) {
            var j = 0
            while (j < dsub) {
              centroids((s * ksub + cc) * dsub + j) =
                sums(cc)(j) / counts(cc)
              j += 1
            }
          } // emptied cluster keeps its previous centroid
          cc += 1
        }
        it += 1
      }
      s += 1
    }
    PqModel(m, dsub, ksub, centroids)
  }

  /** Add the PQ code column for every row: array<int> of length m
    * (`packed=false`, the SQL-replayable form) or an m-byte binary
    * (`packed=true`, the storage form; requires ksub <= 256). One
    * native codegen'd expression per row, no shuffle. */
  def encode(df: DataFrame, vecCol: String, model: PqModel,
             out: String = "pq_code", packed: Boolean = false): DataFrame =
    df.withColumn(out, VectorExpressions.pqEncode(col(vecCol),
      model.m, model.dsub, model.ksub, model.centroids, packed))

  /** Approximate top-k by ADC over a PRE-ENCODED corpus
    * (id, codeCol): per query, squared-L2-by-codebook ascending,
    * ties on neighbor id. `rank <= k` over row_number triggers the
    * WindowGroupLimit rewrite — map tasks pre-reduce to local top-k
    * before the shuffle, as in [[Similarity.bruteForceTopK]]. The
    * `adc` column is rounded to 6 decimals BEFORE ranking so the
    * ordering is deterministic and oracle-replayable. */
  def adcTopK(encodedCorpus: DataFrame, queries: DataFrame,
              idCol: String, codeCol: String, qvecCol: String,
              model: PqModel, k: Int,
              excludeSelf: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val q = queries.select(col(idCol).as("query_id"), col(qvecCol).as("__qv"))
    val c = Partitioning.spread(
      encodedCorpus.select(col(idCol).as("neighbor_id"),
        col(codeCol).as("__code")))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
              else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorExpressions.pqAdc(col("__qv"), col("__code"),
          model.m, model.dsub, model.ksub, model.centroids), 6).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ model: coarse cells route (the IVF half), per-cell
    * RESIDUALS are PQ-coded (the PQ half) — the standard
    * billion-scale ANN serving stack (Jégou et al. §V). Residual
    * coding matters: residuals concentrate near 0 with far less
    * variance than raw vectors, so the same code budget buys more
    * fidelity. `coarse` is the flattened (nCells x dim) table. */
  case class IvfPqModel(nCells: Int, dim: Int, coarse: Array[Double],
                        pq: PqModel) {
    require(coarse.length == nCells * dim, "coarse table shape mismatch")
    private[operators] def coarseModel: PqModel =
      PqModel(1, dim, nCells, coarse)
  }

  /** Fit coarse cells then subquantizers ON THE RESIDUALS, both via
    * the deterministic bounded-sample Lloyd of [[fit]] (the coarse
    * fit IS `fit` with m=1 — one subspace spanning the whole vector).
    * Two bounded fits + one corpus-free residual pass over the SAMPLE
    * only; nothing here scans the full corpus. */
  def fitIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
               nCells: Int, m: Int, dsub: Int, ksub: Int,
               seed: Long = 42L, fitFraction: Double = 1.0,
               fitCap: Int = 100000, iters: Int = 10): IvfPqModel = {
    val dim = m * dsub
    val coarse = fit(corpus, idCol, vecCol, m = 1, dsub = dim,
      ksub = nCells, seed = seed, fitFraction = fitFraction,
      fitCap = fitCap, iters = iters)
    val model0 = IvfPqModel(nCells, dim, coarse.centroids,
      PqModel(m, dsub, ksub, new Array[Double](m * ksub * dsub)))
    val residuals = withResiduals(corpus, idCol, vecCol, model0)
      .select(col(idCol), col("__resid"))
    val pq = fit(residuals, idCol, "__resid", m = m, dsub = dsub,
      ksub = ksub, seed = seed, fitFraction = fitFraction,
      fitCap = fitCap, iters = iters)
    IvfPqModel(nCells, dim, coarse.centroids, pq)
  }

  /** (cell, cvec) lookup table — nCells rows, always broadcast. */
  private def cellsDf(model: IvfPqModel,
                      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val rows = (0 until model.nCells).map { c =>
      (c, model.coarse.slice(c * model.dim, (c + 1) * model.dim))
    }
    spark.createDataFrame(rows).toDF("__cell", "__cvec")
  }

  /** Adds `__cell` (nearest coarse cell — [[PqEncode]] with m=1) and
    * `__resid` (vec − cell centroid, via zip_with in double). */
  private def withResiduals(df: DataFrame, idCol: String, vecCol: String,
                            model: IvfPqModel): DataFrame = {
    val cm = model.coarseModel
    val assigned = df.withColumn("__cellArr",
        VectorExpressions.pqEncode(col(vecCol), cm.m, cm.dsub, cm.ksub,
          cm.centroids, packed = false))
      .withColumn("__cell", col("__cellArr").getItem(0))
      .drop("__cellArr")
    assigned.join(broadcast(cellsDf(model, df.sparkSession)), Seq("__cell"))
      .withColumn("__resid", zip_with(col(vecCol).cast("array<double>"),
        col("__cvec"), (a, b) => a - b))
      .drop("__cvec")
  }

  /** Encode a corpus for IVF-PQ serving: (…, cell, codeCol) — the
    * persistable index form (cell for routing, m small ints per row
    * for ADC). One corpus pass, no shuffle. */
  def encodeIvfPq(df: DataFrame, idCol: String, vecCol: String,
                  model: IvfPqModel, cellOut: String = "cell",
                  codeOut: String = "pq_code",
                  packed: Boolean = false): DataFrame =
    encode(withResiduals(df, idCol, vecCol, model), "__resid", model.pq,
        out = codeOut, packed = packed)
      .withColumnRenamed("__cell", cellOut)
      .drop("__resid")

  /** IVF-PQ top-k over a PRE-ENCODED corpus: queries rank the nCells
    * coarse cells (broadcast table, [[PqAdc]] with the cell id as a
    * 1-element code), keep `nProbe`, form per-(query, cell) residuals
    * and ADC-score only rows in probed cells. At 100 TB the corpus
    * side reads `nProbe/nCells` of the CODES column (32-64x smaller
    * than the embeddings) — both prunings compose; the probed query
    * table (|Q| * nProbe rows) broadcasts into the cell join, and the
    * final top-k is the same WindowGroupLimit shape as the other
    * search paths. ADC rounded to 6 decimals before ranking. */
  def ivfPqTopK(encodedCorpus: DataFrame, queries: DataFrame,
                idCol: String, cellCol: String, codeCol: String,
                qvecCol: String, model: IvfPqModel, k: Int,
                nProbe: Int, excludeSelf: Boolean = false): DataFrame = {
    require(k > 0 && nProbe > 0, "k and nProbe must be positive")
    val cm = model.coarseModel
    val q = queries.select(col(idCol).as("query_id"), col(qvecCol).as("__qv"))
    // carry __cvec through the probe ranking — the cross join already
    // pairs every query with every cell's centroid, so the residual
    // needs no second cells build/broadcast
    val probes = q.crossJoin(broadcast(cellsDf(model, queries.sparkSession)))
      .select(col("query_id"), col("__qv"), col("__cell"), col("__cvec"),
        VectorExpressions.pqAdc(col("__qv"),
          array(col("__cell")), cm.m, cm.dsub, cm.ksub, cm.centroids)
          .as("__cd"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__cd").asc, col("__cell").asc)
    val probed = probes.withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__cell"),
        zip_with(col("__qv").cast("array<double>"), col("__cvec"),
          (a, b) => a - b).as("__qres"))
    val c = Partitioning.spread(encodedCorpus.select(
      col(idCol).as("neighbor_id"), col(cellCol).as("__cell"),
      col(codeCol).as("__code")))
    val scored = c.join(broadcast(probed), Seq("__cell"))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
              else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorExpressions.pqAdc(col("__qres"), col("__code"),
          model.pq.m, model.pq.dsub, model.pq.ksub,
          model.pq.centroids), 6).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Model FORMAT version stamped as `__fmt` into every persisted
    * codebook row — same discipline as the minhash/gram index
    * families (Dedup.MinhashIndexFormat): the params alone cannot
    * detect an incompatible layout change (centroid flattening order,
    * argmin tie rule), and the failure mode of a stale codebook is a
    * silently WRONG encode, worse than the index families' silent
    * zero-candidate screens. v1 = `[(sub*ksub)+cidx]*dsub+j`
    * flattening, strict-less-than argmin. */
  private[graft] val PqModelFormat = 1

  /** Persist a codebook: one row per (space, sub, cidx) — "pq" rows
    * for the subquantizers, "coarse" rows for an IVF-PQ coarse table
    * — with `__fmt` + shape params stamped constant on every row
    * (free under parquet RLE, validated on load). The model is
    * driver-state by nature (like a spark.ml model) but rides the
    * same storage contract as the persisted dedup indexes. */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
                model: PqModel, path: String): Unit =
    modelDf(spark, "pq", model).coalesce(1).write.mode("overwrite")
      .parquet(path)

  /** Persist an [[IvfPqModel]]: the coarse table is "coarse" rows
    * (sub=0, cidx=cell) in the same file. */
  def saveIvfPqModel(spark: org.apache.spark.sql.SparkSession,
                     model: IvfPqModel, path: String): Unit =
    modelDf(spark, "pq", model.pq)
      .unionByName(modelDf(spark, "coarse",
        PqModel(1, model.dim, model.nCells, model.coarse)))
      .coalesce(1).write.mode("overwrite").parquet(path)

  private def modelDf(spark: org.apache.spark.sql.SparkSession,
                      space: String, m: PqModel): DataFrame = {
    val rows = for (s <- 0 until m.m; c <- 0 until m.ksub) yield
      (space, s, c,
        m.centroids.slice((s * m.ksub + c) * m.dsub,
          (s * m.ksub + c + 1) * m.dsub).toSeq)
    spark.createDataFrame(rows)
      .toDF("space", "sub", "cidx", "centroid")
      .withColumn("__fmt", lit(PqModelFormat))
      .withColumn("__m", lit(m.m))
      .withColumn("__dsub", lit(m.dsub))
      .withColumn("__ksub", lit(m.ksub))
  }

  /** Load a [[PqModel]] persisted by [[saveModel]]. Validates the
    * `__fmt` format version, the shape params (constant, matching the
    * row population: exactly m*ksub "pq" rows, each centroid of
    * length dsub) — any gap throws with a rebuild message instead of
    * encoding wrongly. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): PqModel =
    loadSpace(spark.read.parquet(path), "pq")

  /** Load an [[IvfPqModel]] persisted by [[saveIvfPqModel]]. */
  def loadIvfPqModel(spark: org.apache.spark.sql.SparkSession,
                     path: String): IvfPqModel = {
    val df = spark.read.parquet(path)
    val pq = loadSpace(df, "pq")
    val coarse = loadSpace(df, "coarse")
    IvfPqModel(coarse.ksub, coarse.dsub, coarse.centroids, pq)
  }

  private def loadSpace(df: DataFrame, space: String): PqModel = {
    val need = Seq("space", "sub", "cidx", "centroid",
      "__fmt", "__m", "__dsub", "__ksub")
    val missing = need.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"not a PQ model file: missing columns $missing — rebuild with " +
        s"Pq.saveModel (format v$PqModelFormat)")
    val rows = df.filter(col("space") === space)
      .select(col("sub"), col("cidx"), col("centroid").cast("array<double>"),
        col("__fmt"), col("__m"), col("__dsub"), col("__ksub"))
      .collect()
    require(rows.nonEmpty, s"PQ model file has no '$space' rows")
    val fmts = rows.map(_.getInt(3)).distinct
    require(fmts.sameElements(Array(PqModelFormat)),
      s"PQ model format ${fmts.mkString(",")} does not match this " +
        s"library's v$PqModelFormat — rebuild the codebook " +
        s"(an incompatible layout would encode WRONG, not just miss)")
    val (m, dsub, ksub) = (rows.map(_.getInt(4)).distinct,
      rows.map(_.getInt(5)).distinct, rows.map(_.getInt(6)).distinct) match {
      case (Array(a), Array(b), Array(c)) => (a, b, c)
      case other => sys.error(s"PQ model params not constant: $other")
    }
    require(rows.length == m * ksub,
      s"PQ model '$space' rows incomplete: ${rows.length} of ${m * ksub}")
    val centroids = new Array[Double](m * ksub * dsub)
    val seen = new java.util.HashSet[Int]()
    rows.foreach { r =>
      val (s, c) = (r.getInt(0), r.getInt(1))
      val arr = r.getSeq[Double](2)
      require(s >= 0 && s < m && c >= 0 && c < ksub,
        s"PQ model row out of range: sub=$s cidx=$c")
      require(seen.add(s * ksub + c),
        s"PQ model has duplicate row sub=$s cidx=$c")
      require(arr.length == dsub,
        s"PQ model centroid length ${arr.length} != dsub $dsub")
      var j = 0
      while (j < dsub) {
        centroids((s * ksub + c) * dsub + j) = arr(j); j += 1
      }
    }
    PqModel(m, dsub, ksub, centroids)
  }

  /** Content digest of a codebook (md5 over shape + every centroid
    * byte) — the pairing key between a persisted ENCODED CORPUS and
    * the model that encoded it. [[PqAdc]]'s range check only catches
    * SHAPE-incompatible models; two models of identical (m, dsub,
    * ksub) trained on different data pass it and decode silently
    * WRONG — the exact trap `__fmt` versioning exists for, keyed here
    * on content because PQ "params" ARE the learned centroids. */
  def codebookDigest(model: PqModel): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(12 + model.centroids.length * 8)
    bb.putInt(model.m).putInt(model.dsub).putInt(model.ksub)
    model.centroids.foreach(bb.putDouble)
    bb.flip()
    md.update(bb)
    md.digest().map("%02x".format(_)).mkString
  }

  /** [[codebookDigest]] over both halves of an IVF-PQ model. */
  def codebookDigest(model: IvfPqModel): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(codebookDigest(model.coarseModel)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.update(codebookDigest(model.pq)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Encoded-corpus index format version (`__fmt`), bumped with any
    * incompatible change to the code column layout. v1 = array<int> /
    * packed-binary codes as [[PqEncode]] emits them. */
  private[graft] val PqIndexFormat = 1

  /** Persist an encoded corpus (from [[encode]] / [[encodeIvfPq]])
    * with the encoding model's digest stamped on every row — parquet
    * RLE stores the constants for free, and [[loadEncoded]] can then
    * REFUSE a corpus/model mismatch instead of ADC-scanning wrong
    * distances. Any layout (partitioning, bucketing) can wrap this;
    * the stamp is column-level. */
  def saveEncoded(encoded: DataFrame, path: String, digest: String,
                  mode: String = "overwrite"): Unit =
    encoded
      .withColumn("__fmt", lit(PqIndexFormat))
      .withColumn("__digest", lit(digest))
      .write.mode(mode).parquet(path)

  /** Load a [[saveEncoded]] corpus for serving with `model`:
    * validates the format version and that EVERY distinct stamped
    * digest equals the model's (one column-pruned distinct over
    * constant RLE columns — cheap at any scale; a union of corpora
    * encoded under different models fails here instead of mixing
    * geometries). Returns the frame with the stamp columns dropped. */
  def loadEncoded(spark: org.apache.spark.sql.SparkSession, path: String,
                  digest: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(df.columns.contains("__fmt") && df.columns.contains("__digest"),
      "not a saveEncoded corpus: missing __fmt/__digest stamps — " +
        "re-encode and persist with Pq.saveEncoded")
    val stamps = df.select(col("__fmt"), col("__digest")).distinct()
      .collect()
    stamps.foreach { r =>
      require(r.getInt(0) == PqIndexFormat,
        s"encoded-corpus format ${r.getInt(0)} != this library's " +
          s"v$PqIndexFormat — re-encode")
      require(r.getString(1) == digest,
        s"encoded corpus was built by codebook ${r.getString(1)}, not " +
          s"the passed model's $digest — ADC against the wrong " +
          "codebook returns silently wrong neighbors; re-encode or " +
          "load the matching model")
    }
    df.drop("__fmt", "__digest")
  }

  /** Exact squared-L2 top-k (the recall yardstick for [[adcTopK]] —
    * ADC approximates L2, not cosine, so the gate compares like with
    * like). Same shape as [[Similarity.bruteForceTopK]]. */
  def exactL2TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int,
                  excludeSelf: Boolean = false): DataFrame = {
    import graft.functions.VectorFunctions
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = Partitioning.spread(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("query_id") =!= col("neighbor_id")
              else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.l2Distance(col("__qv"), col("__cv")).as("l2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
