package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (DRIVER-EXT,
  * SURVEY.md §2.12): media payloads ride as opaque `binary` columns
  * next to a typed metadata struct; decode / feature-extract /
  * frame-sample run as batched partition-local transforms.
  *
  * The Spark-side plumbing (schema, batching, partition sizing,
  * column pruning of the heavy binary column until the decode stage)
  * is real and tested. The kernels are REAL for every format the JDK
  * itself can decode — images via javax.imageio (PNG/JPEG/BMP/GIF):
  * true dimensions, channel counts and a downsampled-luminance
  * content embedding; audio via javax.sound.sampled (WAV/AIFF):
  * sample rate / channels / duration. Only payloads outside the
  * JDK's codec set (webp, mp3, video containers — would need
  * external libs absent from this container) fall back to
  * clearly-marked deterministic hash-derived stand-ins, so synthetic
  * fixtures exercise the same plumbing.
  *
  * At 100 TB: binary payloads dominate scan width, so every transform
  * here keeps the payload column out of shuffles — decode outputs are
  * compact structs/arrays, and downstream joins happen on ids only.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),        // image | audio | video
    StructField("content", BinaryType),     // opaque payload
    StructField("meta", StructType(Seq(     // typed sidecar metadata
      StructField("n_bytes", LongType),
      StructField("mime", StringType),
      StructField("source", StringType))))))

  /** build a media table from any (id, string) table — the payload is
    * the utf-8 bytes; stands in for real files in this container. */
  def fromText(df: DataFrame, idCol: String, textCol: String,
               kind: String = "image"): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(length(col(textCol)).cast("long").as("n_bytes"),
        lit(s"application/x-fake-$kind").as("mime"),
        lit("testdata").as("source")).as("meta"))

  // ---- decode kernels --------------------------------------------------
  // REAL for the formats the JDK ships codecs for — javax.imageio
  // (PNG/JPEG/BMP/GIF) and javax.sound.sampled (WAV/AIFF) — with a
  // clearly-marked deterministic fallback for payloads no JDK codec
  // accepts (e.g. the synthetic text-byte fixtures, or formats that
  // would need external libs: webp, mp3, video containers).

  /** r18 opt (guide §1.2 per-task work): ImageIO's stream cache
    * defaults to DISK — every read/write of an in-memory byte-array
    * image creates and deletes a temp FILE, pure filesystem-metadata
    * overhead that also serializes parallel decode. Our payloads are
    * always in-memory byte arrays, so flip the process-global flag
    * once per JVM, lazily from every media kernel (executor JVMs
    * included — the kernels are where the codecs run). */
  private[graft] lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** image decode → (width, height, channels). JDK ImageIO first;
    * non-decodable bytes fall back to a deterministic hash-derived
    * shape (FALLBACK, not a real decode — kept so synthetic fixtures
    * flow through the same plumbing). */
  private[multimodal] def decodeKernel(bytes: Array[Byte]): (Int, Int, Int) = {
    imageIoNoDiskCache
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img != null)
        return (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
    } catch { case scala.util.control.NonFatal(_) => }
    val h = java.util.Arrays.hashCode(bytes)
    (math.abs(h % 1920) + 1, math.abs((h >> 8) % 1080) + 1, 3)
  }

  /** feature extraction → dim floats. For JDK-decodable images this is
    * a REAL content embedding: the image is resampled onto a
    * ceil(sqrt(dim))² grayscale grid (average pooling via
    * getScaledInstance) and the normalized luminances are the vector.
    * Non-decodable payloads fall back to hash-seeded pseudo-features
    * (FALLBACK — stands in for an encoder forward pass). */
  private[multimodal] def embedKernel(bytes: Array[Byte], dim: Int): Array[Float] = {
    val side = math.ceil(math.sqrt(dim.toDouble)).toInt
    lumGrid(bytes, side, side) match {
      case Some(g) => Array.tabulate(dim)(i => (g(i) * 2 - 1).toFloat)
      case None =>
        val rnd = new scala.util.Random(
          java.util.Arrays.hashCode(bytes).toLong)
        Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    }
  }

  /** audio decode → (sampleRate, channels, frames) via the JDK's
    * javax.sound.sampled (WAV/AIFF/AU are in every JDK); null for
    * payloads no JDK codec accepts. */
  private[multimodal] def audioKernel(bytes: Array[Byte])
      : Option[(Float, Int, Long)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val r = (fmt.getSampleRate, fmt.getChannels, in.getFrameLength)
      in.close()
      Some(r)
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- partition-batched transforms ------------------------------------

  /** decode: (media_id, width, height, channels). mapPartitions so a
    * real codec could amortize per-batch setup (model load, JNI
    * session) across the partition — the Pandas-UDF batching shape. */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        // per-partition setup for a real codec would go here
        rows.map { r =>
          val (w, h, c) = decodeKernel(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), w, h, c)
        }
      }(enc)
  }

  /** feature-extract: (media_id, embedding array<float>) */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0),
            embedKernel(r.getAs[Array[Byte]](1), dim).toSeq)
        }
      }(enc)
  }

  /** frame-sample a "video": fingerprint every `stride`-th 1 KiB block
    * → (media_id, frame_no, frame_hash). Generator-shaped output, so
    * downstream ops see narrow rows, never the payload. */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType),
      StructField("frame_hash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val blocks = bytes.grouped(1024).zipWithIndex
          blocks.collect { case (b, i) if i % stride == 0 =>
            Row(r.getLong(0), i,
              java.util.Arrays.hashCode(b).toLong)
          }
        }
      }(enc)
  }

  /** audio metadata: (media_id, sample_rate, channels, frames,
    * duration_s) for JDK-decodable audio; non-audio rows are dropped
    * (generator shape — narrow output, payload never leaves the
    * partition). */
  def decodeAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", FloatType),
      StructField("channels", IntegerType),
      StructField("frames", LongType),
      StructField("duration_s", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          audioKernel(r.getAs[Array[Byte]](1)).map {
            case (rate, ch, frames) =>
              Row(r.getLong(0), rate, ch, frames,
                if (rate > 0) frames.toDouble / rate else 0.0)
          }
        }
      }(enc)
  }

  // ---- perceptual hashing ------------------------------------------------

  /** grayscale grid luminances for a decodable image: gw×gh average
    * pooling (the [[embedKernel]] resample), row-major in [0,1]. */
  private def lumGrid(bytes: Array[Byte], gw: Int, gh: Int)
      : Option[Array[Double]] = {
    imageIoNoDiskCache
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img != null) {
        val small = new java.awt.image.BufferedImage(gw, gh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = small.createGraphics()
        g.drawImage(img.getScaledInstance(gw, gh,
          java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
        g.dispose()
        val out = new Array[Double](gw * gh)
        var i = 0
        while (i < out.length) {
          val p = small.getRGB(i % gw, i / gw)
          out(i) = (((p >> 16) & 0xff) * 0.299 + ((p >> 8) & 0xff) * 0.587 +
            (p & 0xff) * 0.114) / 255.0
          i += 1
        }
        return Some(out)
      }
    } catch { case scala.util.control.NonFatal(_) => }
    None
  }

  /** average hash (aHash): 8×8 luminance grid, bit k set iff cell k's
    * luminance exceeds the grid MEAN. Mean-relative thresholding makes
    * the hash invariant to global brightness/contrast scaling, and the
    * 8×8 pooling makes it invariant to resolution — the classic
    * near-duplicate image fingerprint. None for non-decodable bytes. */
  private[multimodal] def aHashKernel(bytes: Array[Byte]): Option[Long] =
    lumGrid(bytes, 8, 8).map { g =>
      val mean = g.sum / g.length
      var h = 0L; var i = 0
      while (i < 64) { if (g(i) > mean) h |= (1L << i); i += 1 }
      h
    }

  /** difference hash (dHash): 9×8 luminance grid, bit (r*8+c) set iff
    * cell (r,c) is darker than its right neighbour — a horizontal
    * gradient fingerprint, more robust than aHash to smooth global
    * lighting changes. None for non-decodable bytes. */
  private[multimodal] def dHashKernel(bytes: Array[Byte]): Option[Long] =
    lumGrid(bytes, 9, 8).map { g =>
      var h = 0L; var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (g(r * 9 + c) < g(r * 9 + c + 1)) h |= (1L << (r * 8 + c))
          c += 1
        }
        r += 1
      }
      h
    }

  /** DCT pHash (r18, VERDICT r17 item 4): 32×32 luminance grid →
    * 2D DCT-II (orthonormal α(u)α(v) scaling) → the top-left 8×8
    * low-frequency block → threshold each of the 63 NON-DC
    * coefficients at their median — bit k (k = 0..62, row-major over
    * the block skipping (0,0)) set iff its coefficient exceeds the
    * median; bit 63 is always 0. Excluding the DC term makes the
    * hash EXACTLY invariant to uniform brightness shifts (a constant
    * offset moves only C(0,0): Σ_x cos((2x+1)uπ/2N) = 0 for u ≥ 1)
    * and median thresholding makes it invariant to contrast scaling;
    * the low-frequency crop is what survives recompression and
    * rescaling far better than aHash's cell-vs-mean bits (Haitsma–
    * Kalker-style robust hashing applied to images; the widely
    * published pHash construction). Cost: the 8×16 cosine table ×
    * separable partial DCT = O(8·32·32 + 8·8·32) mults per image —
    * decode-dominated in practice. None for non-decodable bytes. */
  private[multimodal] def pHashKernel(bytes: Array[Byte]): Option[Long] =
    lumGrid(bytes, 32, 32).map { g =>
      val n = 32
      val cosT = Array.tabulate(8, n)((u, x) =>
        math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)))
      def alpha(u: Int): Double =
        if (u == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      // separable: tmp(u)(y) = Σ_x g(y·32+x)·cos(u,x), then
      // d(u)(v) = α(u)α(v) Σ_y tmp(u)(y)·cos(v,y)
      val tmp = Array.ofDim[Double](8, n)
      var u = 0
      while (u < 8) {
        var y = 0
        while (y < n) {
          var s = 0.0; var x = 0
          while (x < n) { s += g(y * n + x) * cosT(u)(x); x += 1 }
          tmp(u)(y) = s; y += 1
        }
        u += 1
      }
      val d = Array.ofDim[Double](64)
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0; var y = 0
          while (y < n) { s += tmp(u)(y) * cosT(v)(y); y += 1 }
          d(v * 8 + u) = alpha(u) * alpha(v) * s; v += 1
        }
        u += 1
      }
      val nonDc = java.util.Arrays.copyOfRange(d, 1, 64)
      val sorted = nonDc.clone(); java.util.Arrays.sort(sorted)
      val med = sorted(31) // median of 63
      var h = 0L; var i = 0
      while (i < 63) { if (nonDc(i) > med) h |= (1L << i); i += 1 }
      h
    }

  /** perceptual image hashes: (media_id, img_hash long). `kind` is
    * "ahash" (mean-thresholded 8×8 grid), "dhash" (9×8 horizontal
    * gradient) or "phash" (32×32 DCT low-frequency median bits —
    * the recompression/rescale-robust choice, [[pHashKernel]]).
    * Non-decodable payloads are DROPPED (generator shape —
    * a hash-of-garbage would poison duplicate groups downstream;
    * [[decodeImages]] is the face that surfaces decode failures).
    *
    * The dedup composition this exists for: exact duplicate groups
    * via one hash-shuffle groupBy on `img_hash` (q235's gate), and
    * NEAR-duplicate pairs via
    * [[graft.operators.Dedup.signaturePairs]] — the 64-bit value
    * rides the same pigeonhole band-bucketing machinery as text
    * simhash, so image near-dup at 100 TB inherits the bucketed,
    * never-all-pairs shape. Payload stays partition-local; only
    * (id, long) rows ever shuffle. */
  def imageHashes(media: DataFrame, kind: String = "ahash"): DataFrame = {
    require(Set("ahash", "dhash", "phash")(kind),
      s"kind must be ahash|dhash|phash, got $kind")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("img_hash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val h = kind match {
            case "ahash" => aHashKernel(bytes)
            case "dhash" => dHashKernel(bytes)
            case _ => pHashKernel(bytes)
          }
          h.map(v => Row(r.getLong(0), v))
        }
      }(enc)
  }

  // ---- decode-coverage census (r18) ------------------------------------

  /** Container-format sniff by MAGIC BYTES — pure column math over
    * the first 12 payload bytes (one hex prefix + a when-chain,
    * whole-stage codegen; no decode is attempted and the payload
    * never shuffles). Formats recognized: png, jpeg, gif, bmp, tiff,
    * webp, avif, heif, mp4, avi, matroska (mkv/webm), wav, aiff, au,
    * mp3, ogg, flac; `none` for a NULL payload, `unknown` otherwise.
    * BMP's 2-byte magic is sniffed LAST among the image formats — it
    * is the weakest signature in the table. */
  def sniffFormat(content: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column = {
    val h = upper(hex(substring(content, 1, 12)))
    // hex of bytes [off, off+len) (0-based offset into the payload)
    def at(off: Int, len: Int) =
      substring(h, 2 * off + 1, 2 * len)
    def ascii(s: String) =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        .map(b => f"$b%02X").mkString
    when(content.isNull, lit("none"))
      .when(at(0, 8) === "89504E470D0A1A0A", "png")
      .when(at(0, 3) === "FFD8FF", "jpeg")
      .when(at(0, 4) === ascii("GIF8"), "gif")
      .when(at(0, 4).isin("49492A00", "4D4D002A"), "tiff")
      .when(at(0, 4) === ascii("RIFF") && at(8, 4) === ascii("WEBP"),
        "webp")
      .when(at(0, 4) === ascii("RIFF") && at(8, 4) === ascii("WAVE"),
        "wav")
      .when(at(0, 4) === ascii("RIFF") && at(8, 4) === ascii("AVI "),
        "avi")
      .when(at(0, 4) === ascii("FORM") && at(8, 4) === ascii("AIFF"),
        "aiff")
      .when(at(0, 4) === ascii(".snd"), "au")
      .when(at(4, 4) === ascii("ftyp") &&
        at(8, 4).isin(ascii("avif"), ascii("avis")), "avif")
      .when(at(4, 4) === ascii("ftyp") &&
        at(8, 4).isin(ascii("heic"), ascii("heix"), ascii("mif1")),
        "heif")
      .when(at(4, 4) === ascii("ftyp"), "mp4")
      .when(at(0, 4) === ascii("OggS"), "ogg")
      .when(at(0, 4) === ascii("fLaC"), "flac")
      .when(at(0, 4) === "1A45DFA3", "matroska")
      .when(at(0, 3) === ascii("ID3") ||
        at(0, 2).isin("FFFB", "FFF3", "FFF2", "FFFA"), "mp3")
      .when(at(0, 2) === ascii("BM"), "bmp")
      .otherwise(lit("unknown"))
  }

  /** decode-claim for a sniffed format: `jdk_decodable` (a stdlib
    * codec exists — javax.imageio: png/jpeg/gif/bmp/tiff since
    * JDK 9; javax.sound: wav/aiff/au), `no_jdk_codec` (webp, avif,
    * heif, mp3, ogg, flac, mp4, avi, matroska — formats whose decode
    * would need third-party libraries, excluded by the no-deps
    * policy), `no_payload`, or `unknown_magic`. The claims are not
    * taken on trust: DecodeCoverageSpec feeds every class through
    * the REAL JDK codecs and asserts agreement. */
  def decodeStatus(format: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column =
    when(format.isin("png", "jpeg", "gif", "bmp", "tiff",
      "wav", "aiff", "au"), lit("jdk_decodable"))
      .when(format === "none", lit("no_payload"))
      .when(format === "unknown", lit("unknown_magic"))
      .otherwise(lit("no_jdk_codec"))

  /** The decode-coverage census — [[graft.sources.Warc.codingCoverage]]'s
    * twin for media payloads: (kind, format, status) → record count +
    * total payload bytes, so the formats the JDK-codec media stack
    * silently falls back on ([[decodeKernel]]'s hash-derived shapes,
    * [[imageHashes]]' drops — notably WebP/AVIF, a large share of
    * modern web images) are a MEASURED number committed alongside a
    * corpus, never a silent coverage hole. One payload-local scan +
    * one tiny (≤ kinds × formats) aggregation; the payload bytes
    * themselves never shuffle. */
  def decodeCoverage(media: DataFrame): DataFrame =
    media.select(col("kind"),
        sniffFormat(col("content")).as("format"),
        coalesce(length(col("content")).cast("long"), lit(0L)).as("nb"))
      .withColumn("status", decodeStatus(col("format")))
      .groupBy(col("kind"), col("format"), col("status"))
      .agg(count(lit(1)).as("n"), sum(col("nb")).as("bytes"))

  /** Decoded mono PCM in [-1, 1] plus the sample rate, via the JDK
    * codec set (WAV/AIFF/AU): the stream is converted to 16-bit
    * signed PCM when it is not already, channels are averaged down
    * to mono. None for payloads no JDK codec accepts. */
  private[multimodal] def pcmMono(bytes: Array[Byte])
      : Option[(Array[Double], Float)] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in0 = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val src = in0.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        src.getChannels * 2, src.getSampleRate, false)
      val in =
        if (src.matches(target)) in0
        else AudioSystem.getAudioInputStream(target, in0)
      val data = in.readAllBytes()
      in.close()
      val ch = math.max(1, target.getChannels)
      val n = data.length / (2 * ch)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        var s = 0.0
        var c = 0
        while (c < ch) {
          val idx = (i * ch + c) * 2
          val lo = data(idx) & 0xff
          val hi = data(idx + 1)
          s += ((hi << 8) | lo).toShort.toDouble / 32768.0
          c += 1
        }
        out(i) = s / ch
        i += 1
      }
      Some((out, target.getSampleRate))
      // NonFatal only (ADVICE r14): an undecodable payload is a data
      // condition and the row drops, but OutOfMemoryError /
      // InterruptedException are resource failures that must
      // propagate — swallowing them here would mask an executor
      // problem as "undecodable media"
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Goertzel power of the frequency-`f` component over
    * `x[a, a+len)`: |X(f)|² / len² — the len² normalization makes a
    * pure tone's power ≈ (amplitude/2)² independent of window length
    * and sample rate, which is what buys the resample robustness the
    * spec pins. */
  private def goertzelPower(x: Array[Double], a: Int, len: Int,
                            f: Double, sr: Double): Double = {
    val w = 2.0 * math.Pi * f / sr
    val cw = 2.0 * math.cos(w)
    var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < len) {
      val s0 = x(a + i) + cw * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    (s1 * s1 + s2 * s2 - cw * s1 * s2) / (len.toDouble * len)
  }

  /** spectral band-energy probe frequencies (Hz) — absolute, so the
    * fingerprint measures CONTENT, not container sample rate; the
    * highest band bounds the minimum decodable rate at 8 kHz
    * (Nyquist 4 kHz > 3.2 kHz). */
  private[multimodal] val AudioHashBands =
    Array(400.0, 800.0, 1600.0, 3200.0)

  /** perceptual audio hash kernel (chromaprint-SHAPED, not the
    * chromaprint algorithm: same published structure — a
    * time × frequency energy image reduced to sign-of-difference
    * bits): the clip is split into 17 duration-proportional windows,
    * each probed at the 4 [[AudioHashBands]] via Goertzel, and bit
    * (t·4 + b) is set iff band b's energy RISES from window t to
    * t+1 — 16 transitions × 4 bands = 64 bits.
    *
    * Invariances, by construction:
    *  - gain: scaling every sample by g scales every energy by g²,
    *    so the > comparisons — and the hash — are EXACTLY unchanged;
    *  - resample: windows are duration-proportional and the probe
    *    frequencies absolute, so the energy image describes the
    *    analog content (leakage differences only — the spec pins a
    *    tight Hamming bound on resampled copies).
    *
    * Degenerate faces: silence hashes to 0L (the all-zero signature
    * — the band screen's `maxBucketSize` refusal is the documented
    * guard for blank-media floods); clips shorter than 8 samples per
    * window and rates below 8 kHz return None (too short / too
    * narrow to fingerprint honestly).
    *
    * NON-goals (r15, VERDICT r14 item 7 — stated so callers size
    * recall expectations correctly):
    *  - clip/time-shift invariance: windows are proportional to the
    *    WHOLE clip, so trimming or padding re-phases every window
    *    boundary and the hash moves arbitrarily (spec-pinned:
    *    MultimodalHashSpec asserts a trimmed copy lands OUTSIDE the
    *    dedup screen's Hamming radius). This kernel is for
    *    exact-content dedup under re-encoding (gain/resample);
    *    shift-robust matching needs overlapping fixed-length sliding
    *    windows + alignment search — a different index shape
    *    (per-clip hash SEQUENCES, not one 64-bit row), implemented
    *    since r16 as [[audioFrameHashes]] + [[audioAlignPairs]].
    *  - formats beyond the JDK codec set: [[pcmMono]] decodes what
    *    javax.sound ships (WAV/AIFF/AU); mp3/flac/ogg would need
    *    external decoder dependencies absent from this build, so
    *    such payloads return None and drop from [[audioHashes]]
    *    rather than fingerprinting container bytes. */
  private[multimodal] def audioHashKernel(bytes: Array[Byte])
      : Option[Long] =
    pcmMono(bytes).flatMap { case (x, sr) =>
      val nWin = 17
      if (sr < 8000f || x.length < nWin * 8) None
      else {
        val nb = AudioHashBands.length
        val e = Array.ofDim[Double](nWin, nb)
        var t = 0
        while (t < nWin) {
          val a = (t.toLong * x.length / nWin).toInt
          val b = ((t + 1).toLong * x.length / nWin).toInt
          var bi = 0
          while (bi < nb) {
            e(t)(bi) = goertzelPower(x, a, b - a, AudioHashBands(bi), sr)
            bi += 1
          }
          t += 1
        }
        var h = 0L
        t = 0
        while (t < nWin - 1) {
          var bi = 0
          while (bi < nb) {
            if (e(t + 1)(bi) > e(t)(bi)) h |= 1L << (t * nb + bi)
            bi += 1
          }
          t += 1
        }
        Some(h)
      }
    }

  /** perceptual audio hashes: (media_id, audio_hash long) — the
    * audio face of [[imageHashes]], completing the multimodal dedup
    * triangle (text simhash / image aHash-dHash / audio band-energy,
    * VERDICT r13 #2). Non-decodable, too-short and sub-8 kHz
    * payloads are DROPPED (generator shape — a hash of garbage would
    * poison duplicate groups; [[decodeAudio]] is the face that
    * surfaces decode metadata).
    *
    * Dedup composition: exact groups via one hash-shuffle groupBy
    * (q249's gate); NEAR-dup pairs via
    * [[graft.operators.Dedup.signaturePairs]] and the admission
    * loop via [[graft.streaming.Admission.admitBatchSignature]] —
    * the 64-bit value rides the same pigeonhole band machinery as
    * text simhash and image hashes, UNCHANGED. Payload stays
    * partition-local; only (id, long) rows ever shuffle. */
  def audioHashes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("audio_hash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          audioHashKernel(r.getAs[Array[Byte]](1))
            .map(v => Row(r.getLong(0), v))
        }
      }(enc)
  }

  /** OVERLAPPING-WINDOW audio frame hashes — the shift-tolerant
    * extension path [[audioHashKernel]]'s non-goals named (r16,
    * VERDICT r15 item 6): the chromaprint / Philips-fingerprint
    * published SHAPE (Haitsma & Kalker 2002, "A Highly Robust Audio
    * Fingerprint System" — overlapping fixed-length frames, each
    * reduced to sign bits of band energies; matching = counting
    * frame agreements at a consistent alignment), not either exact
    * algorithm.
    *
    * Kernel: frames of `frameMs` advancing by `hopMs`; each frame is
    * split into 16 equal subwindows probed at the 4
    * [[AudioHashBands]] via Goertzel, and bit (w·4 + b) is set iff
    * band b's energy in subwindow w exceeds the frame's MEAN energy
    * for that band — 64 bits per frame. Mean-threshold (not the
    * whole-clip kernel's transitions) because it is gain-invariant
    * (all energies and the mean scale by g² together) and every bit
    * is decided by a within-frame RATIO, so re-encoded copies move
    * bits only where energies hug the mean.
    *
    * Shift tolerance — the contract, stated precisely: a clip
    * trimmed by k·hop yields frames BIT-IDENTICAL to the original's
    * frames k positions later (identical sample ranges), so
    * [[audioAlignPairs]] recovers trimmed/padded copies by exact or
    * near-exact frame matches voting a consistent offset. Trims at
    * sub-hop granularity land between frame phases and match only
    * through the Hamming tolerance — shrink `hopMs` to tighten the
    * quantum (cost: rows scale 1/hop). Frames shorter than
    * 16 × 8 samples or rates under 8 kHz yield no rows (the
    * [[audioHashKernel]] guards). */
  private[multimodal] def audioFrameHashKernel(
      bytes: Array[Byte], frameMs: Int, hopMs: Int)
      : Seq[(Int, Long)] =
    pcmMono(bytes) match {
      case None => Seq.empty
      case Some((x, sr)) =>
        val nSub = 16
        val frame = (sr * frameMs / 1000f).toInt
        val hop = math.max(1, (sr * hopMs / 1000f).toInt)
        if (sr < 8000f || frame < nSub * 8 || x.length < frame) Seq.empty
        else {
          val nb = AudioHashBands.length
          val out = Seq.newBuilder[(Int, Long)]
          var f = 0
          var start = 0
          while (start + frame <= x.length) {
            val e = Array.ofDim[Double](nSub, nb)
            var w = 0
            while (w < nSub) {
              val a = start + (w.toLong * frame / nSub).toInt
              val b = start + ((w + 1).toLong * frame / nSub).toInt
              var bi = 0
              while (bi < nb) {
                e(w)(bi) = goertzelPower(x, a, b - a, AudioHashBands(bi), sr)
                bi += 1
              }
              w += 1
            }
            var h = 0L
            var bi = 0
            while (bi < nb) {
              var mean = 0.0
              var w2 = 0
              while (w2 < nSub) { mean += e(w2)(bi); w2 += 1 }
              mean /= nSub
              w2 = 0
              while (w2 < nSub) {
                if (e(w2)(bi) > mean) h |= 1L << (w2 * nb + bi)
                w2 += 1
              }
              bi += 1
            }
            out += ((f, h))
            f += 1
            start += hop
          }
          out.result()
        }
    }

  /** per-frame fingerprints: (media_id, frame_idx, frame_hash) — one
    * row per overlapping window. Non-decodable / too-short / sub-8kHz
    * payloads yield no rows (the [[audioHashes]] drop convention).
    * Payload stays partition-local; only (id, int, long) rows ever
    * leave the scan. At 100 TB rows scale with audio-hours / hop —
    * the standard fingerprint-index footprint. */
  def audioFrameHashes(media: DataFrame, frameMs: Int = 500,
                       hopMs: Int = 125): DataFrame = {
    require(frameMs > 0 && hopMs > 0 && hopMs <= frameMs,
      s"need 0 < hopMs <= frameMs, got frameMs=$frameMs hopMs=$hopMs")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_hash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          audioFrameHashKernel(r.getAs[Array[Byte]](1), frameMs, hopMs)
            .map { case (f, h) => Row(r.getLong(0), f, h) }
        }
      }(enc)
  }

  /** Offset-voting alignment over a frame table (the Haitsma match
    * stage, Spark-shaped): candidate frame pairs via the simhash
    * pigeonhole chunk machinery (maxDistance+1 chunks — any pair
    * within the Hamming radius shares a chunk), verified by exact
    * [[graft.functions.TextFunctions.hammingDistance]], then votes
    * grouped by (id_a, id_b, offset = frame_a − frame_b): a pair of
    * clips sharing ≥ minMatches frames at ONE consistent offset is a
    * shifted-duplicate group. Output: (id_a, id_b, offset, matches)
    * with id_a < id_b, the single best (most votes; ties to the
    * smallest offset) alignment per pair.
    *
    * Hot-hash census (the LSH bucket discipline): frame hashes
    * occurring more than `maxHashFreq` times corpus-wide — silence,
    * test tones, boilerplate jingles — are REFUSED from candidate
    * generation (one partial-agg census pass; the refusal is the
    * same all-pairs guard every screen in this engine carries).
    * Shape at 100 TB: census partial-agg, chunk-keyed equi-join (no
    * all-pairs), per-(pair, offset) counts partial-aggregate
    * map-side; nothing corpus-quadratic anywhere. */
  def audioAlignPairs(frames: DataFrame, maxDistance: Int = 2,
                      minMatches: Int = 3,
                      maxHashFreq: Long = 1000L): DataFrame = {
    require(maxDistance >= 0 && minMatches >= 1 && maxHashFreq >= 1,
      s"bad params: maxDistance=$maxDistance minMatches=$minMatches " +
        s"maxHashFreq=$maxHashFreq")
    import graft.functions.TextFunctions
    val cold = frames
      .join(broadcast(frames.groupBy(col("frame_hash"))
          .agg(count(lit(1)).as("__freq"))
          .filter(col("__freq") > maxHashFreq)
          .select(col("frame_hash"))),
        Seq("frame_hash"), "left_anti")
    val chunked = cold.select(col("media_id"), col("frame_idx"),
        col("frame_hash"),
        explode(TextFunctions.simhashChunks(col("frame_hash"),
          maxDistance + 1)).as("__c"))
      .select(col("media_id"), col("frame_idx"), col("frame_hash"),
        col("__c.chunk").as("__chunk"), col("__c.key").as("__key"))
    val a = chunked.select(col("__chunk"), col("__key"),
      col("media_id").as("id_a"), col("frame_idx").as("fa"),
      col("frame_hash").as("ha"))
    val b = chunked.select(col("__chunk"), col("__key"),
      col("media_id").as("id_b"), col("frame_idx").as("fb"),
      col("frame_hash").as("hb"))
    val cand = a.join(b, Seq("__chunk", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("fa"), col("ha"),
        col("id_b"), col("fb"), col("hb"))
      .distinct() // a pair can collide in several chunks — vote once
      .filter(TextFunctions.hammingDistance(col("ha"), col("hb"))
        <= maxDistance)
    cand
      .groupBy(col("id_a"), col("id_b"),
        (col("fa") - col("fb")).as("offset"))
      .agg(count(lit(1)).as("matches"))
      .filter(col("matches") >= minMatches)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(struct(col("matches"),
        (-col("offset")).as("__no"), col("offset"))).as("__best"))
      .select(col("id_a"), col("id_b"),
        col("__best.offset").as("offset"),
        col("__best.matches").as("matches"))
  }

  /** PCM16 mono WAV bytes for a sample array — the synthesized-
    * fixture generator (the [[fromText]] discipline in audio space:
    * real RIFF/WAVE payloads so gates and specs drive the REAL
    * decode path, not a stub). */
  /** fixture image kernels (the wavBytes discipline: REAL container
    * bytes — PNG/JPEG through javax.imageio — so gates drive the
    * real decode path): a deterministic grayscale scene per class
    * (diagonal gradient + a class-positioned rectangle), and the
    * recompress / rescale / brighten transforms pHash must survive. */
  private[graft] def syntheticImage(cls: Int, w: Int = 64, h: Int = 64,
                                    bright: Int = 0)
  : java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val base = math.min(255, math.max(0,
          (x * 255 / w + y * 128 / h) / 2 + bright))
        val rx = 8 + (cls * 9) % 40; val ry = 6 + (cls * 13) % 40
        val inRect = x >= rx && x < rx + 14 && y >= ry && y < ry + 10
        val v = if (inRect)
          math.min(255, math.max(0, 235 - cls * 17 + bright))
        else base
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
        y += 1
      }
      x += 1
    }
    im
  }

  private[graft] def pngBytes(im: java.awt.image.BufferedImage)
  : Array[Byte] = {
    imageIoNoDiskCache
    val o = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", o)
    o.toByteArray
  }

  private[graft] def jpegBytes(im: java.awt.image.BufferedImage,
                               quality: Float): Array[Byte] = {
    imageIoNoDiskCache
    val wr = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val o = new java.io.ByteArrayOutputStream()
    wr.setOutput(javax.imageio.ImageIO.createImageOutputStream(o))
    wr.write(null, new javax.imageio.IIOImage(im, null, null), p)
    wr.dispose()
    o.toByteArray
  }

  private[graft] def rescaled(im: java.awt.image.BufferedImage,
                              w: Int, h: Int)
  : java.awt.image.BufferedImage = {
    val s = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = s.createGraphics()
    g.drawImage(im.getScaledInstance(w, h,
      java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
    g.dispose()
    s
  }

  private[graft] def wavBytes(samples: Array[Short],
                              rate: Float): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL image resize: decode via ImageIO, downscale so
    * max(width, height) <= maxSide (aspect preserved, area-averaging
    * filter), re-encode as PNG. Non-decodable payloads and images
    * already within bounds pass through unchanged. Output carries the
    * new payload plus decoded dimensions; runs partition-local, the
    * payload never crosses a shuffle. */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        imageIoNoDiskCache
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || math.max(img.getWidth, img.getHeight) <= maxSide)
            Row(r.getLong(0), bytes,
              if (img == null) null else Integer.valueOf(img.getWidth),
              if (img == null) null else Integer.valueOf(img.getHeight))
          else {
            val scale = maxSide.toDouble / math.max(img.getWidth, img.getHeight)
            val w = math.max(1, math.round(img.getWidth * scale).toInt)
            val h = math.max(1, math.round(img.getHeight * scale).toInt)
            val small = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = small.createGraphics()
            g.drawImage(img.getScaledInstance(w, h,
              java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
            g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(small, "png", out)
            Row(r.getLong(0), out.toByteArray,
              Integer.valueOf(w), Integer.valueOf(h))
          }
        }
      }(enc)
  }

  /** resize metadata update (kept for payload-less flows: computes the
    * target dimensions without touching bytes — [[resizeImages]] is
    * the real re-encoding variant). */
  def withResizeMeta(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))
}
