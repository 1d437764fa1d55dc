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
  * is real and tested. The codec kernels themselves are STUBS —
  * deterministic functions of the bytes — because no image/audio
  * libraries exist in this container; swap `decodeKernel` /
  * `embedKernel` for real codecs (JNI/javacv) without touching the
  * plumbing.
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

  // ---- STUB kernels (deterministic fakes; the ??? of this container) --

  /** STUB image decode: real impl would JNI into a codec; this derives
    * (width, height, channels) deterministically from the bytes. */
  private[multimodal] def decodeKernel(bytes: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    (math.abs(h % 1920) + 1, math.abs((h >> 8) % 1080) + 1, 3)
  }

  /** STUB feature extraction: dim floats seeded from the payload hash
    * — stands in for a vision/audio encoder forward pass. */
  private[multimodal] def embedKernel(bytes: Array[Byte], dim: Int): Array[Float] = {
    val rnd = new scala.util.Random(java.util.Arrays.hashCode(bytes).toLong)
    Array.fill(dim)(rnd.nextFloat() * 2 - 1)
  }

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
          val (w, h, c) = decodeKernel(r.getAs[Array[Byte]]("content"))
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
            embedKernel(r.getAs[Array[Byte]]("content"), dim).toSeq)
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
          val bytes = r.getAs[Array[Byte]]("content")
          val blocks = bytes.grouped(1024).zipWithIndex
          blocks.collect { case (b, i) if i % stride == 0 =>
            Row(r.getLong(0), i,
              java.util.Arrays.hashCode(b).toLong)
          }
        }
      }(enc)
  }

  /** resize metadata update (STUB: real impl re-encodes the payload;
    * here only the typed metadata transform is exercised). */
  def withResizeMeta(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))
}
