package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.multimodal.Multimodal

/** Decode-coverage census pins ([[Multimodal.sniffFormat]] /
  * `decodeStatus` / `decodeCoverage` — the WARC codingCoverage twin
  * for media payloads). The load-bearing test is the CODEC-AGREEMENT
  * one: every `jdk_decodable` claim is fed through the REAL JDK codec
  * (ImageIO / AudioSystem) and must decode; every `no_jdk_codec` /
  * `unknown_magic` claim must NOT — so the status column is a
  * verified fact about this JVM's codec set, not documentation. */
class DecodeCoverageSpec extends SparkTestBase {
  import spark.implicits._

  private def img(fmt: String): Array[Byte] = {
    val im = Multimodal.syntheticImage(3, 32, 32)
    val o = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, fmt, o), s"no $fmt writer")
    o.toByteArray
  }

  private def audio(tpe: javax.sound.sampled.AudioFileFormat.Type)
  : Array[Byte] = {
    import javax.sound.sampled._
    val data = Array.fill(400)(0x22.toByte)
    val f = new AudioFormat(8000f, 16, 1, true, true)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), f, 200)
    val o = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, o)
    o.toByteArray
  }

  /** crafted magic-byte headers for the formats the JDK cannot
    * decode — header + deterministic filler, fixed 32 bytes */
  private def crafted(magic: Array[Byte], at: Int = 0): Array[Byte] = {
    val b = Array.tabulate[Byte](32)(i => (i * 7 + 3).toByte)
    // avoid accidental magic in the filler: zero the sniffed window
    for (i <- 0 until 12 if i < b.length) b(i) = 0
    System.arraycopy(magic, 0, b, at, magic.length)
    b
  }

  private val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
  private val aiff = javax.sound.sampled.AudioFileFormat.Type.AIFF
  private val au = javax.sound.sampled.AudioFileFormat.Type.AU

  /** (label, kind, payload, expected format, expected status) */
  private lazy val fixtures: Seq[(String, String, Array[Byte], String, String)] =
    Seq(
      ("png", "image", img("png"), "png", "jdk_decodable"),
      ("jpeg", "image", img("jpeg"), "jpeg", "jdk_decodable"),
      ("gif", "image", img("gif"), "gif", "jdk_decodable"),
      ("bmp", "image", img("bmp"), "bmp", "jdk_decodable"),
      ("tiff", "image", img("tiff"), "tiff", "jdk_decodable"),
      ("wav", "audio", audio(wave), "wav", "jdk_decodable"),
      ("aiff", "audio", audio(aiff), "aiff", "jdk_decodable"),
      ("au", "audio", audio(au), "au", "jdk_decodable"),
      ("webp", "image",
        crafted("RIFF????WEBP".getBytes("US-ASCII")), // ? = any size
        "webp", "no_jdk_codec"),
      ("avif", "image", crafted("ftypavif".getBytes("US-ASCII"), 4),
        "avif", "no_jdk_codec"),
      ("heif", "image", crafted("ftypheic".getBytes("US-ASCII"), 4),
        "heif", "no_jdk_codec"),
      ("mp4", "video", crafted("ftypisom".getBytes("US-ASCII"), 4),
        "mp4", "no_jdk_codec"),
      ("avi", "video", crafted("RIFF????AVI ".getBytes("US-ASCII")),
        "avi", "no_jdk_codec"),
      ("matroska", "video",
        crafted(Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte)),
        "matroska", "no_jdk_codec"),
      ("mp3_id3", "audio", crafted("ID3".getBytes("US-ASCII")),
        "mp3", "no_jdk_codec"),
      ("mp3_sync", "audio",
        crafted(Array(0xFF, 0xFB).map(_.toByte)),
        "mp3", "no_jdk_codec"),
      ("ogg", "audio", crafted("OggS".getBytes("US-ASCII")),
        "ogg", "no_jdk_codec"),
      ("flac", "audio", crafted("fLaC".getBytes("US-ASCII")),
        "flac", "no_jdk_codec"),
      ("garbage", "image", Array.tabulate[Byte](40)(i => (i + 1).toByte),
        "unknown", "unknown_magic"),
      ("short", "image", Array[Byte](0x42), "unknown", "unknown_magic"),
      ("nullp", "image", null, "none", "no_payload"))

  private def mediaDf = {
    val rows = fixtures.zipWithIndex.map { case ((_, kind, bytes, _, _), i) =>
      Row(i.toLong, kind, bytes,
        Row(Option(bytes).map(_.length.toLong).getOrElse(0L),
          "application/octet-stream", "spec"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), Multimodal.mediaSchema)
  }

  test("sniffFormat + decodeStatus classify every fixture") {
    val got = mediaDf
      .select($"media_id", Multimodal.sniffFormat($"content").as("f"))
      .withColumn("s", Multimodal.decodeStatus($"f"))
      .as[(Long, String, String)].collect()
      .map { case (id, f, s) => id -> ((f, s)) }.toMap
    for (((label, _, _, ef, es), i) <- fixtures.zipWithIndex)
      assert(got(i.toLong) == ((ef, es)), s"fixture $label")
  }

  test("codec agreement: jdk_decodable ⟺ the real JDK codec decodes") {
    for ((label, kind, bytes, _, status) <- fixtures if bytes != null) {
      val decodes = kind match {
        case "image" | "video" =>
          // video containers go through ImageIO too: it must REFUSE
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)) != null
          catch { case scala.util.control.NonFatal(_) => false }
        case _ =>
          try {
            javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes)).close()
            true
          } catch { case scala.util.control.NonFatal(_) => false }
      }
      assert(decodes == (status == "jdk_decodable"),
        s"fixture $label: codec says $decodes, census claims $status")
    }
  }

  test("decodeCoverage census: counts and bytes per (kind,format,status)") {
    val cov = Multimodal.decodeCoverage(mediaDf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val expected = fixtures
      .groupBy { case (_, kind, _, f, s) => (kind, f, s) }
      .map { case (k, g) => k ->
        ((g.size.toLong,
          g.map(x => Option(x._3).map(_.length.toLong).getOrElse(0L)).sum)) }
    assert(cov == expected)
    // the hole is MEASURED: the census names the undecodable share
    val dropped = cov.collect {
      case ((_, _, "no_jdk_codec"), (n, _)) => n }.sum
    assert(dropped == fixtures.count(_._5 == "no_jdk_codec"))
  }

  test("imageHashes drops exactly the payloads the census calls " +
      "undecodable (image rows)") {
    val imgs = mediaDf.filter($"kind" === "image" && $"content".isNotNull)
    val hashed = Multimodal.imageHashes(imgs, "ahash")
      .select($"media_id").as[Long].collect().toSet
    val claimed = imgs
      .select($"media_id",
        Multimodal.decodeStatus(Multimodal.sniffFormat($"content")).as("s"))
      .as[(Long, String)].collect()
    for ((id, s) <- claimed)
      assert(hashed.contains(id) == (s == "jdk_decodable"),
        s"media $id status $s hashed=${hashed.contains(id)}")
  }
}
