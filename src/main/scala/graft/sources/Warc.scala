package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive) reader — the container format upstream of the
  * r16 HTML main-content extractor: C4, RefinedWeb and every Common
  * Crawl derivative start from `.warc`/`.warc.gz` files, and a user
  * of this engine's cleaning stack meets them before any HTML.
  * Clean-room from the PUBLIC format spec (ISO 28500 / IIPC
  * WARC-1.1: a WARC file is a sequence of records, each a
  * `WARC/x.y` version line + `Name: value` header lines + CRLF CRLF
  * + exactly `Content-Length` payload octets + CRLF CRLF), no
  * third-party parser.
  *
  * Reading rides Spark's `binaryFile` source: one task per WARC
  * file, record parsing partition-local — the Common Crawl layout
  * (many ~1 GB members) parallelizes across files, which is how
  * every published WARC pipeline shards; per-record gzip members
  * (the `.warc.gz` convention) decompress through
  * `GZIPInputStream`'s native multi-member handling. Only header
  * fields and the payload leave the parser; nothing ever shuffles
  * at read time.
  *
  * Fail-soft contract: a malformed record (missing/unparsable
  * Content-Length, truncated payload, missing version line) stops
  * the parse of THAT FILE at the malformation — records already
  * parsed are kept, the rest of the file is skipped (a torn tail
  * must not poison the records before it; a thrown error would
  * poison the whole corpus read).
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("record_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType)))

  /** read every record of every WARC file under `path` (glob ok). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val file = r.getString(0)
          parse(r.getAs[Array[Byte]](1)).zipWithIndex.map {
            case (rec, i) =>
              Row(file, i, rec.headers.get("warc-type").orNull,
                rec.headers.get("warc-record-id").orNull,
                rec.headers.get("warc-target-uri").orNull,
                rec.headers.get("warc-date").orNull,
                rec.headers.get("content-type").orNull,
                rec.headers.get("content-length")
                  .flatMap(_.toLongOption)
                  .map(java.lang.Long.valueOf).orNull,
                rec.payload)
          }
        }
      }(enc)
  }

  /** `response` records unwrapped from their HTTP envelope:
    * (warc_file, record_idx, target_uri, http_status, body). The
    * HTTP payload of a WARC response is a full HTTP/1.x message —
    * status line + headers + CRLF CRLF + body (RFC 9112). The body
    * decodes with the `charset=` the response's own Content-Type
    * header declares (legacy corpora are full of ISO-8859-1 /
    * windows-1252 — UTF-8-only decoding garbles every non-ASCII
    * page); missing, unknown or unsupported charsets fall back to
    * UTF-8 with replacement. (In-body `<meta charset>` sniffing is
    * deliberately out of scope — the header is the transport-level
    * truth the spec assigns precedence when present.) Records
    * without a parsable HTTP envelope are dropped. Feeds
    * [[graft.operators.Extract.mainContent]] directly. */
  def httpResponses(records: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("warc_file", StringType, nullable = false),
      StructField("record_idx", IntegerType, nullable = false),
      StructField("target_uri", StringType),
      StructField("http_status", IntegerType),
      StructField("body", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    records
      .filter(lower(col("warc_type")) === "response")
      .select(col("warc_file"), col("record_idx"), col("target_uri"),
        col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          splitHttpFull(r.getAs[Array[Byte]](3)).map {
            case (status, headers, body) =>
              Row(r.getString(0), r.getInt(1), r.getString(2),
                Integer.valueOf(status),
                new String(body, headers.get("content-type")
                  .flatMap(charsetOf)
                  .getOrElse(java.nio.charset.StandardCharsets.UTF_8)))
          }
        }
      }(enc)
  }

  /** the charset a Content-Type header value declares, when the JVM
    * supports it */
  private[graft] def charsetOf(contentType: String)
  : Option[java.nio.charset.Charset] = {
    val m = "(?i)charset=\"?([A-Za-z0-9_.:\\-]+)\"?".r
    m.findFirstMatchIn(contentType).flatMap { g =>
      try Some(java.nio.charset.Charset.forName(g.group(1)))
      catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  private[graft] final case class Record(
      headers: Map[String, String], payload: Array[Byte])

  /** parse a (possibly multi-member-gzipped) WARC byte stream */
  private[graft] def parse(bytes: Array[Byte]): Seq[Record] = {
    val raw =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) gunzipAll(bytes)
      else bytes
    val out = Seq.newBuilder[Record]
    var pos = 0
    var ok = true
    while (ok && pos < raw.length) {
      // tolerate inter-record CRLF runs (the record terminator)
      while (pos < raw.length &&
        (raw(pos) == '\r' || raw(pos) == '\n')) pos += 1
      if (pos >= raw.length) ok = false
      else {
        val headEnd = indexOfDoubleCrlf(raw, pos)
        if (headEnd < 0) ok = false
        else {
          val head = new String(raw, pos, headEnd - pos,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val lines = head.split("\r\n")
          if (!lines.headOption.exists(_.startsWith("WARC/"))) ok = false
          else {
            val headers = lines.tail.iterator.flatMap { l =>
              val i = l.indexOf(':')
              if (i <= 0) None
              else Some(l.substring(0, i).trim.toLowerCase ->
                l.substring(i + 1).trim)
            }.toMap
            headers.get("content-length").flatMap(_.toLongOption) match {
              case Some(len)
                if headEnd + 4 + len <= raw.length && len >= 0 =>
                val start = headEnd + 4
                out += Record(headers,
                  java.util.Arrays.copyOfRange(raw, start,
                    start + len.toInt))
                pos = start + len.toInt
              case _ => ok = false // malformed: stop this file here
            }
          }
        }
      }
    }
    out.result()
  }

  /** decompress ALL gzip members (GZIPInputStream consumes
    * concatenated members natively — the .warc.gz record-per-member
    * convention) */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch {
      // fail-soft to empty on a corrupt stream: GZIPInputStream
      // buffers internally, so a half-inflated prefix cannot be
      // trusted as record-aligned bytes
      case scala.util.control.NonFatal(_) => Array.emptyByteArray
    }

  private def indexOfDoubleCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' &&
        b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** split an HTTP/1.x message into (status, body); None if the
    * payload is not an HTTP response */
  private[graft] def splitHttp(payload: Array[Byte])
  : Option[(Int, Array[Byte])] =
    splitHttpFull(payload).map { case (s, _, b) => (s, b) }

  /** [[splitHttp]] plus the lowercased response headers */
  private[graft] def splitHttpFull(payload: Array[Byte])
  : Option[(Int, Map[String, String], Array[Byte])] = {
    val headEnd = indexOfDoubleCrlf(payload, 0)
    if (headEnd < 0) None
    else {
      val head = new String(payload, 0, headEnd,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val lines = head.split("\r\n")
      val m = "^HTTP/\\d\\.\\d (\\d{3}).*$".r
      lines.headOption.getOrElse("") match {
        case m(code) =>
          val headers = lines.tail.iterator.flatMap { l =>
            val i = l.indexOf(':')
            if (i <= 0) None
            else Some(l.substring(0, i).trim.toLowerCase ->
              l.substring(i + 1).trim)
          }.toMap
          Some((code.toInt, headers, java.util.Arrays.copyOfRange(
            payload, headEnd + 4, payload.length)))
        case _ => None
      }
    }
  }

  /** serialize records to WARC bytes — the fixture/spec writer (the
    * wavBytes discipline: real container bytes so gates drive the
    * REAL parse path). `headers` keys are written as given. */
  private[graft] def warcBytes(
      records: Seq[(Seq[(String, String)], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val crlf = "\r\n".getBytes
    records.foreach { case (hdrs, payload) =>
      out.write("WARC/1.0\r\n".getBytes)
      hdrs.foreach { case (k, v) => out.write(s"$k: $v\r\n".getBytes) }
      out.write(s"Content-Length: ${payload.length}\r\n".getBytes)
      out.write(crlf)
      out.write(payload)
      out.write(crlf); out.write(crlf)
    }
    out.toByteArray
  }

  /** an HTTP/1.1 200 response envelope around `body` */
  private[graft] def httpBytes(body: Array[Byte],
                               contentType: String = "text/html")
  : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(("HTTP/1.1 200 OK\r\nContent-Type: " + contentType +
      s"\r\nContent-Length: ${body.length}\r\n\r\n").getBytes)
    out.write(body)
    out.toByteArray
  }
}
