package graft

import graft.sources.Warc

/** WARC reader (r16) — round-trip, gzip multi-member, fail-soft
  * malformation, the binaryFile Spark path, and HTTP unwrapping. */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def rec(tpe: String, uri: String, payload: Array[Byte]) =
    (Seq("WARC-Type" -> tpe, "WARC-Record-ID" -> s"<urn:uuid:$tpe>",
      "WARC-Date" -> "2026-08-16T00:00:00Z", "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"),
      payload)

  private val html =
    "<html><body><p>hello warc world</p></body></html>"
  private val threeRecords = Seq(
    rec("warcinfo", "http://x/info", "software: graft\r\n".getBytes),
    rec("request", "http://x/a", "GET /a HTTP/1.1\r\n\r\n".getBytes),
    rec("response", "http://x/a", Warc.httpBytes(html.getBytes)))

  test("parse: round-trips warcBytes — headers lowercased, payloads " +
    "byte-exact, record order preserved") {
    val got = Warc.parse(Warc.warcBytes(threeRecords))
    assert(got.map(_.headers("warc-type")) ==
      Seq("warcinfo", "request", "response"))
    assert(got(2).headers("warc-target-uri") == "http://x/a")
    assert(got(2).payload.sameElements(Warc.httpBytes(html.getBytes)))
    assert(got(0).headers("content-length").toInt ==
      "software: graft\r\n".getBytes.length)
  }

  test("parse: multi-member gzip (.warc.gz convention) inflates " +
    "through the same path") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(b); g.close(); out.toByteArray
    }
    val members = threeRecords.map(r => gz(Warc.warcBytes(Seq(r))))
    val concat = members.reduce(_ ++ _)
    val got = Warc.parse(concat)
    assert(got.map(_.headers("warc-type")) ==
      Seq("warcinfo", "request", "response"))
    assert(got(2).payload.sameElements(Warc.httpBytes(html.getBytes)))
  }

  test("parse: fail-soft — a truncated tail keeps the records before " +
    "it; garbage parses to empty") {
    val full = Warc.warcBytes(threeRecords)
    val torn = full.take(full.length - 30) // cuts into record 3
    val got = Warc.parse(torn)
    assert(got.map(_.headers("warc-type")) == Seq("warcinfo", "request"))
    assert(Warc.parse("not a warc at all".getBytes).isEmpty)
    assert(Warc.parse(Array.emptyByteArray).isEmpty)
  }

  test("read + httpResponses: binaryFile path over multiple files, " +
    "HTTP envelope stripped, non-response and non-HTTP rows dropped") {
    val dir = java.nio.file.Files.createTempDirectory("warc_spec")
    java.nio.file.Files.write(dir.resolve("a.warc"),
      Warc.warcBytes(threeRecords))
    java.nio.file.Files.write(dir.resolve("b.warc"),
      Warc.warcBytes(Seq(
        rec("response", "http://x/b", Warc.httpBytes("second".getBytes)),
        rec("response", "http://x/broken", "no http envelope".getBytes))))
    val records = Warc.read(spark, dir.toString + "/*.warc")
    assert(records.count() == 5)
    assert(records.filter($"warc_type" === "response").count() == 3)
    val bodies = Warc.httpResponses(records)
      .select($"target_uri", $"http_status", $"body")
      .as[(String, Int, String)].collect().toSet
    // the envelope-less response drops; both real ones unwrap
    assert(bodies == Set(("http://x/a", 200, html),
      ("http://x/b", 200, "second")))
    dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
  }

  test("httpResponses decodes with the Content-Type charset; " +
    "missing/unknown charsets fall back to UTF-8") {
    val latin = "café crème"
    val latinBytes = latin.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)
    def resp(ct: String) = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(("HTTP/1.1 200 OK\r\nContent-Type: " + ct +
        "\r\n\r\n").getBytes)
      out.write(latinBytes)
      out.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("warc_cs")
    java.nio.file.Files.write(dir.resolve("c.warc"), Warc.warcBytes(Seq(
      rec("response", "http://x/1",
        resp("text/html; charset=ISO-8859-1")),
      rec("response", "http://x/2", resp("text/html")),
      rec("response", "http://x/3",
        resp("text/html; charset=no-such-charset-xyz")))))
    val got = Warc.httpResponses(Warc.read(spark, dir.toString))
      .select($"target_uri", $"body").as[(String, String)]
      .collect().toMap
    assert(got("http://x/1") == latin) // declared charset honored
    // é as Latin-1 0xE9 is invalid UTF-8 -> replacement char
    assert(got("http://x/2").contains('�'))
    assert(got("http://x/3").contains('�')) // unknown -> UTF-8
    assert(Warc.charsetOf("text/html; charset=\"utf-8\"")
      .contains(java.nio.charset.StandardCharsets.UTF_8))
    assert(Warc.charsetOf("text/plain").isEmpty)
    dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
  }
}
