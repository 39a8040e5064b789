package graft

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC record parsing against hand-built records the fixture never
  * emits: non-HTTP payloads (warcinfo), bodies containing CRLF-CRLF
  * (Content-Length framing must win over delimiter scanning),
  * multi-digit status codes, and malformed-input refusals. */
class WarcSpec extends SparkSpec {

  import spark.implicits._

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def warcRecord(
      wtype: String, uri: String, payload: Array[Byte]): Array[Byte] =
    utf8(s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"Content-Length: ${payload.length}\r\n\r\n") ++ payload

  private def httpPayload(
      status: Int, ctype: String, body: Array[Byte]): Array[Byte] =
    utf8(s"HTTP/1.1 $status Something\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n") ++ body

  test("parseRecord: HTTP response fields; body with embedded CRLF-CRLF " +
      "survives (Content-Length framing, not delimiter scan)") {
    val body = utf8("line1\r\n\r\nline2 — framing test")
    val rec = warcRecord("response", "https://x.test/a",
      httpPayload(301, "text/html", body))
    val got = Warc.parseRecord(rec)
    assert(got.isDefined)
    val (wt, uri, status, ctype, b) = got.get
    assert(wt == "response" && uri == "https://x.test/a")
    assert(status == 301 && ctype == "text/html")
    assert(b.sameElements(body))
  }

  test("parseRecord: non-HTTP payload (warcinfo) parses with status 0 " +
      "and raw body") {
    val payload = utf8("software: graft\r\nformat: WARC file version 1.0")
    val rec = warcRecord("warcinfo", "", payload)
    val got = Warc.parseRecord(rec)
    assert(got.exists { case (wt, uri, st, ct, b) =>
      wt == "warcinfo" && uri == "" && st == 0 && ct == "" &&
        b.sameElements(payload)
    })
  }

  test("parseRecord refusals: bad magic, missing Content-Length, " +
      "Content-Length past EOF, truncated header block, junk status") {
    val good = warcRecord("response", "u",
      httpPayload(200, "text/plain", utf8("hi")))
    assert(Warc.parseRecord(good).isDefined)
    assert(Warc.parseRecord(utf8("HTTP/1.1 200 OK\r\n\r\n")).isEmpty)
    val noLen = utf8("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody")
    assert(Warc.parseRecord(noLen).isEmpty)
    val overLen = utf8(
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nxx")
    assert(Warc.parseRecord(overLen).isEmpty)
    assert(Warc.parseRecord(good.take(20)).isEmpty)
    val badStatus = warcRecord("response", "u",
      utf8("HTTP/1.1 abc X\r\n\r\n"))
    assert(Warc.parseRecord(badStatus).isEmpty)
  }

  test("records: gzip members round-trip through the fixture; corrupt " +
      "members yield NULL rows") {
    val src = Seq((2L, "alpha beta"), (5L, "körper γράμμα")) // multi-byte
      .toDF("doc_id", "text")
    val fix = Warc.warcGzFixture(src, "doc_id", "text",
      uriOf = id => s"u://$id", statusOf = _ => 200, ctypeOf = _ => "t/p")
    val corrupt = Seq((9L, "not gzip".getBytes)).toDF("doc_id", "content")
    val got = Warc.records(fix.union(corrupt), "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, text) <- Seq(2L -> "alpha beta", 5L -> "körper γράμμα")) {
      val r = got(id)
      assert(r.getString(1) == "response" && r.getString(2) == s"u://$id")
      assert(r.getInt(3) == 200 && r.getString(4) == "t/p")
      val bytes = text.getBytes("UTF-8")
      assert(r.getLong(5) == bytes.length)
      md.reset()
      assert(r.getString(6) == md.digest(bytes).map("%02x".format(_)).mkString)
    }
    assert(got(9L).isNullAt(1) && got(9L).isNullAt(6))
  }
}
