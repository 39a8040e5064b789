package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** WARC (Web ARChive, ISO 28500) record ingestion — the Common Crawl
  * interchange shape a web-scale training corpus actually arrives in:
  * one gzip member per record, each record a WARC header block plus an
  * HTTP response (status line, headers, body). This module parses REAL
  * bytes — version line, CRLF-terminated named headers, Content-Length
  * framing, the nested HTTP block — with the same decoder contract as
  * the image/audio kernels: malformed input surfaces as NULL columns,
  * never a task failure.
  *
  * Scale: row-local kernel over a binary column (one gunzip + one
  * header walk per record, no shuffle); the binary column dies at the
  * operator, so only the small extracted columns move on. Pair with
  * [[Formats.gunzipText]]'s bomb cap discipline (`maxBytes`).
  */
object Warc {

  /** One parsed record; NULLs when the bytes are not a valid
    * WARC-over-HTTP record. `body` (UTF-8 text of the payload) is
    * dropped unless the caller asks to keep it — the fingerprint
    * columns travel, the payload doesn't have to. */
  final case class WarcRow(
      id: Long, warc_type: Option[String], target_uri: Option[String],
      http_status: Option[Int], content_type: Option[String],
      body_len: Option[Long], body_md5: Option[String],
      body: Option[String])

  private def gunzip(gz: Array[Byte], maxBytes: Long): Option[Array[Byte]] =
    if (gz == null) None // NULL cell — quarantine, not an NPE
    else try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz))
      try {
        val bb = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = 0
        var total = 0L
        while (n >= 0 && total <= maxBytes) {
          n = in.read(buf)
          if (n > 0) { bb.write(buf, 0, n); total += n }
        }
        if (total > maxBytes) None else Some(bb.toByteArray)
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** Find the end of a CRLF-CRLF-terminated header block starting at
    * `from`; returns the index AFTER the blank line, or -1. */
  private def headerEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i + 4
      i += 1
    }
    -1
  }

  /** Parse a CRLF header block (skipping the first line) into
    * lowercase-name -> value. Malformed lines (no colon) are skipped —
    * the lenient posture real crawl data requires. */
  private def headers(block: String): Map[String, String] =
    block.split("\r\n").drop(1).flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase ->
        line.substring(c + 1).trim)
    }.toMap

  /** Parse one uncompressed WARC record: WARC header block
    * (Content-Length frames the payload), then — for response records
    * whose payload leads with an HTTP status line — the HTTP header
    * block and body. Returns
    * (warcType, targetUri, httpStatus, contentType, body); None for
    * anything that is not a well-formed WARC record. */
  private[graft] def parseRecord(
      b: Array[Byte]): Option[(String, String, Int, String, Array[Byte])] = {
    if (b == null || b.length < 12) return None
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    if (!new String(b, 0, 5, ascii).equals("WARC/")) return None
    val we = headerEnd(b, 0)
    if (we < 0) return None
    val wh = headers(new String(b, 0, we - 4, ascii))
    val wtype = wh.getOrElse("warc-type", return None)
    val uri = wh.getOrElse("warc-target-uri", "")
    val clen = wh.get("content-length").flatMap(s =>
      scala.util.Try(s.toLong).toOption).getOrElse(return None)
    if (clen < 0 || we.toLong + clen > b.length) return None
    val payloadEnd = we + clen.toInt
    // nested HTTP response block
    if (payloadEnd - we >= 12 &&
      new String(b, we, 5, ascii).equals("HTTP/")) {
      val he = headerEnd(b, we)
      if (he < 0 || he > payloadEnd) return None
      val statusLine = new String(b, we,
        math.min(payloadEnd - we, 64), ascii).split("\r\n").head
      val parts = statusLine.split(" ")
      val status = if (parts.length >= 2)
        scala.util.Try(parts(1).toInt).toOption.getOrElse(return None)
      else return None
      val hh = headers(new String(b, we, he - we - 4, ascii))
      val ctype = hh.getOrElse("content-type", "")
      val body = java.util.Arrays.copyOfRange(b, he, payloadEnd)
      Some((wtype, uri, status, ctype, body))
    } else {
      // non-HTTP payload (warcinfo, metadata, request …)
      Some((wtype, uri, 0, "",
        java.util.Arrays.copyOfRange(b, we, payloadEnd)))
    }
  }

  /** Parse a column of per-record gzip WARC members (the Common Crawl
    * layout) to typed columns: (id, warc_type, target_uri, http_status,
    * content_type, body_len, body_md5). `gzipped = false` skips the
    * inflate for already-uncompressed records. */
  def records(
      df: DataFrame, idCol: String, binCol: String, gzipped: Boolean = true,
      keepBody: Boolean = false, maxBytes: Long = 1L << 26,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
        g.map { case (id, raw) =>
          val rec =
            (if (gzipped) gunzip(raw, maxBytes) else Some(raw))
              .flatMap(parseRecord)
          rec match {
            case None =>
              WarcRow(id, None, None, None, None, None, None, None)
            case Some((wt, uri, status, ctype, body)) =>
              md.reset()
              WarcRow(id, Some(wt), Some(uri),
                if (status > 0) Some(status) else None,
                if (ctype.nonEmpty) Some(ctype) else None,
                Some(body.length.toLong),
                Some(md.digest(body).map("%02x".format(_)).mkString),
                // only materialize the payload string when it travels
                if (keepBody) Some(new String(body,
                  java.nio.charset.StandardCharsets.UTF_8)) else None)
          }
        }
      })
      .toDF()
    if (keepBody) out else out.drop("body")
  }

  /** Gate fixture: wrap each row's text in a complete WARC response
    * record (WARC/1.0 headers, HTTP/1.1 status line + headers, the
    * text as body), one gzip member per record — byte-real input for
    * [[records]]. */
  def warcGzFixture(
      df: DataFrame, idCol: String, textCol: String,
      uriOf: Long => String, statusOf: Long => Int,
      ctypeOf: Long => String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val body = text.getBytes(utf8)
        val http =
          (s"HTTP/1.1 ${statusOf(id)} X\r\n" +
            s"Content-Type: ${ctypeOf(id)}\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes(utf8) ++ body
        val warc =
          (s"WARC/1.0\r\n" +
            s"WARC-Type: response\r\n" +
            s"WARC-Target-URI: ${uriOf(id)}\r\n" +
            s"WARC-Record-ID: <urn:graft:$id>\r\n" +
            s"Content-Length: ${http.length}\r\n\r\n").getBytes(utf8) ++
            http ++ "\r\n\r\n".getBytes(utf8)
        val bb = new java.io.ByteArrayOutputStream()
        val out = new java.util.zip.GZIPOutputStream(bb)
        out.write(warc)
        out.close()
        (id, bb.toByteArray)
      })
      .toDF(idCol, "content")
  }
}
