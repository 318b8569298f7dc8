package graft.sources

/** Pure-JVM WARC (ISO 28500) reader/writer — the container web-scale LLM
  * text pipelines actually ingest (CommonCrawl ships WARC). The chunk
  * discipline of [[graft.multimodal.AviCodec]]/[[graft.multimodal.Mp4Codec]]
  * applied to the text tier: records are `WARC/1.0` header blocks framed
  * by `Content-Length`, separated by a blank line and two CRLFs; a
  * `response` record's payload is a full HTTP response whose body starts
  * after the first empty HTTP header line.
  *
  * Facts the walker honors (and the spec exercises):
  *  - header names are case-insensitive; values may contain ':';
  *  - `Content-Length` frames the payload EXACTLY — bodies may contain
  *    blank lines, `WARC/1.0` literals, or binary bytes, so a scanner
  *    that looks for the next record marker instead of honoring the
  *    length is wrong on real files;
  *  - the record separator is CRLF CRLF after the payload;
  *  - files are commonly gzipped; multi-member gzip (one member per
  *    record, the CommonCrawl layout) must read as the concatenation —
  *    JDK GZIPInputStream handles member chaining natively;
  *  - unknown record types (warcinfo, request, metadata) are surfaced,
  *    not errors.
  */
object WarcCodec {

  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      /** The framed payload, verbatim (for `response`: the HTTP bytes). */
      payload: Array[Byte])

  final case class HttpResponse(
      status: Int,
      /** Body bytes after the first CRLFCRLF of the payload. */
      body: Array[Byte])

  private val Crlf = "\r\n"

  /** One response record's bytes (headers + HTTP payload + separator). */
  private def responseRecord(uri: String, httpBytes: Array[Byte],
      recordId: Long): Array[Byte] = {
    val head = new StringBuilder
    head.append("WARC/1.0").append(Crlf)
    head.append("WARC-Type: response").append(Crlf)
    head.append(s"WARC-Record-ID: <urn:graft:$recordId>").append(Crlf)
    head.append("WARC-Date: 2026-01-01T00:00:00Z").append(Crlf)
    head.append(s"WARC-Target-URI: $uri").append(Crlf)
    head.append("Content-Type: application/http; msgtype=response").append(Crlf)
    head.append(s"Content-Length: ${httpBytes.length}").append(Crlf)
    head.append(Crlf)
    val h = head.toString.getBytes("UTF-8")
    val out = new Array[Byte](h.length + httpBytes.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(httpBytes, 0, out, h.length, httpBytes.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Wrap an HTML body as a minimal HTTP/1.1 200 response. */
  def httpResponse(htmlBytes: Array[Byte], status: Int = 200): Array[Byte] = {
    val head = (s"HTTP/1.1 $status OK" + Crlf +
      "Content-Type: text/html; charset=utf-8" + Crlf +
      s"Content-Length: ${htmlBytes.length}" + Crlf + Crlf).getBytes("UTF-8")
    val out = new Array[Byte](head.length + htmlBytes.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(htmlBytes, 0, out, head.length, htmlBytes.length)
    out
  }

  /** Assemble a WARC file: one warcinfo record, then a response record
    * per (uri, htmlBytes). `gzipped` emits one gzip member PER RECORD
    * (the CommonCrawl layout) so member chaining is exercised by
    * construction.
    */
  def encode(pages: Seq[(String, Array[Byte])],
      gzipped: Boolean = false): Array[Byte] = {
    val info = ("WARC/1.0" + Crlf +
      "WARC-Type: warcinfo" + Crlf +
      "WARC-Date: 2026-01-01T00:00:00Z" + Crlf +
      "Content-Type: application/warc-fields" + Crlf +
      "Content-Length: 19" + Crlf + Crlf +
      "software: graft/1.0" + Crlf + Crlf).getBytes("UTF-8")
    val records = info +: pages.zipWithIndex.map { case ((uri, html), i) =>
      responseRecord(uri, httpResponse(html), i.toLong)
    }
    if (!gzipped) {
      val out = new java.io.ByteArrayOutputStream()
      records.foreach(out.write)
      out.toByteArray
    } else {
      val out = new java.io.ByteArrayOutputStream()
      records.foreach { r =>
        val gz = new java.util.zip.GZIPOutputStream(out)
        try { gz.write(r); gz.finish() } finally gz.close()
      }
      out.toByteArray
    }
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 65536)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Parse every record (gzip sniffed and member-chained transparently).
    * Fails loudly on framing violations — a silent resync would hide
    * exactly the corruption a 100 TB crawl ingest needs to surface.
    */
  def records(bytes0: Array[Byte]): Vector[WarcRecord] = {
    val bytes = if (isGzip(bytes0)) gunzipAll(bytes0) else bytes0
    val out = Vector.newBuilder[WarcRecord]
    var o = 0
    def line(): String = {
      val start = o
      while (o + 1 < bytes.length && !(bytes(o) == '\r' && bytes(o + 1) == '\n')) o += 1
      require(o + 1 < bytes.length, s"unterminated header line at offset $start")
      val s = new String(bytes, start, o - start, "UTF-8")
      o += 2
      s
    }
    while (o < bytes.length) {
      val version = line()
      require(version.startsWith("WARC/"),
        s"expected WARC version line at offset ${o - version.length - 2}, got '$version'")
      var warcType = ""; var uri = ""; var len = -1L
      var h = line()
      while (h.nonEmpty) {
        val ci = h.indexOf(':')
        require(ci > 0, s"malformed WARC header '$h'")
        val name = h.substring(0, ci).trim.toLowerCase
        val value = h.substring(ci + 1).trim
        name match {
          case "warc-type" => warcType = value
          case "warc-target-uri" => uri = value
          case "content-length" => len = value.toLong
          case _ => ()
        }
        h = line()
      }
      require(len >= 0, "record missing Content-Length")
      require(o + len + 4 <= bytes.length,
        s"record payload overruns the file (need ${len + 4} at $o of ${bytes.length})")
      val payload = new Array[Byte](len.toInt)
      System.arraycopy(bytes, o, payload, 0, len.toInt)
      o += len.toInt
      require(bytes(o) == '\r' && bytes(o + 1) == '\n' &&
        bytes(o + 2) == '\r' && bytes(o + 3) == '\n',
        s"missing record separator at offset $o")
      o += 4
      out += WarcRecord(warcType, uri, payload)
    }
    out.result()
  }

  /** Split a `response` payload into status + body (after CRLFCRLF). */
  def http(payload: Array[Byte]): HttpResponse = {
    val s = new String(payload, 0, math.min(payload.length, 16), "UTF-8")
    require(s.startsWith("HTTP/"), "payload is not an HTTP response")
    var o = 0
    var status = -1
    var bodyAt = -1
    // status code: second space-separated token of the first line
    val sp1 = {
      var i = 0
      while (i < payload.length && payload(i) != ' ') i += 1
      i
    }
    status = {
      var i = sp1 + 1; var v = 0
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0'); i += 1
      }
      v
    }
    o = 0
    while (bodyAt < 0 && o + 3 < payload.length) {
      if (payload(o) == '\r' && payload(o + 1) == '\n' &&
        payload(o + 2) == '\r' && payload(o + 3) == '\n') bodyAt = o + 4
      o += 1
    }
    require(bodyAt >= 0, "HTTP response has no header/body separator")
    val body = new Array[Byte](payload.length - bodyAt)
    System.arraycopy(payload, bodyAt, body, 0, body.length)
    HttpResponse(status, body)
  }
}
