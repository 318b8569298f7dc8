package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** WARC framing at the byte level: Content-Length framing against
  * adversarial bodies (embedded "WARC/1.0" lines, blank lines, CRLFs),
  * gzip member chaining (one member per record — the CommonCrawl
  * layout), header case-insensitivity, HTTP payload splitting, and the
  * loud failure paths. No Spark — the codec is plain JVM code; the
  * Spark plumbing is covered by q252/q255 and their oracles.
  */
class WarcCodecSpec extends AnyFunSuite {

  test("round-trip: warcinfo + responses, bodies verbatim") {
    val pages = Seq(
      ("https://a.example/x", "<html>one</html>".getBytes("UTF-8")),
      ("https://b.example/y", "<html>two</html>".getBytes("UTF-8")))
    val warc = WarcCodec.encode(pages)
    val rs = WarcCodec.records(warc)
    assert(rs.length === 3)
    assert(rs.head.warcType === "warcinfo")
    assert(rs(1).warcType === "response" && rs(1).targetUri === "https://a.example/x")
    val h = WarcCodec.http(rs(1).payload)
    assert(h.status === 200)
    assert(new String(h.body, "UTF-8") === "<html>one</html>")
    assert(new String(WarcCodec.http(rs(2).payload).body, "UTF-8") === "<html>two</html>")
  }

  test("Content-Length framing survives adversarial bodies") {
    // a body containing a fake record header, blank lines and CRLFCRLF —
    // a scanner that resyncs on markers instead of honoring the length
    // would split this record in half
    val evil = ("line1\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\ntail").getBytes("UTF-8")
    val warc = WarcCodec.encode(Seq(("https://e.example/", evil)))
    val rs = WarcCodec.records(warc)
    assert(rs.length === 2)
    assert(new String(WarcCodec.http(rs(1).payload).body, "UTF-8") ===
      new String(evil, "UTF-8"))
  }

  test("gzip member chaining: one member per record reads as the file") {
    val pages = (0 until 5).map(i =>
      (s"https://g.example/$i", s"<p>page $i</p>".getBytes("UTF-8")))
    val gz = WarcCodec.encode(pages, gzipped = true)
    assert((gz(0) & 0xff) === 0x1f && (gz(1) & 0xff) === 0x8b)
    val rs = WarcCodec.records(gz)
    assert(rs.length === 6)
    assert(rs.count(_.warcType === "response") === 5)
    (0 until 5).foreach { i =>
      assert(new String(WarcCodec.http(rs(i + 1).payload).body, "UTF-8") ===
        s"<p>page $i</p>")
    }
    // and the gzipped file parses identically to the plain one
    val plain = WarcCodec.records(WarcCodec.encode(pages))
    assert(rs.map(r => (r.warcType, r.targetUri, r.payload.toSeq)) ===
      plain.map(r => (r.warcType, r.targetUri, r.payload.toSeq)))
  }

  test("header names are case-insensitive") {
    val raw = ("WARC/1.0\r\n" +
      "warc-type: response\r\n" +
      "WARC-TARGET-URI: https://c.example/\r\n" +
      "content-length: 4\r\n" +
      "\r\nbody\r\n\r\n").getBytes("UTF-8")
    val rs = WarcCodec.records(raw)
    assert(rs.length === 1)
    assert(rs.head.warcType === "response")
    assert(rs.head.targetUri === "https://c.example/")
    assert(new String(rs.head.payload, "UTF-8") === "body")
  }

  test("failure paths are loud") {
    val ok = WarcCodec.encode(Seq(("https://x/", "hi".getBytes("UTF-8"))))
    // truncated payload
    intercept[IllegalArgumentException] {
      WarcCodec.records(java.util.Arrays.copyOf(ok, ok.length - 10))
    }
    // not a WARC
    intercept[IllegalArgumentException] {
      WarcCodec.records("HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8"))
    }
    // missing Content-Length
    intercept[IllegalArgumentException] {
      WarcCodec.records(
        "WARC/1.0\r\nWARC-Type: metadata\r\n\r\n\r\n\r\n".getBytes("UTF-8"))
    }
    // corrupted separator
    val bad = ok.clone()
    bad(bad.length - 1) = 'X'
    intercept[IllegalArgumentException] { WarcCodec.records(bad) }
    // non-HTTP payload through the HTTP splitter
    intercept[IllegalArgumentException] {
      WarcCodec.http("not http at all".getBytes("UTF-8"))
    }
  }
}
