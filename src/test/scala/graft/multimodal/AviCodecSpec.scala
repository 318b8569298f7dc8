package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** AVI container semantics at the byte level: chunk-stream walking
  * (padding, LIST nesting, JUNK tolerance), both stream flavors (DIB
  * closed-form, MJPG through the real JPEG decoder), the bottom-up DIB
  * row order, and the loud failure paths. No Spark — the codec is plain
  * JVM code; the Spark plumbing is covered by q194 and its oracle.
  */
class AviCodecSpec extends AnyFunSuite {

  private def gradFrame(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] =
    AviCodec.encodeDibFrame(w, h)((x, y) => ((r + x + y) << 16) | (g << 8) | b)

  test("DIB round-trip: header facts, frame payloads, box sums") {
    val (w, h) = (10, 8)
    val frames = (0 until 3).map(f => gradFrame(w, h, 20 + f, 30, 40))
    val avi = AviCodec.encode(w, h, frames, microSecPerFrame = 33333)
    val info = AviCodec.info(avi)
    assert(info === AviCodec.AviInfo(w, h, 3, 33333, "DIB "))
    val back = AviCodec.frames(avi)
    assert(back.length === 3)
    (back zip frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // box sums against the closed form: box (gy, gx) of the gradient
    // frame sums np*(299r + 587g + 114b) + 299 * sum of (x + y)
    val sums = AviCodec.dibBoxSums(back(1), w, h, 4)
    def bnd(k: Int, dim: Int) = (k * dim + 3) / 4
    for (gy <- 0 until 4; gx <- 0 until 4) {
      val (x0, x1) = (bnd(gx, w), bnd(gx + 1, w))
      val (y0, y1) = (bnd(gy, h), bnd(gy + 1, h))
      val np = (x1 - x0).toLong * (y1 - y0)
      val grad = (y1 - y0).toLong * ((x0 + x1 - 1).toLong * (x1 - x0) / 2) +
        (x1 - x0).toLong * ((y0 + y1 - 1).toLong * (y1 - y0) / 2)
      val want = np * (299L * 21 + 587L * 30 + 114L * 40) + 299L * grad
      assert(sums(gy * 4 + gx) === want, s"box ($gy,$gx)")
    }
  }

  test("DIB rows are stored bottom-up: the corner pixel lands in the right box") {
    // one white pixel at image TOP-LEFT, rest black: a decoder ignoring
    // bottom-up storage would put it in the bottom row's box
    val f = AviCodec.encodeDibFrame(8, 8)((x, y) =>
      if (x == 0 && y == 0) 0xffffff else 0)
    val sums = AviCodec.dibBoxSums(f, 8, 8, 2)
    assert(sums(0) === 299L * 255 + 587L * 255 + 114L * 255)
    assert(sums(1) === 0L && sums(2) === 0L && sums(3) === 0L)
  }

  test("MJPG flavor: JPEG payloads round-trip byte-exactly and decode") {
    val jpegs = (0 until 2).map(f =>
      ImageIoCodec.encode(16, 12, "jpg")((x, y) => ((40 + 10 * f) << 16) | (x << 8) | y))
    val avi = AviCodec.encode(16, 12, jpegs, handler = "MJPG")
    val info = AviCodec.info(avi)
    assert(info.handler === "MJPG" && info.nFrames === 2)
    val back = AviCodec.frames(avi)
    (back zip jpegs).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // every extracted frame is a standalone JPEG the real decoder reads
    back.foreach { fr =>
      val d = ImageIoCodec.decode(fr)
      assert(d.width === 16 && d.height === 12)
    }
  }

  test("chunk walk honors JUNK chunks, odd-size padding, and rec nesting") {
    // hand-built container: JUNK between hdrl and movi, frames grouped
    // under a 'rec ' LIST, one frame with an ODD byte length (its pad
    // byte must be skipped, not parsed as the next chunk's fourcc)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + body.length + (body.length & 1))
      tag.zipWithIndex.foreach { case (c, i) => out(i) = c.toByte }
      out(4) = (body.length & 0xff).toByte
      out(5) = ((body.length >> 8) & 0xff).toByte
      out(6) = ((body.length >> 16) & 0xff).toByte
      out(7) = ((body.length >> 24) & 0xff).toByte
      System.arraycopy(body, 0, out, 8, body.length)
      out
    }
    def list(kind: String, parts: Array[Byte]*): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ parts.flatten)
    // reuse the real encoder's hdrl by slicing it out of a canonical file
    val canonical = AviCodec.encode(4, 4, Seq(gradFrame(4, 4, 1, 2, 3)))
    val hdrlSize = 8 + ((canonical(16) & 0xff) | ((canonical(17) & 0xff) << 8) |
      ((canonical(18) & 0xff) << 16) | ((canonical(19) & 0xff) << 24))
    val hdrl = canonical.slice(12, 12 + hdrlSize)
    val odd = Array.tabulate[Byte](7)(i => (i + 1).toByte) // odd-size frame
    val even = Array.tabulate[Byte](6)(i => (i + 10).toByte)
    val movi = list("movi",
      list("rec ", chunk("00dc", odd)),
      chunk("JUNK", Array.fill[Byte](5)(0)),
      chunk("00dc", even))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++
      chunk("JUNK", Array.fill[Byte](3)(0)) ++ movi
    val riff = chunk("RIFF", body)
    val got = AviCodec.frames(riff)
    assert(got.length === 2)
    assert(got(0).toSeq === odd.toSeq)
    assert(got(1).toSeq === even.toSeq)
    assert(AviCodec.info(riff).width === 4)
  }

  test("loud failures: bad magic, truncation, overrunning chunk sizes") {
    intercept[IllegalArgumentException] {
      AviCodec.info("not an avi at all".getBytes("US-ASCII"))
    }
    val ok = AviCodec.encode(6, 6, Seq(gradFrame(6, 6, 5, 6, 7)))
    intercept[IllegalArgumentException] { AviCodec.info(ok.take(10)) }
    // corrupt a chunk size to overrun the buffer
    val bad = ok.clone()
    bad(16) = 0xff.toByte; bad(17) = 0xff.toByte
    bad(18) = 0xff.toByte; bad(19) = 0x7f.toByte
    intercept[IllegalArgumentException] { AviCodec.info(bad) }
    intercept[IllegalArgumentException] {
      AviCodec.encode(4, 4, Seq(gradFrame(4, 4, 1, 1, 1)), handler = "H264")
    }
    intercept[IllegalArgumentException] {
      AviCodec.dibBoxSums(new Array[Byte](10), 8, 8, 4)
    }
  }
}
