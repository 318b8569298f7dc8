package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class WebpCodecSpec extends AnyFunSuite {

  test("container layout: RIFF/WEBP/VP8L fourccs, LE sizes, signature byte") {
    val bytes = WebpCodec.encode(3, 2)((_, _) => 0x102030)
    assert(new String(bytes.slice(0, 4)) == "RIFF")
    assert(new String(bytes.slice(8, 12)) == "WEBP")
    assert(new String(bytes.slice(12, 16)) == "VP8L")
    val riffSize = (bytes(4) & 0xff) | ((bytes(5) & 0xff) << 8) |
      ((bytes(6) & 0xff) << 16) | ((bytes(7) & 0xff) << 24)
    assert(riffSize == bytes.length - 8, "RIFF size covers everything after it")
    val vp8lSize = (bytes(16) & 0xff) | ((bytes(17) & 0xff) << 8) |
      ((bytes(18) & 0xff) << 16) | ((bytes(19) & 0xff) << 24)
    assert(bytes.length == 20 + vp8lSize + (vp8lSize & 1),
      "file is header + payload + RIFF even-size pad")
    assert((bytes(20) & 0xff) == 0x2f, "VP8L signature byte")
    // 14-bit w-1 / h-1 header: for 3x2 the first header bits decode back
    val d = WebpCodec.decode(bytes)
    assert(d.width == 3 && d.height == 2 && d.channels == 3)
  }

  test("pixel round-trip: gradient sums + orientation pins at many dims") {
    for (w <- Seq(1, 4, 7, 16, 23); h <- Seq(1, 2, 5, 16)) {
      val bytes = WebpCodec.encode(w, h)((x, y) => ((10 + x + y) << 16) | (20 << 8) | 30)
      val d = WebpCodec.decode(bytes)
      val n = w.toLong * h
      val sumR = n * 10 + h.toLong * (w * (w - 1)) / 2 + w.toLong * (h * (h - 1)) / 2
      assert(d.width == w && d.height == h)
      assert(d.lumaSumMilli == 299 * sumR + n * (587 * 20 + 114 * 30),
        s"gradient sum mismatch at ${w}x$h")
      assert(d.topLeftLumaMilli == 299 * 10 + 587 * 20 + 114 * 30)
      assert(d.bottomRightLumaMilli == 299 * (10 + w - 1 + h - 1) + 587 * 20 + 114 * 30)
    }
  }

  test("round-trip covers the full byte alphabet (all 256 literal codes)") {
    // a 16x16 image whose channels sweep 0..255 exercises every symbol of
    // every fixed-8 code — a canonical-construction off-by-one anywhere
    // desyncs the stream and changes the sums
    val bytes = WebpCodec.encode(16, 16) { (x, y) =>
      val v = y * 16 + x
      (v << 16) | ((255 - v) << 8) | ((v * 7) % 256)
    }
    val d = WebpCodec.decode(bytes)
    var expected = 0L
    for (v <- 0 until 256) expected += 299L * v + 587L * (255 - v) + 114L * ((v * 7) % 256)
    assert(d.lumaSumMilli == expected)
    assert(d.topLeftLumaMilli == 587L * 255)
    assert(d.bottomRightLumaMilli == 299L * 255 + 114L * ((255 * 7) % 256))
  }

  test("LZ77 backrefs: constant and run-heavy images round-trip (dist-1 refs)") {
    // constant color: one literal + one maximal backref per image
    for ((w, h) <- Seq((4, 4), (16, 16), (23, 19))) {
      val d = WebpCodec.decode(WebpCodec.encode(w, h)((_, _) => 0x405060))
      assert(d.width == w && d.height == h)
      assert(d.lumaSumMilli == w.toLong * h * (299 * 0x40 + 587 * 0x50 + 114 * 0x60))
      assert(d.topLeftLumaMilli == d.bottomRightLumaMilli)
    }
    // horizontal stripes: each row is one literal + one run (run length
    // w-1 >= 4), rows differ so refs never cross rows
    val w = 9; val h = 7
    val d = WebpCodec.decode(WebpCodec.encode(w, h)((_, y) => (y * 30) << 16))
    var expected = 0L
    for (y <- 0 until h) expected += w.toLong * 299 * (y * 30)
    assert(d.lumaSumMilli == expected)
    assert(d.topLeftLumaMilli == 0)
    assert(d.bottomRightLumaMilli == 299L * (6 * 30))
    // compression sanity: the constant image must be far smaller than its
    // literal pixel cost (the backref actually fired)
    val const = WebpCodec.encode(64, 64)((_, _) => 0x123456)
    assert(const.length < 200, s"constant 64x64 should compress, got ${const.length}B")
    // runs longer than one backref's 4096-max still round-trip
    val big = WebpCodec.decode(WebpCodec.encode(128, 40)((_, _) => 0x010203))
    assert(big.lumaSumMilli == 128L * 40 * (299 * 1 + 587 * 2 + 114 * 3))
  }

  test("9-bit literal greens (symbols 232-255) round-trip") {
    // greens above 231 take the 9-bit half of the complete 280-code —
    // a canonical split off-by-one would desync every following symbol
    val d = WebpCodec.decode(WebpCodec.encode(8, 3)((x, y) =>
      ((x * 3) << 16) | ((232 + (x + y * 8) % 24) << 8) | 0x11))
    var expected = 0L
    for (y <- 0 until 3; x <- 0 until 8)
      expected += 299L * (x * 3) + 587L * (232 + (x + y * 8) % 24) + 114L * 0x11
    assert(d.lumaSumMilli == expected)
  }

  test("subset boundaries fail loudly with the feature name") {
    val good = WebpCodec.encode(2, 2)((_, _) => 0)
    // corrupt container magic
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](WebpCodec.decode(notRiff))
      .getMessage.contains("RIFF"))
    // lossy VP8 chunk
    val lossy = good.clone()
    lossy(15) = ' '.toByte // "VP8L" -> "VP8 "
    assert(intercept[IllegalArgumentException](WebpCodec.decode(lossy))
      .getMessage.contains("VP8L profile"))
    // extended VP8X
    val vp8x = good.clone(); vp8x(15) = 'X'.toByte
    assert(intercept[IllegalArgumentException](WebpCodec.decode(vp8x))
      .getMessage.contains("VP8X"))
    // transform bit set: the post-signature stream is 14+14+1+3 = 32
    // header bits (bytes 21-24 LSB-first), so the transform flag is
    // stream bit 32 = byte 25, bit 0
    val withTransform = good.clone()
    withTransform(25) = (withTransform(25) | 0x01).toByte
    assert(intercept[IllegalArgumentException](WebpCodec.decode(withTransform))
      .getMessage.contains("transform"))
    // bad signature byte
    val badSig = good.clone(); badSig(20) = 0x2e
    assert(intercept[IllegalArgumentException](WebpCodec.decode(badSig))
      .getMessage.contains("signature"))
    // truncation mid-pixels
    assert(intercept[IllegalArgumentException](
      WebpCodec.decode(good.take(good.length - 2)))
      .getMessage.contains("truncated"))
  }

  test("unknown RIFF chunks before VP8L are skipped (with odd-size padding)") {
    val good = WebpCodec.encode(2, 2)((_, _) => 0x405060)
    val payload = good.drop(12) // VP8L chunk onward
    // splice in an unknown 3-byte chunk (odd size -> 1 pad byte)
    val extra = Array[Byte]('J', 'U', 'N', 'K', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = new Array[Byte](12 + extra.length + payload.length)
    System.arraycopy(good, 0, spliced, 0, 12)
    System.arraycopy(extra, 0, spliced, 12, extra.length)
    System.arraycopy(payload, 0, spliced, 12 + extra.length, payload.length)
    // fix RIFF size
    val newSize = spliced.length - 8
    (0 until 4).foreach(i => spliced(4 + i) = ((newSize >> (8 * i)) & 0xff).toByte)
    val d = WebpCodec.decode(spliced)
    assert(d.width == 2 && d.height == 2)
    assert(d.lumaSumMilli == 4L * (299 * 0x40 + 587 * 0x50 + 114 * 0x60))
  }
}
