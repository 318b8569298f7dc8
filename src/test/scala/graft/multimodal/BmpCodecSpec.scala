package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class BmpCodecSpec extends AnyFunSuite {

  test("header layout: magic, offsets, dims, bpp, padded size") {
    val bytes = BmpCodec.encode(5, 3)((_, _) => 0)
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    // rowSize(5) = ((15+3)/4)*4 = 16; size = 54 + 16*3
    assert(bytes.length == 54 + 16 * 3)
    assert(bytes.length == BmpCodec.fileSize(5, 3))
    val d = BmpCodec.decode(bytes)
    assert(d.width == 5 && d.height == 3 && d.channels == 3)
    assert(d.lumaSumMilli == 0)
  }

  test("pixel round-trip: gradient sums, orientation pins, every padding width") {
    // widths 4..7 exercise padding 0..3 bytes
    for (w <- 4 to 7; h <- Seq(2, 5)) {
      val bytes = BmpCodec.encode(w, h)((x, y) => ((10 + x + y) << 16) | (20 << 8) | 30)
      val d = BmpCodec.decode(bytes)
      val n = w.toLong * h
      val sumR = n * 10 + h.toLong * (w * (w - 1)) / 2 + w.toLong * (h * (h - 1)) / 2
      assert(d.lumaSumMilli == 299 * sumR + n * (587 * 20 + 114 * 30),
        s"gradient sum mismatch at ${w}x$h")
      assert(d.topLeftLumaMilli == 299 * 10 + 587 * 20 + 114 * 30)
      assert(d.bottomRightLumaMilli == 299 * (10 + w - 1 + h - 1) + 587 * 20 + 114 * 30)
    }
  }

  test("orientation: top-left pixel is IMAGE top-left, not storage row 0") {
    // white top-left, black everywhere else: bottom-up storage puts the
    // white pixel in the LAST stored row — a decoder ignoring bottom-up
    // order reads black at (0,0)
    val bytes = BmpCodec.encode(3, 2)((x, y) => if (x == 0 && y == 0) 0xffffff else 0)
    val d = BmpCodec.decode(bytes)
    assert(d.topLeftLumaMilli == 299L * 255 + 587L * 255 + 114L * 255)
    assert(d.bottomRightLumaMilli == 0)
    // the white pixel sits at the START of the LAST stored row
    val stride = ((3 * 3 + 3) / 4) * 4
    assert((bytes(54 + stride) & 0xff) == 255)
  }

  test("BGR byte order: pure-red pixel stores R in the third byte") {
    val bytes = BmpCodec.encode(1, 1)((_, _) => 0xff0000)
    assert((bytes(54) & 0xff) == 0) // B
    assert((bytes(55) & 0xff) == 0) // G
    assert((bytes(56) & 0xff) == 255) // R
    assert(BmpCodec.decode(bytes).lumaSumMilli == 299L * 255)
  }

  test("top-down (negative height) variant decodes with the same image semantics") {
    val up = BmpCodec.encode(3, 2)((x, y) => ((10 + x + 5 * y) << 16))
    // rewrite height to -2 and reorder rows to top-down
    val stride = ((3 * 3 + 3) / 4) * 4
    val down = up.clone()
    val neg = -2
    down(22) = (neg & 0xff).toByte
    down(23) = ((neg >> 8) & 0xff).toByte
    down(24) = ((neg >> 16) & 0xff).toByte
    down(25) = ((neg >> 24) & 0xff).toByte
    Array.copy(up, 54 + stride, down, 54, stride) // image row 0 first
    Array.copy(up, 54, down, 54 + stride, stride)
    val a = BmpCodec.decode(up)
    val b = BmpCodec.decode(down)
    assert(a.lumaSumMilli == b.lumaSumMilli)
    assert(a.topLeftLumaMilli == b.topLeftLumaMilli)
    assert(a.bottomRightLumaMilli == b.bottomRightLumaMilli)
  }

  test("unsupported profiles fail loudly") {
    val good = BmpCodec.encode(2, 2)((_, _) => 0)
    assert(intercept[IllegalArgumentException](
      BmpCodec.decode(good.take(20))).getMessage.contains("truncated"))
    val notBmp = good.clone(); notBmp(0) = 'X'
    assert(intercept[IllegalArgumentException](
      BmpCodec.decode(notBmp)).getMessage.contains("magic"))
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(intercept[IllegalArgumentException](
      BmpCodec.decode(bpp8)).getMessage.contains("bpp"))
    val rle = good.clone(); rle(30) = 1
    assert(intercept[IllegalArgumentException](
      BmpCodec.decode(rle)).getMessage.contains("compression"))
    val short = java.util.Arrays.copyOf(good, good.length - 1)
    assert(intercept[IllegalArgumentException](
      BmpCodec.decode(short)).getMessage.contains("pixel array"))
    // crafted headers must hit the documented require, not AIOOBE
    val negOff = good.clone(); negOff(13) = 0x80.toByte // pixelOffset < 0
    assert(intercept[IllegalArgumentException](
      BmpCodec.decode(negOff)).getMessage.contains("pixel offset"))
    val hugeDims = good.clone() // 65535 x 65535: stride*height overflows Int
    hugeDims(18) = 0xff.toByte; hugeDims(19) = 0xff.toByte
    hugeDims(22) = 0xff.toByte; hugeDims(23) = 0xff.toByte
    assert(intercept[IllegalArgumentException](
      BmpCodec.decode(hugeDims)).getMessage.contains("pixel array"))
  }
}
