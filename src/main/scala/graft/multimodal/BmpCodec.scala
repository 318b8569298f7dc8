package graft.multimodal

/** Pure-JVM BMP (Windows bitmap) codec for the multimodal decode path —
  * the one uncompressed raster format this sandbox can decode end-to-end
  * without native codecs. Scope: BITMAPINFOHEADER, 24-bit BI_RGB, the
  * format every tool writes when asked for "uncompressed BMP".
  *
  * Layout facts the decoder must honor (and the spec exercises):
  *  - 14-byte file header (`BM` magic, file size, pixel-array offset) +
  *    40-byte info header;
  *  - each pixel row is padded to a 4-byte boundary
  *    (`rowSize = ((3·w + 3) / 4) · 4`);
  *  - rows are stored BOTTOM-UP when `height > 0` (top-down only for the
  *    rare negative-height variant, also handled);
  *  - channel byte order is BGR, not RGB.
  *
  * Replaces [[Multimodal.decodeStub]] for `format == "bmp"` assets: the
  * reference treats uploaded media as opaque blobs + metadata
  * (upload_app file handling); this gives the engine a real decode stage
  * for at least one format while the codec-backed ones stay stubbed.
  */
object BmpCodec {

  final case class Decoded(
      width: Int,
      height: Int,
      channels: Int,
      /** Σ over pixels of (299·R + 587·G + 114·B) — integer milli-luma,
        * exact in any summation order and in 64 bits for any image this
        * side of 8 exapixels.
        */
      lumaSumMilli: Long,
      /** milli-luma of pixel (0,0) — top-left in IMAGE orientation;
        * catches decoders that ignore bottom-up row storage.
        */
      topLeftLumaMilli: Long,
      /** milli-luma of pixel (w-1, h-1) — bottom-right in image
        * orientation.
        */
      bottomRightLumaMilli: Long)

  private def rowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Total file size for a w×h 24-bit BMP (header + padded pixel array). */
  def fileSize(width: Int, height: Int): Int = 54 + rowSize(width) * height

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def getShortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode an image as 24-bit BI_RGB BMP. `rgb(x, y)` returns packed
    * 0xRRGGBB for the pixel at image coordinates (x left→right, y
    * top→bottom); the encoder handles the bottom-up row order, BGR byte
    * order, and row padding.
    */
  def encode(width: Int, height: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = rowSize(width)
    val size = 54 + stride * height
    val out = new Array[Byte](size) // zero-filled => padding bytes are 0
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, size)
    putIntLE(out, 10, 54) // pixel-array offset
    putIntLE(out, 14, 40) // BITMAPINFOHEADER size
    putIntLE(out, 18, width)
    putIntLE(out, 22, height) // positive => bottom-up
    out(26) = 1 // planes
    out(28) = 24 // bpp
    putIntLE(out, 30, 0) // BI_RGB
    putIntLE(out, 34, stride * height)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < width) {
        val p = rgb(x, y)
        val off = rowOff + 3 * x
        out(off) = (p & 0xff).toByte // B
        out(off + 1) = ((p >> 8) & 0xff).toByte // G
        out(off + 2) = ((p >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit BI_RGB BMP to its feature summary. Throws
    * IllegalArgumentException on anything outside the supported profile —
    * a decode stage must fail loudly on payloads it would silently
    * mis-sum.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 54, s"truncated header: ${bytes.length} bytes")
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP (missing BM magic)")
    val pixelOffset = getIntLE(bytes, 10)
    val headerSize = getIntLE(bytes, 14)
    require(headerSize >= 40, s"unsupported DIB header size $headerSize")
    val width = getIntLE(bytes, 18)
    val rawHeight = getIntLE(bytes, 22)
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    val bpp = getShortLE(bytes, 28)
    val compression = getIntLE(bytes, 30)
    require(width > 0 && height > 0, s"bad dims ${width}x$rawHeight")
    require(bpp == 24, s"unsupported bpp $bpp (24-bit BI_RGB only)")
    require(compression == 0, s"unsupported compression $compression")
    val stride = rowSize(width)
    // pixelOffset comes from the file; guard it (and the total-size check)
    // in Long arithmetic so crafted headers fail the documented
    // IllegalArgumentException path instead of ArrayIndexOutOfBounds.
    require(pixelOffset >= 54, s"bad pixel offset $pixelOffset (< header size)")
    val need = pixelOffset.toLong + stride.toLong * height
    require(bytes.length >= need,
      s"truncated pixel array: need $need, have ${bytes.length}")

    def lumaAt(x: Int, y: Int): Long = {
      val storedRow = if (bottomUp) height - 1 - y else y
      val off = pixelOffset + storedRow * stride + 3 * x
      val b = bytes(off) & 0xff
      val g = bytes(off + 1) & 0xff
      val r = bytes(off + 2) & 0xff
      299L * r + 587L * g + 114L * b
    }

    var sum = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { sum += lumaAt(x, y); x += 1 }
      y += 1
    }
    Decoded(width, height, channels = 3, lumaSumMilli = sum,
      topLeftLumaMilli = lumaAt(0, 0),
      bottomRightLumaMilli = lumaAt(width - 1, height - 1))
  }
}
