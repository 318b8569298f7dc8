package graft.multimodal

/** Pure-JVM AVI (RIFF) video codec — [[WavCodec]]'s chunk-stream walk
  * generalized to the video container. Scope: single-stream `vids` AVIs
  * in the two flavors this sandbox can close end-to-end:
  *
  *  - `DIB ` (uncompressed): each `00db` chunk is one raw bottom-up BGR
  *    frame with 4-byte-padded rows (the [[BmpCodec]] pixel layout minus
  *    the file header — the format BITMAPINFOHEADER in `strf`
  *    describes). Fully closed-form decodable, so frame features are
  *    ORACLE-exact — the near-dup query (q194) runs on this flavor.
  *  - `MJPG` (Motion JPEG): each `00dc` chunk is a standalone JPEG,
  *    decoded through [[ImageIoCodec]] — real entropy decoding, lossy by
  *    design, so it is spec-verified (deterministic within the JVM)
  *    rather than oracled.
  *
  * Container facts the walker must honor (and the spec exercises):
  *  - RIFF header (`RIFF` + size + `AVI `), then a chunk STREAM where
  *    every chunk is `fourcc + u32 size + body` padded to an EVEN byte
  *    boundary — a fixed-offset reader is wrong on real files;
  *  - `LIST` chunks nest (`hdrl` holds `avih` and a `strl` per stream;
  *    `movi` holds the frame chunks, possibly grouped under `rec `
  *    LISTs), and `JUNK` chunks appear anywhere;
  *  - frame chunks are `##db`/`##dc` (stream number + flavor); the
  *    optional trailing `idx1` index is redundant for a sequential read
  *    and ignored.
  */
object AviCodec {

  final case class AviInfo(
      width: Int,
      height: Int,
      nFrames: Int,
      microSecPerFrame: Int,
      /** `strh.fccHandler`: "DIB " or "MJPG" here. */
      handler: String)

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def putShortLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def putTag(b: Array[Byte], off: Int, t: String): Unit = {
    require(t.length == 4, s"fourcc must be 4 chars: '$t'")
    var i = 0
    while (i < 4) { b(off + i) = t.charAt(i).toByte; i += 1 }
  }

  private def rowStride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Byte size of one raw DIB frame (padded 24-bit BGR rows). */
  def dibFrameSize(width: Int, height: Int): Int = rowStride(width) * height

  /** Encode one raw DIB frame body (bottom-up BGR, padded rows) from an
    * `rgb(x, y)` = packed 0xRRGGBB accessor in image orientation.
    */
  def encodeDibFrame(width: Int, height: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val stride = rowStride(width)
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val rowOff = (height - 1 - y) * stride
      var x = 0
      while (x < width) {
        val p = rgb(x, y)
        val off = rowOff + 3 * x
        out(off) = (p & 0xff).toByte
        out(off + 1) = ((p >> 8) & 0xff).toByte
        out(off + 2) = ((p >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Assemble a single-video-stream AVI from pre-encoded frame bodies.
    * `handler` selects the flavor: "DIB " writes `00db` chunks (frames
    * must be [[encodeDibFrame]]-layout raw bodies), "MJPG" writes `00dc`
    * chunks (frames must be standalone JPEG payloads).
    */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]],
      handler: String = "DIB ", microSecPerFrame: Int = 40000): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(frames.nonEmpty, "an AVI needs at least one frame")
    require(handler == "DIB " || handler == "MJPG", s"unsupported handler '$handler'")
    val frameTag = if (handler == "DIB ") "00db" else "00dc"
    val isDib = handler == "DIB "
    val maxFrame = frames.map(_.length).max
    // sizes: every chunk body padded even
    def padded(n: Int) = n + (n & 1)
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl' avih LIST(strl strh strf)
    val moviBody = 4 + frames.map(f => 8 + padded(f.length)).sum
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    val out = new Array[Byte](8 + riffBody)
    var o = 0
    putTag(out, o, "RIFF"); putIntLE(out, o + 4, riffBody); putTag(out, o + 8, "AVI "); o += 12
    // LIST hdrl
    putTag(out, o, "LIST"); putIntLE(out, o + 4, hdrlBody); putTag(out, o + 8, "hdrl"); o += 12
    // avih (56-byte MainAVIHeader)
    putTag(out, o, "avih"); putIntLE(out, o + 4, 56); o += 8
    putIntLE(out, o, microSecPerFrame)
    putIntLE(out, o + 16, frames.length) // dwTotalFrames
    putIntLE(out, o + 24, 1) // dwStreams
    putIntLE(out, o + 28, maxFrame) // dwSuggestedBufferSize
    putIntLE(out, o + 32, width)
    putIntLE(out, o + 36, height)
    o += 56
    // LIST strl
    val strlBody = 4 + (8 + 56) + (8 + 40)
    putTag(out, o, "LIST"); putIntLE(out, o + 4, strlBody); putTag(out, o + 8, "strl"); o += 12
    // strh (56-byte AVIStreamHeader)
    putTag(out, o, "strh"); putIntLE(out, o + 4, 56); o += 8
    putTag(out, o, "vids"); putTag(out, o + 4, handler)
    putIntLE(out, o + 20, 1) // dwScale
    putIntLE(out, o + 24, 1000000 / math.max(1, microSecPerFrame)) // dwRate
    putIntLE(out, o + 32, frames.length) // dwLength
    putIntLE(out, o + 36, maxFrame)
    putShortLE(out, o + 52, width) // rcFrame right
    putShortLE(out, o + 54, height) // rcFrame bottom
    o += 56
    // strf (BITMAPINFOHEADER)
    putTag(out, o, "strf"); putIntLE(out, o + 4, 40); o += 8
    putIntLE(out, o, 40)
    putIntLE(out, o + 4, width)
    putIntLE(out, o + 8, height)
    putShortLE(out, o + 12, 1) // planes
    putShortLE(out, o + 14, 24) // bpp
    if (!isDib) putTag(out, o + 16, "MJPG") // biCompression (0 = BI_RGB for DIB)
    putIntLE(out, o + 20, if (isDib) dibFrameSize(width, height) else maxFrame)
    o += 40
    // LIST movi
    putTag(out, o, "LIST"); putIntLE(out, o + 4, moviBody); putTag(out, o + 8, "movi"); o += 12
    frames.foreach { f =>
      putTag(out, o, frameTag); putIntLE(out, o + 4, f.length); o += 8
      System.arraycopy(f, 0, out, o, f.length)
      o += padded(f.length) // zero-filled array => pad byte is 0
    }
    require(o == out.length, s"encoder layout bug: wrote $o of ${out.length}")
    out
  }

  /** Walk the header chunks to the container facts. Fails loudly on
    * anything outside the supported profile.
    */
  def info(bytes: Array[Byte]): AviInfo = {
    require(bytes.length >= 12, s"truncated RIFF header: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ",
      "not an AVI (missing RIFF/AVI magic)")
    var width = -1; var height = -1; var nFrames = -1
    var microSec = -1; var handler = ""
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val t = tag(bytes, o)
        val size = getIntLE(bytes, o + 4)
        require(size >= 0 && o + 8L + size <= bytes.length,
          s"chunk '$t' overruns the buffer (size $size at offset $o)")
        if (t == "LIST") {
          val listType = tag(bytes, o + 8)
          if (listType == "hdrl" || listType == "strl") walk(o + 12, o + 8 + size)
        } else if (t == "avih") {
          require(size >= 40, s"avih too small: $size")
          microSec = getIntLE(bytes, o + 8)
          nFrames = getIntLE(bytes, o + 8 + 16)
          width = getIntLE(bytes, o + 8 + 32)
          height = getIntLE(bytes, o + 8 + 36)
        } else if (t == "strh" && handler.isEmpty) {
          require(size >= 8, s"strh too small: $size")
          if (tag(bytes, o + 8) == "vids") handler = tag(bytes, o + 12)
        }
        o += 8 + size + (size & 1)
      }
    }
    walk(12, bytes.length)
    require(width > 0 && height > 0 && nFrames > 0,
      s"no usable avih header (dims ${width}x$height, frames $nFrames)")
    require(handler.nonEmpty, "no vids stream header")
    AviInfo(width, height, nFrames, microSec, handler)
  }

  /** Extract the frame payloads (`##db`/`##dc` bodies) in stream order,
    * descending into `rec ` groups and skipping `JUNK`/index chunks.
    */
  def frames(bytes: Array[Byte]): Vector[Array[Byte]] = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ",
      "not an AVI (missing RIFF/AVI magic)")
    val out = Vector.newBuilder[Array[Byte]]
    def emit(o: Int, size: Int): Unit = {
      val f = new Array[Byte](size)
      System.arraycopy(bytes, o, f, 0, size)
      out += f
    }
    def walkMovi(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val t = tag(bytes, o)
        val size = getIntLE(bytes, o + 4)
        require(size >= 0 && o + 8L + size <= bytes.length,
          s"chunk '$t' overruns the buffer (size $size at offset $o)")
        if (t == "LIST" && tag(bytes, o + 8) == "rec ") walkMovi(o + 12, o + 8 + size)
        else if (t.length == 4 && (t.endsWith("db") || t.endsWith("dc"))) emit(o + 8, size)
        o += 8 + size + (size & 1)
      }
    }
    def walkTop(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val t = tag(bytes, o)
        val size = getIntLE(bytes, o + 4)
        require(size >= 0 && o + 8L + size <= bytes.length,
          s"chunk '$t' overruns the buffer (size $size at offset $o)")
        if (t == "LIST" && tag(bytes, o + 8) == "movi") walkMovi(o + 12, o + 8 + size)
        o += 8 + size + (size & 1)
      }
    }
    walkTop(12, bytes.length)
    out.result()
  }

  /** Box-pooled milli-luma sums of one raw DIB frame — the
    * [[ImageIoCodec.boxSums]] pooling (pixel (x, y) lands in box
    * (y·g/h, x·g/w); row-major output) applied to the bottom-up padded
    * BGR layout. Integer-exact, so q194's oracle recomputes it in
    * closed form.
    */
  def dibBoxSums(frame: Array[Byte], width: Int, height: Int,
      grid: Int): Array[Long] = {
    val stride = rowStride(width)
    require(frame.length >= stride * height,
      s"truncated DIB frame: need ${stride * height}, have ${frame.length}")
    val sums = new Array[Long](grid * grid)
    var y = 0
    while (y < height) {
      val rowOff = (height - 1 - y) * stride
      val gy = y * grid / height
      var x = 0
      while (x < width) {
        val off = rowOff + 3 * x
        val b = frame(off) & 0xff
        val g = frame(off + 1) & 0xff
        val r = frame(off + 2) & 0xff
        sums(gy * grid + x * grid / width) += 299L * r + 587L * g + 114L * b
        x += 1
      }
      y += 1
    }
    sums
  }
}
