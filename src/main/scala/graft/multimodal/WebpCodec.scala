package graft.multimodal

/** Pure-JVM WebP-lossless (VP8L) codec for the multimodal decode path —
  * closing the last [[Multimodal.decodeStub]] format tier with the same
  * from-scratch discipline as [[BmpCodec]] (BI_RGB) and [[WavCodec]]
  * (RIFF PCM). Scope, stated exactly like BmpCodec's: VP8L literals plus
  * LZ77 backward references with LINEAR distances (plane codes > 120) —
  * no transforms, no color cache, no meta-prefix image, no 2-D
  * neighborhood plane codes (the 120-entry offset map). That profile is
  * a fully legal VP8L bitstream (every standard decoder reads it; the
  * optional features are exactly that — optional), and decoding it
  * exercises the real VP8L machinery end to end:
  *
  *  - RIFF container walk (`RIFF`/`WEBP`/`VP8L` chunks, even-size
  *    padding), with loud rejection of lossy `VP8 ` and extended `VP8X`;
  *  - the 0x2f signature + 14-bit dimension header;
  *  - prefix-code loading: both the "simple" 1-2 symbol form and the
  *    full form where symbol code lengths are themselves prefix-coded by
  *    a code-length code stored as 3-bit lengths in VP8L's fixed
  *    {17,18,0,1,...,15} order, including the repeat opcodes
  *    (16: repeat previous non-zero, 17/18: runs of zeros) and the
  *    optional max-symbol short-circuit;
  *  - canonical prefix-code reconstruction (codes assigned by increasing
  *    length then symbol, bit-reversed on the wire, read LSB-first) for
  *    all five alphabets (green+length+cache 280, red/blue/alpha 256,
  *    distance 40);
  *  - the green→red→blue→alpha literal pixel loop, and the LZ77 path:
  *    length symbols 256-279 of the green alphabet and distance symbols
  *    through the shared value-prefix coding (4 no-extra-bit codes, then
  *    extra bits growing with the code), runs copied pixel by pixel so
  *    overlapping distance-1 references work (the RLE case).
  *
  * Out-of-profile features fail loudly with the feature name — the same
  * contract as BmpCodec's rejection of RLE/16-bit variants. No byte of
  * this implementation is derived from libwebp; it is written against
  * the public bitstream specification (RFC 9649).
  *
  * Exactness: decode yields integer ARGB pixels, reduced to the same
  * milli-luma sums as the other image codecs — closed-form predictable
  * by the oracle from the synthesis parameters, so the q151 compare is
  * hash-exact (the profile is lossless).
  */
object WebpCodec {

  final case class Decoded(
      width: Int,
      height: Int,
      channels: Int,
      lumaSumMilli: Long,
      topLeftLumaMilli: Long,
      bottomRightLumaMilli: Long)

  /** VP8L's fixed storage order of the code-length code's own lengths. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // ---- bit I/O: LSB-first within bytes (the DEFLATE/VP8L convention) ----

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0
    /** Write `n` bits of `v`, least-significant first. */
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        i += 1
      }
    }
    /** Write a canonical prefix code MSB-first (codes are bit-reversed
      * relative to the LSB-first value stream — RFC 9649 §3.3).
      */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      val out = if (nBits > 0) buf :+ cur.toByte else buf
      out.toArray
    }
  }

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var pos = startByte * 8
    private val end = bytes.length * 8
    def readBits(n: Int): Int = {
      require(pos + n <= end, s"vp8l: bitstream truncated at bit $pos")
      var v = 0
      var i = 0
      while (i < n) {
        v |= ((bytes(pos >> 3) >> (pos & 7)) & 1) << i
        pos += 1
        i += 1
      }
      v
    }
  }

  // ---- canonical prefix codes ------------------------------------------

  /** Canonical decoder over `lengths` (0 = absent): symbols are assigned
    * codes by increasing (length, symbol); reading walks the stream bit
    * by bit accumulating MSB-first, the inverse of [[BitWriter.writeCode]].
    * A one-symbol code (the "simple" 1-entry form) reads zero bits.
    */
  private final class Canonical(lengths: Array[Int]) {
    private val maxLen = if (lengths.isEmpty) 0 else lengths.max
    private val count = new Array[Int](maxLen + 1)
    for (l <- lengths if l > 0) count(l) += 1
    private val firstCode = new Array[Int](maxLen + 1)
    private val offset = new Array[Int](maxLen + 1)
    locally {
      var code = 0
      var total = 0
      var l = 1
      while (l <= maxLen) {
        code = (code + (if (l > 1) count(l - 1) else 0)) << 1
        firstCode(l) = code
        offset(l) = total
        total += count(l)
        l += 1
      }
    }
    private val symbols: Array[Int] = {
      val syms = new Array[Int](count.sum)
      val next = offset.clone()
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) > 0) { syms(next(lengths(s))) = s; next(lengths(s)) += 1 }
        s += 1
      }
      syms
    }
    require(symbols.nonEmpty, "vp8l: prefix code with no symbols")
    // a one-symbol code reads ZERO bits (RFC 9649's trivial-code case),
    // however it was stored — the simple form or a degenerate full form
    private val single = symbols.length == 1

    def read(br: BitReader): Int = {
      if (single) return symbols(0)
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.readBits(1)
        len += 1
        if (count(len) > 0 &&
            code >= firstCode(len) && code - firstCode(len) < count(len))
          return symbols(offset(len) + code - firstCode(len))
      }
      throw new IllegalArgumentException("vp8l: invalid prefix code in stream")
    }
  }

  /** Canonical code of every symbol for a fixed all-8-bit alphabet of 256
    * literals: code == symbol (256 codes of length 8 assign in symbol
    * order starting at 0).
    */
  private def writeFixed8Code(bw: BitWriter, alphabetSize: Int): Unit = {
    bw.writeBits(0, 1) // not the simple form
    // code-length code: symbols {8 -> len 1, 16 -> len 2, 18 -> len 2};
    // stored as 3-bit lengths at ClOrder positions 11, 8, 1 -> 12 entries
    bw.writeBits(12 - 4, 4)
    val clLen = Array(0, 2, 0, 0, 0, 0, 0, 0, 2, 0, 0, 1)
    clLen.foreach(bw.writeBits(_, 3))
    bw.writeBits(0, 1) // no max-symbol short-circuit: lengths cover the alphabet
    // canonical cl codes: 8 -> 0 (1 bit); 16 -> 10b; 18 -> 11b
    def cl8(): Unit = bw.writeCode(0, 1)
    def cl16(repMinus3: Int): Unit = { bw.writeCode(2, 2); bw.writeBits(repMinus3, 2) }
    def cl18(repMinus11: Int): Unit = { bw.writeCode(3, 2); bw.writeBits(repMinus11, 7) }
    cl8() // symbol 0: length 8
    var emitted = 1
    while (emitted < 256) { // 42 runs of 6 + 1 run of 3
      val rep = math.min(6, 256 - emitted)
      cl16(rep - 3)
      emitted += rep
    }
    if (alphabetSize > 256) cl18(alphabetSize - 256 - 11) // trailing zeros
  }

  /** The green+length alphabet's code: a COMPLETE canonical code over all
    * 280 symbols (Kraft sum exactly 1: 232 eight-bit + 48 nine-bit
    * codes), so literal greens AND the 24 LZ77 length codes are
    * emittable. Canonical assignment: symbols 0-231 get codes 0-231 at
    * 8 bits; symbols 232-279 get codes 464-511 at 9 bits.
    */
  private def writeGreen280Code(bw: BitWriter): Unit = {
    bw.writeBits(0, 1) // not the simple form
    // code-length code: {8 -> len 1, 9 -> len 2, 16 -> len 2} at ClOrder
    // positions 11, 12, 8 -> 13 entries
    bw.writeBits(13 - 4, 4)
    val clLen = Array(0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 1, 2)
    clLen.foreach(bw.writeBits(_, 3))
    bw.writeBits(0, 1) // no max-symbol short-circuit
    // canonical cl codes: 8 -> 0 (1 bit); 9 -> 10b; 16 -> 11b
    def lit(code: Int, len: Int): Unit = bw.writeCode(code, len)
    def rep(r: Int): Unit = { bw.writeCode(3, 2); bw.writeBits(r - 3, 2) }
    lit(0, 1) // symbol 0: length 8
    var emitted = 1
    while (emitted < 232) { val r = math.min(6, 232 - emitted); rep(r); emitted += r }
    lit(2, 2) // symbol 232: length 9
    emitted += 1
    while (emitted < 280) { val r = math.min(6, 280 - emitted); rep(r); emitted += r }
  }

  /** Canonical (code, length) of a green-alphabet symbol under
    * [[writeGreen280Code]]'s lengths.
    */
  private def greenCode(symbol: Int): (Int, Int) =
    if (symbol < 232) (symbol, 8) else (464 + symbol - 232, 9)

  /** The 1-2 symbol "simple" code form. */
  private def writeSimpleCode(bw: BitWriter, symbols: Seq[Int]): Unit = {
    require(symbols.nonEmpty && symbols.length <= 2)
    bw.writeBits(1, 1)
    bw.writeBits(symbols.length - 1, 1)
    if (symbols.head <= 1) { bw.writeBits(0, 1); bw.writeBits(symbols.head, 1) }
    else { bw.writeBits(1, 1); bw.writeBits(symbols.head, 8) }
    if (symbols.length == 2) bw.writeBits(symbols(1), 8)
  }

  /** LZ77 prefix coding of a value (length or distance plane code):
    * (symbol, extraValue, extraBits). Codes 0-3 carry values 1-4 with no
    * extra bits; code s >= 4 covers [offset+1, offset+2^extra] with
    * extra = (s-2)>>1, offset = (2+(s&1)) << extra.
    */
  private def lz77Encode(value: Int): (Int, Int, Int) = {
    require(value >= 1, s"vp8l: lz77 value $value")
    if (value <= 4) return (value - 1, 0, 0)
    var s = 4
    while (true) {
      val extra = (s - 2) >> 1
      val offset = (2 + (s & 1)) << extra
      if (value <= offset + (1 << extra)) return (s, value - offset - 1, extra)
      s += 1
    }
    sys.error("unreachable")
  }

  private def lz77Decode(symbol: Int, br: BitReader): Int =
    if (symbol < 4) symbol + 1
    else {
      val extra = (symbol - 2) >> 1
      val offset = (2 + (symbol & 1)) << extra
      offset + 1 + br.readBits(extra)
    }

  // ---- encode -----------------------------------------------------------

  /** Encode an image as lossless WebP (no transforms, no color cache).
    * `rgb(x, y)` returns packed 0xRRGGBB (alpha is emitted as constant
    * 255 through a one-symbol alpha code costing zero bits per pixel).
    * Runs of >= 4 identical pixels compress as distance-1 LZ77 backward
    * references (plane code 121 = linear distance 1, prefix symbol 13 —
    * a one-symbol distance code, so each backref costs one 9-bit length
    * symbol + extra bits + 5 distance extra bits).
    */
  def encode(width: Int, height: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 16384 && height <= 16384,
      s"bad dims ${width}x$height")
    val bw = new BitWriter
    bw.writeBits(0x2f, 8) // VP8L signature
    bw.writeBits(width - 1, 14)
    bw.writeBits(height - 1, 14)
    bw.writeBits(0, 1) // alpha-is-used hint: opaque
    bw.writeBits(0, 3) // version
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta-prefix image
    writeGreen280Code(bw) // green literals + length codes (no cache)
    writeFixed8Code(bw, 256) // red
    writeFixed8Code(bw, 256) // blue
    writeSimpleCode(bw, Seq(255)) // alpha: constant 255, zero bits/pixel
    // distance: the run-length emitter only ever uses plane code 121
    // (linear distance 1), whose prefix symbol is 13 with 5 extra bits —
    // a one-symbol code makes the symbol itself cost zero bits
    writeSimpleCode(bw, Seq(13))
    val n = width * height
    def px(i: Int): Int = rgb(i % width, i / width)
    var i = 0
    while (i < n) {
      val p = px(i)
      // literal: green, red, blue (alpha code is zero-bit)
      val (gc, gl) = greenCode((p >> 8) & 0xff)
      bw.writeCode(gc, gl)
      bw.writeCode((p >> 16) & 0xff, 8)
      bw.writeCode(p & 0xff, 8)
      i += 1
      // distance-1 run following this pixel -> one backref (4096 is the
      // longest length the 24-code prefix alphabet can carry; longer
      // runs emit several backrefs through the outer loop)
      var run = 0
      while (i + run < n && run < 4096 && px(i + run) == p) run += 1
      if (run >= 4) {
        val (sym, extraVal, extraBits) = lz77Encode(run)
        val (lc, ll) = greenCode(256 + sym)
        bw.writeCode(lc, ll)
        bw.writeBits(extraVal, extraBits)
        // distance symbol 13 costs zero bits; extra value 24 -> plane 121
        bw.writeBits(24, 5)
        i += run
      }
    }
    val payload = bw.toBytes
    val padded = payload.length + (payload.length & 1) // RIFF even-size pad
    val out = new Array[Byte](12 + 8 + padded)
    def put4(off: Int, s: String): Unit =
      (0 until 4).foreach(i => out(off + i) = s.charAt(i).toByte)
    def putIntLE(off: Int, v: Int): Unit =
      (0 until 4).foreach(i => out(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    put4(0, "RIFF")
    putIntLE(4, 4 + 8 + padded)
    put4(8, "WEBP")
    put4(12, "VP8L")
    putIntLE(16, payload.length)
    System.arraycopy(payload, 0, out, 20, payload.length)
    out
  }

  // ---- decode -----------------------------------------------------------

  private def readPrefixCode(br: BitReader, alphabetSize: Int): Canonical = {
    val lengths = new Array[Int](alphabetSize)
    if (br.readBits(1) == 1) { // simple form
      val numSymbols = br.readBits(1) + 1
      val first =
        if (br.readBits(1) == 1) br.readBits(8) else br.readBits(1)
      require(first < alphabetSize, s"vp8l: simple-code symbol $first out of range")
      lengths(first) = 1
      if (numSymbols == 2) {
        val second = br.readBits(8)
        require(second < alphabetSize, s"vp8l: simple-code symbol $second out of range")
        lengths(second) = 1
      }
    } else {
      val numCl = br.readBits(4) + 4
      require(numCl <= ClOrder.length, s"vp8l: $numCl code-length lengths")
      val clLengths = new Array[Int](19)
      (0 until numCl).foreach(i => clLengths(ClOrder(i)) = br.readBits(3))
      val clCode = new Canonical(clLengths)
      var maxSymbol =
        if (br.readBits(1) == 1) {
          val nBits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nBits)
        } else alphabetSize
      var symbol = 0
      var prev = 8 // RFC 9649: default previous length before any literal
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(br)
        if (cl < 16) {
          lengths(symbol) = cl; symbol += 1
          if (cl != 0) prev = cl
        } else {
          val (rep, len) = cl match {
            case 16 => (3 + br.readBits(2), prev)
            case 17 => (3 + br.readBits(3), 0)
            case 18 => (11 + br.readBits(7), 0)
            case other =>
              throw new IllegalArgumentException(s"vp8l: bad code-length symbol $other")
          }
          require(symbol + rep <= alphabetSize,
            s"vp8l: code-length repeat overflows alphabet at $symbol+$rep")
          (0 until rep).foreach { _ => lengths(symbol) = len; symbol += 1 }
        }
      }
    }
    new Canonical(lengths)
  }

  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b.slice(off, off + 4), java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode a literal-only VP8L WebP. Out-of-profile bitstream features
    * (lossy VP8, extended VP8X, transforms, color cache, meta-prefix,
    * LZ77 backrefs) fail loudly with the feature name.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 30, s"webp: ${bytes.length} bytes is no container")
    require(fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "WEBP",
      "webp: not a RIFF/WEBP container")
    // chunk walk from offset 12 to the VP8L payload
    var off = 12
    var payloadStart = -1
    var payloadLen = -1
    while (payloadStart < 0 && off + 8 <= bytes.length) {
      val cc = fourcc(bytes, off)
      val sz = getIntLE(bytes, off + 4)
      cc match {
        case "VP8L" => payloadStart = off + 8; payloadLen = sz
        case "VP8 " => throw new IllegalArgumentException(
          "webp: lossy VP8 payload — this codec decodes the lossless VP8L profile only")
        case "VP8X" => throw new IllegalArgumentException(
          "webp: extended VP8X container unsupported (animation/EXIF features)")
        case _ => off += 8 + sz + (sz & 1) // skip unknown chunk + pad
      }
    }
    require(payloadStart > 0, "webp: no VP8L chunk found")
    require((bytes(payloadStart) & 0xff) == 0x2f, "vp8l: bad signature byte")
    val br = new BitReader(bytes, payloadStart + 1)
    val width = br.readBits(14) + 1
    val height = br.readBits(14) + 1
    val alphaHint = br.readBits(1)
    val version = br.readBits(3)
    require(version == 0, s"vp8l: unknown version $version")
    if (br.readBits(1) == 1) throw new IllegalArgumentException(
      "vp8l: transform present — out of this codec's literal-only profile")
    if (br.readBits(1) == 1) throw new IllegalArgumentException(
      "vp8l: color cache present — out of this codec's literal-only profile")
    if (br.readBits(1) == 1) throw new IllegalArgumentException(
      "vp8l: meta-prefix image present — out of this codec's literal-only profile")
    val green = readPrefixCode(br, 256 + 24)
    val red = readPrefixCode(br, 256)
    val blue = readPrefixCode(br, 256)
    val alpha = readPrefixCode(br, 256)
    val dist = readPrefixCode(br, 40)
    val n = width * height
    val argb = new Array[Int](n)
    var i = 0
    while (i < n) {
      val g = green.read(br)
      if (g < 256) {
        val r = red.read(br)
        val b = blue.read(br)
        val a = alpha.read(br)
        argb(i) = (a << 24) | (r << 16) | (g << 8) | b
        i += 1
      } else {
        // LZ77 backward reference: length prefix from the green alphabet,
        // distance prefix mapped through the plane code — linear region
        // (> 120) only; the 120-entry 2-D neighborhood map is the one
        // VP8L feature outside this codec's profile
        val length = lz77Decode(g - 256, br)
        val planeCode = lz77Decode(dist.read(br), br)
        if (planeCode <= 120) throw new IllegalArgumentException(
          "vp8l: 2-D neighborhood distance plane code — out of this codec's profile")
        val d = planeCode - 120
        require(d <= i, s"vp8l: backref distance $d at pixel $i reaches before the image")
        require(i + length <= n, s"vp8l: backref overruns the image at pixel $i")
        var k = 0
        while (k < length) { argb(i) = argb(i - d); i += 1; k += 1 }
      }
    }
    var lumaSum = 0L
    i = 0
    while (i < n) {
      val p = argb(i)
      lumaSum += 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
      i += 1
    }
    def luma(p: Int): Long =
      299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
    Decoded(width, height, channels = if (alphaHint == 1) 4 else 3,
      lumaSumMilli = lumaSum, topLeftLumaMilli = luma(argb(0)),
      bottomRightLumaMilli = luma(argb(n - 1)))
  }
}
