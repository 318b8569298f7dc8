package graft.sources

import scala.collection.mutable

/** TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, 9→12-bit
  * codes with the EARLY code-width change (the width bumps when the next
  * free code reaches 2^bits − 1, one code before the table actually
  * needs it — TIFF's documented deviation from GIF LZW), ClearCode 256
  * first, EOI 257, table reset at 4094. Decode is the ingest path
  * ([[TiffReader]] compression 5); encode exists for byte-level fixtures
  * and the closed-form raster synthesis queries — the spec cross-checks
  * both directions against the JDK ImageIO TIFF plugin's independent
  * implementation.
  */
object LzwCodec {

  private val ClearCode = 256
  private val EoiCode = 257
  private val FirstFree = 258
  private val MaxTable = 4094 // spec: emit Clear when the table reaches here

  /** Decode `len` bytes at `off` into exactly `expected` output bytes. */
  def decode(in: Array[Byte], off: Int, len: Int, expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outAt = 0
    // table: prefix code + appended byte; first byte memoized for the
    // KwKwK case; lengths let us write strings without recursion
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    val length = new Array[Int](4096)
    val first = new Array[Byte](4096)
    var i = 0
    while (i < 256) {
      prefix(i) = -1; append(i) = i.toByte; length(i) = 1; first(i) = i.toByte
      i += 1
    }
    var nextCode = FirstFree
    var bits = 9
    var oldCode = -1

    var bitPos = 0
    val bitEnd = len * 8
    def nextSym(): Int = {
      if (bitPos + bits > bitEnd) return EoiCode // ran off the end: treat as EOI
      var v = 0
      var taken = 0
      while (taken < bits) {
        val byteAt = off + (bitPos >> 3)
        val avail = 8 - (bitPos & 7)
        val take = math.min(avail, bits - taken)
        val chunk = ((in(byteAt) & 0xFF) >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        taken += take
        bitPos += take
      }
      v
    }
    def writeString(code: Int): Unit = {
      val l = length(code)
      require(outAt + l <= expected,
        s"LZW output overruns the expected $expected bytes")
      var at = outAt + l - 1
      var c = code
      while (c >= 0) { out(at) = append(c); at -= 1; c = prefix(c) }
      outAt += l
    }

    var code = nextSym()
    while (code != EoiCode && outAt < expected) {
      if (code == ClearCode) {
        nextCode = FirstFree; bits = 9
        code = nextSym()
        if (code != EoiCode) { writeString(code); oldCode = code }
      } else {
        require(oldCode >= 0, "LZW stream does not start with ClearCode")
        // a conformant encoder clears at 4094, so nextCode never reaches
        // 4095 — a stream that doesn't must fail loudly, not overrun the
        // 4096-entry table
        require(nextCode < 4095,
          "LZW table overflow: stream never emitted ClearCode")
        if (code < nextCode) {
          writeString(code)
          prefix(nextCode) = oldCode; append(nextCode) = first(code)
          length(nextCode) = length(oldCode) + 1; first(nextCode) = first(oldCode)
        } else {
          require(code == nextCode, s"LZW code $code beyond table ($nextCode)")
          prefix(nextCode) = oldCode; append(nextCode) = first(oldCode)
          length(nextCode) = length(oldCode) + 1; first(nextCode) = first(oldCode)
          writeString(nextCode)
        }
        nextCode += 1
        // TIFF early change, decoder side: widen when the next free code
        // reaches 511/1023/2047 — one code EARLIER than a GIF decoder
        // (which waits for 512/1024/2048). Calibrated against the JDK
        // ImageIO TIFF writer's streams (TiffReaderSpec cross-check).
        if (nextCode >= (1 << bits) - 1 && bits < 12) bits += 1
        oldCode = code
      }
      if (outAt < expected) code = nextSym()
    }
    require(outAt == expected, s"LZW segment yielded $outAt of $expected bytes")
    out
  }

  /** Encode with the same early-change discipline (fixture/synthesis
    * side). Emits Clear first, resets at table code 4094, ends with EOI.
    */
  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new mutable.ArrayBuilder.ofByte
    var cur = 0; var curBits = 0
    var bits = 9
    def put(code: Int): Unit = {
      cur = (cur << bits) | code
      curBits += bits
      while (curBits >= 8) {
        out += ((cur >> (curBits - 8)) & 0xFF).toByte
        curBits -= 8
      }
    }
    // (prefixCode << 8 | byte) -> code
    var table = new java.util.HashMap[Integer, Integer]()
    var nextCode = FirstFree
    def reset(): Unit = { table = new java.util.HashMap(); nextCode = FirstFree; bits = 9 }

    put(ClearCode)
    var omega = -1
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xFF
      if (omega < 0) omega = c
      else {
        val key = Integer.valueOf((omega << 8) | c)
        val hit = table.get(key)
        if (hit != null) omega = hit.intValue()
        else {
          put(omega)
          table.put(key, Integer.valueOf(nextCode))
          nextCode += 1
          // encoder side pairs with the decoder rule above: the decoder's
          // table trails the wire by one entry, so the encoder widens at
          // 512/1024/2048 — exactly when the decoder (at 511/1023/2047 of
          // its own counter) starts reading wider codes
          if (nextCode >= (1 << bits) && bits < 12) bits += 1
          if (nextCode >= MaxTable) { put(ClearCode); reset() }
          omega = c
        }
      }
      i += 1
    }
    if (omega >= 0) put(omega)
    put(EoiCode)
    if (curBits > 0) out += ((cur << (8 - curBits)) & 0xFF).toByte
    out.result()
  }
}
