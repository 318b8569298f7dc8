package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF container semantics at the byte level: the box walk
  * (big-endian sizes, largesize and size-0 forms, unknown-box skipping,
  * free top-level order), sample extraction as the stsz x stsc x stco
  * table join (multi-chunk layouts, uniform-size stsz, co64), both
  * flavors ('raw ' closed-form, 'jpeg' through the real decoder), the
  * top-down unpadded 'raw ' row order, and the loud failure paths. No
  * Spark — the codec is plain JVM code; the Spark plumbing is covered
  * by q249 and its oracle.
  */
class Mp4CodecSpec extends AnyFunSuite {

  private def gradFrame(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] =
    Mp4Codec.encodeRawFrame(w, h)((x, y) => ((r + x + y) << 16) | (g << 8) | b)

  test("raw round-trip: header facts, frame payloads, box sums") {
    val (w, h) = (10, 8)
    val frames = (0 until 5).map(f => gradFrame(w, h, 20 + f, 30, 40))
    val mp4 = Mp4Codec.encode(w, h, frames, timescale = 30)
    val info = Mp4Codec.info(mp4)
    assert(info === Mp4Codec.Mp4Info(w, h, 5, 30, 1, "raw "))
    val back = Mp4Codec.frames(mp4)
    assert(back.length === 5)
    (back zip frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // box sums against the closed form (the q249 oracle formula)
    val sums = Mp4Codec.rawBoxSums(back(1), w, h, 4)
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

  test("raw rows are stored top-down unpadded: corner pixel in the top box") {
    // one white pixel at image TOP-LEFT, rest black — the opposite
    // orientation convention from AVI's bottom-up DIB, asserted so the
    // two walkers can never be silently interchanged
    val f = Mp4Codec.encodeRawFrame(8, 8)((x, y) =>
      if (x == 0 && y == 0) 0xffffff else 0)
    assert((f(0) & 0xff) === 255 && (f(1) & 0xff) === 255 && (f(2) & 0xff) === 255)
    assert(f.length === 3 * 8 * 8) // no row padding, unlike DIB's 4-byte stride
    val sums = Mp4Codec.rawBoxSums(f, 8, 8, 2)
    assert(sums(0) === 299L * 255 + 587L * 255 + 114L * 255)
    assert(sums(1) === 0L && sums(2) === 0L && sums(3) === 0L)
  }

  test("stsc multi-chunk map: a trailing partial chunk gets its own run") {
    // 7 samples at 3 per chunk -> chunks of 3,3,1: extraction must honor
    // the run-length semantics (entry holds until the next first_chunk)
    val frames = (0 until 7).map(f => gradFrame(6, 4, 10 * f, 0, 0))
    val mp4 = Mp4Codec.encode(6, 4, frames, samplesPerChunk = 3)
    val back = Mp4Codec.frames(mp4)
    assert(back.length === 7)
    (back zip frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // and one sample per chunk (single stsc entry, 7 chunks)
    val one = Mp4Codec.encode(6, 4, frames, samplesPerChunk = 1)
    assert(Mp4Codec.frames(one).length === 7)
    (Mp4Codec.frames(one) zip frames).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
  }

  test("box order is free: moov before mdat decodes identically") {
    val frames = (0 until 4).map(f => gradFrame(5, 5, 40 + f, 7, 9))
    val mp4 = Mp4Codec.encode(5, 5, frames, samplesPerChunk = 2)
    // rebuild the file with moov moved BEFORE mdat; stco offsets are
    // absolute, so they must be shifted by the moov size
    def be(b: Array[Byte], o: Int) =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    def putBe(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = ((v >>> 24) & 0xff).toByte; b(o + 1) = ((v >>> 16) & 0xff).toByte
      b(o + 2) = ((v >>> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
    }
    val ftypLen = be(mp4, 0)
    val mdatLen = be(mp4, ftypLen)
    val moovOff = ftypLen + mdatLen
    val moovLen = be(mp4, moovOff)
    assert(ftypLen + mdatLen + moovLen === mp4.length)
    val re = new Array[Byte](mp4.length)
    System.arraycopy(mp4, 0, re, 0, ftypLen)
    System.arraycopy(mp4, moovOff, re, ftypLen, moovLen)
    System.arraycopy(mp4, ftypLen, re, ftypLen + moovLen, mdatLen)
    // shift every stco entry by +moovLen (find stco by scanning)
    var i = ftypLen
    var stco = -1
    while (i + 8 <= ftypLen + moovLen && stco < 0) {
      if (new String(re, i, 4, "US-ASCII") == "stco") stco = i - 4
      i += 1
    }
    assert(stco > 0, "stco not found in relocated moov")
    val nChunks = be(re, stco + 12)
    (0 until nChunks).foreach { c =>
      putBe(re, stco + 16 + 4 * c, be(re, stco + 16 + 4 * c) + moovLen)
    }
    val back = Mp4Codec.frames(re)
    assert(back.length === 4)
    (back zip frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    assert(Mp4Codec.info(re) === Mp4Codec.info(mp4))
  }

  test("largesize (size=1) and unknown top-level boxes are walked correctly") {
    val frames = Seq(gradFrame(4, 4, 50, 60, 70))
    val mp4 = Mp4Codec.encode(4, 4, frames)
    def be(b: Array[Byte], o: Int) =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    val ftypLen = be(mp4, 0)
    // splice in: an unknown 'free' box, then the rest with mdat rewritten
    // to the 64-bit largesize form (size field 1 + 8-byte largesize) —
    // every downstream offset moves by free(16) + largesize delta(8)
    val mdatLen = be(mp4, ftypLen)
    val shift = 16 + 8
    val out = new java.io.ByteArrayOutputStream()
    out.write(mp4, 0, ftypLen)
    // free box (16 bytes)
    out.write(Array[Byte](0, 0, 0, 16)); out.write("free".getBytes("US-ASCII"))
    out.write(new Array[Byte](8))
    // mdat as largesize
    out.write(Array[Byte](0, 0, 0, 1)); out.write("mdat".getBytes("US-ASCII"))
    val large = mdatLen.toLong + 8
    (56 to 0 by -8).foreach(s => out.write(((large >>> s) & 0xff).toInt))
    out.write(mp4, ftypLen + 8, mdatLen - 8)
    out.write(mp4, ftypLen + mdatLen, mp4.length - ftypLen - mdatLen)
    val re = out.toByteArray
    // shift stco by +shift
    var i = 0
    var stco = -1
    while (i + 4 <= re.length && stco < 0) {
      if (new String(re, i, 4, "US-ASCII") == "stco") stco = i - 4
      i += 1
    }
    val nChunks = be(re, stco + 12)
    def putBe(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = ((v >>> 24) & 0xff).toByte; b(o + 1) = ((v >>> 16) & 0xff).toByte
      b(o + 2) = ((v >>> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
    }
    (0 until nChunks).foreach { c =>
      putBe(re, stco + 16 + 4 * c, be(re, stco + 16 + 4 * c) + shift)
    }
    val back = Mp4Codec.frames(re)
    assert(back.length === 1)
    assert(back.head.toSeq === frames.head.toSeq)
  }

  test("jpeg flavor: payloads round-trip byte-exactly and decode") {
    val w = 16; val h = 16
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 16) << 16 | (y * 16) << 8)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val jpeg = baos.toByteArray
    val mp4 = Mp4Codec.encode(w, h, Seq(jpeg, jpeg), handler = "jpeg")
    val info = Mp4Codec.info(mp4)
    assert(info.handler === "jpeg" && info.nFrames === 2)
    val back = Mp4Codec.frames(mp4)
    assert(back.forall(_.toSeq == jpeg.toSeq))
    // and the payload is a real JPEG the image path can decode
    val (dw, dh, _) = ImageIoCodec.boxSums(back.head, 4)
    assert(dw === w && dh === h)
  }

  test("info() times from the vide trak when an audio trak comes first") {
    val (w, h) = (6, 4)
    val frames = Seq(gradFrame(w, h, 9, 9, 9), gradFrame(w, h, 1, 2, 3))
    val mp4 = Mp4Codec.encode(w, h, frames, timescale = 25, sampleDelta = 1)
    // splice a minimal 'soun' trak (mdhd timescale 8000) as the FIRST
    // child of moov — mdat precedes moov in the encoder's layout, so the
    // stco offsets survive the insertion untouched
    def i32(buf: Array[Byte], o: Int, v: Int): Unit = {
      buf(o) = (v >>> 24).toByte; buf(o + 1) = (v >>> 16).toByte
      buf(o + 2) = (v >>> 8).toByte; buf(o + 3) = v.toByte
    }
    def tag4(buf: Array[Byte], o: Int, t: String): Unit =
      t.getBytes("US-ASCII").copyToArray(buf, o)
    val mdhdSize = 32; val hdlrSize = 33
    val mdiaSize = 8 + mdhdSize + hdlrSize; val trakSize = 8 + mdiaSize
    val audio = new Array[Byte](trakSize)
    i32(audio, 0, trakSize); tag4(audio, 4, "trak")
    i32(audio, 8, mdiaSize); tag4(audio, 12, "mdia")
    var o = 16
    i32(audio, o, mdhdSize); tag4(audio, o + 4, "mdhd")
    i32(audio, o + 8 + 12, 8000) // timescale: NOT the video's 25
    i32(audio, o + 8 + 16, 4000)
    o += mdhdSize
    i32(audio, o, hdlrSize); tag4(audio, o + 4, "hdlr")
    tag4(audio, o + 16, "soun")
    // locate moov among the top-level boxes (ftyp, mdat, moov)
    var moovS = 0
    while (!(mp4(moovS + 4) == 'm' && mp4(moovS + 5) == 'o' &&
             mp4(moovS + 6) == 'o' && mp4(moovS + 7) == 'v')) {
      moovS += java.nio.ByteBuffer.wrap(mp4, moovS, 4).getInt
    }
    val spliced = new Array[Byte](mp4.length + trakSize)
    System.arraycopy(mp4, 0, spliced, 0, moovS + 8)
    System.arraycopy(audio, 0, spliced, moovS + 8, trakSize)
    System.arraycopy(mp4, moovS + 8, spliced, moovS + 8 + trakSize,
      mp4.length - moovS - 8)
    i32(spliced, moovS, java.nio.ByteBuffer.wrap(mp4, moovS, 4).getInt + trakSize)
    val info = Mp4Codec.info(spliced)
    assert(info.timescale === 25, "timescale must come from the vide trak's mdhd")
    assert(info.width === w && info.height === h && info.nFrames === 2)
    assert(info.sampleDelta === 1)
    assert(Mp4Codec.frames(spliced).head.toSeq == frames.head.toSeq)
  }

  test("failure paths are loud") {
    val frames = Seq(gradFrame(4, 4, 1, 2, 3))
    val mp4 = Mp4Codec.encode(4, 4, frames)
    intercept[IllegalArgumentException] { Mp4Codec.info(Array[Byte](1, 2, 3)) }
    // missing ftyp
    intercept[IllegalArgumentException] {
      Mp4Codec.frames(java.util.Arrays.copyOfRange(mp4, 24, mp4.length))
    }
    // truncated mid-moov
    intercept[IllegalArgumentException] {
      Mp4Codec.info(java.util.Arrays.copyOf(mp4, mp4.length - 40))
    }
    intercept[IllegalArgumentException] { Mp4Codec.encode(0, 4, frames) }
    intercept[IllegalArgumentException] { Mp4Codec.encode(4, 4, Seq.empty) }
    intercept[IllegalArgumentException] {
      Mp4Codec.encode(4, 4, frames, handler = "avc1")
    }
    intercept[IllegalArgumentException] {
      Mp4Codec.rawBoxSums(new Array[Byte](10), 4, 4, 2)
    }
  }
}
