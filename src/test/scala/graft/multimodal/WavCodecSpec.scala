package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class WavCodecSpec extends AnyFunSuite {

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  test("canonical round-trip: ramp stats are exact closed forms") {
    val n = 100
    val a0 = -30
    val bytes = WavCodec.encode(n)((f, _) => a0 + f)
    assert(bytes.length == WavCodec.fileSize(n))
    val d = WavCodec.decode(bytes)
    assert(d.channels == 1 && d.sampleRate == 16000 && d.bitsPerSample == 16)
    assert(d.nFrames == n)
    assert(d.ampSum == n.toLong * a0 + n.toLong * (n - 1) / 2)
    val sq = n.toLong * a0 * a0 + 2L * a0 * (n.toLong * (n - 1) / 2) +
      (n - 1).toLong * n * (2 * n - 1) / 6
    assert(d.ampSqSum == sq)
    assert(d.minAmp == a0 && d.maxAmp == a0 + n - 1)
  }

  test("negative 16-bit samples decode signed (not as large unsigned)") {
    val bytes = WavCodec.encode(2)((f, _) => if (f == 0) -32768 else 32767)
    val d = WavCodec.decode(bytes)
    assert(d.minAmp == -32768 && d.maxAmp == 32767)
    assert(d.ampSum == -1)
  }

  test("stereo frames: nFrames is per-channel, sums cover every sample") {
    val bytes = WavCodec.encode(10, channels = 2)((f, c) => if (c == 0) f else -f)
    val d = WavCodec.decode(bytes)
    assert(d.channels == 2 && d.nFrames == 10)
    assert(d.ampSum == 0) // each frame's channels cancel
    assert(d.ampSqSum == 2L * (0 until 10).map(i => i.toLong * i).sum)
  }

  test("chunk stream: unknown chunks between fmt and data are skipped, odd lengths padded") {
    val base = WavCodec.encode(4)((f, _) => f)
    // splice a 5-byte LIST chunk (odd -> 1 pad byte) between fmt and data
    val listBody = Array[Byte](1, 2, 3, 4, 5)
    val spliced =
      base.slice(0, 36) ++
        "LIST".getBytes("US-ASCII") ++ le32(listBody.length) ++ listBody ++ Array[Byte](0) ++
        base.slice(36, base.length)
    // fix the RIFF size field (total - 8)
    System.arraycopy(le32(spliced.length - 8), 0, spliced, 4, 4)
    val d = WavCodec.decode(spliced)
    assert(d.nFrames == 4 && d.ampSum == 0 + 1 + 2 + 3)
    assert(d == WavCodec.decode(base)) // identical stats to unspliced
  }

  test("8-bit PCM decodes unsigned-rebased (-128 centering)") {
    // hand-build: header with bits=8, data = [0, 128, 255]
    val data = Array[Byte](0, 128.toByte, 255.toByte)
    val out = new Array[Byte](44 + 4) // +1 pad for odd data length... data len 3, pad 1
    val hdr = WavCodec.encode(1)((_, _) => 0) // template for tags
    System.arraycopy(hdr, 0, out, 0, 44)
    // patch fmt: bits=8 (offset 34), byteRate (28) and blockAlign (32)
    out(34) = 8; out(28) = (16000 & 0xff).toByte; out(32) = 1
    out(29) = ((16000 >> 8) & 0xff).toByte; out(30) = 0; out(31) = 0; out(33) = 0
    out(35) = 0
    // patch data chunk: len 3, then samples + pad
    System.arraycopy(le32(3), 0, out, 40, 4)
    System.arraycopy(data, 0, out, 44, 3)
    System.arraycopy(le32(out.length - 8), 0, out, 4, 4)
    val d = WavCodec.decode(out)
    assert(d.bitsPerSample == 8 && d.nFrames == 3)
    assert(d.minAmp == -128 && d.maxAmp == 127)
    assert(d.ampSum == -128 + 0 + 127)
  }

  test("unsupported profiles fail loudly") {
    val good = WavCodec.encode(4)((f, _) => f)
    val notRiff = good.clone(); notRiff(0) = 'X'
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(notRiff)).getMessage.contains("RIFF"))
    val compressed = good.clone(); compressed(20) = 3 // IEEE float fmt
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(compressed)).getMessage.contains("audioFormat"))
    val bits24 = good.clone(); bits24(34) = 24
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(bits24)).getMessage.contains("bitsPerSample"))
    val truncated = java.util.Arrays.copyOf(good, good.length - 3)
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(truncated)).getMessage.contains("overruns"))
    // a crafted data-chunk length near Int.MaxValue must not wrap the
    // off + 8 + len bound check (Int overflow → negative → "fits")
    val hugeLen = good.clone()
    hugeLen(40) = 0xff.toByte; hugeLen(41) = 0xff.toByte
    hugeLen(42) = 0xff.toByte; hugeLen(43) = 0x7f.toByte
    assert(intercept[IllegalArgumentException](
      WavCodec.decode(hugeLen)).getMessage.contains("overruns"))
  }

  test("segmentTv: hand-computed segment assignment") {
    // samples [0, 10, 10, 25], 2 segments: diff i=1 (|10|) lands in
    // segment (1*2)/4 = 0; diffs i=2 (0) and i=3 (15) land in segment 1
    val clip = WavCodec.encode(4)((f, _) => Seq(0, 10, 10, 25)(f))
    val (n, tv) = WavCodec.segmentTv(clip, 2)
    assert(n === 4L)
    assert(tv.toSeq === Seq(10L, 15L))
  }

  test("segmentTv: DC shift cancels; waveform change does not") {
    def clip(base: Int) = WavCodec.encode(300)((f, _) => base + (f * 3) % 97)
    val (_, a) = WavCodec.segmentTv(clip(-40), 16)
    val (_, b) = WavCodec.segmentTv(clip(25), 16) // re-leveled copy
    assert(a.toSeq === b.toSeq, "DC offset must cancel in every difference")
    val (_, c) = WavCodec.segmentTv(
      WavCodec.encode(300)((f, _) => -40 + (f * 4) % 97), 16)
    assert(a.toSeq !== c.toSeq, "different waveform must fingerprint apart")
  }

  test("segmentTv: rejects multi-channel input loudly") {
    val stereo = WavCodec.encode(32, channels = 2)((f, c) => f + c)
    assert(intercept[IllegalArgumentException](
      WavCodec.segmentTv(stereo, 16)).getMessage.contains("mono"))
  }
}
