package graft.multimodal

/** Pure-JVM PCM WAV codec — the audio counterpart of [[BmpCodec]]: the
  * one audio container this sandbox can decode end-to-end without native
  * codecs. Scope: RIFF/WAVE with linear PCM (`audioFormat = 1`), 8-bit
  * unsigned or 16-bit signed little-endian samples, any channel count.
  *
  * Container facts the decoder must honor (and the spec exercises):
  *  - 12-byte RIFF header (`RIFF` + chunk size + `WAVE`);
  *  - a chunk STREAM after it — `fmt ` and `data` can be separated by
  *    arbitrary chunks (`LIST`, `fact`, ...), each padded to an even
  *    byte boundary, so a fixed 44-byte-offset reader is wrong on real
  *    files;
  *  - 8-bit samples are UNSIGNED centered at 128; 16-bit are signed LE.
  *
  * All emitted statistics are integer sums (amplitude, squared
  * amplitude): exact in any order, so oracle compares are equality.
  */
object WavCodec {

  final case class Decoded(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      /** frames = samples per channel. */
      nFrames: Long,
      /** Σ of all sample amplitudes (8-bit rebased to signed by -128). */
      ampSum: Long,
      /** Σ of squared amplitudes — energy; 16-bit × 100M samples still
        * fits a long with 13 bits to spare.
        */
      ampSqSum: Long,
      minAmp: Int,
      maxAmp: Int)

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

  private def getShortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Canonical byte length of [[encode]]'s output (44-byte header +
    * 2 bytes per 16-bit sample, padded even — 16-bit data always is).
    */
  def fileSize(nFrames: Long, channels: Int = 1): Long =
    44L + 2L * nFrames * channels

  /** Encode mono-interleavable 16-bit signed PCM into the canonical
    * 44-byte-header WAV. `sample(frame, channel)` must fit a short.
    */
  def encode(nFrames: Int, channels: Int = 1, sampleRate: Int = 16000)(
      sample: (Int, Int) => Int): Array[Byte] = {
    require(nFrames > 0 && channels > 0, s"bad shape $nFrames x $channels")
    val dataBytes = 2 * nFrames * channels
    val out = new Array[Byte](44 + dataBytes)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putIntLE(out, 4, 36 + dataBytes)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putIntLE(out, 16, 16) // PCM fmt chunk body size
    putShortLE(out, 20, 1) // linear PCM
    putShortLE(out, 22, channels)
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * channels * 2) // byte rate
    putShortLE(out, 32, channels * 2) // block align
    putShortLE(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putIntLE(out, 40, dataBytes)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val v = sample(f, c)
        require(v >= Short.MinValue && v <= Short.MaxValue, s"sample $v out of 16-bit range")
        putShortLE(out, 44 + 2 * (f * channels + c), v & 0xffff)
        c += 1
      }
      f += 1
    }
    out
  }

  /** Decode linear-PCM WAV to integer amplitude statistics. Walks the
    * chunk stream (skipping unknown chunks, honoring even padding);
    * throws IllegalArgumentException on anything outside linear 8/16-bit
    * PCM — a decode stage must fail loudly rather than mis-sum.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    val l = layout(bytes)
    val nSamples = l.nSamples
    var sum = 0L; var sq = 0L
    var minA = Int.MaxValue; var maxA = Int.MinValue
    var i = 0
    while (i < nSamples) {
      val a = l.sample(bytes, i)
      sum += a
      sq += a.toLong * a
      if (a < minA) minA = a
      if (a > maxA) maxA = a
      i += 1
    }
    if (nSamples == 0) { minA = 0; maxA = 0 }
    Decoded(l.channels, l.sampleRate, l.bits, nSamples.toLong / l.channels,
      sum, sq, minA, maxA)
  }

  /** The validated PCM geometry of a WAV byte stream — the chunk walk
    * shared by [[decode]] and [[segmentTv]], with all its loud failures.
    */
  private final case class PcmLayout(
      channels: Int, sampleRate: Int, bits: Int, dataOff: Int, dataLen: Int) {
    def nSamples: Int = dataLen / (bits / 8)
    def sample(bytes: Array[Byte], i: Int): Int =
      if (bits == 16) getShortLE(bytes, dataOff + 2 * i).toShort.toInt
      else (bytes(dataOff + i) & 0xff) - 128 // 8-bit PCM is unsigned
  }

  private def layout(bytes: Array[Byte]): PcmLayout = {
    require(bytes.length >= 12, s"truncated RIFF header: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a WAV (missing RIFF/WAVE tags)")
    var off = 12
    var fmtSeen = false
    var channels = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length && dataOff < 0) {
      val id = tag(bytes, off)
      val len = getIntLE(bytes, off + 4)
      require(len >= 0 && off.toLong + 8 + len <= bytes.length,
        s"chunk '$id' overruns file (len $len at offset $off)")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too small: $len")
          val audioFormat = getShortLE(bytes, off + 8)
          require(audioFormat == 1, s"unsupported audioFormat $audioFormat (linear PCM only)")
          channels = getShortLE(bytes, off + 10)
          sampleRate = getIntLE(bytes, off + 12)
          bits = getShortLE(bytes, off + 22)
          require(channels > 0, s"bad channel count $channels")
          require(bits == 8 || bits == 16, s"unsupported bitsPerSample $bits")
          fmtSeen = true
        case "data" =>
          require(fmtSeen, "data chunk before fmt chunk")
          dataOff = off + 8
          dataLen = len
        case _ => // LIST, fact, cue, ... — skip
      }
      off += 8 + len + (len & 1) // chunks are padded to even boundaries
    }
    require(fmtSeen, "no fmt chunk")
    require(dataOff >= 0, "no data chunk")
    val bytesPerSample = bits / 8
    require(dataLen % (bytesPerSample * channels) == 0,
      s"data length $dataLen not a whole number of frames")
    PcmLayout(channels, sampleRate, bits, dataOff, dataLen)
  }

  /** Per-segment total variation of a MONO sample stream: the frame axis
    * is cut into `segments` equal slices and each sums |x_i - x_{i-1}|
    * for the differences landing in it (difference i goes to segment
    * i*segments/n). This is the shift-invariant audio fingerprint behind
    * q167: a DC offset cancels in every difference, so re-leveled copies
    * of the same waveform produce identical vectors, while the segment
    * axis keeps enough locality to band-LSH. Integer-exact at any
    * accumulation order. Returns (nFrames, tv).
    */
  def segmentTv(bytes: Array[Byte], segments: Int): (Long, Array[Long]) = {
    require(segments > 0, s"bad segment count $segments")
    val l = layout(bytes)
    require(l.channels == 1,
      s"segmentTv expects mono (mix down first), got ${l.channels} channels")
    val n = l.nSamples
    val out = new Array[Long](segments)
    var prev = 0
    var i = 0
    while (i < n) {
      val a = l.sample(bytes, i)
      if (i > 0) out((i.toLong * segments / n).toInt) += math.abs(a - prev)
      prev = a
      i += 1
    }
    (n.toLong, out)
  }
}
