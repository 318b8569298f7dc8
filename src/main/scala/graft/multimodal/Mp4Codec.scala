package graft.multimodal

/** Pure-JVM MP4 (ISO-BMFF, ISO/IEC 14496-12) video codec — the box-tree
  * sibling of [[AviCodec]]'s RIFF chunk walk, closing the container gap
  * the verdict named: production video corpora are overwhelmingly MP4.
  * Scope: one video track in the two flavors the sandbox can close
  * end-to-end (the DIB/MJPG split, translated):
  *
  *  - `raw ` (uncompressed): each sample is one TOP-DOWN interleaved
  *    24-bit RGB frame with NO row padding (stride = 3·width — the
  *    QuickTime 'raw ' layout, deliberately DIFFERENT from DIB's
  *    bottom-up padded BGR so the two walkers cannot be confused).
  *    Fully closed-form decodable — the near-dup oracle row runs here.
  *  - `jpeg` (Motion JPEG in MP4): each sample is a standalone JPEG,
  *    decoded through [[ImageIoCodec]] — real entropy decoding, lossy,
  *    so spec-verified rather than oracled (the MJPG discipline).
  *
  * Container facts the walker honors (and the spec exercises):
  *  - boxes are `u32 size (BIG-endian) + fourcc + body`; size 1 means a
  *    64-bit `largesize` follows; size 0 means "to end of file" — a
  *    fixed-offset reader is wrong on real files;
  *  - sample LOCATION is indirected through the stbl tables: `stsz`
  *    (per-sample sizes, or one uniform size), `stco`/`co64` (absolute
  *    chunk offsets — samples need not live in this file's `mdat`),
  *    and `stsc` (run-length chunk→samples-per-chunk map whose entries
  *    hold until the next first_chunk) — frame extraction is a table
  *    join, not a linear scan;
  *  - top-level box order is free (`moov` before or after `mdat`), and
  *    unknown boxes (`free`, `udta`, ...) must be skipped by size.
  */
object Mp4Codec {

  final case class Mp4Info(
      width: Int,
      height: Int,
      nFrames: Int,
      timescale: Int,
      sampleDelta: Int,
      /** stsd sample-entry fourcc: "raw " or "jpeg" here. */
      handler: String)

  // ---- big-endian primitives (ISO-BMFF, unlike RIFF, is BE) ------------

  private def putIntBE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte
    b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }

  private def putShortBE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 8) & 0xff).toByte
    b(off + 1) = (v & 0xff).toByte
  }

  private def getIntBE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def getLongBE(b: Array[Byte], off: Int): Long =
    ((getIntBE(b, off) & 0xffffffffL) << 32) | (getIntBE(b, off + 4) & 0xffffffffL)

  private def getShortBE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def putTag(b: Array[Byte], off: Int, t: String): Unit = {
    require(t.length == 4, s"fourcc must be 4 chars: '$t'")
    var i = 0
    while (i < 4) { b(off + i) = t.charAt(i).toByte; i += 1 }
  }

  /** Byte size of one 'raw ' frame (top-down unpadded 24-bit RGB). */
  def rawFrameSize(width: Int, height: Int): Int = 3 * width * height

  /** Encode one 'raw ' frame body from an `rgb(x, y)` = packed 0xRRGGBB
    * accessor in image orientation (top-down, no padding).
    */
  def encodeRawFrame(width: Int, height: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val out = new Array[Byte](rawFrameSize(width, height))
    var y = 0
    while (y < height) {
      val rowOff = 3 * width * y
      var x = 0
      while (x < width) {
        val p = rgb(x, y)
        val off = rowOff + 3 * x
        out(off) = ((p >> 16) & 0xff).toByte
        out(off + 1) = ((p >> 8) & 0xff).toByte
        out(off + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Assemble a single-video-track MP4 (ftyp + mdat + moov) from
    * pre-encoded sample bodies. `handler` selects the flavor: "raw "
    * expects [[encodeRawFrame]] bodies, "jpeg" expects standalone JPEG
    * payloads. `samplesPerChunk` > 1 groups samples into chunks so the
    * stsc run-length map is a real map (a trailing partial chunk gets
    * its own stsc entry) — the walker's table join is exercised by
    * construction, not just by the spec's hand-built fixtures.
    */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]],
      handler: String = "raw ", samplesPerChunk: Int = 3,
      timescale: Int = 25, sampleDelta: Int = 1): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(frames.nonEmpty, "an MP4 needs at least one sample")
    require(handler == "raw " || handler == "jpeg", s"unsupported handler '$handler'")
    require(samplesPerChunk >= 1, s"bad samplesPerChunk: $samplesPerChunk")
    val n = frames.length
    val payload = frames.map(_.length).sum
    val ftypSize = 24
    val mdatSize = 8 + payload
    // chunk layout: ceil(n / spc) chunks, last possibly partial
    val nChunks = (n + samplesPerChunk - 1) / samplesPerChunk
    val lastChunkSamples = n - (nChunks - 1) * samplesPerChunk
    val stscEntries = if (nChunks > 1 && lastChunkSamples != samplesPerChunk) 2 else 1
    // table box sizes
    val stsdSize = 8 + 8 + 86
    val sttsSize = 24
    val stscSize = 16 + 12 * stscEntries
    val stszSize = 20 + 4 * n
    val stcoSize = 16 + 4 * nChunks
    val stblSize = 8 + stsdSize + sttsSize + stscSize + stszSize + stcoSize
    val vmhdSize = 20
    val dinfSize = 8 + 28 // dref(url )
    val minfSize = 8 + vmhdSize + dinfSize + stblSize
    val mdhdSize = 32
    val hdlrSize = 33 // 1-byte NUL name
    val mdiaSize = 8 + mdhdSize + hdlrSize + minfSize
    val tkhdSize = 92
    val trakSize = 8 + tkhdSize + mdiaSize
    val mvhdSize = 108
    val moovSize = 8 + mvhdSize + trakSize
    val out = new Array[Byte](ftypSize + mdatSize + moovSize)
    var o = 0
    // ftyp
    putIntBE(out, o, ftypSize); putTag(out, o + 4, "ftyp")
    putTag(out, o + 8, "isom"); putIntBE(out, o + 12, 0x200)
    putTag(out, o + 16, "isom"); putTag(out, o + 20, "mp41")
    o += ftypSize
    // mdat (before moov: chunk offsets depend only on ftyp+mdat layout)
    putIntBE(out, o, mdatSize); putTag(out, o + 4, "mdat")
    o += 8
    val chunkOffsets = new Array[Int](nChunks)
    var ci = 0; var si = 0
    while (si < n) {
      if (si % samplesPerChunk == 0) { chunkOffsets(ci) = o; ci += 1 }
      System.arraycopy(frames(si), 0, out, o, frames(si).length)
      o += frames(si).length
      si += 1
    }
    val duration = n * sampleDelta
    // moov
    putIntBE(out, o, moovSize); putTag(out, o + 4, "moov"); o += 8
    // mvhd
    putIntBE(out, o, mvhdSize); putTag(out, o + 4, "mvhd"); o += 8
    o += 4 // version/flags = 0
    o += 8 // creation/modification
    putIntBE(out, o, timescale); putIntBE(out, o + 4, duration); o += 8
    putIntBE(out, o, 0x00010000) // rate 1.0
    putShortBE(out, o + 4, 0x0100) // volume 1.0
    o += 4 + 2 + 2 + 8 // rate volume reserved reserved2
    putIntBE(out, o, 0x00010000); putIntBE(out, o + 16, 0x00010000)
    putIntBE(out, o + 32, 0x40000000) // identity matrix
    o += 36 + 24 // matrix + predefined
    putIntBE(out, o, 2); o += 4 // next_track_id
    // trak
    putIntBE(out, o, trakSize); putTag(out, o + 4, "trak"); o += 8
    // tkhd (flags 7: enabled | in_movie | in_preview)
    putIntBE(out, o, tkhdSize); putTag(out, o + 4, "tkhd"); o += 8
    putIntBE(out, o, 7); o += 4 // version 0, flags 7
    o += 8 // creation/modification
    putIntBE(out, o, 1); o += 4 // track_id
    o += 4 // reserved
    putIntBE(out, o, duration); o += 4
    o += 8 + 2 + 2 + 2 + 2 // reserved layer altgroup volume reserved
    putIntBE(out, o, 0x00010000); putIntBE(out, o + 16, 0x00010000)
    putIntBE(out, o + 32, 0x40000000)
    o += 36
    putIntBE(out, o, width << 16); putIntBE(out, o + 4, height << 16) // 16.16
    o += 8
    // mdia
    putIntBE(out, o, mdiaSize); putTag(out, o + 4, "mdia"); o += 8
    // mdhd
    putIntBE(out, o, mdhdSize); putTag(out, o + 4, "mdhd"); o += 8
    o += 4 + 8 // version/flags creation/modification
    putIntBE(out, o, timescale); putIntBE(out, o + 4, duration); o += 8
    putShortBE(out, o, 0x55c4) // language 'und'
    o += 2 + 2
    // hdlr
    putIntBE(out, o, hdlrSize); putTag(out, o + 4, "hdlr"); o += 8
    o += 4 + 4 // version/flags predefined
    putTag(out, o, "vide"); o += 4
    o += 12 + 1 // reserved + empty NUL-terminated name
    // minf
    putIntBE(out, o, minfSize); putTag(out, o + 4, "minf"); o += 8
    // vmhd (flags 1)
    putIntBE(out, o, vmhdSize); putTag(out, o + 4, "vmhd"); o += 8
    putIntBE(out, o, 1); o += 4 + 8 // graphicsmode + opcolor
    // dinf > dref > url (flags 1: data in this file)
    putIntBE(out, o, dinfSize); putTag(out, o + 4, "dinf"); o += 8
    putIntBE(out, o, 28); putTag(out, o + 4, "dref"); o += 8
    o += 4 // version/flags
    putIntBE(out, o, 1); o += 4 // entry_count
    putIntBE(out, o, 12); putTag(out, o + 4, "url "); putIntBE(out, o + 8, 1)
    o += 12
    // stbl
    putIntBE(out, o, stblSize); putTag(out, o + 4, "stbl"); o += 8
    // stsd + VisualSampleEntry
    putIntBE(out, o, stsdSize); putTag(out, o + 4, "stsd"); o += 8
    o += 4 // version/flags
    putIntBE(out, o, 1); o += 4 // entry_count
    putIntBE(out, o, 86); putTag(out, o + 4, handler); o += 8
    o += 6 // reserved
    putShortBE(out, o, 1); o += 2 // data_reference_index
    o += 16 // predefined/reserved
    putShortBE(out, o, width); putShortBE(out, o + 2, height); o += 4
    putIntBE(out, o, 0x00480000); putIntBE(out, o + 4, 0x00480000) // 72 dpi
    o += 8 + 4 // resolutions + reserved
    putShortBE(out, o, 1); o += 2 // frame_count per sample
    o += 32 // compressorname (zeroed pascal string)
    putShortBE(out, o, 24); o += 2 // depth
    putShortBE(out, o, 0xffff); o += 2 // pre_defined = -1
    // stts: one run (n samples, constant delta)
    putIntBE(out, o, sttsSize); putTag(out, o + 4, "stts"); o += 8
    o += 4
    putIntBE(out, o, 1); putIntBE(out, o + 4, n); putIntBE(out, o + 8, sampleDelta)
    o += 12
    // stsc
    putIntBE(out, o, stscSize); putTag(out, o + 4, "stsc"); o += 8
    o += 4
    putIntBE(out, o, stscEntries); o += 4
    putIntBE(out, o, 1); putIntBE(out, o + 4, samplesPerChunk)
    putIntBE(out, o + 8, 1); o += 12
    if (stscEntries == 2) {
      putIntBE(out, o, nChunks); putIntBE(out, o + 4, lastChunkSamples)
      putIntBE(out, o + 8, 1); o += 12
    }
    // stsz: per-sample sizes
    putIntBE(out, o, stszSize); putTag(out, o + 4, "stsz"); o += 8
    o += 4 + 4 // version/flags + sample_size=0 (per-sample table follows)
    putIntBE(out, o, n); o += 4
    var i = 0
    while (i < n) { putIntBE(out, o, frames(i).length); o += 4; i += 1 }
    // stco
    putIntBE(out, o, stcoSize); putTag(out, o + 4, "stco"); o += 8
    o += 4
    putIntBE(out, o, nChunks); o += 4
    i = 0
    while (i < nChunks) { putIntBE(out, o, chunkOffsets(i)); o += 4; i += 1 }
    require(o == out.length, s"encoder layout bug: wrote $o of ${out.length}")
    out
  }

  // ---- decoder: generic box walk + sample-table join -------------------

  /** (bodyStart, bodyEnd) of the first child box named `name` inside
    * [from, to), skipping unknown boxes by size; -1s if absent.
    */
  private def findBox(bytes: Array[Byte], from: Long, to: Long,
      name: String): (Long, Long) = {
    var o = from
    while (o + 8 <= to) {
      val size32 = getIntBE(bytes, o.toInt) & 0xffffffffL
      val t = tag(bytes, o.toInt + 4)
      val (bodyStart, boxEnd) =
        if (size32 == 1L) {
          require(o + 16 <= to, s"truncated largesize box '$t' at $o")
          (o + 16, o + getLongBE(bytes, o.toInt + 8))
        } else if (size32 == 0L) (o + 8, to)
        else (o + 8, o + size32)
      require(boxEnd > o && boxEnd <= to,
        s"box '$t' overruns its container (end $boxEnd of $to, offset $o)")
      if (t == name) return (bodyStart, boxEnd)
      o = boxEnd
    }
    (-1L, -1L)
  }

  private def requireBox(bytes: Array[Byte], from: Long, to: Long,
      name: String): (Long, Long) = {
    val r = findBox(bytes, from, to, name)
    require(r._1 >= 0, s"missing required box '$name'")
    r
  }

  /** Descend moov -> (first trak whose hdlr is 'vide') -> mdia bounds.
    * Timing (mdhd) and sample tables (stbl) must both come from THIS
    * trak — an MP4 whose first track is audio has a different mdhd
    * timescale there.
    */
  private def videoMdia(bytes: Array[Byte]): (Long, Long) = {
    require(bytes.length >= 8, s"truncated MP4: ${bytes.length} bytes")
    val (ftypS, _) = findBox(bytes, 0, bytes.length, "ftyp")
    require(ftypS >= 0, "not an MP4 (missing ftyp)")
    val (moovS, moovE) = requireBox(bytes, 0, bytes.length, "moov")
    var o = moovS
    while (o + 8 <= moovE) {
      val (trakS, trakE) = findBox(bytes, o, moovE, "trak")
      if (trakS < 0)
        throw new IllegalArgumentException("no video ('vide' hdlr) track")
      val (mdiaS, mdiaE) = requireBox(bytes, trakS, trakE, "mdia")
      val (hdlrS, _) = requireBox(bytes, mdiaS, mdiaE, "hdlr")
      if (tag(bytes, hdlrS.toInt + 8) == "vide") return (mdiaS, mdiaE)
      o = trakE
    }
    throw new IllegalArgumentException("no video ('vide' hdlr) track")
  }

  /** Descend to the vide trak's stbl (sample tables). */
  private def videoStbl(bytes: Array[Byte]): (Long, Long) = {
    val (mdiaS, mdiaE) = videoMdia(bytes)
    val (minfS, minfE) = requireBox(bytes, mdiaS, mdiaE, "minf")
    requireBox(bytes, minfS, minfE, "stbl")
  }

  /** Walk the box tree to the container facts. Fails loudly on anything
    * outside the supported profile.
    */
  def info(bytes: Array[Byte]): Mp4Info = {
    val (mdiaS, mdiaE) = videoMdia(bytes)
    val (minfS, minfE) = requireBox(bytes, mdiaS, mdiaE, "minf")
    val (stblS, stblE) = requireBox(bytes, minfS, minfE, "stbl")
    val (stsdS, _) = requireBox(bytes, stblS, stblE, "stsd")
    require(getIntBE(bytes, stsdS.toInt + 4) >= 1, "empty stsd")
    val entry = stsdS.toInt + 8
    val handler = tag(bytes, entry + 4)
    val width = getShortBE(bytes, entry + 32)
    val height = getShortBE(bytes, entry + 34)
    val (stszS, _) = requireBox(bytes, stblS, stblE, "stsz")
    val nFrames = getIntBE(bytes, stszS.toInt + 8)
    // timescale/delta from the SAME vide trak's mdhd/stts — an MP4 whose
    // first track is audio must not donate its timing to the video dims
    val (mdhdS, _) = requireBox(bytes, mdiaS, mdiaE, "mdhd")
    val timescale = getIntBE(bytes, mdhdS.toInt + 12)
    val (sttsS, _) = requireBox(bytes, stblS, stblE, "stts")
    val sampleDelta =
      if (getIntBE(bytes, sttsS.toInt + 4) >= 1) getIntBE(bytes, sttsS.toInt + 12)
      else 0
    require(width > 0 && height > 0 && nFrames > 0,
      s"no usable video track (dims ${width}x$height, samples $nFrames)")
    Mp4Info(width, height, nFrames, timescale, sampleDelta, handler)
  }

  /** Extract sample payloads in track order by JOINING the stbl tables:
    * stsc expands to samples-per-chunk runs, stco/co64 give each chunk's
    * absolute offset, stsz sizes consecutive samples within a chunk.
    */
  def frames(bytes: Array[Byte]): Vector[Array[Byte]] = {
    val (stblS, stblE) = videoStbl(bytes)
    val (stszS, _) = requireBox(bytes, stblS, stblE, "stsz")
    val uniform = getIntBE(bytes, stszS.toInt + 4)
    val n = getIntBE(bytes, stszS.toInt + 8)
    val sizes = Array.tabulate(n)(i =>
      if (uniform != 0) uniform else getIntBE(bytes, stszS.toInt + 12 + 4 * i))
    val (stscS, _) = requireBox(bytes, stblS, stblE, "stsc")
    val nStsc = getIntBE(bytes, stscS.toInt + 4)
    val stsc = Array.tabulate(nStsc) { i =>
      val e = stscS.toInt + 8 + 12 * i
      (getIntBE(bytes, e), getIntBE(bytes, e + 4)) // (first_chunk, samples)
    }
    val (stcoS, _) = findBox(bytes, stblS, stblE, "stco")
    val (chunkCount, chunkOff) =
      if (stcoS >= 0)
        (getIntBE(bytes, stcoS.toInt + 4),
          (i: Int) => getIntBE(bytes, stcoS.toInt + 8 + 4 * i) & 0xffffffffL)
      else {
        val (co64S, _) = requireBox(bytes, stblS, stblE, "co64")
        (getIntBE(bytes, co64S.toInt + 4),
          (i: Int) => getLongBE(bytes, co64S.toInt + 8 + 8 * i))
      }
    val out = Vector.newBuilder[Array[Byte]]
    var sample = 0
    var c = 0
    while (c < chunkCount && sample < n) {
      // stsc entry in effect for 1-based chunk c+1: last whose first_chunk <= c+1
      var e = 0
      while (e + 1 < nStsc && stsc(e + 1)._1 <= c + 1) e += 1
      val inChunk = stsc(e)._2
      var off = chunkOff(c)
      var s = 0
      while (s < inChunk && sample < n) {
        val sz = sizes(sample)
        require(off + sz <= bytes.length,
          s"sample $sample overruns the buffer (offset $off size $sz)")
        val f = new Array[Byte](sz)
        System.arraycopy(bytes, off.toInt, f, 0, sz)
        out += f
        off += sz
        sample += 1
        s += 1
      }
      c += 1
    }
    require(sample == n,
      s"sample tables inconsistent: stsz says $n samples, chunks yield $sample")
    out.result()
  }

  /** Box-pooled milli-luma sums of one 'raw ' frame — the
    * [[ImageIoCodec.boxSums]] pooling over the top-down unpadded RGB
    * layout. Integer-exact, so the near-dup oracle recomputes it in
    * closed form.
    */
  def rawBoxSums(frame: Array[Byte], width: Int, height: Int,
      grid: Int): Array[Long] = {
    require(frame.length >= rawFrameSize(width, height),
      s"truncated raw frame: need ${rawFrameSize(width, height)}, have ${frame.length}")
    val sums = new Array[Long](grid * grid)
    var y = 0
    while (y < height) {
      val rowOff = 3 * width * y
      val gy = y * grid / height
      var x = 0
      while (x < width) {
        val off = rowOff + 3 * x
        val r = frame(off) & 0xff
        val g = frame(off + 1) & 0xff
        val b = frame(off + 2) & 0xff
        sums(gy * grid + x * grid / width) += 299L * r + 587L * g + 114L * b
        x += 1
      }
      y += 1
    }
    sums
  }
}
