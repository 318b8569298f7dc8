package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/** Builds a little-endian float32 GeoTIFF byte-by-byte (baseline TIFF +
  * GeoTIFF affine tags + GDAL_NODATA) and reads it back.
  */
class TiffReaderSpec extends SparkSpec {

  // 4x3 slope grid; -9999 = nodata
  private val W = 4; private val H = 3
  private val vals: Array[Float] = Array(
    2.0f, 4.0f, 7.5f, -9999f,
    13.0f, 2.2f, -9999f, 31.0f,
    0.5f, 9.9f, 16.0f, 44.9f)

  private def fixtureBytes: Array[Byte] = {
    val nTags = 13
    val ifdOff = 8
    val ifdSize = 2 + nTags * 12 + 4
    val dataOff = ifdOff + ifdSize            // tag overflow area
    val scaleOff = dataOff                    // 3 doubles
    val tieOff = scaleOff + 24                // 6 doubles
    val nodataOff = tieOff + 48               // ascii
    val nodataStr = "-9999\u0000"
    val stripOff = nodataOff + nodataStr.length
    val total = stripOff + W * H * 4
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0, 0x49.toByte); buf.put(1, 0x49.toByte); buf.putShort(2, 42)
    buf.putInt(4, ifdOff)
    buf.putShort(ifdOff, nTags.toShort)
    var ti = 0
    def tag(id: Int, ttype: Int, count: Int, inlineOrOffset: Int): Unit = {
      val p = ifdOff + 2 + ti * 12
      buf.putShort(p, id.toShort); buf.putShort(p + 2, ttype.toShort)
      buf.putInt(p + 4, count)
      ttype match {
        case 3 if count == 1 => buf.putShort(p + 8, inlineOrOffset.toShort)
        case _ => buf.putInt(p + 8, inlineOrOffset)
      }
      ti += 1
    }
    // ids must be ascending per the spec
    tag(256, 3, 1, W)          // ImageWidth
    tag(257, 3, 1, H)          // ImageLength
    tag(258, 3, 1, 32)         // BitsPerSample
    tag(259, 3, 1, 1)          // Compression = none
    tag(262, 3, 1, 1)          // Photometric
    tag(273, 4, 1, stripOff)   // StripOffsets
    tag(277, 3, 1, 1)          // SamplesPerPixel
    tag(278, 3, 1, H)          // RowsPerStrip (single strip)
    tag(279, 4, 1, W * H * 4)  // StripByteCounts
    tag(339, 3, 1, 3)          // SampleFormat = IEEE float
    tag(33550, 12, 3, scaleOff)  // ModelPixelScale
    tag(33922, 12, 6, tieOff)    // ModelTiepoint
    tag(42113, 2, nodataStr.length, nodataOff) // GDAL_NODATA ascii
    buf.putInt(ifdOff + 2 + nTags * 12, 0) // next IFD = none
    buf.putDouble(scaleOff, 0.5); buf.putDouble(scaleOff + 8, 0.25); buf.putDouble(scaleOff + 16, 0.0)
    // tiepoint: raster (0,0,0) -> model (30.0, -1.0, 0)
    buf.putDouble(tieOff, 0.0); buf.putDouble(tieOff + 8, 0.0); buf.putDouble(tieOff + 16, 0.0)
    buf.putDouble(tieOff + 24, 30.0); buf.putDouble(tieOff + 32, -1.0); buf.putDouble(tieOff + 40, 0.0)
    nodataStr.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => buf.put(nodataOff + i, b) }
    vals.zipWithIndex.foreach { case (v, i) => buf.putFloat(stripOff + i * 4, v) }
    buf.array()
  }

  test("parses header, affine, strip data, GDAL_NODATA") {
    val g = TiffReader.parseBytes(fixtureBytes)
    assert(g.width == W && g.height == H)
    assert(g.pixelScaleX == 0.5 && g.pixelScaleY == 0.25)
    assert(g.originX == 30.0 && g.originY == -1.0)
    assert(g.nodata.contains(-9999.0))
    assert(g.value(0, 0) == 2.0 && g.value(3, 2) == 44.9f.toDouble)
    // pixel centers: area convention, y north-down
    assert(g.centerX(0) == 30.25 && g.centerY(0) == -1.125)
    assert(g.centerX(3) == 31.75 && g.centerY(2) == -1.625)
  }

  test("read() drops nodata rows and quantizes") {
    val path = java.nio.file.Files.createTempFile("fixture", ".tif")
    java.nio.file.Files.write(path, fixtureBytes)
    val all = TiffReader.read(spark, path.toString)
    assert(all.count() == 10) // 12 pixels, 2 nodata
    // quantize to 5: 7.5 -> round(1.5)*5 = 10
    val q = TiffReader.read(spark, path.toString, quantizeStep = Some(5.0))
      .filter(col("px") === 2 && col("py") === 0).head()
    assert(q.getDouble(4) == 10.0)
  }

  test("grid feeds zonal statistics end-to-end (S5 -> A13 path)") {
    val path = java.nio.file.Files.createTempFile("fixture", ".tif")
    java.nio.file.Files.write(path, fixtureBytes)
    val samples = TiffReader.read(spark, path.toString)
      .filter(col("value") =!= -9999.0)
      .select(col("x"), col("y"), col("value"))
    import spark.implicits._
    val g = TiffReader.parseBytes(fixtureBytes)
    // one boundary polygon covering the raster's west half
    val ring = Seq(Seq(
      Seq(30.0, -2.0), Seq(31.0, -2.0), Seq(31.0, -1.0), Seq(30.0, -1.0), Seq(30.0, -2.0)))
    val boundaries = Seq((1L, ring)).toDF("boundary_id", "geom")
    val stats = graft.api.GeoPipeline.zonalSlopeStats(boundaries, samples).head()
    // west half = px 0..1 (centers 30.25, 30.75): values 2,4,13,2.2,0.5,9.9
    assert(stats.getAs[Long]("slope_points_used") == 6)
    assert(stats.getAs[Double]("max_slope") == 13.0)
    assert(stats.getAs[Double]("min_slope") == 0.5)
  }

  test("pixelPolygon reconstructs the cell square in the graft encoding") {
    val g = TiffReader.parseBytes(fixtureBytes)
    val poly = TiffReader.pixelPolygon(g, 1, 1)
    import spark.implicits._
    val df = Seq(Tuple1(poly)).toDF("geom")
    val area = df.select(graft.geo.GeoFunctions.stArea(col("geom"))).head().getDouble(0)
    assert(math.abs(area - 0.125) < 1e-12) // 0.5 x 0.25 cell
    assert(df.select(graft.geo.GeoFunctions.stIsValidPolygon(col("geom"))).head().getBoolean(0))
  }

  test("rejects non-TIFF bytes") {
    intercept[IllegalArgumentException] { TiffReader.parseBytes(Array.fill[Byte](64)(1)) }
  }

  // ---- compressed + tiled ingest (the rasterio.open envelope) ----------

  /** A 61x47 float slope raster with nodata holes — prime-ish dims so
    * strips and 16x16 tiles both clip at the edges.
    */
  private val CW = 61; private val CH = 47
  private def slopeVals: Array[Double] = Array.tabulate(CW * CH) { i =>
    val x = i % CW; val y = i / CW
    if ((x * 7 + y * 11) % 23 == 0) -9999.0
    else ((x * 31 + y * 17) % 97) / 4.0
  }

  private def assertGrid(bytes: Array[Byte]): Unit = {
    val g = TiffReader.parseBytes(bytes)
    assert(g.width == CW && g.height == CH)
    assert(g.nodata.contains(-9999.0))
    val want = slopeVals
    var i = 0
    while (i < want.length) {
      assert(g.values(i) == want(i), s"pixel $i (${i % CW},${i / CW})")
      i += 1
    }
    assert(g.originX == 30.0 && g.originY == -1.0)
  }

  test("LZW strips round-trip (multi-strip, early code-width changes)") {
    assertGrid(TiffWriter.encode(CW, CH, slopeVals,
      TiffWriter.Layout(compression = 5, rowsPerStrip = 6),
      0.5, 0.25, 30.0, -1.0, Some(-9999.0)))
  }

  test("Deflate strips round-trip") {
    assertGrid(TiffWriter.encode(CW, CH, slopeVals,
      TiffWriter.Layout(compression = 8, rowsPerStrip = 11),
      0.5, 0.25, 30.0, -1.0, Some(-9999.0)))
  }

  test("tiled layouts round-trip: edge tiles clip, all compressions") {
    for (comp <- Seq(1, 5, 8, 32773))
      assertGrid(TiffWriter.encode(CW, CH, slopeVals,
        TiffWriter.Layout(compression = comp, tile = Some((16, 16))),
        0.5, 0.25, 30.0, -1.0, Some(-9999.0)))
  }

  test("BigTIFF (magic 43) round-trips: every compression, strips and tiles, predictor") {
    // the same raster through the 64-bit header/IFD/LONG8 layout GDAL
    // emits above 4 GiB — byte-identical grid to the classic encodes
    for (comp <- Seq(1, 5, 8, 32773)) {
      assertGrid(TiffWriter.encode(CW, CH, slopeVals,
        TiffWriter.Layout(compression = comp, rowsPerStrip = 9, bigTiff = true),
        0.5, 0.25, 30.0, -1.0, Some(-9999.0)))
      assertGrid(TiffWriter.encode(CW, CH, slopeVals,
        TiffWriter.Layout(compression = comp, tile = Some((16, 16)), bigTiff = true),
        0.5, 0.25, 30.0, -1.0, Some(-9999.0)))
    }
    // predictor-2 uint16 through the BigTIFF path
    val ints = Array.tabulate(CW * CH)(i => ((i * 37) % 251).toDouble)
    val big = TiffWriter.encode(CW, CH, ints,
      TiffWriter.Layout(compression = 5, predictor = 2, sampleFormat = 1,
        bits = 16, rowsPerStrip = 7, bigTiff = true))
    assert(TiffReader.parseBytes(big).values.toSeq == ints.toSeq)
    // header shape: magic 43, offset bytesize 8, constant 0
    val b = java.nio.ByteBuffer.wrap(big).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(b.getShort(2) == 43 && b.getShort(4) == 8 && b.getShort(6) == 0)
    // and a BigTIFF encode is BYTE-different from classic but value-equal
    val classic = TiffWriter.encode(CW, CH, ints,
      TiffWriter.Layout(compression = 5, predictor = 2, sampleFormat = 1,
        bits = 16, rowsPerStrip = 7))
    assert(!java.util.Arrays.equals(big, classic))
    assert(TiffReader.parseBytes(classic).values.toSeq ==
      TiffReader.parseBytes(big).values.toSeq)
  }

  test("malformed BigTIFF header (offset bytesize != 8) is loud") {
    val big = TiffWriter.encode(4, 3, new Array[Double](12),
      TiffWriter.Layout(bigTiff = true))
    val patched = big.clone()
    java.nio.ByteBuffer.wrap(patched).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(4, 4.toShort)
    val ex = intercept[IllegalArgumentException] { TiffReader.parseBytes(patched) }
    assert(ex.getMessage.contains("BigTIFF"))
  }

  test("ZSTD (50000) round-trips: strips, tiles, BigTIFF, predictor, float and int") {
    // GDAL's modern creation default; frames decode via zstd-jni, the
    // codec every Spark distribution already ships for shuffle/IO
    for (tile <- Seq(None, Some((16, 16))); big <- Seq(false, true))
      assertGrid(TiffWriter.encode(CW, CH, slopeVals,
        TiffWriter.Layout(compression = 50000, tile = tile, rowsPerStrip = 9,
          bigTiff = big),
        0.5, 0.25, 30.0, -1.0, Some(-9999.0)))
    val ints = Array.tabulate(CW * CH)(i => ((i * 37) % 251).toDouble)
    for ((sf, bits) <- Seq((1, 8), (1, 16), (2, 16), (1, 32))) {
      val vals = if (sf == 2) ints.map(_ - 125) else ints
      val enc = TiffWriter.encode(CW, CH, vals,
        TiffWriter.Layout(compression = 50000, predictor = 2, tile = Some((16, 16)),
          sampleFormat = sf, bits = bits))
      assert(TiffReader.parseBytes(enc).values.toSeq == vals.toSeq, s"sf=$sf bits=$bits")
    }
  }

  // Three frames over the same 16 KiB text-like payload, produced by the
  // REFERENCE zstd CLI (level 3, level 19, --no-check) — an encoder
  // independent of zstd-jni, so frame-format interop (Huffman literals,
  // FSE sequences, optional content checksum) is pinned against the
  // canonical implementation, not against the decoder's own sibling.
  private def cliPayload: Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < 400) {
      sb.append(f"the slope raster tile row ${i % 140}%03d with nodata at margin; ")
      i += 1
    }
    sb.toString.getBytes("US-ASCII").take(16384)
  }
  private val CliZstdFrames = Map(
    "level3" -> "KLUv/WQAPwUJAFZQKRqQJWkOALRWof9XZSNlFLsDRLuJiAiRWN0FPS4AIQAZAHQ3JfGsaAJQMAQOYoAcghCHCDAUyOAYBaQtKTAcpCAYhxzFORAHKQgMhAMpBid005TEs6KLpiSeFd0zJfGs6JopiWdFt0xJPCu6ZEriWQX///////////+bknhWdI0piWdFt5iSeFYBd3d3d3dmZmZmZlVVVVVVRERERET//9+2bdv+AYDJqCHw7v8d8DW2AxL4/0cQ+BP4ewd79s9IkkwmSSIhSZJkkkkSSZJMSpIkkUmSRJJUEskkyUiSJJFMkkSSzCSSrNxS5ySSyXgiSSKZCSJJMolBEpJkNpEkSeYEkSRJYkISSZJNTJIkM0FKEklikIwkyaJthQGyCpLOT7I=",
    "level19" -> "KLUv/WQAP10HAPJMIRSQGx4A2rpGrCi7W/SSIqSUSmaaENS8mnhWv+bVxLO6Na8mntWreTXxrP5qXk08q3fzauJZnZtXE8/q27yaeFbX5tXEs3o2ryae1bF5NfGsfs2riWd1a15NPKtX82riWRGQGAQTIOQEFDiBoCRUOMZD/+lRGBoOwyFmcJqAoWFRjoaGwgmAjagRoNv+vwHwNbYDEvj/BIERBP4E/n4GAeOfW0mSkkiQTCKJBxJJMvkgkSSZbwJLkiSygWSSSSKRTJLEgxFJknyQkSTJB5GSJPkgkUmSDySSSfJBIskkH0gkyUSg3sJTWQWSzk+y",
    "nocheck" -> "KLUv/WAAPwUJAFZQKRqQJWkOALRWof9XZSNlFLsDRLuJiAiRWN0FPS4AIQAZAHQ3JfGsaAJQMAQOYoAcghCHCDAUyOAYBaQtKTAcpCAYhxzFORAHKQgMhAMpBid005TEs6KLpiSeFd0zJfGs6JopiWdFt0xJPCu6ZEriWQX///////////+bknhWdI0piWdFt5iSeFYBd3d3d3dmZmZmZlVVVVVVRERERET//9+2bdv+AYDJqCHw7v8d8DW2AxL4/0cQ+BP4ewd79s9IkkwmSSIhSZJkkkkSSZJMSpIkkUmSRJJUEskkyUiSJJFMkkSSzCSSrNxS5ySSyXgiSSKZCSJJMolBEpJkNpEkSeYEkSRJYkISSZJNTJIkM0FKEklikIwkyaJthQGyCg==")

  test("ZSTD frames from the reference CLI implementation decode inside a TIFF") {
    // 16384 payload bytes = one 128x128 uint8 strip: write the raster
    // uncompressed, then swap the strip for the CLI frame and flip the
    // compression tag — the reader must recover the exact payload
    val payload = cliPayload
    val vals = payload.map(b => (b & 0xFF).toDouble)
    val plain = TiffWriter.encode(128, 128, vals,
      TiffWriter.Layout(compression = 1, sampleFormat = 1, bits = 8, rowsPerStrip = 128))
    val b = java.nio.ByteBuffer.wrap(plain).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ifd = b.getInt(4); val n = b.getShort(ifd) & 0xFFFF
    def entry(id: Int): Int =
      (0 until n).map(i => ifd + 2 + i * 12).find(p => (b.getShort(p) & 0xFFFF) == id).get
    val stripOff = b.getInt(entry(273) + 8)
    for ((name, b64) <- CliZstdFrames) {
      val frame = java.util.Base64.getDecoder.decode(b64)
      val patched = java.util.Arrays.copyOf(plain, stripOff + frame.length)
      val pb = java.nio.ByteBuffer.wrap(patched).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      pb.putShort(entry(259) + 8, 50000.toShort) // 0xC350 in the SHORT slot
      pb.putInt(entry(279) + 8, frame.length)
      System.arraycopy(frame, 0, patched, stripOff, frame.length)
      val g = TiffReader.parseBytes(patched)
      assert(g.width == 128 && g.height == 128, name)
      assert(g.values.toSeq == vals.toSeq, s"$name payload mismatch")
    }
  }

  test("corrupt ZSTD segments fail loudly naming the codec") {
    val enc = TiffWriter.encode(CW, CH, slopeVals,
      TiffWriter.Layout(compression = 50000, rowsPerStrip = 47))
    // truncation: the frame header declares more than remains
    val ex1 = intercept[IllegalArgumentException] {
      TiffReader.parseBytes(java.util.Arrays.copyOf(enc, enc.length - 25))
    }
    assert(ex1.getMessage.contains("ZSTD"))
    // bit-flip inside the frame body
    val flipped = enc.clone()
    flipped(flipped.length - 40) = (flipped(flipped.length - 40) ^ 0x55).toByte
    val ex2 = intercept[IllegalArgumentException] { TiffReader.parseBytes(flipped) }
    assert(ex2.getMessage.contains("ZSTD"))
  }

  // ---- JPEG-in-TIFF (compression 7, TechNote 2) ---------------------------

  test("JPEG-in-TIFF from the JDK TIFF writer decodes (independent implementation)") {
    val (w, h) = (61, 47)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 13 + (x * y) % 31) % 256)
    for (tiled <- Seq(false, true)) {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType("JPEG")
      if (tiled) {
        p.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setTiling(16, 16, 0, 0)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      // ground truth = the JDK's own TIFF reader on the same bytes (JPEG
      // is lossy, so agreement is judged decode-vs-decode, never against
      // the pre-compression samples)
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val g = TiffReader.parseBytes(bytes)
      assert(g.width == w && g.height == h, s"tiled=$tiled")
      for (y <- 0 until h; x <- 0 until w)
        assert(g.value(x, y) == jdk.getRaster.getSample(x, y, 0).toDouble,
          s"tiled=$tiled pixel ($x,$y)")
    }
  }

  test("JPEG-in-TIFF with the JPEGTables hoist (tag 347) round-trips and cross-checks") {
    val vals = Array.tabulate(CW * CH)(i => ((i % CW) * 7 + (i / CW) * 13).toDouble % 256)
    def enc(tables: Boolean) = TiffWriter.encode(CW, CH, vals,
      TiffWriter.Layout(compression = 7, sampleFormat = 1, bits = 8,
        tile = Some((16, 16)), jpegTables = tables))
    val hoisted = enc(tables = true)
    val selfContained = enc(tables = false)
    // the hoist is lossless byte plumbing: identical decoded grids
    val gh = TiffReader.parseBytes(hoisted)
    val gs = TiffReader.parseBytes(selfContained)
    assert(gh.values.toSeq == gs.values.toSeq)
    // tag 347 present in the hoisted file, absent otherwise
    def hasTag(bytes: Array[Byte], id: Int): Boolean = {
      val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ifd = b.getInt(4); val n = b.getShort(ifd) & 0xFFFF
      (0 until n).exists(i => (b.getShort(ifd + 2 + i * 12) & 0xFFFF) == id)
    }
    assert(hasTag(hoisted, 347) && !hasTag(selfContained, 347))
    // the hoisted layout is smaller: shared tables paid once, not per tile
    assert(hoisted.length < selfContained.length)
    // independent cross-check: the JDK TIFF reader decodes the hoisted
    // file (its TIFFJPEGDecompressor honors JPEGTables) to the same grid
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(hoisted))
    assert(jdk != null, "JDK ImageIO could not read the JPEGTables tiff")
    for (y <- 0 until CH; x <- 0 until CW)
      assert(gh.value(x, y) == jdk.getRaster.getSample(x, y, 0).toDouble, s"($x,$y)")
  }

  test("JPEG-in-TIFF beyond 8-bit grayscale is a loud failure") {
    intercept[IllegalArgumentException] {
      TiffWriter.encode(4, 3, new Array[Double](12),
        TiffWriter.Layout(compression = 7, sampleFormat = 1, bits = 16))
    }
    // reader side: a valid 8-bit JPEG tiff whose BitsPerSample lies 16
    val ok = TiffWriter.encode(4, 3, Array.fill(12)(9.0),
      TiffWriter.Layout(compression = 7, sampleFormat = 1, bits = 8))
    val b = java.nio.ByteBuffer.wrap(ok).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ifd = b.getInt(4); val n = b.getShort(ifd) & 0xFFFF
    val p = (0 until n).map(i => ifd + 2 + i * 12).find(q => (b.getShort(q) & 0xFFFF) == 258).get
    b.putShort(p + 8, 16.toShort)
    val ex = intercept[IllegalArgumentException] { TiffReader.parseBytes(ok) }
    assert(ex.getMessage.contains("JPEG"))
  }

  test("exotic codecs (WEBP/JPEG2000/LERC) fail loudly BY NAME — the pinned contract") {
    // WEBP (50001) is undefined for single-band rasters (WebP encodes
    // RGB(A) only; GDAL refuses to create a 1-band WEBP TIFF), and
    // JPEG2000/LERC have no independent decoder here to cross-check an
    // implementation against — so the contract is a NAMED failure, and
    // this test pins the name so the gap can never go silent
    for ((code, name) <- Seq(50001 -> "WEBP", 34712 -> "JPEG2000", 34887 -> "LERC")) {
      val ok = TiffWriter.encode(4, 3, Array.fill(12)(9.0),
        TiffWriter.Layout(compression = 5, sampleFormat = 1, bits = 8))
      val b = java.nio.ByteBuffer.wrap(ok).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ifd = b.getInt(4); val n = b.getShort(ifd) & 0xFFFF
      val p = (0 until n).map(i => ifd + 2 + i * 12)
        .find(q => (b.getShort(q) & 0xFFFF) == 259).get
      b.putShort(p + 8, code.toShort) // unsigned-short value slot
      val e = intercept[IllegalArgumentException] { TiffReader.parseBytes(ok) }
      assert(e.getMessage.contains(name), s"code $code must fail naming $name")
    }
  }

  test("horizontal predictor (2) round-trips for u8/u16/s16/u32, strips and tiles") {
    val ints = Array.tabulate(CW * CH)(i => ((i * 37) % 251).toDouble)
    val signed = Array.tabulate(CW * CH)(i => (((i * 37) % 251) - 125).toDouble)
    for {
      comp <- Seq(5, 8, 32773)
      (sf, bits, vals) <- Seq((1, 8, ints), (1, 16, ints), (2, 16, signed), (1, 32, ints))
      tile <- Seq(None, Some((16, 16)))
    } {
      val enc = TiffWriter.encode(CW, CH, vals,
        TiffWriter.Layout(compression = comp, predictor = 2, tile = tile,
          rowsPerStrip = 9, sampleFormat = sf, bits = bits))
      val g = TiffReader.parseBytes(enc)
      assert(g.values.toSeq == vals.toSeq, s"comp=$comp sf=$sf bits=$bits tile=$tile")
    }
  }

  test("LZW decode agrees with the JDK ImageIO TIFF writer (independent implementation)") {
    // big enough to cross the 9->10->11->12-bit widths AND a table reset
    val (w, h) = (200, 150)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 13 + (x * y) % 31) % 256)
    def imageioTiff(compression: String, tiled: Boolean): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(compression)
      if (tiled) {
        p.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setTiling(48, 32, 0, 0)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    for {
      compression <- Seq("LZW", "ZLib", "Deflate", "PackBits")
      tiled <- Seq(false, true)
    } {
      val g = TiffReader.parseBytes(imageioTiff(compression, tiled))
      assert(g.width == w && g.height == h, s"$compression tiled=$tiled")
      for (y <- 0 until h; x <- 0 until w)
        assert(g.value(x, y) == img.getRaster.getSample(x, y, 0).toDouble,
          s"$compression tiled=$tiled pixel ($x,$y)")
    }
  }

  test("LZW encode is readable by the JDK ImageIO TIFF reader (both directions)") {
    val vals = Array.tabulate(CW * CH)(i => ((i * 29 + (i * i) % 41) % 256).toDouble)
    val enc = TiffWriter.encode(CW, CH, vals,
      TiffWriter.Layout(compression = 5, rowsPerStrip = 10, sampleFormat = 1, bits = 8))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img != null, "ImageIO could not read the LZW tiff")
    assert(img.getWidth == CW && img.getHeight == CH)
    for (y <- 0 until CH; x <- 0 until CW)
      assert(img.getRaster.getSample(x, y, 0).toDouble == vals(y * CW + x), s"($x,$y)")
  }

  test("compressed failure paths are loud") {
    val vals = slopeVals
    // unsupported predictor on floats
    intercept[IllegalArgumentException] {
      TiffWriter.encode(CW, CH, vals, TiffWriter.Layout(compression = 5, predictor = 2))
    }
    // truncated deflate segment
    val enc = TiffWriter.encode(CW, CH, vals, TiffWriter.Layout(compression = 8))
    intercept[IllegalArgumentException] {
      TiffReader.parseBytes(java.util.Arrays.copyOf(enc, enc.length - 40))
    }
    // unknown compression tag still rejects loudly, naming the codec
    // (6 = old-style pre-TechNote-2 JPEG, which GDAL also refuses to write)
    val jpegTag = TiffWriter.encode(4, 3, new Array[Double](12))
    val idx = { // find the compression tag and flip it
      val b = java.nio.ByteBuffer.wrap(jpegTag).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ifd = b.getInt(4); val n = b.getShort(ifd) & 0xFFFF
      (0 until n).map(i => ifd + 2 + i * 12).find(p => (b.getShort(p) & 0xFFFF) == 259).get
    }
    java.nio.ByteBuffer.wrap(jpegTag).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(idx + 8, 6.toShort)
    val ex = intercept[IllegalArgumentException] { TiffReader.parseBytes(jpegTag) }
    assert(ex.getMessage.contains("compression") && ex.getMessage.contains("old-JPEG"))
  }
}
