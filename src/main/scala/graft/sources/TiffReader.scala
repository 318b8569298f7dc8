package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** S5 ingest half: a minimal pure-JVM GeoTIFF reader for the slope-raster
  * upload path. The reference reads band 1 with rasterio, masks nodata,
  * optionally quantizes, and polygonizes (SlopeGeoJsonUploadView.py:
  * 195-321); offline there is no GDAL, but baseline TIFF is a public
  * format: little/big-endian header, IFD tag directory, strip-organized
  * sample data, with the GeoTIFF affine carried by ModelPixelScaleTag
  * (33550) + ModelTiepointTag (33922) and nodata by GDAL_NODATA (42113).
  *
  * Scope: single-band rasters (uint8/16/32, int8/16/32, float32/64),
  * strip- OR tile-organized (TileWidth/TileLength/TileOffsets, edge
  * tiles padded per spec), uncompressed, LZW (TIFF variant: MSB-first,
  * early code-width change), Deflate (tags 8/32946), PackBits (32773),
  * ZSTD (50000 — GDAL's modern creation default, decoded via zstd-jni
  * which ships in every Spark distribution) or JPEG (7, TechNote 2 —
  * 8-bit grayscale via the JDK's required ImageIO plugin, with the
  * JPEGTables/347 hoist merged per tile) compressed, with
  * the horizontal-differencing predictor (tag 317 = 2) for integer
  * samples — the envelope `rasterio.open` accepts for real-world slope
  * uploads, which are almost always LZW/Deflate/ZSTD and often tiled
  * (SlopeGeoJsonUploadView.py:205 reads via rasterio/GDAL).
  * Output is the per-pixel grid frame the geo layer consumes
  * (`GeoPipeline.zonalSlopeStats` samples): (px, py, x, y, value) with x/y
  * the pixel-CENTER map coordinates, nodata rows dropped. Connected-region
  * polygonization (rasterio `shapes`) is GDAL-side in the reference and
  * stays at the ingest boundary; the engine's zonal statistics consume
  * point samples, and per-pixel squares reconstruct via [[pixelPolygon]].
  *
  * Driver-side parse like the other upload readers ([[XlsxSource]],
  * [[ShpReader]]): request-payload files, then distributed frames.
  */
object TiffReader {

  final case class Grid(width: Int, height: Int,
      pixelScaleX: Double, pixelScaleY: Double,
      originX: Double, originY: Double,
      nodata: Option[Double], values: Array[Double]) {
    def value(cx: Int, cy: Int): Double = values(cy * width + cx)
    /** Pixel-center map coordinate (GeoTIFF area convention: tiepoint is
      * the outer corner of pixel (0,0); y scale runs north-down).
      */
    def centerX(cx: Int): Double = originX + (cx + 0.5) * pixelScaleX
    def centerY(cy: Int): Double = originY - (cy + 0.5) * pixelScaleY
  }

  def parse(path: String): Grid = parseBytes(Files.readAllBytes(Paths.get(path)))

  def parseBytes(bytes: Array[Byte]): Grid = {
    require(bytes.length >= 8, "tiff too short")
    val order = (bytes(0), bytes(1)) match {
      case (0x49, 0x49) => ByteOrder.LITTLE_ENDIAN
      case (0x4d, 0x4d) => ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("not a TIFF (no II/MM byte-order mark)")
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    // magic 42 = classic TIFF (4-byte offsets, 12-byte IFD entries);
    // magic 43 = BigTIFF (the public Aware Systems/libtiff-4 extension
    // GDAL emits automatically above 4 GiB: 8-byte offsets, 20-byte
    // entries, LONG8/SLONG8/IFD8 value types) — a 100-TB raster store
    // WILL contain these, and `rasterio.open` reads them transparently
    // (SlopeGeoJsonUploadView.py:205)
    val magic = buf.getShort(2)
    require(magic == 42 || magic == 43, s"not a TIFF (magic $magic != 42/43)")
    val big = magic == 43
    if (big) require(buf.getShort(4) == 8 && buf.getShort(6) == 0,
      "malformed BigTIFF header (offset bytesize != 8)")
    val inlineMax = if (big) 8 else 4
    def offsetAt(p: Int): Long =
      if (big) buf.getLong(p) else buf.getInt(p) & 0xFFFFFFFFL
    val ifdOff = (if (big) buf.getLong(8) else buf.getInt(4) & 0xFFFFFFFFL).toInt
    val nTags = (if (big) buf.getLong(ifdOff) else (buf.getShort(ifdOff) & 0xFFFF).toLong).toInt

    // tag id -> (type, count, valueOffsetPos)
    final case class Tag(ttype: Int, count: Int, pos: Int)
    val entrySize = if (big) 20 else 12
    val tags = (0 until nTags).map { i =>
      val p = ifdOff + (if (big) 8 else 2) + i * entrySize
      val count = (if (big) buf.getLong(p + 4) else buf.getInt(p + 4).toLong).toInt
      (buf.getShort(p) & 0xFFFF) ->
        Tag(buf.getShort(p + 2) & 0xFFFF, count, p + (if (big) 12 else 8))
    }.toMap

    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
      case 5 | 10 | 12 | 16 | 17 | 18 => 8
      case t0 => throw new IllegalArgumentException(s"tiff tag type $t0")
    }
    /** All numeric values of a tag (inline when they fit in the entry's
      * value field — 4 bytes classic, 8 BigTIFF).
      */
    def values(tag: Tag): Seq[Double] = {
      val sz = typeSize(tag.ttype)
      val base = (if (sz * tag.count <= inlineMax) tag.pos.toLong else offsetAt(tag.pos)).toInt
      (0 until tag.count).map { i =>
        val p = base + i * sz
        tag.ttype match {
          case 1 | 2 | 7 => (buf.get(p) & 0xFF).toDouble
          case 3 => (buf.getShort(p) & 0xFFFF).toDouble
          case 4 => (buf.getInt(p) & 0xFFFFFFFFL).toDouble
          case 6 => buf.get(p).toDouble
          case 8 => buf.getShort(p).toDouble
          case 9 => buf.getInt(p).toDouble
          case 11 => buf.getFloat(p).toDouble
          case 12 => buf.getDouble(p)
          case 16 | 17 | 18 => buf.getLong(p).toDouble
          case 5 | 10 => buf.getInt(p).toDouble / buf.getInt(p + 4)
        }
      }
    }
    def scalar(id: Int): Option[Double] = tags.get(id).map(t => values(t).head)
    def ascii(id: Int): Option[String] = tags.get(id).map { t =>
      val base = (if (t.count <= inlineMax) t.pos.toLong else offsetAt(t.pos)).toInt
      new String(bytes, base, t.count, "US-ASCII").takeWhile(_ != '\u0000')
    }

    val width = scalar(256).getOrElse(throw new IllegalArgumentException("no ImageWidth")).toInt
    val height = scalar(257).getOrElse(throw new IllegalArgumentException("no ImageLength")).toInt
    val bits = scalar(258).getOrElse(8.0).toInt
    val sampleFormat = scalar(339).getOrElse(1.0).toInt // 1 uint, 2 int, 3 float
    val compression = scalar(259).getOrElse(1.0).toInt
    // unknown codecs fail LOUDLY with the codec named — never silent
    // garbage. ZSTD (50000) decodes via zstd-jni, which ships in every
    // Spark distribution (spark.io.compression.codec=zstd rides the
    // same jar); JPEG (7, TechNote 2) via the JDK's required ImageIO
    // JPEG plugin with the JPEGTables (347) hoist merged back per tile.
    // WEBP (50001) stays a named failure BY CONTRACT, not as debt: WebP
    // encodes 3/4-band RGB(A) only, and GDAL itself refuses to create a
    // 1-band WEBP TIFF — the combination is undefined for the
    // single-band DEM/slope rasters this reader models, so there is no
    // correct decode to implement. JPEG2000 (34712) and LERC (34887)
    // remain named failures: plausible for DEMs but absent from the
    // reference's raster envelope, and no independent decoder exists in
    // this environment to cross-check a from-spec implementation against
    val codecName = Map(2 -> "CCITT-RLE", 6 -> "old-JPEG (pre-TechNote-2)",
      34712 -> "JPEG2000", 50001 -> "WEBP", 34887 -> "LERC")
    require(compression == 1 || compression == 5 || compression == 7 ||
        compression == 8 || compression == 32946 || compression == 32773 ||
        compression == 50000,
      s"unsupported TIFF compression $compression" +
        codecName.get(compression).map(n => s" ($n)").getOrElse("") +
        " (none/LZW/JPEG/Deflate/PackBits/ZSTD only)")
    val predictor = scalar(317).getOrElse(1.0).toInt
    require(predictor == 1 || predictor == 2,
      s"unsupported TIFF predictor $predictor (none/horizontal only)")
    require(predictor == 1 || sampleFormat != 3,
      "horizontal predictor (2) is integer-only; floating-point rasters must use predictor 1")
    require(compression != 7 || (bits == 8 && sampleFormat == 1 && predictor == 1),
      s"JPEG-in-TIFF supports 8-bit unsigned without predictor only " +
        s"(got $bits-bit sf=$sampleFormat predictor=$predictor)")
    val samplesPerPixel = scalar(277).getOrElse(1.0).toInt
    require(samplesPerPixel == 1, s"only single-band rasters supported (spp=$samplesPerPixel)")

    val pixScale = tags.get(33550).map(values).getOrElse(Seq(1.0, 1.0, 0.0))
    val tiepoint = tags.get(33922).map(values).getOrElse(Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    val nodata = ascii(42113).flatMap(s => scala.util.Try(s.trim.toDouble).toOption)

    val bytesPerSample = bits / 8
    val out = new Array[Double](width * height)

    // JPEGTables (347, UNDEFINED bytes): the shared abbreviated table
    // stream GDAL hoists tile DQT/DHT segments into; merged back in
    // front of each tile's scan before the ImageIO decode
    val jpegTables: Option[Array[Byte]] =
      tags.get(347).map(t => values(t).map(_.toInt.toByte).toArray)

    /** One decompressed segment (strip or tile) of `segW` x `segRows`
      * samples, exact expected byte size.
      */
    def decodeSegment(off: Long, byteCount: Option[Long],
        segW: Int, segRows: Int): Array[Byte] = {
      val expected = segW * segRows * bytesPerSample
      // a declared count overrunning the file means truncation: clamp,
      // and let the per-codec exactness requires report it loudly
      val avail = math.max(0L, bytes.length - off)
      val count = math.min(byteCount.getOrElse(avail), avail).toInt
      compression match {
        case 7 =>
          JpegSegments.decodeGray(
            java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + count),
            jpegTables, segW, segRows)
        case 50000 =>
          val seg = new Array[Byte](expected)
          val n = try com.github.luben.zstd.Zstd.decompressByteArray(
              seg, 0, expected, bytes, off.toInt, count)
            catch { case e: com.github.luben.zstd.ZstdException =>
              throw new IllegalArgumentException(
                s"ZSTD segment at $off: ${e.getMessage}", e) }
          require(n == expected, s"ZSTD segment yielded $n of $expected bytes")
          seg
        case 1 =>
          require(count >= expected, s"segment at $off: $count bytes < expected $expected (truncated?)")
          java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + expected)
        case 5 =>
          LzwCodec.decode(bytes, off.toInt, count, expected)
        case 32773 => // PackBits (TIFF 6.0 §9): literal/replicate runs
          val seg = new Array[Byte](expected)
          var in = off.toInt; val end = off.toInt + count
          var at = 0
          while (at < expected && in < end) {
            val n = bytes(in); in += 1
            if (n >= 0) { // n+1 literal bytes
              val take = n + 1
              require(in + take <= end && at + take <= expected,
                "PackBits literal run overruns the segment")
              System.arraycopy(bytes, in, seg, at, take)
              in += take; at += take
            } else if (n != -128) { // repeat next byte 1-n times
              val rep = 1 - n
              require(in < end && at + rep <= expected,
                "PackBits replicate run overruns the segment")
              java.util.Arrays.fill(seg, at, at + rep, bytes(in))
              in += 1; at += rep
            } // -128: no-op per spec
          }
          require(at == expected, s"PackBits segment yielded $at of $expected bytes")
          seg
        case _ =>
          val inf = new java.util.zip.Inflater()
          inf.setInput(bytes, off.toInt, count)
          val seg = new Array[Byte](expected)
          var at = 0
          try {
            while (at < expected && !inf.finished()) {
              val n = inf.inflate(seg, at, expected - at)
              require(n > 0 || !inf.needsInput(), "truncated deflate segment")
              at += n
            }
          } finally inf.end()
          require(at == expected, s"deflate segment yielded $at of $expected bytes")
          seg
      }
    }

    /** Copy a decoded segment into the grid: `segW` samples per segment
      * row, `segRows` rows, destination corner (dx0, dy0); edge tiles
      * clip. Horizontal differencing accumulates per row in the sample's
      * integer domain (mod 2^bits), per spec.
      */
    def fillRegion(seg: Array[Byte], segW: Int, segRows: Int, dx0: Int, dy0: Int): Unit = {
      val sb = ByteBuffer.wrap(seg).order(order)
      val mask = if (bits == 32) 0xFFFFFFFFL else (1L << bits) - 1
      var ry = 0
      while (ry < segRows) {
        var acc = 0L
        var rx = 0
        while (rx < segW) {
          val p = (ry * segW + rx) * bytesPerSample
          val v: Double = (sampleFormat, bits) match {
            case (3, 32) => sb.getFloat(p).toDouble
            case (3, 64) => sb.getDouble(p)
            case (f @ (1 | 2), 8 | 16 | 32) =>
              val raw: Long = bits match {
                case 8 => sb.get(p) & 0xFFL
                case 16 => sb.getShort(p) & 0xFFFFL
                case _ => sb.getInt(p) & 0xFFFFFFFFL
              }
              acc = if (predictor == 2 && rx > 0) (acc + raw) & mask else raw
              if (f == 1) acc.toDouble
              else { // sign-extend
                val signBit = 1L << (bits - 1)
                (if ((acc & signBit) != 0) acc - (1L << bits) else acc).toDouble
              }
            case (f, b) => throw new IllegalArgumentException(s"unsupported sample format $f/$b-bit")
          }
          val x = dx0 + rx; val y = dy0 + ry
          if (x < width && y < height) out(y * width + x) = v
          rx += 1
        }
        ry += 1
      }
    }

    if (tags.contains(322)) { // tile-organized
      val tileW = scalar(322).get.toInt
      val tileH = scalar(323).getOrElse(
        throw new IllegalArgumentException("TileWidth without TileLength")).toInt
      val tileOffsets = values(tags.getOrElse(324,
        throw new IllegalArgumentException("tiled TIFF without TileOffsets"))).map(_.toLong)
      val tileCounts = tags.get(325).map(t => values(t).map(_.toLong))
      val across = (width + tileW - 1) / tileW
      val down = (height + tileH - 1) / tileH
      require(tileOffsets.length >= across * down,
        s"tiled TIFF declares ${tileOffsets.length} tiles, grid needs ${across * down}")
      var ti = 0
      while (ti < across * down) {
        val seg = decodeSegment(tileOffsets(ti), tileCounts.map(_(ti)), tileW, tileH)
        fillRegion(seg, tileW, tileH, (ti % across) * tileW, (ti / across) * tileH)
        ti += 1
      }
    } else { // strip-organized
      val stripOffsets = values(tags(273)).map(_.toLong)
      val rowsPerStrip = scalar(278).getOrElse(height.toDouble).toInt
      val stripCounts = tags.get(279).map(t => values(t).map(_.toLong))
      var s = 0
      while (s * rowsPerStrip < height) {
        val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
        val seg = decodeSegment(stripOffsets(s), stripCounts.map(_(s)), width, rows)
        fillRegion(seg, width, rows, 0, s * rowsPerStrip)
        s += 1
      }
    }
    // tiepoint maps raster (i,j,k) -> model (x,y,z): origin = model point of
    // raster (0,0) shifted back by the tied raster coordinate
    val originX = tiepoint(3) - tiepoint(0) * pixScale(0)
    val originY = tiepoint(4) + tiepoint(1) * pixScale(1)
    Grid(width, height, pixScale(0), pixScale(1), originX, originY, nodata, out)
  }

  private val schema = StructType(Seq(
    StructField("px", IntegerType, nullable = false),
    StructField("py", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** The raster as the point-sample frame `GeoPipeline.zonalSlopeStats`
    * consumes: one row per VALID pixel (nodata + non-finite masked out, the
    * reference's `mask_valid`), optional value quantization
    * (`round(v / step) * step`, SlopeGeoJsonUploadView.py:234-236).
    */
  def read(spark: SparkSession, path: String,
      quantizeStep: Option[Double] = None): DataFrame = {
    val g = parse(path)
    val rows = for {
      py <- 0 until g.height
      px <- 0 until g.width
      v0 = g.value(px, py)
      if java.lang.Double.isFinite(v0) && !g.nodata.contains(v0)
      v = quantizeStep.filter(_ > 0).map(q => math.round(v0 / q) * q).getOrElse(v0)
    } yield Row(px, py, g.centerX(px), g.centerY(py), v)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, math.max(1, rows.size / 100000)), schema)
  }

  /** Per-pixel square polygon in the graft geometry encoding (ring of 5
    * points, closed) — reconstructs the polygon-feature view of a raster
    * cell for the GeoJSON sink / contains / area operators.
    */
  def pixelPolygon(grid: Grid, px: Int, py: Int): Seq[Seq[Seq[Double]]] = {
    val x0 = grid.originX + px * grid.pixelScaleX
    val x1 = x0 + grid.pixelScaleX
    val y0 = grid.originY - py * grid.pixelScaleY
    val y1 = y0 - grid.pixelScaleY
    Seq(Seq(Seq(x0, y1), Seq(x1, y1), Seq(x1, y0), Seq(x0, y0), Seq(x0, y1)))
  }
}
