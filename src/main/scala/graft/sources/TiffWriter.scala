package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Single-band GeoTIFF ENCODER — the synthesis side of [[TiffReader]]:
  * byte-level fixtures for the compressed/tiled ingest paths and the
  * closed-form raster queries build their inputs here (the
  * WarcCodec/Mp4Codec discipline: the engine carries both directions so
  * oracles can predict every fact without parsing a byte). Little-endian
  * baseline TIFF; strip- or tile-organized; compression none (1),
  * TIFF-LZW (5, [[LzwCodec]]), Deflate (8) or PackBits (32773);
  * horizontal-differencing
  * predictor (317=2) for integer samples; GeoTIFF affine
  * (ModelPixelScale + ModelTiepoint) and GDAL_NODATA.
  */
object TiffWriter {

  /** PackBits (TIFF 6.0 §9): greedy — byte runs of >= 2 become replicate
    * records, everything else literal records of up to 128 bytes.
    */
  private def packBits(data: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](data.length + data.length / 128 + 1)
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out += (1 - run).toByte; out += data(i)
        i += run
      } else {
        var lit = 1
        while (i + lit < data.length && lit < 128 &&
            !(i + lit + 1 < data.length && data(i + lit) == data(i + lit + 1))) lit += 1
        out += (lit - 1).toByte
        var j = 0
        while (j < lit) { out += data(i + j); j += 1 }
        i += lit
      }
    }
    out.toArray
  }

  final case class Layout(
      compression: Int = 1, // 1 none, 5 LZW, 7 JPEG, 8 deflate, 32773 PackBits, 50000 ZSTD
      predictor: Int = 1, // 1 none, 2 horizontal (integer only)
      tile: Option[(Int, Int)] = None, // (tileW, tileH); None = strips
      rowsPerStrip: Int = Int.MaxValue,
      sampleFormat: Int = 3, // 1 uint, 2 int, 3 float
      bits: Int = 32,
      // BigTIFF (magic 43): 8-byte offsets, 20-byte IFD entries, LONG8
      // segment offset/count tags — the layout GDAL switches to above
      // 4 GiB, emitted here at any size so the reader's 64-bit paths are
      // byte-tested without a 4 GiB fixture
      bigTiff: Boolean = false,
      // compression 7 only: hoist the (identical) DQT/DHT marker segments
      // out of every tile stream into a shared JPEGTables field (tag 347)
      // — GDAL's default JPEG-in-TIFF layout; false emits self-contained
      // interchange streams per segment (the JDK TIFF writer's layout)
      jpegTables: Boolean = false)

  /** Encode `values` (row-major, width*height) under `layout` with the
    * GeoTIFF affine (pixel sizes + origin at the outer corner of pixel
    * (0,0), y running north-down) and optional nodata.
    */
  def encode(width: Int, height: Int, values: Array[Double],
      layout: Layout = Layout(),
      pixelScaleX: Double = 1.0, pixelScaleY: Double = 1.0,
      originX: Double = 0.0, originY: Double = 0.0,
      nodata: Option[Double] = None): Array[Byte] = {
    require(values.length == width * height,
      s"values ${values.length} != $width x $height")
    require(Seq(1, 5, 7, 8, 32773, 50000).contains(layout.compression),
      s"compression ${layout.compression}")
    require(layout.predictor == 1 || layout.predictor == 2, s"predictor ${layout.predictor}")
    require(layout.predictor == 1 || layout.sampleFormat != 3,
      "horizontal predictor is integer-only")
    require(layout.compression != 7 ||
        (layout.bits == 8 && layout.sampleFormat == 1 && layout.predictor == 1),
      "JPEG-in-TIFF: 8-bit unsigned, no predictor (JPEG is its own transform)")
    val bps = layout.bits / 8

    /** One segment's samples (row-major segW x rows), differenced and
      * packed little-endian, then compressed.
      */
    def segment(segW: Int, rows: Int, sample: (Int, Int) => Double): Array[Byte] = {
      val raw = ByteBuffer.allocate(segW * rows * bps).order(ByteOrder.LITTLE_ENDIAN)
      val mask = if (layout.bits == 32) 0xFFFFFFFFL else (1L << layout.bits) - 1
      var ry = 0
      while (ry < rows) {
        var prev = 0L
        var rx = 0
        while (rx < segW) {
          val v = sample(rx, ry)
          (layout.sampleFormat, layout.bits) match {
            case (3, 32) => raw.putFloat(v.toFloat)
            case (3, 64) => raw.putDouble(v)
            case (_, b) =>
              val iv = v.toLong & mask
              val stored = if (layout.predictor == 2 && rx > 0) (iv - prev) & mask else iv
              prev = iv
              b match {
                case 8 => raw.put(stored.toByte)
                case 16 => raw.putShort(stored.toShort)
                case 32 => raw.putInt(stored.toInt)
                case bad => throw new IllegalArgumentException(s"bits $bad")
              }
          }
          rx += 1
        }
        ry += 1
      }
      layout.compression match {
        case 1 => raw.array()
        case 5 => LzwCodec.encode(raw.array())
        case 32773 => packBits(raw.array())
        case 7 => JpegSegments.encodeGray(raw.array(), segW, rows)
        case 50000 =>
          // standard zstd frames per segment, exactly what GDAL's
          // COMPRESS=ZSTD writes; level 9 = GDAL's ZSTD_LEVEL default.
          // zstd-jni ships in every Spark distribution (spark.io
          // .compression.codec=zstd rides the same jar), so the codec
          // is on the classpath of any cluster this library runs on
          com.github.luben.zstd.Zstd.compress(raw.array(), 9)
        case 8 =>
          val d = new java.util.zip.Deflater()
          d.setInput(raw.array()); d.finish()
          val buf = new Array[Byte](raw.array().length + 64)
          val out = new ArrayBuffer[Byte]()
          while (!d.finished()) {
            val n = d.deflate(buf)
            out ++= buf.take(n)
          }
          d.end()
          out.toArray
      }
    }

    // build all segments
    val (rawSegments, segTags): (Seq[Array[Byte]], Seq[(Int, Seq[Long])]) =
      layout.tile match {
        case Some((tw, th)) =>
          val across = (width + tw - 1) / tw
          val down = (height + th - 1) / th
          val segs = for {
            ty <- 0 until down
            tx <- 0 until across
          } yield segment(tw, th, (rx, ry) => {
            val x = tx * tw + rx; val y = ty * th + ry
            if (x < width && y < height) values(y * width + x) else 0.0
          })
          (segs, Seq(322 -> Seq(tw.toLong), 323 -> Seq(th.toLong)))
        case None =>
          val rps = math.min(layout.rowsPerStrip, height)
          val nStrips = (height + rps - 1) / rps
          val segs = (0 until nStrips).map { s =>
            val rows = math.min(rps, height - s * rps)
            segment(width, rows, (rx, ry) => values((s * rps + ry) * width + rx))
          }
          (segs, Seq(278 -> Seq(rps.toLong)))
      }

    // GDAL's JPEGTables layout: every tile's DQT/DHT hoists into ONE
    // shared abbreviated table stream (tag 347), tiles become
    // abbreviated image streams. The hoist is only sound when the
    // tables are identical across tiles (they are: one encoder, fixed
    // quality) — enforced, never assumed
    val (segments, jpegTablesStream): (Seq[Array[Byte]], Option[Array[Byte]]) =
      if (layout.compression == 7 && layout.jpegTables) {
        val split = rawSegments.map(JpegSegments.splitTables)
        val tables = split.head._1
        require(split.forall(s => java.util.Arrays.equals(s._1, tables)),
          "JPEG tile streams carry differing DQT/DHT tables; cannot hoist into JPEGTables")
        (split.map(_._2), Some(tables))
      } else (rawSegments, None)

    // assemble: header + IFD + overflow values + segment data
    final case class T(id: Int, ttype: Int, vals: Seq[Long], dbls: Seq[Double] = Nil,
        asciiz: Option[String] = None, raw: Option[Array[Byte]] = None)
    val nodataStr = nodata.map(v =>
      (if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString else v.toString) + "\u0000")
    val tiled = layout.tile.isDefined
    val offsetsId = if (tiled) 324 else 273
    val countsId = if (tiled) 325 else 279
    val big = layout.bigTiff
    // segment offsets/counts ride LONG8 (16) in BigTIFF — the 64-bit
    // value path GDAL uses — and LONG (4) classic
    val longType = if (big) 16 else 4

    var tags = ArrayBuffer[T](
      T(256, 3, Seq(width.toLong)), T(257, 3, Seq(height.toLong)),
      T(258, 3, Seq(layout.bits.toLong)), T(259, 3, Seq(layout.compression.toLong)),
      T(262, 3, Seq(1L)),
      T(offsetsId, longType, Seq.fill(segments.size)(0L)), // patched below
      T(277, 3, Seq(1L)))
    segTags.foreach { case (id, vs) => tags += T(id, if (id == 278) 4 else 3, vs) }
    tags += T(countsId, longType, segments.map(_.length.toLong))
    if (layout.predictor != 1) tags += T(317, 3, Seq(layout.predictor.toLong))
    jpegTablesStream.foreach(b => tags += T(347, 7, Nil, raw = Some(b)))
    tags += T(339, 3, Seq(layout.sampleFormat.toLong))
    tags += T(33550, 12, Nil, Seq(pixelScaleX, pixelScaleY, 0.0))
    tags += T(33922, 12, Nil, Seq(0.0, 0.0, 0.0, originX, originY, 0.0))
    nodataStr.foreach(s => tags += T(42113, 2, Nil, Nil, Some(s)))
    val sorted = tags.sortBy(_.id)

    // classic: 8-byte header, 2-byte tag count, 12-byte entries, 4-byte
    // next-IFD pointer; BigTIFF: 16-byte header, 8-byte count, 20-byte
    // entries, 8-byte pointer, values inline up to 8 bytes
    val ifdOff = if (big) 16 else 8
    val entrySize = if (big) 20 else 12
    val inlineMax = if (big) 8 else 4
    val countOff = if (big) 8 else 2
    val ifdSize = countOff + sorted.size * entrySize + inlineMax
    var overflowOff = ifdOff + ifdSize
    // lay out overflow areas
    def valueBytes(t: T): Int = t.ttype match {
      case 2 => t.asciiz.get.length
      case 3 => 2 * t.vals.size
      case 4 => 4 * t.vals.size
      case 7 => t.raw.get.length
      case 12 => 8 * t.dbls.size
      case 16 => 8 * t.vals.size
      case tt => throw new IllegalArgumentException(s"writer tag type $tt")
    }
    val overflowAt = sorted.map { t =>
      val n = valueBytes(t)
      if (n <= inlineMax) -1
      else { val at = overflowOff; overflowOff = at + n; at }
    }
    // segment data after all overflow
    var segOff = overflowOff
    val segAt = segments.map { s => val at = segOff; segOff = at + s.length; at }
    val total = segOff
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0, 0x49.toByte); buf.put(1, 0x49.toByte)
    if (big) {
      buf.putShort(2, 43)
      buf.putShort(4, 8); buf.putShort(6, 0) // offset bytesize + constant
      buf.putLong(8, ifdOff.toLong)
      buf.putLong(ifdOff, sorted.size.toLong)
    } else {
      buf.putShort(2, 42)
      buf.putInt(4, ifdOff)
      buf.putShort(ifdOff, sorted.size.toShort)
    }
    sorted.zipWithIndex.foreach { case (t, i) =>
      val p = ifdOff + countOff + i * entrySize
      val realVals: Seq[Long] =
        if (t.id == offsetsId) segAt.map(_.toLong) else t.vals
      buf.putShort(p, t.id.toShort); buf.putShort(p + 2, t.ttype.toShort)
      val count = t.ttype match {
        case 2 => t.asciiz.get.length
        case 7 => t.raw.get.length
        case 12 => t.dbls.size
        case _ => realVals.size
      }
      val valuePos = if (big) { buf.putLong(p + 4, count.toLong); p + 12 }
        else { buf.putInt(p + 4, count); p + 8 }
      val n = valueBytes(t)
      val at = if (n <= inlineMax) valuePos
        else if (big) { buf.putLong(valuePos, overflowAt(i).toLong); overflowAt(i) }
        else { buf.putInt(valuePos, overflowAt(i)); overflowAt(i) }
      t.ttype match {
        case 2 => t.asciiz.get.getBytes("US-ASCII").zipWithIndex.foreach {
          case (b, j) => buf.put(at + j, b) }
        case 7 => t.raw.get.zipWithIndex.foreach {
          case (b, j) => buf.put(at + j, b) }
        case 3 => realVals.zipWithIndex.foreach { case (v, j) =>
          buf.putShort(at + 2 * j, v.toShort) }
        case 4 => realVals.zipWithIndex.foreach { case (v, j) =>
          buf.putInt(at + 4 * j, v.toInt) }
        case 16 => realVals.zipWithIndex.foreach { case (v, j) =>
          buf.putLong(at + 8 * j, v) }
        case 12 => t.dbls.zipWithIndex.foreach { case (v, j) =>
          buf.putDouble(at + 8 * j, v) }
      }
    }
    val nextIfdAt = ifdOff + countOff + sorted.size * entrySize
    if (big) buf.putLong(nextIfdAt, 0L) else buf.putInt(nextIfdAt, 0) // next IFD
    segments.zip(segAt).foreach { case (s, at) =>
      System.arraycopy(s, 0, buf.array(), at, s.length)
    }
    buf.array()
  }
}
