package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import scala.collection.mutable.ArrayBuffer

/** JPEG-in-TIFF (compression 7, TIFF TechNote 2) plumbing: each tile or
  * strip is its own baseline JPEG stream, optionally with the DQT/DHT
  * table segments hoisted into one shared JPEGTables field (tag 347,
  * GDAL's default layout). The entropy codec itself is the JDK's
  * ImageIO JPEG plugin — a required part of every JRE — so what this
  * object owns is exactly the TIFF-side byte plumbing: the marker-level
  * split of an interchange stream into (abbreviated table stream,
  * abbreviated image stream) and the inverse merge, per TechNote 2's
  * datastream layout. Single-band 8-bit grayscale only (the slope-raster
  * envelope; reference path rasterio/GDAL, SlopeGeoJsonUploadView.py:205).
  *
  * Marker walk: SOI, then length-prefixed segments until SOS; the
  * entropy-coded data after SOS (byte-stuffed, RSTn embedded) runs to
  * EOI and is never rescanned for markers — per ITU T.81 §B.1.1.5 the
  * only markers inside it are stuffed FF00 and RSTn, so a simple
  * header-section walk is exact, not heuristic.
  */
object JpegSegments {

  /** Encode row-major 8-bit samples as one grayscale JPEG interchange
    * stream (quality 1.0 — the writer is a fixture/sink path; decode
    * correctness is judged against the independent JDK decode of the
    * same stream, never against the pre-compression samples).
    */
  def encodeGray(samples: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(samples.length == w * h, s"${samples.length} samples != $w x $h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, samples)
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), p)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Decode one segment's JPEG stream — abbreviated (needs `tables`
    * merged back in) or self-contained — to its row-major 8-bit
    * samples, loudly checking the decoded dimensions against the tile
    * geometry the IFD declared.
    */
  def decodeGray(stream: Array[Byte], tables: Option[Array[Byte]],
      expectW: Int, expectH: Int): Array[Byte] = {
    val full = tables match {
      case Some(t) => mergeTables(t, stream)
      case None => stream
    }
    val img = ImageIO.read(new ByteArrayInputStream(full))
    require(img != null, "JPEG segment did not decode (corrupt stream?)")
    require(img.getWidth == expectW && img.getHeight == expectH,
      s"JPEG segment is ${img.getWidth}x${img.getHeight}, IFD declares ${expectW}x$expectH")
    require(img.getRaster.getNumBands == 1,
      s"JPEG segment has ${img.getRaster.getNumBands} bands; single-band rasters only")
    val out = new Array[Byte](expectW * expectH)
    var y = 0
    while (y < expectH) {
      var x = 0
      while (x < expectW) {
        out(y * expectW + x) = img.getRaster.getSample(x, y, 0).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Split an interchange stream into (abbreviated table stream
    * `SOI DQT/DHT... EOI`, abbreviated image stream) — the JPEGTables
    * hoist. APPn/COM segments drop from the image stream (GDAL does the
    * same; they are JFIF metadata, meaningless inside a TIFF container).
    */
  def splitTables(stream: Array[Byte]): (Array[Byte], Array[Byte]) = {
    require(marker(stream, 0) == 0xD8, "JPEG stream does not start with SOI")
    val tables = new ArrayBuffer[Byte]()
    val image = new ArrayBuffer[Byte]()
    tables += 0xFF.toByte += 0xD8.toByte
    image += 0xFF.toByte += 0xD8.toByte
    var i = 2
    var done = false
    while (!done) {
      val (m, mi) = markerSkippingFill(stream, i)
      if (m == 0xDA) { // SOS: header section over; the rest is the scan
        image ++= stream.view.slice(mi, stream.length)
        done = true
      } else {
        require(mi + 3 < stream.length,
          f"JPEG segment 0xFF$m%02X at byte $mi truncated before its length field")
        val len = ((stream(mi + 2) & 0xFF) << 8) | (stream(mi + 3) & 0xFF)
        require(len >= 2 && mi + 2 + len <= stream.length,
          f"JPEG segment 0xFF$m%02X at byte $mi declares $len content bytes, " +
            s"overrunning the ${stream.length}-byte stream")
        val seg = stream.view.slice(mi, mi + 2 + len)
        if (m == 0xDB || m == 0xC4) tables ++= seg // DQT / DHT
        else if (!((m >= 0xE0 && m <= 0xEF) || m == 0xFE)) image ++= seg
        i = mi + 2 + len
      }
    }
    tables += 0xFF.toByte += 0xD9.toByte
    (tables.toArray, image.toArray)
  }

  /** Inverse of [[splitTables]]: SOI + the table stream's interior
    * (its own SOI/EOI stripped) + the image stream after its SOI.
    */
  def mergeTables(tables: Array[Byte], image: Array[Byte]): Array[Byte] = {
    require(marker(tables, 0) == 0xD8, "JPEGTables does not start with SOI")
    require(tables.length >= 4 && marker(tables, tables.length - 2) == 0xD9,
      "JPEGTables does not end with EOI")
    require(marker(image, 0) == 0xD8, "JPEG segment does not start with SOI")
    val out = new Array[Byte](tables.length - 2 + image.length - 2)
    System.arraycopy(tables, 0, out, 0, tables.length - 2) // SOI + tables
    System.arraycopy(image, 2, out, tables.length - 2, image.length - 2)
    out
  }

  private def marker(b: Array[Byte], at: Int): Int = {
    require(at + 1 < b.length && (b(at) & 0xFF) == 0xFF,
      s"expected JPEG marker at byte $at")
    b(at + 1) & 0xFF
  }

  /** Marker id at/after `at`, skipping the optional 0xFF fill bytes ITU
    * T.81 §B.1.1.2 permits before any marker; returns (id, index of the
    * marker's FINAL 0xFF) so callers measure segments from the real
    * marker, not the padding. A stream that ends inside fill bytes fails
    * loudly instead of reading past the array.
    */
  private def markerSkippingFill(b: Array[Byte], at: Int): (Int, Int) = {
    require(at + 1 < b.length && (b(at) & 0xFF) == 0xFF,
      s"expected JPEG marker at byte $at")
    var i = at
    while (i + 1 < b.length && (b(i + 1) & 0xFF) == 0xFF) i += 1
    require(i + 1 < b.length, s"JPEG stream truncated in fill bytes at byte $at")
    (b(i + 1) & 0xFF, i)
  }
}
