package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Write half of S4: encode feature records into ESRI .shp bytes (public
  * 1998 whitepaper layout, the format [[ShpReader]] parses), a minimal
  * character-field .dbf sidecar, and a zip archive — enough to round-trip
  * the reference's shapefile-zip upload contract
  * (SlopeGeoJsonUploadView.py:326-422) entirely in-engine, and to plant
  * closed-form shapefile fixtures for oracle rows the way [[TiffWriter]]
  * plants rasters for q269.
  *
  * Supports Point (1), Polygon (5) and PolygonZ (15) records — PolygonZ
  * emits a real Z block (range + per-vertex values) after the XY section,
  * so a reader that misparses the Z trailer as coordinates fails loudly.
  */
object ShpWriter {

  sealed trait Rec
  final case class PointRec(x: Double, y: Double) extends Rec
  /** `withZ` writes shape type 15 with a trailing Z block. */
  final case class PolyRec(rings: Seq[Seq[(Double, Double)]],
      withZ: Boolean = false) extends Rec

  private def content(rec: Rec): Array[Byte] = rec match {
    case PointRec(x, y) =>
      ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(1).putDouble(x).putDouble(y).array()
    case PolyRec(rings, withZ) =>
      val numPoints = rings.map(_.size).sum
      val zBytes = if (withZ) 16 + 8 * numPoints else 0
      val buf = ByteBuffer
        .allocate(4 + 32 + 8 + 4 * rings.size + 16 * numPoints + zBytes)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(if (withZ) 15 else 5)
      val xs = rings.flatten.map(_._1); val ys = rings.flatten.map(_._2)
      buf.putDouble(xs.min).putDouble(ys.min).putDouble(xs.max).putDouble(ys.max)
      buf.putInt(rings.size).putInt(numPoints)
      var start = 0
      rings.foreach { r => buf.putInt(start); start += r.size }
      rings.flatten.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
      if (withZ) {
        buf.putDouble(0.0).putDouble(numPoints - 1.0)
        (0 until numPoints).foreach(i => buf.putDouble(i.toDouble))
      }
      buf.array()
  }

  /** Complete .shp byte stream: 100-byte header + records. */
  def encode(recs: Seq[Rec]): Array[Byte] = {
    val bodies = recs.map(content)
    val total = 100 + bodies.map(8 + _.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(9994)
    (0 until 5).foreach(_ => buf.putInt(0))
    buf.putInt(total / 2) // length in 16-bit words
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1000)
    buf.putInt(recs.headOption.map {
      case _: PointRec => 1
      case PolyRec(_, z) => if (z) 15 else 5
    }.getOrElse(0))
    (0 until 8).foreach(_ => buf.putDouble(0))
    bodies.zipWithIndex.foreach { case (body, i) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(i + 1)
      buf.putInt(body.length / 2)
      buf.put(body)
    }
    buf.array()
  }

  /** Minimal dBASE III sidecar: all fields character-typed, values padded
    * or truncated to the declared width ([[DbfReader]]'s parse target).
    */
  def dbf(fields: Seq[(String, Int)], rows: Seq[Seq[String]]): Array[Byte] = {
    require(rows.forall(_.length == fields.length), "row arity != field arity")
    val headerSize = 32 + 32 * fields.size + 1
    val recordSize = 1 + fields.map(_._2).sum
    val buf = ByteBuffer.allocate(headerSize + recordSize * rows.size + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte); buf.put(126.toByte).put(1.toByte).put(1.toByte)
    buf.putInt(rows.size)
    buf.putShort(headerSize.toShort); buf.putShort(recordSize.toShort)
    buf.position(32)
    fields.foreach { case (name, len) =>
      val start = buf.position()
      buf.put(name.take(10).getBytes("ISO-8859-1"))
      buf.position(start + 11); buf.put('C'.toByte)
      buf.position(start + 16); buf.put(len.toByte).put(0.toByte)
      buf.position(start + 32)
    }
    buf.put(0x0D.toByte)
    rows.foreach { cells =>
      buf.put(0x20.toByte)
      cells.zip(fields).foreach { case (v, (_, len)) =>
        buf.put(v.take(len).padTo(len, ' ').getBytes("ISO-8859-1"))
      }
    }
    buf.put(0x1A.toByte)
    buf.array()
  }

  /** In-memory zip archive (the upload-payload shape [[ShapefileZip]] reads). */
  def zipArchive(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(bytes); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }
}
