package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/** Builds a tiny .shp byte-for-byte per the public ESRI spec and reads it
  * back through [[ShpReader]] into the GeoJson feature frame.
  */
class ShpReaderSpec extends SparkSpec {

  /** One Polygon record (2 rings: square + hole triangle) + one Point. */
  private def fixtureBytes: Array[Byte] = {
    def polygonContent: Array[Byte] = {
      val rings = Seq(
        Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)),
        Seq((1.0, 1.0), (2.0, 1.0), (1.0, 2.0), (1.0, 1.0)))
      val numPoints = rings.map(_.size).sum
      val buf = ByteBuffer.allocate(4 + 32 + 8 + 4 * rings.size + 16 * numPoints)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(5) // Polygon
      buf.putDouble(0).putDouble(0).putDouble(4).putDouble(4) // box
      buf.putInt(rings.size).putInt(numPoints)
      var start = 0
      rings.foreach { r => buf.putInt(start); start += r.size }
      rings.flatten.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
      buf.array()
    }
    def pointContent: Array[Byte] = {
      val buf = ByteBuffer.allocate(4 + 16).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(1).putDouble(2.5).putDouble(3.5)
      buf.array()
    }
    val recs = Seq(polygonContent, pointContent)
    val total = 100 + recs.map(8 + _.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(9994) // file code
    (0 until 5).foreach(_ => buf.putInt(0))
    buf.putInt(total / 2) // file length in 16-bit words
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1000) // version
    buf.putInt(5)    // shape type
    (0 until 8).foreach(_ => buf.putDouble(0)) // bbox + z/m ranges
    recs.zipWithIndex.foreach { case (content, i) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(i + 1)              // record number, 1-based
      buf.putInt(content.length / 2) // content length in words
      buf.put(content)
    }
    buf.array()
  }

  test("parses polygon rings and point records per the ESRI layout") {
    val feats = ShpReader.parseBytes(fixtureBytes)
    assert(feats.size == 2)
    val poly = feats(0)
    assert(poly.geometryType == "Polygon" && poly.rings.size == 2)
    assert(poly.rings(0).size == 5 && poly.rings(0).head == ((0.0, 0.0)))
    assert(poly.rings(1) == Seq((1.0, 1.0), (2.0, 1.0), (1.0, 2.0), (1.0, 1.0)))
    assert(feats(1).geometryType == "Point")
    assert(feats(1).rings == Seq(Seq((2.5, 3.5))))
  }

  test("reads into the GeoJson feature frame; geo layer runs unchanged") {
    val path = java.nio.file.Files.createTempFile("fixture", ".shp")
    java.nio.file.Files.write(path, fixtureBytes)
    val df = ShpReader.read(spark, path.toString)
    assert(df.columns.toSeq == Seq("feature_index", "geometry_type", "geom", "properties"))
    val poly = df.filter(col("geometry_type") === "Polygon")
    // shoelace area over the ring encoding: 16 (square) - 0.5 (hole) = 15.5
    val area = poly.select(graft.geo.GeoFunctions.stArea(col("geom"))).head().getDouble(0)
    assert(area == 15.5)
    // validity check sees closed rings
    assert(poly.select(graft.geo.GeoFunctions.stIsValidPolygon(col("geom"))).head().getBoolean(0))
  }

  test("rejects non-shapefile bytes") {
    intercept[IllegalArgumentException] {
      ShpReader.parseBytes(Array.fill[Byte](128)(7))
    }
  }

  /** A matching 2-record .dbf for [[fixtureBytes]] (polygon + point). */
  private def dbfSidecar(deleteSecond: Boolean = false): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val fields = Seq(("VILLAGE", 'C', 10), ("POP", 'N', 6))
    val rows = Seq(
      (false, Seq("Kigarama  ", "  1250")),
      (deleteSecond, Seq("Remera    ", "   980")))
    val headerSize = 32 + 32 * fields.size + 1
    val recordSize = 1 + fields.map(_._3).sum
    val buf = ByteBuffer.allocate(headerSize + recordSize * rows.size + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte); buf.put(126.toByte).put(1.toByte).put(1.toByte)
    buf.putInt(rows.size)
    buf.putShort(headerSize.toShort); buf.putShort(recordSize.toShort)
    buf.position(32)
    fields.foreach { case (name, t, len) =>
      val start = buf.position()
      buf.put(name.getBytes("ISO-8859-1"))
      buf.position(start + 11); buf.put(t.toByte)
      buf.position(start + 16); buf.put(len.toByte).put(0.toByte)
      buf.position(start + 32)
    }
    buf.put(0x0D.toByte)
    rows.foreach { case (del, cells) =>
      buf.put(if (del) '*'.toByte else 0x20.toByte)
      cells.foreach(c => buf.put(c.getBytes("ISO-8859-1")))
    }
    buf.put(0x1A.toByte)
    buf.array()
  }

  test("readWithAttributes pairs .dbf properties positionally (gpd.read_file contract)") {
    val dir = java.nio.file.Files.createTempDirectory("shpattr")
    val shp = dir.resolve("villages.shp"); val dbf = dir.resolve("villages.dbf")
    java.nio.file.Files.write(shp, fixtureBytes)
    java.nio.file.Files.write(dbf, dbfSidecar())
    val df = ShpReader.readWithAttributes(spark, shp.toString)
    assert(df.columns.toSeq == Seq("feature_index", "geometry_type", "geom", "properties"))
    val rows = df.orderBy("feature_index")
      .select(col("geometry_type"), col("properties")).collect()
    assert(rows(0).getString(0) === "Polygon")
    assert(rows(0).getMap[String, String](1).toMap ===
      Map("VILLAGE" -> "Kigarama", "POP" -> "1250"))
    assert(rows(1).getMap[String, String](1).toMap ===
      Map("VILLAGE" -> "Remera", "POP" -> "980"))
  }

  test("readWithAttributes: deleted .dbf row keeps geometry with empty properties") {
    val dir = java.nio.file.Files.createTempDirectory("shpdel")
    java.nio.file.Files.write(dir.resolve("v.shp"), fixtureBytes)
    java.nio.file.Files.write(dir.resolve("v.dbf"), dbfSidecar(deleteSecond = true))
    val rows = ShpReader.readWithAttributes(spark, dir.resolve("v.shp").toString)
      .orderBy("feature_index").select(col("properties")).collect()
    assert(rows.length === 2)
    assert(rows(0).getMap[String, String](0).nonEmpty)
    assert(rows(1).getMap[String, String](0).isEmpty)
  }

  test("readWithAttributes: missing sidecar degrades to the bare frame; count mismatch is loud") {
    val dir = java.nio.file.Files.createTempDirectory("shpbare")
    java.nio.file.Files.write(dir.resolve("bare.shp"), fixtureBytes)
    val df = ShpReader.readWithAttributes(spark, dir.resolve("bare.shp").toString)
    assert(df.count() === 2)
    assert(df.select(col("properties")).collect().forall(_.getMap[String, String](0).isEmpty))
    // a .dbf with the wrong record count must not pair silently
    val bad = dbfSidecar()
    val patched = bad.clone()
    java.nio.ByteBuffer.wrap(patched).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4, 1)
    // shrink to one record so the parse itself succeeds
    val oneRec = java.util.Arrays.copyOf(patched, patched.length - 18)
    java.nio.file.Files.write(dir.resolve("bare.dbf"), oneRec)
    intercept[IllegalArgumentException] {
      ShpReader.readWithAttributes(spark, dir.resolve("bare.shp").toString)
    }
    // an EXPLICITLY named missing .dbf is caller error, never a silent
    // fallback (only the derived sidecar may legitimately be absent)
    intercept[IllegalArgumentException] {
      ShpReader.readWithAttributes(spark, dir.resolve("bare.shp").toString,
        dbfPath = Some(dir.resolve("nope.dbf").toString))
    }
  }
}
