package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/** The boundaries ingest E2E over a zip with NO GeoJSON sidecar — the
  * reference's archive flow (country_adm_boundaries_upload_views.py:
  * unzip → score every .shp → gpd.read_file the winner): the picker
  * must choose the village layer from the .dbf columns it now actually
  * reads, properties must ride the feature frame, and the `.prj` WKT
  * must carry the CRS PAST the Rwanda probe window — the planted
  * coordinates sit OUTSIDE it, so only the sidecar knows the zone.
  */
class ShapefileZipSpec extends SparkSpec {

  /** Single-Point .shp at (x, y). */
  private def pointShp(x: Double, y: Double): Array[Byte] = {
    val content = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    content.putInt(1).putDouble(x).putDouble(y)
    val total = 100 + 8 + 20
    val buf = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(9994)
    (0 until 5).foreach(_ => buf.putInt(0))
    buf.putInt(total / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1000).putInt(1)
    (0 until 8).foreach(_ => buf.putDouble(0))
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(1).putInt(10)
    buf.put(content.array())
    buf.array()
  }

  /** One C-field .dbf with a single record. */
  private def oneColDbf(field: String, value10: String): Array[Byte] = {
    val headerSize = 32 + 32 + 1
    val recordSize = 11
    val buf = ByteBuffer.allocate(headerSize + recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte); buf.put(126.toByte).put(1.toByte).put(1.toByte)
    buf.putInt(1); buf.putShort(headerSize.toShort); buf.putShort(recordSize.toShort)
    buf.position(32)
    buf.put(field.getBytes("ISO-8859-1"))
    buf.position(32 + 11); buf.put('C'.toByte)
    buf.position(32 + 16); buf.put(10.toByte).put(0.toByte)
    buf.position(32 + 32); buf.put(0x0D.toByte)
    buf.put(0x20.toByte); buf.put(value10.getBytes("ISO-8859-1"))
    buf.put(0x1A.toByte)
    buf.array()
  }

  private def zipOf(files: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    files.foreach { case (name, bytes) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(bytes); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val Utm35SWkt =
    """PROJCS["WGS_1984_UTM_Zone_35S",GEOGCS["GCS_WGS_1984",
      |DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],
      |PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],
      |PROJECTION["Transverse_Mercator"],
      |PARAMETER["False_Easting",500000.0],
      |PARAMETER["False_Northing",10000000.0],
      |PARAMETER["Central_Meridian",27.0],
      |PARAMETER["Scale_Factor",0.9996],
      |PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]"""
      .stripMargin.replace("\n", "")

  test("zip e2e: pick by dbf columns, properties + .prj CRS, no GeoJSON anywhere") {
    // a point OUTSIDE the Rwanda probe window (lon 25.5, lat -5.2) — the
    // probe ladder cannot place it; only the .prj can
    val (e, n) = graft.geo.CrsDetect.utmForward(25.5, -5.2, 27.0,
      graft.geo.CrsDetect.Wgs84)
    val zip = zipOf(
      "admin/districts.shp" -> pointShp(1.0, 2.0),
      "admin/districts.dbf" -> oneColDbf("DIST_CODE", "D01       "),
      "admin/villages.shp" -> pointShp(e, n),
      "admin/villages.DBF" -> oneColDbf("VILL_NAME", "Kigarama  "),
      "admin/villages.PRJ" -> Utm35SWkt.getBytes("UTF-8"),
      "readme.txt" -> "not a shapefile".getBytes("UTF-8"))

    val picked = ShapefileZip.read(spark, zip)
    // villages wins: filename keyword (+10) AND name-column indicator
    // (+20) from the .dbf it now actually reads; districts scores 0
    assert(picked.shpName === "admin/villages.shp")
    assert(picked.prjWkt.exists(_.contains("UTM_Zone_35S")))
    val props = picked.features.select(col("properties")).head()
      .getMap[String, String](0).toMap
    assert(props === Map("VILL_NAME" -> "Kigarama"))

    // probe ladder alone CANNOT place this sample...
    assert(graft.geo.CrsDetect.detect(e, n).isEmpty)
    // ...but the sidecar can: reproject lands back on the planted lon/lat
    val reproj = graft.api.GeoPipeline.reprojectFeatures(
      picked.features, prjWkt = picked.prjWkt)
    val pt = reproj.select(col("geom")(0)(0)(0), col("geom")(0)(0)(1)).head()
    assert(math.abs(pt.getDouble(0) - 25.5) < 1e-6)
    assert(math.abs(pt.getDouble(1) - (-5.2)) < 1e-6)
  }

  test("zip bomb fails loudly at the decompressed-byte ceiling, not at driver OOM") {
    // 8 MiB of zeros compresses to a few KiB; a 1 MiB ceiling must trip
    // while draining, before any shapefile validation sees the payload
    val bomb = zipOf("innocent.shp" -> new Array[Byte](8 << 20))
    val ex = intercept[IllegalArgumentException] {
      ShapefileZip.entries(bomb, maxDecompressedBytes = 1 << 20)
    }
    assert(ex.getMessage.contains("zip bomb"))
    // the default ceiling leaves real uploads untouched
    assert(ShapefileZip.entries(bomb)("innocent.shp").length == (8 << 20))
  }

  test("zip without any .shp is loud; shp-only zip still reads bare") {
    intercept[IllegalArgumentException] {
      ShapefileZip.read(spark, zipOf("a.txt" -> "x".getBytes("UTF-8")))
    }
    val bare = ShapefileZip.read(spark, zipOf("solo.shp" -> pointShp(30.0, -1.5)))
    assert(bare.shpName === "solo.shp" && bare.prjWkt.isEmpty)
    assert(bare.features.count() === 1)
    assert(bare.features.select(col("properties")).head()
      .getMap[String, String](0).isEmpty)
  }
}
