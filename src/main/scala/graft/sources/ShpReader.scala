package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

/** S4 ingest half: a minimal pure-JVM ESRI shapefile (.shp) record reader.
  * The reference unzips uploaded shapefile archives and reads them with
  * geopandas (country_adm_boundaries_upload_views.py:113-150,
  * SlopeGeoJsonUploadView.py:326-422); offline there is no GDAL, but the
  * .shp binary layout is a public spec (ESRI whitepaper, 1998): a 100-byte
  * header (big-endian file code 9994, little-endian shape type + bbox),
  * then records of [big-endian rec#/length][little-endian geometry].
  *
  * Supported shapes: Point (1), PolyLine (3, emitted with its GeoJSON name "LineString" so shapefile- and GeoJSON-sourced frames filter identically), Polygon (5) — the types the
  * reference's admin-boundary and slope uploads contain. Output rows match
  * [[GeoJson.explodeFeatures]]'s feature frame (feature_index,
  * geometry_type, geom, properties) so the downstream geo layer
  * (reproject, centroid, contains) runs unchanged. Attribute columns come
  * from the sibling .dbf via [[DbfReader]] ([[readWithAttributes]]) —
  * the full `gpd.read_file` contract (geometry + properties) from the
  * shapefile alone, no GeoJSON sidecar required.
  *
  * Driver-side parse, like [[CsvSource]]'s probe and [[XlsxSource]]:
  * upload-payload files, not bulk scans.
  */
object ShpReader {

  final case class ShpFeature(featureIndex: Int, geometryType: String,
      rings: Seq[Seq[(Double, Double)]])

  def parse(path: String): Seq[ShpFeature] = parseBytes(Files.readAllBytes(Paths.get(path)))

  def parseBytes(bytes: Array[Byte]): Seq[ShpFeature] = {
    require(bytes.length >= 100, "shp too short for the 100-byte header")
    val header = ByteBuffer.wrap(bytes, 0, 100)
    header.order(ByteOrder.BIG_ENDIAN)
    val fileCode = header.getInt(0)
    require(fileCode == 9994, s"not a shapefile (file code $fileCode != 9994)")
    // header file length is in 16-bit words, big-endian at offset 24
    val declaredBytes = header.getInt(24) * 2
    val limit = math.min(bytes.length, declaredBytes)

    val out = ArrayBuffer[ShpFeature]()
    var off = 100
    while (off + 8 <= limit) {
      val recHdr = ByteBuffer.wrap(bytes, off, 8).order(ByteOrder.BIG_ENDIAN)
      val recNo = recHdr.getInt
      val contentBytes = recHdr.getInt * 2
      require(contentBytes >= 4 && off + 8 + contentBytes <= bytes.length,
        s"record $recNo: content length $contentBytes overruns the file (truncated/corrupt .shp)")
      val body = ByteBuffer.wrap(bytes, off + 8, contentBytes).order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = body.getInt
      shapeType match {
        case 0 => // null shape — skip
        case 1 => // Point: x, y
          val x = body.getDouble; val y = body.getDouble
          out += ShpFeature(recNo - 1, "Point", Seq(Seq((x, y))))
        case 3 | 5 => // PolyLine (GeoJSON: LineString) / Polygon: box, numParts, numPoints, parts, points
          body.position(body.position() + 32) // skip box (4 doubles)
          val numParts = body.getInt
          val numPoints = body.getInt
          val parts = Array.fill(numParts)(body.getInt)
          val pts = Array.fill(numPoints)((body.getDouble, body.getDouble))
          val bounds = parts :+ numPoints
          val rings = (0 until numParts).map(i =>
            pts.slice(bounds(i), bounds(i + 1)).toSeq)
          out += ShpFeature(recNo - 1,
            if (shapeType == 5) "Polygon" else "LineString", rings)
        case t =>
          throw new IllegalArgumentException(
            s"record $recNo: unsupported shape type $t (Point/PolyLine/Polygon only)")
      }
      off += 8 + contentBytes
    }
    out.toSeq
  }

  /** The GeoJson feature-frame schema, shared with [[ShapefileZip]]. */
  private[sources] def frameSchema: StructType = schema

  private val schema = StructType(Seq(
    StructField("feature_index", IntegerType, nullable = false),
    StructField("geometry_type", StringType, nullable = false),
    StructField("geom", ArrayType(ArrayType(ArrayType(DoubleType)))),
    StructField("properties", MapType(StringType, StringType))))

  /** Features as the [[GeoJson]] frame: rings → points → [x, y]. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = parse(path).map { f =>
      Row(f.featureIndex, f.geometryType,
        f.rings.map(_.map(p => Seq(p._1, p._2))), Map.empty[String, String])
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), schema)
  }

  /** Features WITH attributes — the `gpd.read_file` contract: geometry
    * from the .shp, properties from the sibling .dbf ([[DbfReader]]),
    * paired POSITIONALLY (the shapefile contract: .dbf physical record i
    * describes .shp record i — both references index this way,
    * village_admin_boundaries_etl_view.py:418-485). Record counts must
    * agree; a .dbf row flagged deleted keeps its geometry with EMPTY
    * properties (spec-conformant shapefiles have none). `dbfPath`
    * defaults to the .shp's sibling; a MISSING sidecar degrades to
    * [[read]]'s empty-properties frame rather than failing — matching
    * the reference's behavior on bare .shp uploads.
    */
  def readWithAttributes(spark: SparkSession, shpPath: String,
      dbfPath: Option[String] = None): DataFrame = {
    val sidecar = dbfPath.getOrElse(shpPath.replaceAll("\\.[Ss][Hh][Pp]$", "") + ".dbf")
    if (!Files.exists(Paths.get(sidecar))) {
      // only the DERIVED sidecar may be legitimately absent (bare .shp
      // upload); an EXPLICITLY named .dbf that is missing is caller error
      require(dbfPath.isEmpty, s"dbf sidecar not found: $sidecar")
      return read(spark, shpPath)
    }
    val feats = parse(shpPath)
    val dbf = DbfReader.parse(sidecar)
    require(dbf.records.length == feats.length,
      s".dbf has ${dbf.records.length} records but .shp has ${feats.length} " +
        "features — not a matching sidecar")
    val rows = feats.zip(dbf.records).map { case (f, r) =>
      Row(f.featureIndex, f.geometryType,
        f.rings.map(_.map(p => Seq(p._1, p._2))),
        if (r.deleted) Map.empty[String, String] else r.toMap(dbf.fields))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), schema)
  }
}
