package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

/** S4 ingest half: a pure-JVM ESRI shapefile (.shp) record reader.
  * The reference unzips uploaded shapefile archives and reads them with
  * pyshp (`import shapefile`, SlopeGeoJsonUploadView.py:42, iterated at
  * :326-422) or geopandas (country_adm_boundaries_upload_views.py:113-150);
  * offline there is no GDAL, but the .shp binary layout is a public spec
  * (ESRI whitepaper, 1998): a 100-byte header (big-endian file code 9994,
  * little-endian shape type + bbox), then records of
  * [big-endian rec#/length][little-endian geometry].
  *
  * Supported shapes — the full pyshp surface:
  *   - Point (1) and its Z/M variants (11, 21): XY read, Z/M skipped.
  *   - MultiPoint (8, 18, 28): one point set per record.
  *   - PolyLine (3, 13, 23): single-part records emit with the GeoJSON
  *     name "LineString", multi-part as "MultiLineString" (pyshp's
  *     `__geo_interface__` split).
  *   - Polygon (5, 15, 25): rings are organized by WINDING, the public
  *     shapefile-spec contract pyshp's `organize_polygon_rings`
  *     implements — clockwise (negative signed area) = exterior,
  *     counter-clockwise = hole; holes attach to the exterior whose bbox
  *     and ring contain them (smallest-area exterior wins nested
  *     ambiguity, orphan holes promote to exteriors, an all-hole record
  *     degrades each ring to its own exterior). One exterior → Polygon
  *     (exterior first, then its holes); several → MultiPolygon.
  *   - MultiPatch (31): the 3-D surface-patch type. No GeoJSON rank
  *     exists for triangle strips/fans (pyshp's own `__geo_interface__`
  *     refuses it), so — like pyshp's raw `.parts`/`.points` access,
  *     which IS how the reference iterates shapes
  *     (SlopeGeoJsonUploadView.py:326-422) — each XY part is emitted as
  *     one ring of a `"MultiPatch"` feature; part types (strip/fan/ring
  *     roles) are structural metadata the reference never reads.
  *   Z/M coordinate blocks trail the XY section in every Z- and
  *   M-variant, so XY parsing is layout-identical and the record length
  *   delimits the skip.
  *
  * Output rows carry [[GeoJson.explodeFeatures]]'s feature frame
  * (feature_index, geometry_type, geom, properties) EXTENDED with a
  * rank-4 `geom_multi` column — a union against a GeoJSON-sourced frame
  * needs the extra column selected away (or added null) first. The
  * polygon-rank `geom` column is NULL for MultiPolygon features — full
  * coordinates ride the rank-4 `geom_multi` column instead — which
  * preserves the reference's quirk that `_calculate_centroid` handles
  * only Point/Polygon and yields (None, None) for MultiPolygon
  * (village_admin_boundaries_etl_view.py:299-321): the vertex-mean
  * centroid over a null `geom` is null in both fields, byte-for-byte the
  * reference's behavior, without losing the geometry itself.
  *
  * Attribute columns come from the sibling .dbf via [[DbfReader]]
  * ([[readWithAttributes]]) — the full `gpd.read_file` contract
  * (geometry + properties) from the shapefile alone, no GeoJSON sidecar
  * required.
  *
  * Driver-side parse, like [[CsvSource]]'s probe and [[XlsxSource]]:
  * upload-payload files, not bulk scans.
  */
object ShpReader {

  type Ring = Seq[(Double, Double)]

  /** `polygons` is non-empty only for MultiPolygon (each element =
    * exterior ring followed by its holes); `rings` carries every other
    * geometry rank (and, for MultiPolygon, the flattened polygon rings
    * in organized order, for callers that only need the vertex soup).
    */
  final case class ShpFeature(featureIndex: Int, geometryType: String,
      rings: Seq[Ring], polygons: Seq[Seq[Ring]] = Nil)

  /** Hard ceiling on the whole-file driver parse — the same loud-failure
    * discipline as [[ShapefileZip.DefaultMaxDecompressedBytes]] (1 GiB):
    * reference uploads cap at 100 MB (SlopeGeoJsonUploadView.py:502), so
    * a bare .shp anywhere near this is not an upload and must fail with
    * a NAMED error here, not an opaque array failure at the JVM's 2 GiB
    * byte-array limit.
    */
  val MaxShpBytes: Long = 1L << 30

  def parse(path: String): Seq[ShpFeature] = {
    val p = Paths.get(path)
    val size = Files.size(p)
    require(size <= MaxShpBytes,
      s"$path is $size bytes, over the $MaxShpBytes-byte driver-parse " +
        "ceiling for upload-grade .shp ingest")
    parseBytes(Files.readAllBytes(p))
  }

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
        case 1 | 11 | 21 => // Point / PointZ / PointM: x, y [, z][, m]
          val x = body.getDouble; val y = body.getDouble
          out += ShpFeature(recNo - 1, "Point", Seq(Seq((x, y))))
        case 8 | 18 | 28 => // MultiPoint / Z / M: box, numPoints, points [, z/m]
          body.position(body.position() + 32)
          val numPoints = body.getInt
          require(numPoints >= 0 && body.remaining() >= 16L * numPoints,
            s"record $recNo: point count $numPoints inconsistent with " +
              s"${body.remaining()} remaining content bytes (truncated/corrupt .shp)")
          val pts = Seq.fill(numPoints)((body.getDouble, body.getDouble))
          out += ShpFeature(recNo - 1, "MultiPoint", Seq(pts))
        case 3 | 13 | 23 => // PolyLine / Z / M: box, numParts, numPoints, parts, points [, z/m]
          val parts = readParts(body, recNo)
          out += ShpFeature(recNo - 1,
            if (parts.size > 1) "MultiLineString" else "LineString", parts)
        case 5 | 15 | 25 => // Polygon / Z / M: same XY layout as PolyLine
          val rings = readParts(body, recNo)
          val polys = organizePolygonRings(rings)
          if (polys.size == 1)
            out += ShpFeature(recNo - 1, "Polygon", polys.head)
          else
            out += ShpFeature(recNo - 1, "MultiPolygon", polys.flatten, polys)
        case 31 => // MultiPatch: box, numParts, numPoints, parts, partTypes, points, z [, m]
          // pyshp's raw surface (.parts/.points — no GeoJSON conversion
          // exists for triangle strips/fans, and pyshp's own
          // __geo_interface__ refuses type 31): each XY part becomes one
          // ring of a "MultiPatch" feature, the Z block trails and is
          // skipped by the record-length walk like every Z variant
          val (parts, numPoints) =
            readPartHeader(body, recNo, partTypeInts = true)
          body.position(body.position() + 4 * parts.length) // partTypes
          val pts = Array.fill(numPoints)((body.getDouble, body.getDouble))
          val bounds = parts :+ numPoints
          out += ShpFeature(recNo - 1, "MultiPatch",
            (0 until parts.length).map(i => pts.slice(bounds(i), bounds(i + 1)).toSeq))
        case t =>
          throw new IllegalArgumentException(
            s"record $recNo: unsupported shape type $t " +
              "(Point/MultiPoint/PolyLine/Polygon/MultiPatch and Z/M variants only)")
      }
      off += 8 + contentBytes
    }
    out.toSeq
  }

  /** The shared part-list XY layout of PolyLine/Polygon records (the Z/M
    * blocks that follow in the 13/15/23/25 variants are skipped by the
    * record-length walk).
    */
  private def readParts(body: ByteBuffer, recNo: Int): Seq[Ring] = {
    val (parts, numPoints) = readPartHeader(body, recNo, partTypeInts = false)
    val pts = Array.fill(numPoints)((body.getDouble, body.getDouble))
    val bounds = parts :+ numPoints
    (0 until parts.length).map(i => pts.slice(bounds(i), bounds(i + 1)).toSeq)
  }

  /** Skips the 32-byte box, then reads and VALIDATES the numParts /
    * numPoints / part-offset prologue shared by PolyLine, Polygon and
    * MultiPatch records: counts must be non-negative and fit inside the
    * record's declared content length (with an extra int per part for
    * MultiPatch's partTypes block), and part offsets must be
    * non-decreasing and within [0, numPoints]. Corrupt counts otherwise
    * surface as BufferUnderflow/NegativeArraySize JVM faults, and
    * out-of-order offsets silently truncate rings (`slice` clamps) — this
    * module's contract is a NAMED, record-numbered failure instead.
    */
  private def readPartHeader(body: ByteBuffer, recNo: Int,
      partTypeInts: Boolean): (Array[Int], Int) = {
    body.position(body.position() + 32) // skip box (4 doubles)
    val numParts = body.getInt
    val numPoints = body.getInt
    require(numParts >= 0 && numPoints >= 0,
      s"record $recNo: negative part/point count " +
        s"($numParts parts, $numPoints points) (corrupt .shp)")
    val need = 4L * numParts * (if (partTypeInts) 2 else 1) + 16L * numPoints
    require(body.remaining() >= need,
      s"record $recNo: $numParts parts / $numPoints points need $need " +
        s"bytes, record content has ${body.remaining()} (truncated/corrupt .shp)")
    val parts = Array.fill(numParts)(body.getInt)
    var prev = 0
    var i = 0
    while (i < parts.length) {
      require(parts(i) >= prev && parts(i) <= numPoints,
        s"record $recNo: part offset ${parts(i)} at index $i is " +
          s"decreasing or out of range (numPoints=$numPoints) (corrupt .shp)")
      prev = parts(i)
      i += 1
    }
    (parts, numPoints)
  }

  // ---- ring winding / organization (pyshp organize_polygon_rings) ---------

  /** Doubled signed area, pyshp's formula: positive = counter-clockwise. */
  private[sources] def signedArea2(ring: Ring): Double = {
    val n = ring.length
    if (n < 3) 0.0
    else {
      var s = 0.0
      var i = 1
      while (i < n) {
        val yNext = if (i + 1 < n) ring(i + 1)._2 else ring(1)._2
        s += ring(i)._1 * (yNext - ring(i - 1)._2)
        i += 1
      }
      s
    }
  }

  /** Clockwise = negative signed area = exterior, per the shapefile spec. */
  private[sources] def isClockwise(ring: Ring): Boolean = signedArea2(ring) < 0

  private def ringBbox(ring: Ring): (Double, Double, Double, Double) =
    (ring.map(_._1).min, ring.map(_._2).min, ring.map(_._1).max, ring.map(_._2).max)

  private def bboxContains(outer: (Double, Double, Double, Double),
      inner: (Double, Double, Double, Double)): Boolean =
    outer._1 <= inner._1 && outer._2 <= inner._2 &&
      outer._3 >= inner._3 && outer._4 >= inner._4

  /** Even-odd ray cast (the [[graft.geo.GeoFunctions.stContainsPoint]]
    * rule, driver-side over a closed ring).
    */
  private def ringContainsPoint(ring: Ring, x: Double, y: Double): Boolean = {
    var inside = false
    var i = 0
    while (i < ring.length - 1) {
      val (x1, y1) = ring(i); val (x2, y2) = ring(i + 1)
      if (((y1 > y) != (y2 > y)) && x < (x2 - x1) * (y - y1) / (y2 - y1) + x1)
        inside = !inside
      i += 1
    }
    inside
  }

  /** A sample point guaranteed interior to the ring: first vertex-triplet
    * centroid whose triangle matches the ring's orientation and passes
    * the point-in-ring test (pyshp's `ring_sample` walk).
    */
  private def ringSample(ring: Ring): Option[(Double, Double)] = {
    val ccw = !isClockwise(ring)
    val walk = ring ++ ring.slice(1, 2) // re-yield coords[1] for the last triplet
    val triplet = ArrayBuffer[(Double, Double)]()
    walk.foreach { p =>
      if (!triplet.contains(p)) triplet += p
      if (triplet.length == 3) {
        val straight =
          (triplet(0)._2 - triplet(1)._2) * (triplet(0)._1 - triplet(2)._1) ==
            (triplet(0)._2 - triplet(2)._2) * (triplet(0)._1 - triplet(1)._1)
        if (!straight) {
          val closed = triplet.toSeq :+ triplet(0)
          if (ccw == !isClockwise(closed)) {
            val cx = (triplet(0)._1 + triplet(1)._1 + triplet(2)._1) / 3.0
            val cy = (triplet(0)._2 + triplet(1)._2 + triplet(2)._2) / 3.0
            if (ringContainsPoint(ring, cx, cy)) return Some((cx, cy))
          }
        }
        triplet.remove(0)
      }
    }
    None
  }

  /** Group a multipart record's rings into polygons (each = exterior ::
    * holes) by winding and containment — observable-output parity with
    * pyshp's `organize_polygon_rings`: single exterior takes every hole;
    * with several, a hole joins the exterior whose bbox and ring contain
    * its sample point (smallest-|area| exterior on nested ties); orphan
    * holes and all-hole records promote each unmatched ring to its own
    * exterior.
    */
  private[sources] def organizePolygonRings(rings: Seq[Ring]): Seq[Seq[Ring]] = {
    val (exteriors, holes) = rings.partition(isClockwise)
    if (exteriors.isEmpty) rings.map(Seq(_))
    else if (exteriors.length == 1) Seq(exteriors.head +: holes)
    else {
      val extBoxes = exteriors.map(ringBbox)
      val assigned = Array.fill(exteriors.length)(ArrayBuffer[Ring]())
      val orphans = ArrayBuffer[Ring]()
      holes.foreach { h =>
        val hb = ringBbox(h)
        var cands = exteriors.indices.filter(i => bboxContains(extBoxes(i), hb))
        if (cands.length > 1) ringSample(h).foreach { case (sx, sy) =>
          cands = cands.filter(i => ringContainsPoint(exteriors(i), sx, sy))
        }
        if (cands.isEmpty) orphans += h
        else assigned(cands.minBy(j => math.abs(signedArea2(exteriors(j))))) += h
      }
      exteriors.indices.map(i => exteriors(i) +: assigned(i).toSeq) ++
        orphans.map(Seq(_))
    }
  }

  // ---- feature frame -------------------------------------------------------

  /** The GeoJson feature-frame schema, shared with [[ShapefileZip]]. */
  private[sources] def frameSchema: StructType = schema

  private val schema = StructType(Seq(
    StructField("feature_index", IntegerType, nullable = false),
    StructField("geometry_type", StringType, nullable = false),
    StructField("geom", ArrayType(ArrayType(ArrayType(DoubleType)))),
    StructField("geom_multi", ArrayType(ArrayType(ArrayType(ArrayType(DoubleType))))),
    StructField("properties", MapType(StringType, StringType))))

  /** One frame row; MultiPolygon rides `geom_multi` with a null
    * polygon-rank `geom` (the centroid-quirk contract, see class doc).
    */
  private[sources] def featureRow(f: ShpFeature, props: Map[String, String]): Row =
    if (f.geometryType == "MultiPolygon")
      Row(f.featureIndex, f.geometryType, null,
        f.polygons.map(_.map(_.map(p => Seq(p._1, p._2)))), props)
    else
      Row(f.featureIndex, f.geometryType,
        f.rings.map(_.map(p => Seq(p._1, p._2))), null, props)

  /** Features as the [[GeoJson]] frame: rings → points → [x, y]. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = parse(path).map(featureRow(_, Map.empty[String, String]))
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
    * defaults to the .shp's sibling, probing case variants (.dbf/.DBF —
    * zip tools routinely upcase sidecar extensions, the same
    * case-insensitive lookup [[ShapefileZip]] does); a MISSING sidecar
    * degrades to [[read]]'s empty-properties frame rather than failing —
    * matching the reference's behavior on bare .shp uploads.
    */
  def readWithAttributes(spark: SparkSession, shpPath: String,
      dbfPath: Option[String] = None): DataFrame = {
    val stem = shpPath.replaceAll("\\.[Ss][Hh][Pp]$", "")
    val sidecar = dbfPath.orElse(
      Seq(".dbf", ".DBF", ".Dbf").map(stem + _)
        .find(p => Files.exists(Paths.get(p))))
    sidecar match {
      case None => read(spark, shpPath) // bare .shp upload: no derived sidecar
      case Some(path) =>
        // an EXPLICITLY named .dbf that is missing is caller error
        require(Files.exists(Paths.get(path)), s"dbf sidecar not found: $path")
        val feats = parse(shpPath)
        val dbf = DbfReader.parse(path)
        require(dbf.records.length == feats.length,
          s".dbf has ${dbf.records.length} records but .shp has ${feats.length} " +
            "features — not a matching sidecar")
        val rows = feats.zip(dbf.records).map { case (f, r) =>
          featureRow(f, if (r.deleted) Map.empty[String, String] else r.toMap(dbf.fields))
        }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toList, 1), schema)
    }
  }
}
