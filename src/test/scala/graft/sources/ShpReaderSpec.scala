package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/** Builds tiny .shp files byte-for-byte per the public ESRI spec and reads
  * them back through [[ShpReader]] into the GeoJson feature frame — now
  * covering the full pyshp shape-type surface: Z/M variants (XY parsed,
  * Z/M blocks skipped), MultiPoint, multi-part PolyLine, and winding-based
  * polygon-ring organization into Polygon/MultiPolygon.
  */
class ShpReaderSpec extends SparkSpec {

  private type Ring = Seq[(Double, Double)]

  // ---- byte-level fixture builders ----------------------------------------

  /** Polygon/PolyLine-family record content. For Z/M variants the spec
    * appends [range + per-point values] blocks after the XY section; we
    * write real (nonzero) Z/M values so a parser that misreads them as
    * coordinates fails loudly in the asserts.
    */
  private def partsContent(shapeType: Int, rings: Seq[Ring],
      withZ: Boolean = false, withM: Boolean = false): Array[Byte] = {
    val numPoints = rings.map(_.size).sum
    val zBytes = if (withZ) 16 + 8 * numPoints else 0
    val mBytes = if (withM) 16 + 8 * numPoints else 0
    val buf = ByteBuffer
      .allocate(4 + 32 + 8 + 4 * rings.size + 16 * numPoints + zBytes + mBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(shapeType)
    val xs = rings.flatten.map(_._1); val ys = rings.flatten.map(_._2)
    buf.putDouble(xs.min).putDouble(ys.min).putDouble(xs.max).putDouble(ys.max)
    buf.putInt(rings.size).putInt(numPoints)
    var start = 0
    rings.foreach { r => buf.putInt(start); start += r.size }
    rings.flatten.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
    if (withZ) {
      buf.putDouble(100.0).putDouble(200.0)
      (0 until numPoints).foreach(i => buf.putDouble(100.0 + i))
    }
    if (withM) {
      buf.putDouble(1.0).putDouble(2.0)
      (0 until numPoints).foreach(i => buf.putDouble(1.0 + i * 0.25))
    }
    buf.array()
  }

  private def pointContent(shapeType: Int, x: Double, y: Double,
      extraDoubles: Int = 0): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 + 8 * extraDoubles).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(shapeType).putDouble(x).putDouble(y)
    (0 until extraDoubles).foreach(i => buf.putDouble(500.0 + i))
    buf.array()
  }

  private def multiPointContent(shapeType: Int, pts: Seq[(Double, Double)],
      zmBlocks: Int = 0): Array[Byte] = {
    val buf = ByteBuffer
      .allocate(4 + 32 + 4 + 16 * pts.size + zmBlocks * (16 + 8 * pts.size))
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(shapeType)
    buf.putDouble(pts.map(_._1).min).putDouble(pts.map(_._2).min)
    buf.putDouble(pts.map(_._1).max).putDouble(pts.map(_._2).max)
    buf.putInt(pts.size)
    pts.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
    (0 until zmBlocks).foreach { b =>
      buf.putDouble(10.0 * b).putDouble(10.0 * b + 1)
      pts.indices.foreach(i => buf.putDouble(10.0 * b + i))
    }
    buf.array()
  }

  /** Assemble record contents into a complete .shp byte stream. */
  private def shpFile(recs: Seq[Array[Byte]], headerShapeType: Int = 5): Array[Byte] = {
    val total = 100 + recs.map(8 + _.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(9994)
    (0 until 5).foreach(_ => buf.putInt(0))
    buf.putInt(total / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1000).putInt(headerShapeType)
    (0 until 8).foreach(_ => buf.putDouble(0))
    recs.zipWithIndex.foreach { case (content, i) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(i + 1)
      buf.putInt(content.length / 2)
      buf.put(content)
    }
    buf.array()
  }

  // spec-correct windings: exterior CLOCKWISE (negative signed area),
  // holes counter-clockwise
  private val squareCw: Ring = Seq((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0))
  private val holeTriCcw: Ring = Seq((1.0, 1.0), (2.0, 1.0), (1.0, 2.0), (1.0, 1.0))

  /** One Polygon record (CW square + CCW hole) + one Point — the original
    * S4 fixture with spec-correct winding.
    */
  private def fixtureBytes: Array[Byte] =
    shpFile(Seq(partsContent(5, Seq(squareCw, holeTriCcw)), pointContent(1, 2.5, 3.5)))

  // ---- parsing -------------------------------------------------------------

  test("parses polygon rings and point records per the ESRI layout") {
    val feats = ShpReader.parseBytes(fixtureBytes)
    assert(feats.size == 2)
    val poly = feats(0)
    assert(poly.geometryType == "Polygon" && poly.rings.size == 2)
    assert(poly.rings(0) == squareCw)
    assert(poly.rings(1) == holeTriCcw)
    assert(feats(1).geometryType == "Point")
    assert(feats(1).rings == Seq(Seq((2.5, 3.5))))
  }

  test("Z/M variants parse XY identically, skipping the trailing Z/M blocks") {
    val feats = ShpReader.parseBytes(shpFile(Seq(
      partsContent(15, Seq(squareCw, holeTriCcw), withZ = true, withM = true), // PolygonZ
      partsContent(25, Seq(squareCw), withM = true),                           // PolygonM
      pointContent(11, 2.5, 3.5, extraDoubles = 2),                            // PointZ (z+m)
      pointContent(21, 7.5, 8.5, extraDoubles = 1),                            // PointM
      partsContent(13, Seq(Seq((0.0, 0.0), (1.0, 1.0)),
        Seq((5.0, 5.0), (6.0, 5.0), (7.0, 4.0))), withZ = true))))             // PolyLineZ, 2 parts
    assert(feats.map(_.geometryType) ==
      Seq("Polygon", "Polygon", "Point", "Point", "MultiLineString"))
    assert(feats(0).rings == Seq(squareCw, holeTriCcw))
    assert(feats(1).rings == Seq(squareCw))
    assert(feats(2).rings == Seq(Seq((2.5, 3.5))))
    assert(feats(3).rings == Seq(Seq((7.5, 8.5))))
    assert(feats(4).rings(1) == Seq((5.0, 5.0), (6.0, 5.0), (7.0, 4.0)))
  }

  test("MultiPoint family parses its point set (Z/M blocks skipped)") {
    val pts = Seq((1.0, 2.0), (3.0, 4.0), (5.0, 6.0))
    val feats = ShpReader.parseBytes(shpFile(Seq(
      multiPointContent(8, pts),
      multiPointContent(18, pts, zmBlocks = 2),
      multiPointContent(28, pts, zmBlocks = 1))))
    assert(feats.map(_.geometryType) == Seq("MultiPoint", "MultiPoint", "MultiPoint"))
    assert(feats.forall(_.rings == Seq(pts)))
  }

  test("single-part PolyLine stays LineString; multi-part becomes MultiLineString") {
    val feats = ShpReader.parseBytes(shpFile(Seq(
      partsContent(3, Seq(Seq((0.0, 0.0), (1.0, 1.0)))),
      partsContent(3, Seq(Seq((0.0, 0.0), (1.0, 1.0)), Seq((2.0, 2.0), (3.0, 3.0)))))))
    assert(feats.map(_.geometryType) == Seq("LineString", "MultiLineString"))
  }

  // ---- ring organization (pyshp organize_polygon_rings parity) -------------

  test("multipart polygon with two exteriors splits into MultiPolygon by winding") {
    // rings deliberately interleaved in the file: exterior A, exterior B,
    // then A's hole — assignment must be by containment, not file order
    val extB: Ring = Seq((10.0, 0.0), (10.0, 3.0), (13.0, 3.0), (13.0, 0.0), (10.0, 0.0))
    val holeA: Ring = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))
    val feats = ShpReader.parseBytes(
      shpFile(Seq(partsContent(5, Seq(squareCw, extB, holeA)))))
    assert(feats.size == 1)
    val f = feats(0)
    assert(f.geometryType == "MultiPolygon")
    assert(f.polygons == Seq(Seq(squareCw, holeA), Seq(extB)))
    // flattened rings ride `rings` in organized order
    assert(f.rings == Seq(squareCw, holeA, extB))
  }

  test("PolygonZ multipart also splits (same XY machinery through the Z path)") {
    val extB: Ring = Seq((10.0, 0.0), (10.0, 3.0), (13.0, 3.0), (13.0, 0.0), (10.0, 0.0))
    val feats = ShpReader.parseBytes(
      shpFile(Seq(partsContent(15, Seq(squareCw, extB), withZ = true))))
    assert(feats(0).geometryType == "MultiPolygon")
    assert(feats(0).polygons == Seq(Seq(squareCw), Seq(extB)))
  }

  test("organizePolygonRings: orphan holes promote; nested exterior wins by area") {
    // orphan: CCW ring outside every exterior becomes its own polygon
    val orphan: Ring = Seq((50.0, 50.0), (51.0, 50.0), (51.0, 51.0), (50.0, 50.0))
    val extB: Ring = Seq((10.0, 0.0), (10.0, 3.0), (13.0, 3.0), (13.0, 0.0), (10.0, 0.0))
    assert(ShpReader.organizePolygonRings(Seq(squareCw, extB, orphan)) ==
      Seq(Seq(squareCw), Seq(extB), Seq(orphan)))
    // nested: a small CW exterior inside the big one; a hole inside BOTH
    // bboxes+rings attaches to the smaller (most-immediate) exterior
    val nested: Ring = Seq((0.5, 0.5), (0.5, 3.5), (3.5, 3.5), (3.5, 0.5), (0.5, 0.5))
    val hole: Ring = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))
    assert(ShpReader.organizePolygonRings(Seq(squareCw, nested, hole)) ==
      Seq(Seq(squareCw), Seq(nested, hole)))
    // all-CCW (wrong-wound) record: every ring degrades to its own exterior
    val ccwSquare = squareCw.reverse
    assert(ShpReader.organizePolygonRings(Seq(ccwSquare, holeTriCcw)) ==
      Seq(Seq(ccwSquare), Seq(holeTriCcw)))
    // single ring of either winding is a plain Polygon
    assert(ShpReader.organizePolygonRings(Seq(ccwSquare)) == Seq(Seq(ccwSquare)))
    assert(ShpReader.parseBytes(shpFile(Seq(partsContent(5, Seq(ccwSquare)))))
      .head.geometryType == "Polygon")
  }

  // ---- frame ---------------------------------------------------------------

  test("reads into the GeoJson feature frame; geo layer runs unchanged") {
    val path = java.nio.file.Files.createTempFile("fixture", ".shp")
    java.nio.file.Files.write(path, fixtureBytes)
    val df = ShpReader.read(spark, path.toString)
    assert(df.columns.toSeq ==
      Seq("feature_index", "geometry_type", "geom", "geom_multi", "properties"))
    val poly = df.filter(col("geometry_type") === "Polygon")
    // shoelace area over the ring encoding: 16 (square) - 0.5 (hole) = 15.5
    val area = poly.select(graft.geo.GeoFunctions.stArea(col("geom"))).head().getDouble(0)
    assert(area == 15.5)
    // validity check sees closed rings
    assert(poly.select(graft.geo.GeoFunctions.stIsValidPolygon(col("geom"))).head().getBoolean(0))
  }

  test("MultiPolygon frame row: geom null (centroid quirk), geom_multi full") {
    val extB: Ring = Seq((10.0, 0.0), (10.0, 3.0), (13.0, 3.0), (13.0, 0.0), (10.0, 0.0))
    val path = java.nio.file.Files.createTempFile("multi", ".shp")
    java.nio.file.Files.write(path,
      shpFile(Seq(partsContent(5, Seq(squareCw, extB, holeTriCcw)),
        partsContent(5, Seq(squareCw)))))
    val df = ShpReader.read(spark, path.toString)
    val multi = df.filter(col("geometry_type") === "MultiPolygon")
    // the reference's _calculate_centroid handles only Point/Polygon and
    // returns (None, None) for MultiPolygon
    // (village_admin_boundaries_etl_view.py:299-321) — preserved: the
    // polygon-rank geom is null, so the vertex-mean centroid is null/null
    val c = multi.select(graft.geo.GeoFunctions.stCentroidVertexMean(col("geom")).as("c"))
      .select(col("c.lon"), col("c.lat")).head()
    assert(c.isNullAt(0) && c.isNullAt(1))
    // but the geometry itself is NOT lost: geom_multi carries both polygons
    val gm = multi.select(size(col("geom_multi"))).head().getInt(0)
    assert(gm == 2)
    // and the plain-Polygon row still centroids normally
    val cp = df.filter(col("geometry_type") === "Polygon")
      .select(graft.geo.GeoFunctions.stCentroidVertexMean(col("geom")).as("c"))
      .select(col("c.lon"), col("c.lat")).head()
    assert(math.abs(cp.getDouble(0) - 1.6) < 1e-9) // (0+0+4+4+0)/5
    assert(math.abs(cp.getDouble(1) - 1.6) < 1e-9) // (0+4+4+0+0)/5
  }

  test("rejects non-shapefile bytes and unknown shape types") {
    intercept[IllegalArgumentException] {
      ShpReader.parseBytes(Array.fill[Byte](128)(7))
    }
    // a genuinely unknown type id stays a loud, NAMED failure
    val unknown = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(99).array()
    val e = intercept[IllegalArgumentException] {
      ShpReader.parseBytes(shpFile(Seq(unknown)))
    }
    assert(e.getMessage.contains("unsupported shape type 99"))
  }

  /** MultiPatch record: box, numParts, numPoints, parts, partTypes,
    * points, then the mandatory Z block (type 31 is inherently 3-D).
    */
  private def multiPatchContent(parts: Seq[Ring], partTypes: Seq[Int]): Array[Byte] = {
    val numPoints = parts.map(_.size).sum
    val buf = ByteBuffer
      .allocate(4 + 32 + 8 + 4 * parts.size * 2 + 16 * numPoints + 16 + 8 * numPoints)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(31)
    val xs = parts.flatten.map(_._1); val ys = parts.flatten.map(_._2)
    buf.putDouble(xs.min).putDouble(ys.min).putDouble(xs.max).putDouble(ys.max)
    buf.putInt(parts.size).putInt(numPoints)
    var start = 0
    parts.foreach { p => buf.putInt(start); start += p.size }
    partTypes.foreach(buf.putInt)
    parts.flatten.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
    // real (nonzero) Z values so a parser that misreads the partTypes or
    // Z block as coordinates fails the asserts loudly
    buf.putDouble(10.0).putDouble(20.0)
    (0 until numPoints).foreach(i => buf.putDouble(10.0 + i))
    buf.array()
  }

  test("MultiPatch (31): XY parts parse as rings, partTypes and Z skipped") {
    val strip: Ring = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))
    val ring: Ring = Seq((5.0, 5.0), (5.0, 6.0), (6.0, 6.0), (5.0, 5.0))
    val feats = ShpReader.parseBytes(shpFile(
      Seq(multiPatchContent(Seq(strip, ring), Seq(0, 2))), headerShapeType = 31))
    assert(feats.size == 1)
    assert(feats.head.geometryType == "MultiPatch")
    assert(feats.head.rings == Seq(strip, ring))
    // a following record still parses (the Z block was length-skipped)
    val two = ShpReader.parseBytes(shpFile(Seq(
      multiPatchContent(Seq(strip), Seq(0)), pointContent(1, 2.5, 3.5)),
      headerShapeType = 31))
    assert(two.map(_.geometryType) == Seq("MultiPatch", "Point"))
    assert(two(1).rings == Seq(Seq((2.5, 3.5))))
  }

  test("corrupt part prologues fail by name with the record number") {
    // ADVICE r15: corrupt numParts/numPoints/part offsets must surface as
    // this module's record-numbered IllegalArgumentException, not JVM
    // BufferUnderflow/NegativeArraySize faults or silently clamped rings.
    // Content starts at 108; numParts@+36, numPoints@+40, parts@+44.
    def poly = shpFile(Seq(partsContent(5, Seq(squareCw, holeTriCcw))))
    def mutated(off: Int, v: Int): Array[Byte] = {
      val b = poly
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).putInt(off, v)
      b
    }
    val e1 = intercept[IllegalArgumentException] {
      ShpReader.parseBytes(mutated(144, -1)) } // numParts = -1
    assert(e1.getMessage.contains("record 1") && e1.getMessage.contains("negative"))
    val e2 = intercept[IllegalArgumentException] {
      ShpReader.parseBytes(mutated(148, 1000000)) } // numPoints overruns content
    assert(e2.getMessage.contains("record 1") &&
      e2.getMessage.contains("truncated/corrupt"))
    val e3 = intercept[IllegalArgumentException] {
      ShpReader.parseBytes(mutated(152, 6)) } // parts (6,5): decreasing
    assert(e3.getMessage.contains("record 1") &&
      e3.getMessage.contains("decreasing or out of range"))
    val e4 = intercept[IllegalArgumentException] {
      ShpReader.parseBytes(mutated(156, 10)) } // parts (0,10) > 9 points
    assert(e4.getMessage.contains("record 1") &&
      e4.getMessage.contains("decreasing or out of range"))
    // the MultiPatch (31) branch shares the same validated prologue
    val strip: Ring = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))
    val mp = shpFile(Seq(multiPatchContent(Seq(strip), Seq(0))), headerShapeType = 31)
    ByteBuffer.wrap(mp).order(ByteOrder.LITTLE_ENDIAN).putInt(148, Int.MaxValue)
    val e5 = intercept[IllegalArgumentException] { ShpReader.parseBytes(mp) }
    assert(e5.getMessage.contains("record 1") &&
      e5.getMessage.contains("truncated/corrupt"))
  }

  test("bare-.shp driver parse is size-gated loudly") {
    val p = java.nio.file.Files.createTempFile("huge", ".shp")
    val raf = new java.io.RandomAccessFile(p.toFile, "rw")
    try raf.setLength(ShpReader.MaxShpBytes + 1) finally raf.close()
    val e = intercept[IllegalArgumentException] { ShpReader.parse(p.toString) }
    assert(e.getMessage.contains("driver-parse ceiling"))
    java.nio.file.Files.delete(p)
  }

  // ---- .dbf pairing ---------------------------------------------------------

  /** A matching 2-record .dbf for [[fixtureBytes]] (polygon + point). */
  private def dbfSidecar(deleteSecond: Boolean = false): Array[Byte] = {
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
    assert(df.columns.toSeq ==
      Seq("feature_index", "geometry_type", "geom", "geom_multi", "properties"))
    val rows = df.orderBy("feature_index")
      .select(col("geometry_type"), col("properties")).collect()
    assert(rows(0).getString(0) === "Polygon")
    assert(rows(0).getMap[String, String](1).toMap ===
      Map("VILLAGE" -> "Kigarama", "POP" -> "1250"))
    assert(rows(1).getMap[String, String](1).toMap ===
      Map("VILLAGE" -> "Remera", "POP" -> "980"))
  }

  test("readWithAttributes probes sidecar case variants (.DBF from zip tools)") {
    val dir = java.nio.file.Files.createTempDirectory("shpcase")
    java.nio.file.Files.write(dir.resolve("v.shp"), fixtureBytes)
    java.nio.file.Files.write(dir.resolve("v.DBF"), dbfSidecar())
    val rows = ShpReader.readWithAttributes(spark, dir.resolve("v.shp").toString)
      .orderBy("feature_index").select(col("properties")).collect()
    assert(rows(0).getMap[String, String](0).toMap ===
      Map("VILLAGE" -> "Kigarama", "POP" -> "1250"))
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
