package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import scala.collection.mutable

/** The reference's shapefile-ARCHIVE ingest, end to end with no GeoJSON
  * sidecar (country_adm_boundaries_upload_views.py:31-112 unzips the
  * upload, scores every .shp, reads the winner with `gpd.read_file`):
  * enumerate the zip's entries in memory, build a [[ShapefilePicker]]
  * candidate per .shp — columns and feature count come from the sibling
  * .dbf ([[DbfReader]]), exactly the attributes the reference's content
  * scan reads — pick the village-level winner, and deliver the
  * (geometry + properties) feature frame via [[ShpReader]] pairing plus
  * the winner's `.prj` WKT for [[graft.geo.CrsDetect.fromPrjWkt]].
  *
  * Driver-side like every upload-payload converter here ([[XlsxSource]],
  * [[ShpReader]]): archives are request bodies, not bulk scans — the
  * distributed frame starts at the returned DataFrame.
  */
object ShapefileZip {

  final case class Picked(
      shpName: String,
      features: DataFrame,
      prjWkt: Option[String])

  /** Hard ceiling on TOTAL decompressed bytes across the archive (default
    * 1 GiB — far above any real admin-boundary upload, far below driver
    * heap): uploads are untrusted request bodies, and a zip bomb must
    * fail loudly here, before any shapefile validation, instead of
    * OOMing the driver.
    */
  val DefaultMaxDecompressedBytes: Long = 1L << 30

  /** All entries of a zip archive, fully read (names normalized to
    * forward slashes; directories skipped). Fails loudly when the
    * archive inflates past `maxDecompressedBytes`.
    */
  def entries(zipBytes: Array[Byte],
      maxDecompressedBytes: Long = DefaultMaxDecompressedBytes): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    val out = mutable.LinkedHashMap[String, Array[Byte]]()
    var total = 0L
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n > 0) {
            total += n
            require(total <= maxDecompressedBytes,
              s"zip inflates past $maxDecompressedBytes decompressed bytes " +
                s"(at entry ${e.getName}) — refusing a likely zip bomb")
            buf.write(chunk, 0, n); n = zin.read(chunk)
          }
          out += e.getName.replace('\\', '/') -> buf.toByteArray
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  private def stem(name: String): String =
    name.replaceAll("\\.[^./]*$", "")

  /** Case-insensitive sibling lookup: `<stem>.<ext>` in any case, same
    * directory (zip tools routinely upcase sidecar extensions).
    */
  private def sibling(all: Map[String, Array[Byte]], shpName: String,
      ext: String): Option[Array[Byte]] = {
    val want = (stem(shpName) + "." + ext).toLowerCase
    all.collectFirst { case (n, b) if n.toLowerCase == want => b }
  }

  /** Unzip, score every .shp (filename keywords + .dbf column indicators
    * + feature count — the reference's three signals), read the winner.
    * Fails loudly when the archive has no readable .shp.
    */
  def read(spark: SparkSession, zipBytes: Array[Byte]): Picked = {
    val all = entries(zipBytes)
    val shps = all.keys.filter(_.toLowerCase.endsWith(".shp")).toSeq.sorted
    require(shps.nonEmpty, "archive contains no .shp entry")
    val candidates = shps.map { name =>
      val (cols, count) = sibling(all, name, "dbf") match {
        case Some(dbfBytes) =>
          val dbf = DbfReader.parseBytes(dbfBytes)
          (dbf.fields.map(_.name), dbf.records.count(!_.deleted))
        case None => (Seq.empty[String], ShpReader.parseBytes(all(name)).length)
      }
      ShapefilePicker.Candidate(name, name.split('/').last, cols, count)
    }
    val winner = ShapefilePicker.pick(candidates).get
    val feats = ShpReader.parseBytes(all(winner.path))
    val dbf = sibling(all, winner.path, "dbf").map(DbfReader.parseBytes)
    dbf.foreach { d =>
      require(d.records.length == feats.length,
        s"${winner.path}: .dbf has ${d.records.length} records but .shp has " +
          s"${feats.length} features — not a matching sidecar")
    }
    val rows = feats.zipWithIndex.map { case (f, i) =>
      val props = dbf match {
        case Some(d) if !d.records(i).deleted => d.records(i).toMap(d.fields)
        case _ => Map.empty[String, String]
      }
      ShpReader.featureRow(f, props)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), ShpReader.frameSchema)
    val prj = sibling(all, winner.path, "prj").map(new String(_, "UTF-8"))
    Picked(winner.path, df, prj)
  }
}
