package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

/** S2: `.xlsx` ingestion at the ingest boundary. The reference accepts
  * Excel uploads via `pd.read_excel`
  * (health_center_lab__data_upload_views.py:72-73,
  * weather_data_prec_temp_upload_views.py:95-96); offline, no spark-excel
  * dependency is available, so this is a self-contained OOXML reader:
  * xlsx = ZIP + XML (SpreadsheetML), both parseable with the JDK alone
  * (java.util.zip + StAX).
  *
  * Scope matches the reference's usage — request-payload-sized workbooks
  * parsed once at upload time (driver-side, like [[CsvSource]]'s encoding
  * probe), then handed to the distributed engine as a DataFrame/parquet.
  * This is NOT a distributed scan and doesn't need to be: bulk data lands
  * as CSV/parquet; xlsx is the human-upload boundary.
  *
  * All cells surface as strings (the downstream clean layer owns typing —
  * try_cast discipline, SURVEY.md §2.3); numeric cells keep their literal
  * lexical form from the file.
  */
object XlsxSource {

  /** Parse the first worksheet into (header, rows). Handles shared strings
    * (`t="s"`), inline strings (`t="inlineStr"`), formula/literal strings
    * (`t="str"`), booleans (`t="b"`) and plain numeric cells; skips empty
    * cells (sparse rows are padded with nulls).
    */
  def parse(path: String): (Seq[String], Seq[Seq[String]]) = {
    val zip = new ZipFile(path)
    try {
      val shared = readSharedStrings(zip)
      // first worksheet = the first <sheet> in workbook.xml resolved
      // through workbook.xml.rels — pd.read_excel(sheet_name=0) order. A
      // user who reorders tabs keeps the data in its original part file
      // (sheet2.xml may be the FIRST sheet), so part filenames are only
      // the fallback when the workbook metadata is absent/degenerate.
      val sheetEntry = firstSheetByWorkbookOrder(zip).orElse {
        // fallback: lowest-numbered sheetN.xml (writers that delete
        // sheets keep non-contiguous numbering — sheet2.xml may be the
        // only sheet, so a hardcoded sheet1.xml would miss it)
        val es = zip.entries()
        val pat = "xl/worksheets/sheet(\\d+)\\.xml".r
        var found: Option[(Int, java.util.zip.ZipEntry)] = None
        while (es.hasMoreElements) {
          val e = es.nextElement()
          e.getName match {
            case pat(n) if found.forall(_._1 > n.toInt) => found = Some((n.toInt, e))
            case _ =>
          }
        }
        found.map(_._2)
      }.getOrElse(throw new IllegalArgumentException(
        s"$path: no xl/worksheets/sheetN.xml — not an xlsx workbook?"))
      val rows = readSheet(zip, sheetEntry, shared)
      if (rows.isEmpty) (Seq.empty, Seq.empty)
      else {
        val header = rows.head.map(v => if (v == null) "" else v)
        val width = header.length
        val data = rows.tail.map(r => r.padTo(width, null).take(width).toSeq)
        (header.toSeq, data.toSeq)
      }
    } finally zip.close()
  }

  /** First worksheet as a DataFrame of strings (header row = column names). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (header, data) = parse(path)
    require(header.nonEmpty, s"$path: empty workbook")
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val rows = data.map(r => Row.fromSeq(r))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, math.max(1, rows.size / 10000)),
      schema)
  }

  /** The upload-path conversion the reference performs implicitly:
    * xlsx → columnar parquet, after which everything is a normal scan.
    */
  def toParquet(spark: SparkSession, xlsxPath: String, outPath: String): Long = {
    val df = read(spark, xlsxPath)
    df.write.mode("overwrite").parquet(outPath)
    df.count()
  }

  /** Resolve the first sheet in WORKBOOK order: the first `<sheet>` of
    * xl/workbook.xml, mapped through xl/_rels/workbook.xml.rels
    * (r:id → worksheet part). Returns None when either part or attribute
    * is missing so the caller can fall back to the filename heuristic.
    */
  private def firstSheetByWorkbookOrder(zip: ZipFile): Option[java.util.zip.ZipEntry] =
    try {
      val wbEntry = Option(zip.getEntry("xl/workbook.xml"))
      val relsEntry = Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
      for {
        wb <- wbEntry
        rels <- relsEntry
        firstRid <- {
          val in = zip.getInputStream(wb)
          try {
            val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
            var rid: Option[String] = None
            while (rid.isEmpty && r.hasNext) {
              if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet")
                rid = (0 until r.getAttributeCount)
                  .find(i => r.getAttributeLocalName(i) == "id")
                  .map(r.getAttributeValue)
            }
            rid
          } finally in.close()
        }
        target <- {
          val in = zip.getInputStream(rels)
          try {
            val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
            var t: Option[String] = None
            while (t.isEmpty && r.hasNext) {
              if (r.next() == XMLStreamConstants.START_ELEMENT &&
                r.getLocalName == "Relationship" &&
                Option(r.getAttributeValue(null, "Id")).contains(firstRid))
                t = Option(r.getAttributeValue(null, "Target"))
            }
            t
          } finally in.close()
        }
        entry <- {
          // Target is usually relative ("worksheets/sheet2.xml"), sometimes
          // absolute ("/xl/worksheets/sheet2.xml")
          val name = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
          Option(zip.getEntry(name))
        }
      } yield entry
    } catch { case _: Exception => None }

  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val in = zip.getInputStream(entry)
    try {
      val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
      val out = ArrayBuffer[String]()
      val sb = new StringBuilder
      var inSi = false
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; sb.clear()
              case "t" if inSi => inT = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += sb.toString
              case _ =>
            }
          case _ =>
        }
      }
      out.toIndexedSeq
    } finally in.close()
  }

  private def readSheet(zip: ZipFile, entry: java.util.zip.ZipEntry,
      shared: IndexedSeq[String]): Seq[ArrayBuffer[String]] = {
    val in = zip.getInputStream(entry)
    try {
      val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
      val rows = ArrayBuffer[ArrayBuffer[String]]()
      var row: ArrayBuffer[String] = null
      var cellCol = -1
      var cellType = ""
      var sawValue = false
      var inV = false
      val v = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = ArrayBuffer[String]()
              case "c" if row != null =>
                val ref = Option(r.getAttributeValue(null, "r")).getOrElse("")
                cellCol = colIndex(ref, fallback = row.length)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                sawValue = false
                v.clear()
              // accumulate across ALL v/t fragments of the cell: inline
              // rich text is multiple <r><t> runs that concatenate (same
              // rule readSharedStrings applies within one <si>)
              case "v" | "t" if cellCol >= 0 => inV = true; sawValue = true
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV => v.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" | "t" => inV = false
              case "c" =>
                if (cellCol >= 0 && sawValue) {
                  val raw = v.toString
                  val value = cellType match {
                    // malformed or out-of-range shared-string indexes
                    // degrade the one cell to null, not the whole parse
                    case "s" => scala.util.Try(raw.trim.toInt).toOption
                      .flatMap(shared.lift).orNull
                    case "b" => if (raw.trim == "1") "true" else "false"
                    case _ => raw
                  }
                  while (row.length <= cellCol) row += null
                  row(cellCol) = value
                }
                cellCol = -1
              case "row" => rows += row; row = null
              case _ =>
            }
          case _ =>
        }
      }
      rows.toSeq
    } finally in.close()
  }

  /** "C7" → 2; tolerates missing refs by falling back to append order. */
  private[sources] def colIndex(cellRef: String, fallback: Int): Int = {
    val letters = cellRef.takeWhile(_.isLetter).toUpperCase
    if (letters.isEmpty) fallback
    else letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }
}
