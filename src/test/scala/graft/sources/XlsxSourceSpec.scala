package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Round-trips a programmatically built OOXML workbook (the format is a
  * public standard: ZIP + SpreadsheetML) through XlsxSource and on through
  * the lab cleaning layer — the reference's pd.read_excel upload path
  * (health_center_lab__data_upload_views.py:72-73).
  */
class XlsxSourceSpec extends SparkSpec {

  private def writeFixture(): String = {
    val path = Files.createTempFile("fixture", ".xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/></sheets>
        |</workbook>""".stripMargin)
    // shared strings: headers + text values (with a multi-run <si> like real
    // writers emit for styled text)
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="9" uniqueCount="9">
        |<si><t>Year</t></si><si><t>Month</t></si><si><t>Age</t></si><si><t>Gender</t></si><si><t>Slide Status</t></si>
        |<si><t>January</t></si><si><r><t>Ma</t></r><r><t>le</t></r></si><si><t>POSITIVE</t></si><si><t xml:space="preserve">no malaria</t></si>
        |</sst>""".stripMargin)
    // row 1 = header (shared strings); row 2: numerics + shared; row 3 has a
    // gap (B skipped) and an inline string cell
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c><c r="E1" t="s"><v>4</v></c></row>
        |<row r="2"><c r="A2"><v>2023</v></c><c r="B2" t="s"><v>5</v></c><c r="C2"><v>34</v></c><c r="D2" t="s"><v>6</v></c><c r="E2" t="s"><v>7</v></c></row>
        |<row r="3"><c r="A3"><v>2024</v></c><c r="C3"><v>7</v></c><c r="D3" t="inlineStr"><is><r><t>F</t></r><r><t>emale</t></r></is></c><c r="E3" t="s"><v>8</v></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin)
    zos.close()
    path
  }

  test("XlsxSource parses shared/inline/numeric cells and sparse rows") {
    val (header, rows) = XlsxSource.parse(writeFixture())
    assert(header == Seq("Year", "Month", "Age", "Gender", "Slide Status"))
    assert(rows.size == 2)
    assert(rows(0) == Seq("2023", "January", "34", "Male", "POSITIVE"))
    // inline rich text: multiple <r><t> runs concatenate ("F" + "emale")
    assert(rows(1) == Seq("2024", null, "7", "Female", "no malaria"))
  }

  test("column reference decoding") {
    assert(XlsxSource.colIndex("A1", 9) == 0)
    assert(XlsxSource.colIndex("C7", 9) == 2)
    assert(XlsxSource.colIndex("AA10", 9) == 26)
    assert(XlsxSource.colIndex("", 9) == 9)
  }

  test("xlsx feeds the lab pipeline end-to-end (S2 upload path)") {
    val df = XlsxSource.read(spark, writeFixture())
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val cleaned = graft.analytics.LabTransform.transform(df).collect()
    assert(cleaned.length == 2)
    val byYear = cleaned.map(r => r.getAs[Int]("year") -> r).toMap
    assert(byYear(2023).getAs[String]("gender") == "Male")
    assert(byYear(2023).getAs[String]("test_result") == "Positive")
    assert(byYear(2023).getAs[Boolean]("is_positive"))
    // "no malaria" keyword-order quirk: interpreted Positive (F6 parity)
    assert(byYear(2024).getAs[String]("test_result") == "Positive")
    assert(byYear(2024).getAs[Int]("age") == 7)
  }

  test("toParquet lands a columnar copy") {
    val out = Files.createTempDirectory("xlsxpq").toString + "/t"
    val n = XlsxSource.toParquet(spark, writeFixture(), out)
    assert(n == 2)
    assert(spark.read.parquet(out).count() == 2)
  }
}
