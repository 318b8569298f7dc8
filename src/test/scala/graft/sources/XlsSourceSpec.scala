package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import java.nio.{ByteBuffer, ByteOrder}

/** Byte-level fixture for the legacy `.xls` upload path
  * (health_center_lab__data_upload_views.py:73): a hand-assembled OLE2
  * compound file wrapping a BIFF8 workbook stream — SST with a CONTINUE-
  * split string (per-fragment encoding flag), LABELSST, NUMBER, RK (int,
  * ×100, raw-double), MULRK, BOOLERR, FORMULA (cached number + STRING
  * result). Exactly the record mix real HMIS-era writers emit.
  */
class XlsSourceSpec extends SparkSpec {

  // ---- BIFF record assembly ----------------------------------------

  private def le16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def le64(v: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
  private def rec(typ: Int, payload: Array[Byte]): Array[Byte] =
    le16(typ) ++ le16(payload.length) ++ payload

  /** Compressed (latin-1) XLUnicodeString. */
  private def str8(s: String): Array[Byte] =
    le16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1")
  /** UTF-16LE XLUnicodeString. */
  private def str16(s: String): Array[Byte] =
    le16(s.length) ++ Array(1.toByte) ++ s.getBytes("UTF-16LE")

  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, le16(row) ++ le16(col) ++ le16(0) ++ le32(isst))
  private def number(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x0203, le16(row) ++ le16(col) ++ le16(0) ++ le64(v))
  private def rkRec(row: Int, col: Int, rk: Int): Array[Byte] =
    rec(0x027E, le16(row) ++ le16(col) ++ le16(0) ++ le32(rk))
  private def mulRk(row: Int, colFirst: Int, rks: Seq[Int]): Array[Byte] =
    rec(0x00BD, le16(row) ++ le16(colFirst) ++
      rks.flatMap(rk => le16(0) ++ le32(rk)).toArray ++
      le16(colFirst + rks.size - 1))
  private def boolErr(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x0205, le16(row) ++ le16(col) ++ le16(0) ++
      Array((if (v) 1 else 0).toByte, 0.toByte))
  private def formulaNum(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x0006, le16(row) ++ le16(col) ++ le16(0) ++ le64(v) ++
      le16(0) ++ le32(0) ++ le16(0)) // grbit + chn + empty parsed expr
  private def formulaStr(row: Int, col: Int): Array[Byte] =
    rec(0x0006, le16(row) ++ le16(col) ++ le16(0) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0xFF.toByte, 0xFF.toByte) ++
      le16(0) ++ le32(0) ++ le16(0))

  /** BIFF8 workbook stream: globals (SST split across a CONTINUE whose
    * second fragment switches to UTF-16) + one worksheet substream.
    *
    * `rowOff` shifts the whole table down (leading blank rows) and
    * `gapAfterHeader` opens an empty row between header and data — real
    * HMIS exports do both, and parse() must resolve them identically to
    * the xlsx reader (header = first PRESENT row, gap rows skipped).
    */
  private def biffStream(rowOff: Int = 0, gapAfterHeader: Int = 0): Array[Byte] = {
    val h = rowOff            // header row index
    val d = rowOff + 1 + gapAfterHeader // first data row index
    val bof = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val bofSheet = rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val eof = rec(0x000A, Array.empty[Byte])

    // SST: 8 strings; "Status" split mid-word across CONTINUE (compressed
    // first fragment, UTF-16 second — the flag-per-fragment rule), and a
    // UTF-16 value with a non-latin char
    val sstStrings7 = Array.concat(
      str8("Year"), str8("Month"), str8("Age"), str8("Score"),
      // string 4 = "Status": header + "Sta" in fragment 1
      le16(6) ++ Array(0.toByte) ++ "Sta".getBytes("ISO-8859-1"))
    val sstContinue = Array(1.toByte) ++ "tus".getBytes("UTF-16LE") ++
      Array.concat(str8("January"), str16("Kigalié"), str8("POSITIVE"))
    val sst = rec(0x00FC, le32(8) ++ le32(8) ++ sstStrings7) ++ rec(0x003C, sstContinue)

    val sheet = Array.concat(
      bofSheet,
      // header row from SST
      labelSst(h, 0, 0), labelSst(h, 1, 1), labelSst(h, 2, 2), labelSst(h, 3, 3), labelSst(h, 4, 4),
      // data row 1: NUMBER, LABELSST, MULRK [int 34, x100 7.25], LABELSST
      number(d, 0, 2023.0), labelSst(d, 1, 5),
      mulRk(d, 2, Seq((34 << 2) | 2, (725 << 2) | 3)), labelSst(d, 4, 7),
      // data row 2: RK x100 int (202400 -> 2024), gap at B, RK raw-double
      // 0.5, UTF-16 SST label, BOOLERR true
      rkRec(d + 1, 0, (202400 << 2) | 3), rkRec(d + 1, 2, 0x3FE00000),
      labelSst(d + 1, 3, 6), boolErr(d + 1, 4, true),
      // data row 3: formula with cached numeric result; formula with
      // string result carried by the trailing STRING record
      formulaNum(d + 2, 0, 4046.0), formulaStr(d + 2, 1), rec(0x0207, str8("sum")),
      eof)

    val globalsPrefix = bof
    // BOUNDSHEET needs the sheet substream offset — compute from sizes
    val boundsheetLen = 4 + 4 + 2 + 1 + 1 + "Sheet1".length
    val globalsLen = globalsPrefix.length + sst.length + (4 + boundsheetLen) + eof.length
    val boundsheet = rec(0x0085, le32(globalsLen) ++ le16(0) ++
      Array("Sheet1".length.toByte, 0.toByte) ++ "Sheet1".getBytes("ISO-8859-1"))
    val stream = Array.concat(globalsPrefix, sst, boundsheet, eof, sheet)
    // pad past the 4096 mini-stream cutoff so the workbook lives in
    // regular FAT sectors, like every real-world .xls
    stream ++ new Array[Byte](math.max(0, 4608 - stream.length))
  }

  /** Minimal OLE2/CFB container: FAT sector 0, directory sector 1,
    * workbook stream in sectors 2+.
    */
  private def writeFixture(rowOff: Int = 0, gapAfterHeader: Int = 0): String = {
    val wb = biffStream(rowOff, gapAfterHeader)
    val nStream = (wb.length + 511) / 512
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    header.position(24)
    header.putShort(0x003E.toShort); header.putShort(3) // minor/major
    header.putShort(0xFFFE.toShort) // byte order
    header.putShort(9); header.putShort(6) // sector 512 / mini 64
    header.position(44)
    header.putInt(1) // one FAT sector
    header.putInt(1) // directory starts at sector 1
    header.putInt(0) // transaction
    header.putInt(4096) // mini cutoff
    header.putInt(-2); header.putInt(0) // no miniFAT
    header.putInt(-2); header.putInt(0) // no DIFAT chain
    header.putInt(0) // DIFAT[0] = FAT at sector 0
    for (_ <- 1 until 109) header.putInt(-1)

    val fat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    fat.putInt(0xFFFFFFFD) // sector 0: FAT itself
    fat.putInt(-2) // sector 1: directory (single-sector chain)
    for (i <- 0 until nStream - 1) fat.putInt(3 + i) // stream chain 2..n
    fat.putInt(-2) // last stream sector
    while (fat.remaining() >= 4) fat.putInt(-1)

    def dirEntry(name: String, typ: Int, start: Int, size: Int): Array[Byte] = {
      val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val n = name.getBytes("UTF-16LE")
      e.put(n); e.position(64); e.putShort((n.length + 2).toShort)
      e.put(typ.toByte); e.put(0.toByte) // color
      e.position(68); e.putInt(-1); e.putInt(-1); e.putInt(-1) // siblings/child
      e.position(116); e.putInt(start); e.putInt(size)
      e.array()
    }
    val dir = Array.concat(
      dirEntry("Root Entry", 5, -2, 0),
      dirEntry("Workbook", 2, 2, wb.length),
      new Array[Byte](256))

    val path = Files.createTempFile("fixture", ".xls").toString
    val out = new java.io.FileOutputStream(path)
    out.write(header.array()); out.write(fat.array()); out.write(dir)
    out.write(wb)
    val pad = nStream * 512 - wb.length
    if (pad > 0) out.write(new Array[Byte](pad))
    out.close()
    path
  }

  test("XlsSource parses BIFF8 cell records incl. CONTINUE-split SST") {
    val (header, rows) = XlsSource.parse(writeFixture())
    assert(header == Seq("Year", "Month", "Age", "Score", "Status"))
    assert(rows.size == 3)
    assert(rows(0) == Seq("2023", "January", "34", "7.25", "POSITIVE"))
    assert(rows(1) == Seq("2024", null, "0.5", "Kigalié", "true"))
    assert(rows(2) == Seq("4046", "sum", null, null, null))
  }

  test("leading blank rows and a header-data gap resolve like the xlsx reader") {
    // table starts at sheet row 2 with an empty row between header and
    // data: header must come from the first PRESENT row and the gap row
    // must be skipped, not materialized as an all-null record — the
    // absolute-row-0 anchoring this regression-tests rejected such files
    val (header, rows) = XlsSource.parse(writeFixture(rowOff = 2, gapAfterHeader = 1))
    assert(header == Seq("Year", "Month", "Age", "Score", "Status"))
    assert(rows.size == 3)
    assert(rows(0) == Seq("2023", "January", "34", "7.25", "POSITIVE"))
  }

  test("xls feeds the engine as strings (S2 legacy upload path)") {
    val df = XlsSource.read(spark, writeFixture())
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 3)
  }

  test("ExcelSource dispatches by magic bytes; garbage rejected clearly") {
    assert(ExcelSource.read(spark, writeFixture()).count() == 3)
    val garbage = Files.createTempFile("not-excel", ".xls")
    Files.write(garbage, "this,is,csv\n1,2,3\n".getBytes("UTF-8"))
    val err = intercept[IllegalArgumentException] {
      ExcelSource.read(spark, garbage.toString)
    }
    assert(err.getMessage.contains("neither OLE2"))
  }
}
