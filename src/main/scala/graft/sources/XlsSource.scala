package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.mutable.ArrayBuffer

/** S2's legacy half: `.xls` (BIFF8) ingestion at the ingest boundary. The
  * reference's `pd.read_excel` accepts both `.xls` and `.xlsx`
  * (health_center_lab__data_upload_views.py:72-73,
  * weather_data_prec_temp_upload_views.py:95-96,
  * malaria_htmis_api_upload_view.py:133) — a user uploading an old HMIS
  * workbook hits this path. Offline, with no POI/spark-excel available,
  * this is a self-contained reader for the two public formats involved:
  * the OLE2/CFB compound container ([MS-CFB]) and the BIFF8 record stream
  * ([MS-XLS]) — both parseable with the JDK alone.
  *
  * Same scope and contract as [[XlsxSource]]: request-payload-sized
  * workbooks parsed once driver-side at upload time, every cell surfaced
  * as a string for the clean layer's try_cast discipline. BIFF stores
  * numbers as typed doubles (there is no lexical form to preserve), so
  * integral values render without the trailing `.0` pandas would show —
  * the downstream try_cast behavior is identical either way. Dates arrive
  * as Excel serial numbers (format records are not applied), matching the
  * reference pipelines, which upload date-free tabular sheets.
  *
  * Record coverage: LABELSST, LABEL/RSTRING, NUMBER, RK, MULRK, BOOLERR,
  * FORMULA (cached numeric/bool/string results + the trailing STRING
  * record), BLANK/MULBLANK (nulls). SST strings handle compressed and
  * UTF-16 encodings, rich-text/phonetic skips, and CONTINUE splits with
  * per-fragment encoding flags — the part real-world files exercise most.
  */
object XlsSource {

  /** Parse the first worksheet into (header, rows) — [[XlsxSource.parse]]
    * contract.
    */
  def parse(path: String): (Seq[String], Seq[Seq[String]]) = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val wb = workbookStream(bytes, path)
    val cells = firstSheetCells(wb)
    if (cells.isEmpty) return (Seq.empty, Seq.empty)
    // PRESENT rows only, like the xlsx reader (which sees only the <row>
    // elements the writer emitted): the header is the first row carrying
    // any cell record — a sheet whose table starts below a leading blank
    // row must parse identically in both formats — and gap rows between
    // records are skipped rather than materialized as all-null rows
    val present = cells.keysIterator.map(_._1).toArray.distinct.sorted
    val headerRow = present.head
    val width = cells.keysIterator.filter(_._1 == headerRow)
      .map(_._2).maxOption.map(_ + 1).getOrElse(0)
    val header = (0 until width)
      .map(c => cells.getOrElse((headerRow, c), "")).map(v => if (v == null) "" else v)
    val data = present.iterator.drop(1).map { r =>
      (0 until width).map(c => cells.getOrElse((r, c), null)): Seq[String]
    }.toSeq
    (header, data)
  }

  /** First worksheet as a DataFrame of strings — [[XlsxSource.read]] contract. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (header, data) = parse(path)
    require(header.nonEmpty, s"$path: empty workbook")
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val rows = data.map(r => Row.fromSeq(r))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, math.max(1, rows.size / 10000)),
      schema)
  }

  // ------------------------------------------------------------------
  // OLE2 / CFB container ([MS-CFB])
  // ------------------------------------------------------------------

  private val EndOfChain = 0xFFFFFFFE
  private val cfbMagic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes.take(8).sameElements(cfbMagic)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** Locate and extract the "Workbook"/"Book" stream. */
  private def workbookStream(bytes: Array[Byte], path: String): Array[Byte] = {
    if (!isCfb(bytes))
      throw new IllegalArgumentException(
        s"$path: not an OLE2 compound file — not a legacy .xls workbook " +
          "(xlsx uploads go through XlsxSource; see ExcelSource.read)")
    val sectorSize = 1 << u16(bytes, 30)
    val miniCutoff = i32(bytes, 56)
    def sector(id: Int): Int = (id + 1) * sectorSize

    // DIFAT: 109 header entries + chained DIFAT sectors
    val difat = ArrayBuffer[Int]()
    for (i <- 0 until 109) {
      val v = i32(bytes, 76 + i * 4)
      if (v >= 0) difat += v
    }
    var difatSect = i32(bytes, 68)
    while (difatSect != EndOfChain && difatSect >= 0) {
      val base = sector(difatSect)
      for (i <- 0 until sectorSize / 4 - 1) {
        val v = i32(bytes, base + i * 4)
        if (v >= 0) difat += v
      }
      difatSect = i32(bytes, base + sectorSize - 4)
    }
    // FAT: int per sector id → next in chain
    val fat = difat.toArray.flatMap { fs =>
      val base = sector(fs)
      (0 until sectorSize / 4).map(i => i32(bytes, base + i * 4))
    }
    def chain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != EndOfChain && s >= 0 && guard <= fat.length) {
        out.write(bytes, sector(s), sectorSize)
        s = fat(s)
        guard += 1
      }
      out.toByteArray
    }

    // directory entries (128 bytes each)
    val dir = chain(i32(bytes, 48))
    case class Entry(name: String, typ: Int, start: Int, size: Int)
    val entries = (0 until dir.length / 128).map { i =>
      val o = i * 128
      val nameLen = u16(dir, o + 64)
      val name = if (nameLen >= 2)
        new String(dir, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Entry(name, dir(o + 66) & 0xFF, i32(dir, o + 116), i32(dir, o + 120))
    }
    val wbEntry = entries.find(e => e.typ == 2 && (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(throw new IllegalArgumentException(
        s"$path: no Workbook stream in compound file — not an Excel .xls?"))
    if (wbEntry.name == "Book" && entries.forall(_.name != "Workbook"))
      throw new IllegalArgumentException(
        s"$path: BIFF5/'Book' stream (Excel 5.0/95) is not supported — " +
          "re-save as .xls (Excel 97+) or .xlsx")

    if (wbEntry.size >= miniCutoff) chain(wbEntry.start).take(wbEntry.size)
    else {
      // mini-stream: 64-byte sectors inside the root entry's stream
      val root = entries.find(_.typ == 5).getOrElse(
        throw new IllegalArgumentException(s"$path: compound file has no root entry"))
      val miniStream = chain(root.start)
      val miniFatBytes = chain(i32(bytes, 60))
      val miniFat = (0 until miniFatBytes.length / 4).map(i => i32(miniFatBytes, i * 4))
      val out = new java.io.ByteArrayOutputStream()
      var s = wbEntry.start
      var guard = 0
      while (s != EndOfChain && s >= 0 && guard <= miniFat.length) {
        out.write(miniStream, s * 64, 64)
        s = miniFat(s)
        guard += 1
      }
      out.toByteArray.take(wbEntry.size)
    }
  }

  // ------------------------------------------------------------------
  // BIFF8 record stream ([MS-XLS])
  // ------------------------------------------------------------------

  private val RecBof = 0x0809
  private val RecEof = 0x000A
  private val RecContinue = 0x003C
  private val RecSst = 0x00FC
  private val RecBoundsheet = 0x0085
  private val RecLabelSst = 0x00FD
  private val RecLabel = 0x0204
  private val RecRString = 0x00D6
  private val RecNumber = 0x0203
  private val RecRk = 0x027E
  private val RecMulRk = 0x00BD
  private val RecBoolErr = 0x0205
  private val RecFormula = 0x0006
  private val RecString = 0x0207

  /** One record: type + payload fragments (payload ++ CONTINUE payloads).
    * Fragments are (offset, length) windows into the stream — no copies.
    */
  private final case class Rec(typ: Int, frags: Seq[(Int, Int)])

  /** Sequential records from `start`, folding CONTINUE into the previous
    * record, stopping after the matching EOF (depth-aware: embedded BOF/
    * EOF pairs of charts/macros don't terminate the scan early).
    */
  private def records(wb: Array[Byte], start: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var off = start
      private var done = false
      private var depth = 0
      def hasNext: Boolean = !done && off + 4 <= wb.length
      def next(): Rec = {
        val typ = u16(wb, off)
        val len = u16(wb, off + 2)
        val frags = ArrayBuffer((off + 4, len))
        off += 4 + len
        if (typ == RecBof) depth += 1
        if (typ == RecEof) { depth -= 1; if (depth <= 0) done = true }
        while (!done && off + 4 <= wb.length && u16(wb, off) == RecContinue) {
          val clen = u16(wb, off + 2)
          frags += ((off + 4, clen))
          off += 4 + clen
        }
        Rec(typ, frags.toSeq)
      }
    }

  /** Byte cursor over a record's fragments. Primitive reads cross
    * fragment boundaries transparently; CHARACTER reads re-read the
    * encoding flag byte at each new fragment (the CONTINUE rule for
    * split strings).
    */
  private final class Cursor(wb: Array[Byte], frags: Seq[(Int, Int)]) {
    private var fi = 0
    private var pos = 0
    def hasMore: Boolean = {
      while (fi < frags.length && pos >= frags(fi)._2) { fi += 1; pos = 0 }
      fi < frags.length
    }
    private def atFragStart: Boolean = pos == 0 && fi > 0
    def u8(): Int = {
      if (!hasMore) throw new IllegalArgumentException("xls: truncated record")
      val v = wb(frags(fi)._1 + pos) & 0xFF
      pos += 1
      v
    }
    def u16le(): Int = u8() | (u8() << 8)
    def i32le(): Int = u16le() | (u16le() << 16)
    def f64le(): Double = {
      var bits = 0L
      for (i <- 0 until 8) bits |= (u8().toLong << (8 * i))
      java.lang.Double.longBitsToDouble(bits)
    }
    def skip(n: Int): Unit = { var i = 0; while (i < n) { u8(); i += 1 } }

    /** XLUnicodeString: cch chars with flags (rich runs + phonetic data
      * skipped), encoding re-announced at CONTINUE boundaries.
      */
    def unicodeString(cchBytes: Int = 2): String = {
      val cch = if (cchBytes == 2) u16le() else u8()
      val grbit = u8()
      var high = (grbit & 1) != 0
      val cRun = if ((grbit & 8) != 0) u16le() else 0
      val cbExt = if ((grbit & 4) != 0) i32le() else 0
      val sb = new java.lang.StringBuilder(cch)
      var i = 0
      while (i < cch) {
        // normalize to the next fragment before the boundary test
        if (hasMore && atFragStart) high = (u8() & 1) != 0
        val ch = if (high) u16le() else u8()
        sb.append(ch.toChar)
        i += 1
      }
      skip(cRun * 4 + cbExt)
      sb.toString
    }
  }

  /** RK-encoded number: 30-bit int or truncated double, optionally /100. */
  private def rkValue(rk: Int): Double = {
    val base = if ((rk & 2) != 0) (rk >> 2).toDouble
    else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** BIFF stores typed doubles; integral values render without ".0" so the
    * clean layer's try_cast sees the same lexical form CSV would carry.
    */
  private def numToString(d: Double): String =
    if (!d.isNaN && !d.isInfinite && d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** (row, col) → string value for the first worksheet. */
  private def firstSheetCells(wb: Array[Byte]): Map[(Int, Int), String] = {
    // globals: SST + first worksheet BOUNDSHEET offset
    var sst = IndexedSeq.empty[String]
    var sheetOffset = -1
    records(wb, 0).foreach { r =>
      r.typ match {
        case RecSst =>
          val c = new Cursor(wb, r.frags)
          c.i32le() // total refs
          val unique = c.i32le()
          val out = new ArrayBuffer[String](unique)
          var i = 0
          while (i < unique && c.hasMore) { out += c.unicodeString(); i += 1 }
          sst = out.toIndexedSeq
        case RecBoundsheet if sheetOffset < 0 =>
          val c = new Cursor(wb, r.frags)
          val off = c.i32le()
          c.u16le() // visibility + type low byte
          // type lives in the high byte of the options word: 0 = worksheet
          val typ = (r.frags.headOption.map { case (o, _) => wb(o + 5) & 0xFF }).getOrElse(0)
          if (typ == 0) sheetOffset = off
        case _ =>
      }
    }
    if (sheetOffset < 0)
      throw new IllegalArgumentException("xls: workbook has no worksheet BOUNDSHEET")

    val cells = scala.collection.mutable.Map[(Int, Int), String]()
    var pendingFormulaCell: Option[(Int, Int)] = None
    records(wb, sheetOffset).foreach { r =>
      val c = new Cursor(wb, r.frags)
      r.typ match {
        case RecLabelSst =>
          val row = c.u16le(); val col = c.u16le(); c.u16le()
          cells((row, col)) = sst.lift(c.i32le()).orNull
        case RecLabel | RecRString =>
          val row = c.u16le(); val col = c.u16le(); c.u16le()
          cells((row, col)) = c.unicodeString()
        case RecNumber =>
          val row = c.u16le(); val col = c.u16le(); c.u16le()
          cells((row, col)) = numToString(c.f64le())
        case RecRk =>
          val row = c.u16le(); val col = c.u16le(); c.u16le()
          cells((row, col)) = numToString(rkValue(c.i32le()))
        case RecMulRk =>
          val len = r.frags.map(_._2).sum
          val row = c.u16le(); val colFirst = c.u16le()
          val n = (len - 6) / 6
          for (i <- 0 until n) {
            c.u16le() // xf
            cells((row, colFirst + i)) = numToString(rkValue(c.i32le()))
          }
        case RecBoolErr =>
          val row = c.u16le(); val col = c.u16le(); c.u16le()
          val v = c.u8(); val isErr = c.u8()
          if (isErr == 0) cells((row, col)) = if (v == 1) "true" else "false"
        case RecFormula =>
          val row = c.u16le(); val col = c.u16le(); c.u16le()
          val resultBytes = (0 until 8).map(_ => c.u8())
          if (resultBytes(6) == 0xFF && resultBytes(7) == 0xFF) {
            resultBytes.head match {
              case 0 => pendingFormulaCell = Some((row, col)) // STRING follows
              case 1 => cells((row, col)) = if (resultBytes(2) == 1) "true" else "false"
              case 3 => cells((row, col)) = ""
              case _ => // error result → null (cell absent)
            }
          } else {
            var bits = 0L
            for (i <- 0 until 8) bits |= (resultBytes(i).toLong << (8 * i))
            cells((row, col)) = numToString(java.lang.Double.longBitsToDouble(bits))
          }
        case RecString =>
          pendingFormulaCell.foreach(rc => cells(rc) = c.unicodeString())
          pendingFormulaCell = None
        case _ =>
      }
    }
    cells.toMap
  }
}

/** The reference's `pd.read_excel` accepts either Excel format through one
  * call — this is that dispatch: magic-byte sniff → [[XlsSource]] (OLE2)
  * or [[XlsxSource]] (ZIP), with a clear reject for anything else.
  */
object ExcelSource {
  def read(spark: SparkSession, path: String): DataFrame = {
    val head = {
      val in = new java.io.FileInputStream(path)
      // readNBytes, not read: a single read() may legally return fewer
      // than 8 bytes, which would misclassify a valid workbook
      try in.readNBytes(8)
      finally in.close()
    }
    if (XlsSource.isCfb(head)) XlsSource.read(spark, path)
    else if (head.length >= 2 && head(0) == 'P'.toByte && head(1) == 'K'.toByte)
      XlsxSource.read(spark, path)
    else throw new IllegalArgumentException(
      s"$path: neither OLE2 (.xls) nor ZIP (.xlsx) magic bytes — not an Excel workbook")
  }
}
