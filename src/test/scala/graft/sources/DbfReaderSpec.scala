package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}

/** Builds a dBase III .dbf byte-for-byte per the public spec and pins
  * [[DbfReader]]'s layout walk (LE header counts, 32-byte descriptors,
  * 0x0D terminator), per-type value canonicalization (C pad-trim,
  * N overflow sentinel, D → ISO, L tri-state), deleted-row flagging,
  * and the loud failure paths. No Spark — driver-side parse; the
  * geometry pairing is ShpReaderSpec's job.
  */
class DbfReaderSpec extends AnyFunSuite {

  /** (name, type, length, decimals) descriptors + rows of fixed-width
    * cell strings (caller pads), with per-row deleted flags.
    */
  private def dbfBytes(fields: Seq[(String, Char, Int, Int)],
      rows: Seq[(Boolean, Seq[String])]): Array[Byte] = {
    val headerSize = 32 + 32 * fields.size + 1
    val recordSize = 1 + fields.map(_._3).sum
    val buf = ByteBuffer.allocate(headerSize + recordSize * rows.size + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte) // dBase III, no memo
    buf.put(126.toByte).put(8.toByte).put(15.toByte) // YMD stamp
    buf.putInt(rows.size)
    buf.putShort(headerSize.toShort)
    buf.putShort(recordSize.toShort)
    buf.position(32)
    fields.foreach { case (name, t, len, dec) =>
      val start = buf.position()
      val nb = name.getBytes("ISO-8859-1")
      buf.put(nb, 0, math.min(nb.length, 11))
      buf.position(start + 11)
      buf.put(t.toByte)
      buf.position(start + 16)
      buf.put(len.toByte).put(dec.toByte)
      buf.position(start + 32)
    }
    buf.put(0x0D.toByte)
    rows.foreach { case (deleted, cells) =>
      buf.put(if (deleted) '*'.toByte else 0x20.toByte)
      fields.zip(cells).foreach { case ((_, _, len, _), cell) =>
        val cb = cell.getBytes("ISO-8859-1")
        require(cb.length == len, s"fixture cell '$cell' is not $len bytes")
        buf.put(cb)
      }
    }
    buf.put(0x1A.toByte) // EOF marker
    buf.array()
  }

  private val AdminFields = Seq(
    ("VILLAGE", 'C', 12, 0), ("SECTOR", 'C', 10, 0), ("POPULATION", 'N', 8, 0),
    ("AREA_KM", 'N', 10, 4), ("SURVEYED", 'D', 8, 0), ("URBAN", 'L', 1, 0))

  private val AdminRows = Seq(
    (false, Seq("Kigarama    ", "Kicukiro  ", "    1250", "    2.5000", "20240315", "Y")),
    (false, Seq("Nyarugunga  ", "Kicukiro  ", "     980", "   12.0000", "20231102", "n")),
    (true,  Seq("Ghost       ", "Gone      ", "       1", "    0.0001", "20200101", "T")),
    (false, Seq("            ", "Rusororo  ", "        ", "**********", "        ", " ")))

  test("header, descriptors and typed values parse per the dBase III layout") {
    val dbf = DbfReader.parseBytes(dbfBytes(AdminFields, AdminRows))
    assert(dbf.fields.map(_.name) ===
      Seq("VILLAGE", "SECTOR", "POPULATION", "AREA_KM", "SURVEYED", "URBAN"))
    assert(dbf.fields.map(_.ftype) === Seq('C', 'C', 'N', 'N', 'D', 'L'))
    assert(dbf.fields(3).decimals === 4)
    assert(dbf.records.length === 4)

    val r0 = dbf.records(0).toMap(dbf.fields)
    assert(r0 === Map("VILLAGE" -> "Kigarama", "SECTOR" -> "Kicukiro",
      "POPULATION" -> "1250", "AREA_KM" -> "2.5000",
      "SURVEYED" -> "2024-03-15", "URBAN" -> "true"))
    assert(dbf.records(1).toMap(dbf.fields)("URBAN") === "false")
  }

  test("deleted rows are parsed and FLAGGED, never dropped") {
    val dbf = DbfReader.parseBytes(dbfBytes(AdminFields, AdminRows))
    assert(dbf.records.map(_.deleted) === Seq(false, false, true, false))
    // the deleted row's values still parse (the caller decides)
    assert(dbf.records(2).toMap(dbf.fields)("VILLAGE") === "Ghost")
  }

  test("blanks and the numeric-overflow sentinel are absent, not empty strings") {
    val dbf = DbfReader.parseBytes(dbfBytes(AdminFields, AdminRows))
    val r3 = dbf.records(3).toMap(dbf.fields)
    assert(r3 === Map("SECTOR" -> "Rusororo")) // others all blank/overflow/'?'
  }

  test("C values keep leading spaces and interior spaces, trim only the pad") {
    val dbf = DbfReader.parseBytes(dbfBytes(
      Seq(("NAME", 'C', 10, 0)), Seq((false, Seq("  a b c   ")))))
    assert(dbf.records(0).values(0) === Some("  a b c"))
  }

  test("failure paths are loud") {
    val good = dbfBytes(AdminFields, AdminRows)
    intercept[IllegalArgumentException] { DbfReader.parseBytes(Array[Byte](3, 1)) }
    // bad version byte
    val badVer = good.clone(); badVer(0) = 0x07
    intercept[IllegalArgumentException] { DbfReader.parseBytes(badVer) }
    // truncated record region
    intercept[IllegalArgumentException] {
      DbfReader.parseBytes(java.util.Arrays.copyOf(good, good.length - 20))
    }
    // record size disagreeing with field widths
    val badRs = good.clone()
    ByteBuffer.wrap(badRs).order(ByteOrder.LITTLE_ENDIAN).putShort(10, 99.toShort)
    intercept[IllegalArgumentException] { DbfReader.parseBytes(badRs) }
    // unsupported field type
    val badT = good.clone(); badT(32 + 11) = 'M'
    intercept[IllegalArgumentException] { DbfReader.parseBytes(badT) }
  }
}
