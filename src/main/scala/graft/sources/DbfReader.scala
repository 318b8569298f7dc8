package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

/** S4 attribute half: a pure-JVM dBase III (.dbf) record reader — the
  * sidecar that carries a shapefile's feature properties (province/
  * district/sector/village names, codes, populations), which the
  * reference receives through `gpd.read_file` and builds the boundaries
  * schema from (village_admin_boundaries_etl_view.py:418-485). The .dbf
  * layout is public (dBase III spec): a 32-byte header (LE record count
  * at 4, header size at 8, record size at 10), 32-byte field descriptors
  * (11-byte NUL-padded name, 1-byte type, length, decimal count) up to
  * the 0x0D terminator, then fixed-width ASCII records each prefixed by
  * a 1-byte deletion flag (0x20 live, '*' deleted).
  *
  * Value canonicalization (what `gpd.read_file` delivers, stringified):
  * C trims trailing padding; N/F trim both sides (kept as the literal
  * digit string — typing is the consumer's schema decision); D becomes
  * ISO `YYYY-MM-DD`; L maps Y/y/T/t → "true", N/n/F/f → "false"; an
  * all-blank value is absent (None). Deleted records are PARSED and
  * FLAGGED, never silently dropped — .shp pairing is positional, so the
  * caller decides (ShpReader keeps the row with empty properties).
  *
  * Driver-side parse like [[ShpReader]]/[[XlsxSource]]: upload-payload
  * files, not bulk scans.
  */
object DbfReader {

  final case class DbfField(name: String, ftype: Char, length: Int, decimals: Int)

  final case class DbfRecord(deleted: Boolean, values: Seq[Option[String]]) {
    /** name → value map for live fields (blanks absent). */
    def toMap(fields: Seq[DbfField]): Map[String, String] =
      fields.zip(values).collect { case (f, Some(v)) => f.name -> v }.toMap
  }

  final case class Dbf(fields: Seq[DbfField], records: Seq[DbfRecord])

  def parse(path: String): Dbf = parseBytes(Files.readAllBytes(Paths.get(path)))

  def parseBytes(bytes: Array[Byte]): Dbf = {
    require(bytes.length >= 33, s"dbf too short for a header (${bytes.length} bytes)")
    val hdr = ByteBuffer.wrap(bytes, 0, 32).order(ByteOrder.LITTLE_ENDIAN)
    val version = bytes(0) & 0x07 // low bits carry the file type
    require(version == 3 || version == 4,
      s"unsupported dbf version byte 0x${(bytes(0) & 0xff).toHexString} (dBase III/IV only)")
    val recordCount = hdr.getInt(4)
    val headerSize = hdr.getShort(8) & 0xffff
    val recordSize = hdr.getShort(10) & 0xffff
    require(headerSize >= 33 && headerSize <= bytes.length,
      s"dbf header size $headerSize overruns the file (${bytes.length} bytes)")
    require(recordSize >= 1, s"dbf record size $recordSize must include the deletion flag")

    // field descriptors: 32 bytes each, terminated by 0x0D
    val fields = ArrayBuffer[DbfField]()
    var off = 32
    while (off < headerSize - 1 && bytes(off) != 0x0D) {
      require(off + 32 <= headerSize,
        s"field descriptor at $off overruns the declared header ($headerSize)")
      val rawName = bytes.slice(off, off + 11)
      val nameEnd = rawName.indexWhere(_ == 0) match { case -1 => 11; case i => i }
      val name = new String(rawName, 0, nameEnd, "ISO-8859-1").trim
      val ftype = (bytes(off + 11) & 0xff).toChar
      val length = bytes(off + 16) & 0xff
      val decimals = bytes(off + 17) & 0xff
      require("CNFDL".indexOf(ftype) >= 0,
        s"field '$name': unsupported type '$ftype' (C/N/F/D/L only)")
      fields += DbfField(name, ftype, length, decimals)
      off += 32
    }
    val declaredWidth = 1 + fields.map(_.length).sum
    require(declaredWidth == recordSize,
      s"field widths sum to $declaredWidth but header declares record size $recordSize")

    val records = ArrayBuffer[DbfRecord]()
    var ro = headerSize
    var rec = 0
    while (rec < recordCount) {
      require(ro + recordSize <= bytes.length,
        s"record $rec overruns the file (truncated .dbf)")
      val flag = bytes(ro) & 0xff
      require(flag == 0x20 || flag == '*',
        s"record $rec: bad deletion flag 0x${flag.toHexString}")
      var fo = ro + 1
      val vals = fields.map { f =>
        val raw = new String(bytes, fo, f.length, "ISO-8859-1")
        fo += f.length
        decodeValue(f, raw)
      }
      records += DbfRecord(flag == '*', vals.toSeq)
      ro += recordSize
      rec += 1
    }
    Dbf(fields.toSeq, records.toSeq)
  }

  private def decodeValue(f: DbfField, raw: String): Option[String] = f.ftype match {
    case 'C' =>
      val v = raw.replaceAll("[ \\u0000]+$", "")
      if (v.isEmpty) None else Some(v)
    case 'N' | 'F' =>
      val v = raw.trim
      if (v.isEmpty || v.forall(_ == '*')) None else Some(v)
    case 'D' =>
      val v = raw.trim
      if (v.length == 8 && v.forall(_.isDigit))
        Some(s"${v.substring(0, 4)}-${v.substring(4, 6)}-${v.substring(6, 8)}")
      else None
    case 'L' =>
      raw.trim.headOption.collect {
        case 'Y' | 'y' | 'T' | 't' => "true"
        case 'N' | 'n' | 'F' | 'f' => "false"
      }
    case _ => None
  }
}
