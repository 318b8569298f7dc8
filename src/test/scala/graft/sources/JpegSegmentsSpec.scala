package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Marker-walk hardening for the JPEG-in-TIFF byte plumbing: ITU T.81
  * §B.1.1.2 permits any number of 0xFF fill bytes before a marker, and a
  * foreign/truncated stream must fail with the module's loud require,
  * never an ArrayIndexOutOfBoundsException or a garbage length read.
  * (The happy-path split/merge is exercised end-to-end by
  * TiffReaderSpec's compression-7 round-trips.)
  */
class JpegSegmentsSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int): Array[Byte] =
    JpegSegments.encodeGray(
      Array.tabulate(w * h)(i => ((i * 31) % 256).toByte), w, h)

  test("fill bytes before header markers are skipped, split unchanged") {
    val stream = gray(16, 16)
    val (tables, image) = JpegSegments.splitTables(stream)
    // pad AFTER SOI: FF D8 | FF FF FF | <first segment> — three fill
    // bytes directly in front of the first header marker
    val padded = stream.take(2) ++ Array.fill(3)(0xFF.toByte) ++ stream.drop(2)
    val (tablesP, imageP) = JpegSegments.splitTables(padded)
    assert(tablesP.toSeq == tables.toSeq)
    assert(imageP.toSeq == image.toSeq)
    // and the padded interchange stream still decodes through the same
    // merge path the TIFF reader uses
    val px = JpegSegments.decodeGray(imageP, Some(tablesP), 16, 16)
    assert(px.toSeq == JpegSegments.decodeGray(stream, None, 16, 16).toSeq)
  }

  test("truncated and overrunning streams fail loudly, not out-of-bounds") {
    val stream = gray(16, 16)
    // cut inside the first header segment's body: the next marker read
    // lands on non-FF bytes or past the end — require, not AIOOBE
    val cut = stream.take(6)
    val e1 = intercept[IllegalArgumentException] { JpegSegments.splitTables(cut) }
    assert(e1.getMessage.contains("JPEG") || e1.getMessage.contains("marker"))
    // a stream that ENDS in fill bytes names the condition
    val fillTail = stream.take(2) ++ Array.fill(4)(0xFF.toByte)
    val e2 = intercept[IllegalArgumentException] { JpegSegments.splitTables(fillTail) }
    assert(e2.getMessage.contains("fill bytes"))
    // a segment whose declared length overruns the stream is named too:
    // craft SOI + APP0 claiming 0xFFFF content bytes
    val lying = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xE0.toByte, 0xFF.toByte, 0xFF.toByte, 0x00, 0x00)
    val e3 = intercept[IllegalArgumentException] { JpegSegments.splitTables(lying) }
    assert(e3.getMessage.contains("overrunning"))
  }
}
