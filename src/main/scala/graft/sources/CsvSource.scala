package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction, StandardCharsets}
import java.nio.file.{Files, Paths}

/** S1: encoding-aware CSV ingestion. The reference sniffs bytes with
  * chardet before pandas parses (health_center_lab__data_upload_views.py:
  * 55-70); Spark needs the charset declared up front, so we probe a small
  * prefix driver-side (cheap: one file head, not a data pass) and pass the
  * winner to the distributed reader.
  */
object CsvSource {

  private val candidates: Seq[Charset] = Seq(
    StandardCharsets.UTF_8,
    Charset.forName("windows-1252"),
    StandardCharsets.ISO_8859_1)

  /** Detect the charset of a file from its first `probeBytes` bytes: first
    * candidate that decodes without error wins (UTF-8's strictness makes it
    * a reliable first probe; latin-1 never fails and is the fallback, same
    * ladder the reference's chardet usage effectively lands on).
    */
  def detectEncoding(path: String, probeBytes: Int = 64 * 1024): String = {
    val f = Paths.get(path)
    val size = Files.size(f)
    val n = math.min(size, probeBytes.toLong).toInt
    val bytes = new Array[Byte](n)
    val in = Files.newInputStream(f)
    try { var off = 0; while (off < n) { val r = in.read(bytes, off, n - off); if (r < 0) off = n else off += r } }
    finally in.close()
    // when the probe is a PREFIX of a larger file, decode with
    // endOfInput=false so a multibyte sequence split at the probe
    // boundary reads as "underflow, more input coming" instead of
    // malformed — a hard-truncated decode() misdetected valid UTF-8
    // files larger than the probe as windows-1252
    val complete = n.toLong == size
    candidates.find { cs =>
      val dec: CharsetDecoder = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val out = java.nio.CharBuffer.allocate(n + 1)
      val res = dec.decode(java.nio.ByteBuffer.wrap(bytes), out, complete)
      val flushed = if (complete && !res.isError) dec.flush(out) else res
      !res.isError && !flushed.isError
    }.getOrElse(StandardCharsets.ISO_8859_1).name()
  }

  /** Header CSV scan with sniffed encoding; schema inference can be
    * replaced by an explicit schema for production reads.
    */
  def read(spark: SparkSession, path: String,
      inferSchema: Boolean = true): DataFrame = {
    // Spark 4 whitelists CSV charsets; allow the full JVM charset set so
    // sniffed encodings like windows-1252 read natively.
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    spark.read
      .option("header", "true")
      .option("encoding", detectEncoding(path))
      .option("inferSchema", inferSchema.toString)
      .csv(path)
  }
}
