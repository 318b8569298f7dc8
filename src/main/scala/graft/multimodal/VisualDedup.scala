package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The perceptual-fingerprint column algebra shared by the batch visual
  * near-dup query (q140) and the store-backed streaming ingest loop
  * ([[Multimodal.visualNearDupIngestStream]]) — one definition, so the
  * stream's verdicts can never drift from the oracle-checked batch
  * semantics.
  *
  * Geometry: a g×g panel of integer milli-luma box sums per image
  * ([[ImageIoCodec.boxSums]]; box k along a dim spans
  * [ceil(k·dim/g), ceil((k+1)·dim/g))). From the box MEANS a
  * 2·g·(g-1)-bit difference hash (horizontal + vertical adjacent-pair
  * comparisons via integer cross-multiplication — exact, and invariant
  * under uniform brightness shifts), split LSH-style into bands for
  * blocking; candidate pairs verify every box mean within 1 luma level.
  */
object VisualDedup {

  /** Default grid (4×4 → 24-bit dHash → 4 six-bit bands). */
  val Grid = 4
  val Bands = 4
  val BandBits = 6

  /** Box k's lower pixel bound along `dim`: ceil(k·dim/g). */
  def bnd(dim: Column, k: Int, g: Int = Grid): Column =
    floor((lit(k) * dim + lit(g - 1)) / lit(g)).cast("long")

  /** Pixel count of box (l, k) for a w×h image. */
  def npix(wc: Column, hc: Column, l: Int, k: Int, g: Int = Grid): Column =
    (bnd(wc, k + 1, g) - bnd(wc, k, g)) * (bnd(hc, l + 1, g) - bnd(hc, l, g))

  /** Box sum (l, k) from a `<pfx>box_sums` column. */
  def bs(pfx: String, l: Int, k: Int, g: Int = Grid): Column =
    element_at(col(pfx + "box_sums"), l * g + k + 1)

  /** The 2·g·(g-1)-bit perceptual dHash over `<pfx>{width,height,box_sums}`:
    * bits 0..g(g-1)-1 horizontal (mean(l,k) > mean(l,k+1)), the rest
    * vertical — mean comparisons as integer cross-multiplication.
    */
  def dhash(pfx: String = "", g: Int = Grid): Column = {
    val w = col(pfx + "width"); val h = col(pfx + "height")
    val hBits = for { l <- 0 until g; k <- 0 until g - 1 } yield
      when(bs(pfx, l, k, g) * npix(w, h, l, k + 1, g)
          > bs(pfx, l, k + 1, g) * npix(w, h, l, k, g),
        lit(1L << (l * (g - 1) + k))).otherwise(lit(0L))
    val vBits = for { l <- 0 until g - 1; k <- 0 until g } yield
      when(bs(pfx, l, k, g) * npix(w, h, l + 1, k, g)
          > bs(pfx, l + 1, k, g) * npix(w, h, l, k, g),
        lit(1L << (g * (g - 1) + l * g + k))).otherwise(lit(0L))
    (hBits ++ vBits).reduce(_ + _)
  }

  /** Explode a framed feature row into its LSH band rows, adding
    * `band_idx` and `band_val` (six-bit slices of `dhash`).
    */
  def explodeBands(df: DataFrame): DataFrame =
    df.withColumn("band_idx", explode(sequence(lit(0), lit(Bands - 1))))
      .withColumn("band_val", expr(s"shiftright(dhash, band_idx * $BandBits) & ${(1 << BandBits) - 1}"))

  /** One blocking key string per band row — (dims, band) in a single
    * column so a signature STORE can bucket on it (the text-store
    * discipline of Curation.writeBandedSignatureStore).
    */
  def bandKey(pfx: String = ""): Column =
    concat_ws("|", col(pfx + "width"), col(pfx + "height"),
      col(pfx + "band_idx"), col(pfx + "band_val"))

  /** Candidate-pair verify: every box mean within 1 luma level, as
    * integer sum differences against 1000·boxPixels. Reads
    * `<pfxA>box_sums`, `<pfxB>box_sums` and `<pfxA>{width,height}` (the
    * blocking key guarantees equal dims).
    */
  def verify(pfxA: String, pfxB: String, g: Int = Grid): Column =
    (for { l <- 0 until g; k <- 0 until g } yield
      abs(bs(pfxA, l, k, g) - bs(pfxB, l, k, g)) <=
        lit(1000L) * npix(col(pfxA + "width"), col(pfxA + "height"), l, k, g))
      .reduce(_ && _)
}
