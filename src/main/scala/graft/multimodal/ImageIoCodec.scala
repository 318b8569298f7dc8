package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real PNG/JPEG/GIF/TIFF decode via the JDK's built-in `javax.imageio`
  * plugins — no native codecs, no AWT display (verified headless in this
  * container: `ImageIO.getReaderFormatNames()` lists png/jpeg/gif/tiff/
  * bmp/wbmp). This closes the gap the old `decodeStub` papered over for
  * the common image formats; the stub remains only for opaque blobs ([[WebpCodec]] covers webp), which the
  * JDK ships no plugin for.
  *
  * Feature extraction mirrors [[BmpCodec.Decoded]]: integer milli-luma
  * (299·R + 587·G + 114·B per pixel) so sums are exact in any order, and
  * the two corner probes pin row orientation. Pixels are read through
  * `BufferedImage.getRGB`, which normalizes every source layout (palette
  * GIF, interleaved-byte PNG, YCbCr JPEG) to sRGB ints — PNG and GIF
  * round-trip bit-exactly (measured), JPEG is lossy by design and gets a
  * tolerance-banded check instead of a hash-exact one.
  *
  * Scale shape: both encode and decode are row-local calls inside
  * `mapPartitions` — payload bytes never leave the executor, never
  * shuffle, and throughput scales with input splits.
  */
object ImageIoCodec {

  /** Decoded feature summary — see [[BmpCodec.Decoded]] for field
    * semantics (identical, deliberately: one downstream schema).
    */
  final case class Decoded(
      width: Int,
      height: Int,
      channels: Int,
      lumaSumMilli: Long,
      topLeftLumaMilli: Long,
      bottomRightLumaMilli: Long)

  /** Encode an RGB image via an ImageIO writer. `fmt` is an ImageIO
    * format name ("png", "gif", "jpg"); `rgb(x, y)` returns a packed
    * 0xRRGGBB. PNG output bytes are deterministic for fixed pixels
    * (measured in-container), so fixture synthesis is reproducible.
    */
  def encode(width: Int, height: Int, fmt: String)(rgb: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, bos), s"no ImageIO writer for '$fmt'")
    bos.toByteArray
  }

  /** Decode any ImageIO-supported payload to its feature summary. Fails
    * loudly (IllegalArgumentException) on undecodable bytes — a decode
    * stage must not silently mis-sum garbage.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    def lumaAt(x: Int, y: Int): Long = {
      val p = img.getRGB(x, y)
      299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
    }
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += lumaAt(x, y); x += 1 }
      y += 1
    }
    Decoded(w, h, img.getColorModel.getNumComponents, sum,
      lumaAt(0, 0), lumaAt(w - 1, h - 1))
  }

  /** Resize-by-box-pooling: decode and pool the pixel grid into a
    * `grid`×`grid` thumbnail of integer milli-luma box SUMS (not means —
    * sums stay exact integers in any order; callers divide by the box
    * pixel count if they want the mean). Box (gx, gy) covers columns
    * [gx·w/grid, (gx+1)·w/grid) × rows [gy·h/grid, (gy+1)·h/grid) in
    * integer arithmetic, so every pixel lands in exactly one box for any
    * image size. Output is row-major. This is the feature-extract /
    * downsample stage of an image pipeline (a perceptual hash is a few
    * comparisons over these sums — see the q135 query).
    */
  def boxSums(bytes: Array[Byte], grid: Int): (Int, Int, Array[Long]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    require(w >= grid && h >= grid, s"${w}x$h too small for a $grid x $grid grid")
    val sums = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val gy = y * grid / h
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sums(gy * grid + x * grid / w) +=
          299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, sums)
  }
}
