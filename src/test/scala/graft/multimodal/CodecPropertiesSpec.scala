package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property invariants for the real codecs: ANY image/clip round-trips
  * through encode→decode with statistics equal to those computed directly
  * from the synthesis function — across random dimensions (every padding
  * width), random pixel/sample content, and multi-channel audio. Raw
  * ScalaCheck generators with fixed seeds (same offline discipline as
  * PropertiesSpec).
  */
class CodecPropertiesSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(97L + i)))

  test("property: BMP round-trip is exact for any dims and pixel content") {
    val caseGen = Gen.zip(Gen.choose(1, 40), Gen.choose(1, 40), Gen.long)
    samples(caseGen, 60).foreach { case (w, h, seed) =>
      // deterministic pseudo-random pixels from the case seed
      def rgb(x: Int, y: Int): Int = {
        val m = seed * 6364136223846793005L + (x.toLong << 20) + y + 1442695040888963407L
        ((m >>> 16) & 0xffffff).toInt
      }
      val d = BmpCodec.decode(BmpCodec.encode(w, h)(rgb))
      assert(d.width == w && d.height == h && d.channels == 3)

      def luma(p: Int): Long =
        299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
      val expected = (for (y <- 0 until h; x <- 0 until w) yield luma(rgb(x, y))).sum
      assert(d.lumaSumMilli == expected, s"luma sum at ${w}x$h seed $seed")
      assert(d.topLeftLumaMilli == luma(rgb(0, 0)))
      assert(d.bottomRightLumaMilli == luma(rgb(w - 1, h - 1)))
    }
  }

  test("property: WAV round-trip is exact for any frames/channels/samples") {
    val caseGen = Gen.zip(Gen.choose(1, 700), Gen.choose(1, 3), Gen.long)
    samples(caseGen, 60).foreach { case (n, ch, seed) =>
      def sample(f: Int, c: Int): Int = {
        val m = seed + f.toLong * 2654435761L + c * 40503L
        (m % 32768).toInt // in [-32767, 32767]
      }
      val d = WavCodec.decode(WavCodec.encode(n, ch)(sample))
      assert(d.nFrames == n && d.channels == ch && d.bitsPerSample == 16)
      val all = for (f <- 0 until n; c <- 0 until ch) yield sample(f, c)
      assert(d.ampSum == all.map(_.toLong).sum, s"amp sum at n=$n ch=$ch seed $seed")
      assert(d.ampSqSum == all.map(a => a.toLong * a).sum)
      assert(d.minAmp == all.min && d.maxAmp == all.max)
    }
  }
}
