package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton code: naive bit-by-bit interleave. */
  private def morton(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x.toLong >> i) & 1L) << (2 * i) | ((y.toLong >> i) & 1L) << (2 * i + 1)
    }

  test("zvalue matches the naive bit interleave over adversarial values") {
    val cases = Seq((0, 0), (1, 0), (0, 1), (0xFFFF, 0xFFFF), (0xAAAA, 0x5555),
      (12345, 54321), (65535, 0), (1, 65535), (32768, 32767))
    val got = cases.toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == cases.map { case (x, y) => morton(x, y) })
  }

  test("z-curve locality: a small xy-box spans a bounded z-range") {
    // the whole point of the layout: boxes aligned to power-of-two cells
    // map to ONE contiguous z-range (here a 16x16 cell = 256 codes)
    val zs = for (x <- 16 until 32; y <- 32 until 48) yield morton(x, y)
    assert(zs.max - zs.min == 255)
  }

  test("values above 16 bits are masked, not corrupted") {
    val z = Seq((0x1FFFF, 0)).toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y"))).head().getLong(0)
    assert(z == morton(0xFFFF, 0))
  }

  test("writeZOrdered round-trips data unchanged and drops the layout column") {
    val df = spark.range(0, 1000).select(
      (col("id") % 37).as("x"), (col("id") % 53).as("y"), col("id").as("payload"))
    ZOrder.writeZOrdered(df, "/tmp/graft_zorder_spec", col("x"), col("y"), 4)
    val back = spark.read.parquet("/tmp/graft_zorder_spec")
    assert(back.columns.sorted.toSeq == Seq("payload", "x", "y"))
    assert(back.count() == 1000)
    assert(back.agg(sum("payload")).head().getLong(0) == (0L until 1000L).sum)
  }
}
