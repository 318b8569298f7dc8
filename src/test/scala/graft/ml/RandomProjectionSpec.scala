package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("sign matrix is deterministic and roughly balanced") {
    val a = RandomProjection.signMatrix(64, 16)
    val b = RandomProjection.signMatrix(64, 16)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val ones = a.flatten.count(_ > 0)
    assert(ones > 380 && ones < 644, s"suspicious sign balance: $ones/1024")
  }

  test("identical vectors get identical sketches; sketch is integer-exact") {
    val df = Seq(
      (1L, (0 until 64).map(i => 0.01 * i)),
      (2L, (0 until 64).map(i => 0.01 * i)),
      (3L, (0 until 64).map(i => -0.02 * i))).toDF("vec_id", "embedding")
    val out = RandomProjection.sketch(df, "embedding", 64, 16)
      .select("vec_id", "jl").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) === out(2L))
    assert(out(1L) !== out(3L))
  }

  test("JL norm preservation holds on the real embeddings") {
    val e = sf("embeddings").limit(100)
    val rows = RandomProjection.sketch(e, "embedding", 64, 16)
      .select(col("embedding").cast("array<double>"), col("jl"))
      .collect()
    val ratios = rows.map { r =>
      val w = r.getSeq[Double](0).map(x => math.floor(x * 1048576.0))
      val y = r.getSeq[Long](1)
      val wn = w.map(x => x * x).sum
      val yn = y.map(x => x.toDouble * x).sum / 16.0
      yn / wn
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.4,
      s"E[||y||^2/r] should approximate ||w||^2, mean ratio was $mean")
  }

  test("guards") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      RandomProjection.sketch(df, "embedding", 2, 3))
  }
}
