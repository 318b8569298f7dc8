package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 semantics: code range and hand-computed boundary codes, the
  * one-quantization-step reconstruction bound, the constant-dimension
  * edge, and search quality vs exact L2 on the real corpus (8 bits per
  * dimension is high fidelity — near-perfect top-k). q197's oracle pins
  * the cross-engine bit-parity; these pin the math.
  */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("codes stay in [0, 255]; min codes 0, max codes 255") {
    // dim 1 spans [0, 10]; dim 2 is constant (edge: codes 0, no NaN)
    val vecs = Seq(
      (1L, Array(0.0f, 7.0f)), (2L, Array(10.0f, 7.0f)),
      (3L, Array(5.0f, 7.0f)))
      .toDF("vec_id", "embedding")
    val p = Sq8.fit(vecs, dims = 2)
    assert(p.mins === Seq(0.0, 7.0) && p.maxs === Seq(10.0, 7.0))
    val codes = Sq8.encode(vecs, p).orderBy("vec_id")
      .collect().map(_.getSeq[Int](1))
    assert(codes(0) === Seq(0, 0))
    assert(codes(1) === Seq(255, 0))
    assert(codes(2) === Seq(127, 0)) // floor(5 * 25.5) = 127
  }

  test("reconstruction error is bounded by one quantization step") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = Sq8.fit(e)
    val steps = p.mins.zip(p.maxs).map { case (lo, hi) => (hi - lo) / 255.0 }
    val worstStep = steps.max
    // decode every coded value and compare to the original: |v - r| <
    // step (floor keeps the code's cell containing v)
    val mn = lit(p.mins.toArray); val mx = lit(p.maxs.toArray)
    val maxErr = Sq8.encode(e, p)
      .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(aggregate(
        sequence(lit(1), lit(64)), lit(0.0),
        (acc, i) => {
          val ii = i.cast("int")
          val lo = element_at(mn, ii)
          val r = lo + element_at(col("codes"), ii).cast("double") *
            (element_at(mx, ii) - lo) / lit(255.0)
          greatest(acc, abs(try_element_at(col("embedding"), ii).cast("double") - r))
        }).as("err"))
      .agg(max("err")).collect()(0).getDouble(0)
    assert(maxErr <= worstStep + 1e-12,
      s"reconstruction error $maxErr exceeds one step $worstStep")
  }

  test("SQ8 top-10 matches exact L2 top-10 on the corpus (high fidelity)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = Sq8.fit(e)
    val q = e.filter(col("vec_id") === 42)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val sq8Top = Sq8.encode(e, p).filter(col("vec_id") =!= 42)
      .select(col("vec_id"), Sq8.dist(q, p).as("d"))
      .orderBy("d", "vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    val qL = lit(q.toArray)
    val exactTop = e.filter(col("embedding").isNotNull && col("vec_id") =!= 42)
      .select(col("vec_id"), aggregate(
        sequence(lit(1), lit(64)), lit(0.0),
        (acc, i) => {
          val d = try_element_at(col("embedding"), i.cast("int")).cast("double") -
            element_at(qL, i.cast("int"))
          acc + d * d
        }).as("d"))
      .orderBy("d", "vec_id").limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = (sq8Top intersect exactTop).size
    assert(recall >= 8, s"SQ8 recall@10 too low: $recall (sq8=$sq8Top exact=$exactTop)")
  }
}
