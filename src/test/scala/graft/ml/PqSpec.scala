package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-simulated Lloyd runs on a 4-dim corpus: every centroid, code and
  * ADC distance below is derived on paper (2 subspaces x 2 centroids x
  * 2 iterations), so a drift anywhere in train/encode/ADC shows as an
  * exact mismatch.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(0.0, 0.0, 10.0, 10.0)),
    (1L, Seq(1.0, 1.0, 11.0, 11.0)),
    (2L, Seq(8.0, 8.0, 0.0, 0.0)),
    (3L, Seq(9.0, 9.0, 1.0, 1.0))).toDF("vec_id", "embedding")

  test("fit converges to the hand-simulated centroids") {
    val cbs = Pq.fit(spark, vecs, m = 2, k = 2, iters = 2, dims = 4)
    // subspace 0: iter1 -> c0=(0,0), c1=(6,6); iter2 -> c0=(.5,.5), c1=(8.5,8.5)
    assert(cbs(0)(0) == Seq(0.5, 0.5))
    assert(cbs(0)(1) == Seq(8.5, 8.5))
    // subspace 1: iter1 -> c0=(11/3,11/3), c1=(11,11); iter2 -> c0=(.5,.5), c1=(10.5,10.5)
    assert(cbs(1)(0) == Seq(0.5, 0.5))
    assert(cbs(1)(1) == Seq(10.5, 10.5))
  }

  test("encode picks nearest centroid per subspace; ADC ranks by table sums") {
    val cbs = Pq.fit(spark, vecs, m = 2, k = 2, iters = 2, dims = 4)
    val coded = Pq.encode(vecs, cbs, dims = 4)
    val codes = coded.select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(0L) == Seq(0L, 1L) && codes(1L) == Seq(0L, 1L))
    assert(codes(2L) == Seq(1L, 0L) && codes(3L) == Seq(1L, 0L))

    val table = Pq.adcTable(Seq(0.0, 0.0, 10.0, 10.0), cbs, dims = 4)
    assert(table(0) == Seq(0.5, 144.5))
    assert(table(1) == Seq(180.5, 0.5))
    val top = Pq.adcTopK(coded, table, topK = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(top.toSeq == Seq((0L, 1.0), (1L, 1.0), (2L, 325.0), (3L, 325.0)))
  }

  test("argmin ties break to the lowest centroid id") {
    // two identical centroids: every vector must code to id 0
    val twin = Seq(
      (0L, Seq(2.0, 2.0)), (1L, Seq(2.0, 2.0)), (2L, Seq(7.0, 7.0))).toDF("vec_id", "embedding")
    val cbs = Pq.fit(spark, twin, m = 1, k = 2, iters = 1, dims = 2)
    // init c0 = c1 = (2,2); all rows tie -> all assigned to cell 0 -> c0
    // updates to the global mean, c1 keeps (2,2)
    val coded = Pq.encode(twin, cbs, dims = 2)
    val codeOf = coded.select(col("vec_id"), element_at(col("codes"), 1)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // c0 = mean of all three = (11/3, 11/3); c1 = (2,2): vecs 0,1 are now
    // nearer to (2,2) = c1, vec 2 nearer to c0
    assert(codeOf(0L) == 1L && codeOf(1L) == 1L && codeOf(2L) == 0L)
  }
}
