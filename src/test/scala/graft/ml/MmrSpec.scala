package graft.ml

import graft.SparkSpec
import Mmr.Cand

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // three near-identical high-relevance vectors + one orthogonal
  // medium-relevance vector: pure relevance ranks the clones 1-2-3;
  // MMR must interleave the orthogonal one at rank 2.
  private val pool = Seq(
    Cand(1L, Seq(1.0, 0.0, 0.0), rel = 0.99),
    Cand(2L, Seq(0.999, 0.01, 0.0), rel = 0.98),
    Cand(3L, Seq(0.998, 0.02, 0.0), rel = 0.97),
    Cand(4L, Seq(0.0, 1.0, 0.0), rel = 0.60))

  test("diversification actually reorders: orthogonal beats redundant") {
    val picks = Mmr.select(pool, k = 3, lam = 0.7)
    assert(picks.map(_.id) === Seq(1L, 4L, 2L))
    assert(picks.head.score === 0.99) // rank 1 = raw relevance
    // rank-2 scores: clone 2 pays ~1.0 similarity penalty, 4 pays ~0
    assert(picks(1).score > 0.7 * 0.98 - (1.0 - 0.7) * 1.0)
  }

  test("lambda = 1 reduces to pure relevance order") {
    assert(Mmr.select(pool, 4, 1.0).map(_.id) === Seq(1L, 2L, 3L, 4L))
  }

  test("k larger than the pool returns the whole pool; ties break by id") {
    assert(Mmr.select(pool, 99, 0.7).length === 4)
    val tied = Seq(
      Cand(7L, Seq(1.0, 0.0), 0.5), Cand(3L, Seq(1.0, 0.0), 0.5))
    assert(Mmr.select(tied, 1, 0.7).head.id === 3L)
  }

  test("batch path equals the row-local core per group") {
    val df = (for {
      q <- Seq(10L, 20L)
      c <- pool
    } yield (q, c.id + q, c.vec, c.rel))
      .toDF("query_id", "vec_id", "embedding", "rel")
    val got = Mmr.diversifyBatch(df, k = 3, lam = 0.7)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    for (q <- Seq(10L, 20L)) {
      val want = Mmr.select(
        pool.map(c => c.copy(id = c.id + q)), 3, 0.7)
      assert(got(q).sortBy(_._2).toSeq ===
        want.map(p => (q, p.rank, p.id, p.score)))
    }
  }

  test("guards: empty k, bad lambda") {
    intercept[IllegalArgumentException](Mmr.select(pool, 0, 0.7))
    intercept[IllegalArgumentException](Mmr.select(pool, 1, 1.5))
  }
}
