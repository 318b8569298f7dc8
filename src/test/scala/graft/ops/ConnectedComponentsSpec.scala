package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def roots(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("long chain collapses to the min (worst case for naive propagation)") {
    val n = 200L
    val m = roots((0L until n - 1).map(i => (i, i + 1)))
    assert((1L until n).forall(m(_) == 0L))
    assert(!m.contains(0L), "the root itself never appears as a node")
  }

  test("two components + duplicate and self edges") {
    val m = roots(Seq((5L, 3L), (3L, 9L), (9L, 5L), (5L, 5L), (20L, 30L), (30L, 20L)))
    assert(m == Map(5L -> 3L, 9L -> 3L, 30L -> 20L))
  }

  test("star graphs are already converged") {
    val m = roots(Seq((10L, 1L), (11L, 1L), (12L, 1L)))
    assert(m == Map(10L -> 1L, 11L -> 1L, 12L -> 1L))
  }

  test("empty edge set yields empty result") {
    assert(ConnectedComponents.run(
      Seq.empty[(Long, Long)].toDF("src", "dst")).isEmpty)
  }
}
