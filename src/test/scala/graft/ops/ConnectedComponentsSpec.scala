package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  // threshold 0 forces the distributed large-star/small-star path;
  // the default exercises the driver union-find fast path — both must
  // return the identical (node, root) contract
  private def roots(edges: Seq[(Long, Long)], threshold: Long): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"), driverThreshold = threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("non-convergence is loud, never silently-wrong component ids") {
    val chain = (0L until 50L).map(i => (i, i + 1))
    assertThrows[IllegalStateException] {
      ConnectedComponents.run(chain.toDF("src", "dst"),
        maxIters = 1, driverThreshold = 0L).collect()
    }
  }

  for ((label, threshold) <- Seq("distributed" -> 0L, "driver" -> 100000L)) {

    test(s"[$label] long chain collapses to the min (worst case for naive propagation)") {
      val n = 200L
      val m = roots((0L until n - 1).map(i => (i, i + 1)), threshold)
      assert((1L until n).forall(m(_) == 0L))
      assert(!m.contains(0L), "the root itself never appears as a node")
    }

    test(s"[$label] two components + duplicate and self edges") {
      val m = roots(Seq((5L, 3L), (3L, 9L), (9L, 5L), (5L, 5L), (20L, 30L), (30L, 20L)), threshold)
      assert(m == Map(5L -> 3L, 9L -> 3L, 30L -> 20L))
    }

    test(s"[$label] star graphs are already converged") {
      val m = roots(Seq((10L, 1L), (11L, 1L), (12L, 1L)), threshold)
      assert(m == Map(10L -> 1L, 11L -> 1L, 12L -> 1L))
    }

    test(s"[$label] empty edge set yields empty result") {
      assert(ConnectedComponents.run(
        Seq.empty[(Long, Long)].toDF("src", "dst"), driverThreshold = threshold).isEmpty)
    }
  }
}
