package graft.graph

import graft.SparkSpec

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int, scale: Long) =
    LinkGraph.pagerank(edges.toDF("src", "dst"), iters, scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pagerank matches the hand-computed integer recurrence") {
    // 1→2, 2→1, 3→1: node 1 is the hub, node 3 gets no in-links.
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L))
    // one round: r1(1) = 150 + 85*(1000+1000)/100 = 1850
    assert(ranks(e, 1, 1000L) === Map(1L -> 1850L, 2L -> 1000L, 3L -> 150L))
    // two rounds: r2(1) = 150 + (85*(1000+150)) div 100 = 1127
    //             r2(2) = 150 + (85*1850) div 100 = 1722
    assert(ranks(e, 2, 1000L) === Map(1L -> 1127L, 2L -> 1722L, 3L -> 150L))
  }

  test("multi-edges contribute once per edge with the split out-degree") {
    // 1 links to 2 twice: outdeg(1)=2, each edge carries rank div 2.
    val r = ranks(Seq((1L, 2L), (1L, 2L)), 1, 1000L)
    assert(r(2L) === 150L + (85L * (500L + 500L)) / 100L)
    assert(r(1L) === 150L) // dangling mass leaks by design
  }

  test("dangling targets keep receiving the base mass every round") {
    // 1→2 and 2 has no out-edges: 2's rank decays toward base, never NPEs.
    val r = ranks(Seq((1L, 2L)), 3, 1000L)
    assert(r(1L) === 150L)
    // r1(2)=1000, r2(2)=150+85*150/100=277, r3(2)=150+(85*150) div 100=277
    assert(r(2L) === 277L)
  }

  test("hits separates hubs from authorities on the hand graph") {
    val out = LinkGraph.hits(Seq((1L, 3L), (2L, 3L)).toDF("src", "dst"),
      iters = 2, scale = 1024L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 1 and 2 are pure hubs, 3 is the pure authority
    assert(out === Set((1L, 1024L, 0L), (2L, 1024L, 0L), (3L, 0L, 1024L)))
    val chain = LinkGraph.hits(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"),
      iters = 2, scale = 1024L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // middle node is both hub and authority at full weight
    assert(chain === Set((1L, 1024L, 0L), (2L, 1024L, 1024L), (3L, 0L, 1024L)))
  }

  test("personalized pagerank: mass flows only from the seed set") {
    def ppr(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int) =
      LinkGraph.pagerankPersonalized(edges.toDF("src", "dst"),
        seeds.toDF("node_id"), iters, 1000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Seq((1L, 2L), (2L, 3L), (9L, 1L))
    // one round: seed keeps base 150, its target gets 850, rest 0
    assert(ppr(e, Seq(1L), 1) ===
      Map(1L -> 150L, 2L -> 850L, 3L -> 0L, 9L -> 0L))
    // two rounds: 3 becomes reachable (85*850 div 100 = 722);
    // 2 decays to 85*150 div 100 = 127; 9 stays at 0 forever
    assert(ppr(e, Seq(1L), 2) ===
      Map(1L -> 150L, 2L -> 127L, 3L -> 722L, 9L -> 0L))
  }

  test("label propagation: clamped seeds, tie-break, 2-hop spread") {
    def lp(edges: Seq[(Long, Long)], seeds: Seq[(Long, String)], iters: Int) =
      LinkGraph.labelPropagation(
        edges.toDF("src", "dst"), seeds.toDF("node_id", "label"), iters)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // tie between a and b breaks toward the LARGER label
    assert(lp(Seq((1L, 2L), (3L, 2L)), Seq(1L -> "a", 3L -> "b"), 1) ===
      Map(1L -> "a", 3L -> "b", 2L -> "b"))
    // a seed never changes, whatever its in-neighbors say
    assert(lp(Seq((1L, 3L)), Seq(1L -> "a", 3L -> "b"), 3)(3L) === "b")
    // two rounds reach two hops down a chain
    assert(lp(Seq((1L, 2L), (2L, 3L)), Seq(1L -> "a"), 2) ===
      Map(1L -> "a", 2L -> "a", 3L -> "a"))
    // one round reaches only one hop — node 3 stays unlabeled (absent)
    assert(!lp(Seq((1L, 2L), (2L, 3L)), Seq(1L -> "a"), 1).contains(3L))
  }

  test("anchorsByTarget caps at the lexicographically smallest distinct") {
    val e = Seq(
      (1L, 9L, "zeta"), (2L, 9L, "alpha"), (3L, 9L, "midway"),
      (4L, 9L, "alpha"), // duplicate anchor — distinct-set collapses it
      (5L, 7L, "only")
    ).toDF("src", "dst", "anchor")
    val out = LinkGraph.anchorsByTarget(e, cap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set((9L, 4L, "alpha|midway"), (7L, 1L, "only")))
  }
}
