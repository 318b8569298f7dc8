package graft.graph

import graft.SparkSpec

/** Pointer-jumping semantics by hand: doubling actually doubles (a
  * 7-hop chain resolves in 3 rounds; 2 rounds must NOT suffice), hop
  * counts are exact, cycles terminate unresolved, the single-successor
  * contract is enforced loudly, and off-chain nodes produce no rows.
  */
class RedirectsSpec extends SparkSpec {
  import spark.implicits._

  private def chain7 = (1 to 7).map(i => (i.toLong, (i - 1).toLong))

  test("a 7-hop chain resolves in 3 rounds with exact hop counts") {
    val out = Redirects.resolve(chain7.toDF("src", "dst"), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out.toSeq === (1 to 7).map(i => (i.toLong, 0L, i.toLong, true)))
  }

  test("2 rounds resolve only 4 hops — the doubling is real") {
    val out = Redirects.resolve(chain7.toDF("src", "dst"), rounds = 2)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert((1 to 4).forall(i => out(i.toLong)))
    assert((5 to 7).forall(i => !out(i.toLong)))
  }

  test("cycles terminate with resolved = false") {
    val out = Redirects.resolve(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (9L, 1L)).toDF("src", "dst"), rounds = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    assert(out === Map(1L -> false, 2L -> false, 3L -> false, 9L -> false))
  }

  test("forked sources are rejected loudly") {
    val ex = intercept[IllegalArgumentException] {
      Redirects.resolve(Seq((1L, 2L), (1L, 3L)).toDF("src", "dst"))
    }
    assert(ex.getMessage.contains("single-successor"))
  }
}
