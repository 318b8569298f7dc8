package graft.curation

import graft.SparkSpec

class DomainReweightSpec extends SparkSpec {
  import spark.implicits._

  private def reweight(rows: Seq[(String, Long)], step: Int = 256, cap: Int = 8) =
    Curation.domainReweight(
      rows.toDF("source", "score"), "source", step, cap)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("hard domains double per step of excess; easy domains halve") {
    // means: hard = 1000, easy = 200, corpus mean = 600 (2 docs each)
    // excess: hard +400 → exp2 = floor(400/256) = 1 → weight 2^9
    //         easy −400 → exp2 = floor(−400/256) = −2 → weight 2^6
    val m = reweight(Seq(
      ("hard", 1000L), ("hard", 1000L), ("easy", 200L), ("easy", 200L)))
    val (_, _, hardExcess, hardExp, hardPpm) = m("hard")
    val (_, _, easyExcess, easyExp, easyPpm) = m("easy")
    assert(hardExcess === 400L && hardExp === 1L)
    assert(easyExcess === -400L && easyExp === -2L)
    // ppm: weights 512 and 64 → 576 total → 888888 and 111111
    assert(hardPpm === 1000000L * 512 / 576)
    assert(easyPpm === 1000000L * 64 / 576)
  }

  test("exponent clamps at ±maxExp and ppm is a valid distribution") {
    val m = reweight(Seq(
      ("a", 100000L), ("b", 0L), ("c", 0L)), step = 1, cap = 8)
    assert(m("a")._4 === 8L) // clamped up
    assert(m("b")._4 === -8L) // clamped down
    val total = m.values.map(_._5).sum
    assert(total <= 1000000L && total > 999900L, s"ppm total $total")
  }

  test("uniform corpus keeps uniform weights") {
    val m = reweight(Seq(("a", 500L), ("b", 500L), ("c", 500L)))
    assert(m.values.map(_._4).toSet === Set(0L))
    assert(m.values.map(_._5).toSet === Set(333333L))
  }

  test("guards") {
    intercept[IllegalArgumentException](
      reweight(Seq(("a", 1L)), step = 0))
    intercept[IllegalArgumentException](
      reweight(Seq(("a", 1L)), cap = 0))
  }
}
