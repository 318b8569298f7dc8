package graft.text

import graft.SparkSpec

/** BLEU sufficient statistics pinned by hand on the Papineni-style toy
  * pair: clipping (a candidate gram never scores above its reference
  * count), per-n totals, length sums, group separation, and the
  * short-text guard (texts with fewer than n tokens contribute empty
  * n-gram sets, never a descending-sequence artifact).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: Seq[(Long, String, String, String)]) =
    Eval.bleuStats(rows.toDF("pair_id", "lang", "cand_text", "ref_text"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("clipping: repeated candidate grams count at most the reference count") {
    // the classic degenerate candidate: "the the the the" vs "the cat"
    // unigram matches clip at ref's count of 'the' = 1; no bigram match
    val m = stats(Seq((1L, "en", "the the the the", "the cat")))("en")
    assert(m.getAs[Long]("pairs") === 1L)
    assert(m.getAs[Long]("cand_tokens") === 4L && m.getAs[Long]("ref_tokens") === 2L)
    assert(m.getAs[Long]("match_1") === 1L && m.getAs[Long]("total_1") === 4L)
    assert(m.getAs[Long]("p1_milli") === 250L)
    assert(m.getAs[Long]("match_2") === 0L && m.getAs[Long]("total_2") === 3L)
  }

  test("exact match: every n scores full") {
    val m = stats(Seq((1L, "en", "a b c d", "a b c d")))("en")
    (1 to 4).foreach { n =>
      assert(m.getAs[Long](s"match_$n") === (5 - n).toLong)
      assert(m.getAs[Long](s"total_$n") === (5 - n).toLong)
      assert(m.getAs[Long](s"p${n}_milli") === 1000L)
    }
  }

  test("short texts: fewer than n tokens yield zero totals and null p") {
    val m = stats(Seq((1L, "en", "x y", "x y")))("en")
    assert(m.getAs[Long]("match_3") === 0L && m.getAs[Long]("total_3") === 0L)
    assert(m.isNullAt(m.fieldIndex("p3_milli")))
    assert(m.getAs[Long]("match_2") === 1L && m.getAs[Long]("total_2") === 1L)
  }

  test("groups aggregate independently and sum over pairs") {
    val m = stats(Seq(
      (1L, "en", "a b", "a b"), (2L, "en", "c d", "c x"),
      (3L, "fr", "e f", "g h")))
    assert(m("en").getAs[Long]("pairs") === 2L)
    assert(m("en").getAs[Long]("match_1") === 3L) // a b + c
    assert(m("en").getAs[Long]("total_1") === 4L)
    assert(m("en").getAs[Long]("match_2") === 1L) // only 'a b'
    assert(m("fr").getAs[Long]("match_1") === 0L)
    assert(m("fr").getAs[Long]("p1_milli") === 0L)
  }
}
