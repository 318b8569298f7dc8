package graft.curation

import graft.SparkSpec

class RealizeMixtureSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    ("a", 1L, ("w " * 10).trim), ("a", 2L, ("w " * 10).trim),
    ("a", 3L, ("w " * 10).trim),
    ("b", 4L, ("w " * 10).trim), ("b", 5L, ("w " * 10).trim),
    ("c", 6L, ("w " * 10).trim)) // c gets NO weight row
    .toDF("source", "doc_id", "text")

  test("budgets honor ppm shares; unweighted domains don't participate") {
    val weights = Seq(("a", 750000L), ("b", 250000L)).toDF("source", "weight_ppm")
    val out = Curation.realizeMixture(docs, weights, totalTokens = 40L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(5), r.getLong(6))) // budget, docs_kept, tokens_kept
      .toMap
    assert(!out.contains("c"))
    assert(out("a")._1 === 30L) // 40 * 0.75
    assert(out("b")._1 === 10L) // 40 * 0.25
    // a fits 3 whole docs of 10 tokens; b fits exactly 1
    assert(out("a") === ((30L, 3L, 30L)))
    assert(out("b")._2 === 1L && out("b")._3 === 10L)
  }

  test("a budget below the first doc keeps nothing; totals still reported") {
    val weights = Seq(("a", 100000L)).toDF("source", "weight_ppm")
    val out = Curation.realizeMixture(docs, weights, totalTokens = 50L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6)))
    assert(out.length === 1)
    val (_, budget, docsTotal, kept, tokensKept) = out.head
    assert(budget === 5L && docsTotal === 3L && kept === 0L && tokensKept === 0L)
    intercept[IllegalArgumentException](
      Curation.realizeMixture(docs, weights, totalTokens = 0L))
  }
}
