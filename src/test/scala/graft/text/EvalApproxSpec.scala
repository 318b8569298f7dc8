package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The approx distinct-n face's error contract, asserted at sf0.1 — the
  * round-driver's bench scale — against the exact row (the round-13
  * verdict's directive): every (source, n) cell of the PURE-SKETCH
  * recipe ([[Eval.distinctNgramStatsApprox]], HLL++ rsd = 0.01) must
  * land within 5·rsd of the exact distinct count. HLL++ is
  * deterministic for fixed input, so this is a stable gate, not a
  * flaky statistical one; 5 standard errors leaves no realistic slack
  * for a sketch-plumbing regression (a wrong relativeSD, a dropped
  * merge, a truncated register set all blow past it).
  */
class EvalApproxSpec extends SparkSpec {

  test("approx distinct-n error <= 5*rsd vs exact at sf0.1, every (source, n)") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val exact = Eval.distinctNgramStats(docs, "source", "text", maxN = 3)
      .select(col("source"), col("n"), col("distinct_ngrams"))
    val approx = Eval.distinctNgramStatsApprox(docs, "source", "text", maxN = 3, rsd = 0.01)
      .select(col("source"), col("n"), col("approx_distinct_ngrams"))
    val cells = exact.join(approx, Seq("source", "n"))
      .select(col("source"), col("n"),
        col("distinct_ngrams"), col("approx_distinct_ngrams"),
        (abs(col("approx_distinct_ngrams") - col("distinct_ngrams")).cast("double") /
          col("distinct_ngrams")).as("rel_err"))
      .collect()
    assert(cells.nonEmpty, "sf0.1 documents must yield distinct-n cells")
    cells.foreach { r =>
      val err = r.getDouble(4)
      assert(err <= 0.05,
        s"(${r.getString(0)}, n=${r.getInt(1)}): approx ${r.getLong(3)} vs " +
          s"exact ${r.getLong(2)} — rel err $err > 0.05")
    }
  }
}
