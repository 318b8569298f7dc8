package graft.curation

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PpsSampleSpec extends SparkSpec {
  import spark.implicits._

  private def sample(rows: Seq[(String, Long, Long)], k: Int) =
    Curation.systematicPpsSample(
      rows.toDF("lang", "doc_id", "w"), k, "lang", "doc_id", "w")

  test("every stratum draws exactly k hits in total") {
    val rows = (0L until 50L).map(i => ("en", i, 1L + i % 7)) ++
      (0L until 30L).map(i => ("fr", i + 100L, 5L + i % 3))
    val perStratum = sample(rows, 8)
      .groupBy("lang").agg(sum("hits").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum === Map("en" -> 8L, "fr" -> 8L))
  }

  test("an item heavier than T/k is always drawn; multiplicity is honest") {
    // one item holds 60 of 100 total weight; k=5 → grid gap 20 → the heavy
    // item must catch 2 or 3 points, every run, any partitioning.
    val rows = Seq(("en", 1L, 60L)) ++ (2L until 42L).map(i => ("en", i, 1L))
    val out = sample(rows, 5).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) >= 2L && out(1L) <= 4L, s"heavy item hits: ${out(1L)}")
    assert(out.values.sum === 5L)
  }

  test("zero/negative weights are excluded; deterministic across partitions") {
    val rows = (0L until 40L).map(i => ("en", i, if (i % 10 == 0) 0L else i))
    val a = sample(rows, 6).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._2)
    val b = Curation.systematicPpsSample(
      rows.toDF("lang", "doc_id", "w").repartition(7), 6, "lang", "doc_id", "w")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._2)
    assert(a === b)
    assert(a.forall(_._3 > 0))
    intercept[IllegalArgumentException](sample(rows, 0))
  }
}
