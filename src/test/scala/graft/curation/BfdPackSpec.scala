package graft.curation

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BfdPackSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(lens: Seq[Int]) =
    lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")

  test("every bin respects capacity and every packable doc lands once") {
    val df = docsOf(Seq(60, 50, 40, 30, 30, 20, 10, 10, 5))
    val out = Curation.packBinsBfd(df, capacity = 64L, buckets = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._2).sorted === (0L until 9L).toArray)
    val lens = (0 until 9).map(i => i.toLong -> Seq(60, 50, 40, 30, 30, 20, 10, 10, 5)(i)).toMap
    val fills = out.groupBy(p => (p._1, p._3)).map { case (_, docs) =>
      docs.map(d => lens(d._2)).sum
    }
    assert(fills.forall(_ <= 64), s"bin overflow: $fills")
  }

  test("classic BFD beats next-fit on the adversarial instance") {
    // 6, 5, 4, 3, 2, 1 with capacity 7, ONE bucket: BFD gives (6,1)(5,2)
    // (4,3)=3 bins; next-fit in the same order gives 4.
    val df = docsOf(Seq(6, 5, 4, 3, 2, 1))
    val out = Curation.packBinsBfd(df, capacity = 7L, buckets = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(out.values.max === 3L)
    // the pairing is the hand-computed one
    assert(out(0L) === out(5L)) // 6 + 1
    assert(out(1L) === out(4L)) // 5 + 2
    assert(out(2L) === out(3L)) // 4 + 3
  }

  test("oversized and empty docs are excluded, not crashed on") {
    val df = Seq(
      (1L, Seq.fill(200)("w").mkString(" ")), // > capacity
      (2L, ""), // zero tokens after trim-split? "" splits to [""] len 1 — use blank
      (3L, "a b c")).toDF("doc_id", "text")
    val out = Curation.packBinsBfd(df, capacity = 10L, buckets = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(3L) && !out.contains(1L))
  }

  test("deterministic across repartitionings") {
    val df = docsOf((0 until 120).map(i => 1 + (i * 37) % 50))
    val a = Curation.packBinsBfd(df.repartition(7), 64L, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    val b = Curation.packBinsBfd(df.repartition(2), 64L, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(a === b)
  }

  test("guards") {
    intercept[IllegalArgumentException](Curation.packBinsBfd(docsOf(Seq(1)), 0L, 1))
    intercept[IllegalArgumentException](Curation.packBinsBfd(docsOf(Seq(1)), 8L, 0))
  }
}
