package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  test("rules fold into one report; nulls violate unless coalesced out") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (5L, null), (null, "y"))
      .toDF("v", "s")
    val rep = report(df, Seq(
      Rule("v_small", col("v") > 3), // null v -> violation
      Rule("v_small_null_ok", coalesce(col("v") > 3, lit(false))),
      Rule("s_present", col("s").isNull)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep("v_small") === ((3L, 2L))) // v=5 breaks it, v=null counts too
    assert(rep("v_small_null_ok") === ((3L, 1L))) // only v=5
    assert(rep("s_present") === ((3L, 1L)))
  }

  test("gateStream splits live batches into pass/quarantine and reports") {
    val srcDir = java.nio.file.Files.createTempDirectory("gate").toString + "/src"
    val b1 = Seq((1L, 10.0), (2L, -1.0), (3L, 5.0)).toDF("id", "amount")
    b1.coalesce(1).write.parquet(srcDir)
    val goodIds = scala.collection.mutable.ArrayBuffer[Long]()
    val badIds = scala.collection.mutable.ArrayBuffer[Long]()
    val rates = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val batchIds = scala.collection.mutable.ArrayBuffer[Long]()
    val q = gateStream(
      spark.readStream.schema(b1.schema).parquet(srcDir),
      Seq(Rule("amount_nonneg", col("amount") < 0)))(
      (g, bid) => { goodIds ++= g.collect().map(_.getLong(0)); batchIds += bid },
      (b, _) => badIds ++= b.collect().map(_.getLong(0)),
      (r, _) => rates ++= r.collect().map(x => x.getString(0) -> x.getLong(2)))
    try {
      q.processAllAvailable()
      assert(goodIds.sorted.toSeq === Seq(1L, 3L) && badIds.toSeq === Seq(2L))
      assert(rates.toSeq === Seq("amount_nonneg" -> 1L))
      Seq((4L, -2.0), (5L, 1.0)).toDF("id", "amount")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(goodIds.sorted.toSeq === Seq(1L, 3L, 5L))
      assert(badIds.sorted.toSeq === Seq(2L, 4L))
      assert(rates.map(_._2).sum === 2L)
      assert(batchIds.toSeq === Seq(0L, 1L)) // sinks see the batch id
    } finally q.stop()
  }

  test("refViolations keeps orphan child rows, including null keys") {
    val child = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (99L, "c"), (null, "d"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val orphans = refViolations(child, "fk", parent, "pk")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(orphans === Seq("c", "d"))
  }
}
