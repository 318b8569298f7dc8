package graft.ops

import java.sql.Date

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val log = Seq(
    // key 1: A, A (no-op), B, B (no-op), A again — 3 versions
    (1, d("2024-01-01"), "A", 10L),
    (1, d("2024-02-01"), "A", 11L),
    (1, d("2024-03-01"), "B", 12L),
    (1, d("2024-04-01"), "B", 13L),
    (1, d("2024-05-01"), "A", 14L),
    // key 2: single observation — 1 open-ended version
    (2, d("2024-06-01"), "X", 20L)
  ).toDF("k", "ts", "attr", "seq")

  test("no-op observations collapse; intervals chain; latest is open") {
    val got = Scd2.fromChangeLog(log, Seq("k"), "ts", Seq("attr"), Seq("seq"))
      .orderBy("k", "version")
      .collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[String]("attr"),
        r.getAs[Date]("valid_from").toString,
        Option(r.getAs[Date]("valid_to")).map(_.toString).orNull,
        r.getAs[Boolean]("is_current"), r.getAs[Int]("version")))
    assert(got.toSeq == Seq(
      (1, "A", "2024-01-01", "2024-03-01", false, 1),
      (1, "B", "2024-03-01", "2024-05-01", false, 2),
      (1, "A", "2024-05-01", null, true, 3),
      (2, "X", "2024-06-01", null, true, 1)))
  }

  test("null attribute transitions are null-safe") {
    val nlog = Seq(
      (1, d("2024-01-01"), Option("A"), 1L),
      (1, d("2024-02-01"), None, 2L), // A -> null: change
      (1, d("2024-03-01"), None, 3L), // null -> null: NO change
      (1, d("2024-04-01"), Option("A"), 4L) // null -> A: change
    ).toDF("k", "ts", "attr", "seq")
    val got = Scd2.fromChangeLog(nlog, Seq("k"), "ts", Seq("attr"), Seq("seq"))
      .orderBy("version").collect()
      .map(r => (Option(r.getAs[String]("attr")), r.getAs[Int]("version")))
    assert(got.toSeq == Seq((Some("A"), 1), (None, 2), (Some("A"), 3)))
  }

  test("same-timestamp observations break ties deterministically") {
    val tied = Seq(
      (1, d("2024-01-01"), "B", 2L),
      (1, d("2024-01-01"), "A", 1L) // seq 1 sorts first: A then B
    ).toDF("k", "ts", "attr", "seq")
    val got = Scd2.fromChangeLog(tied, Seq("k"), "ts", Seq("attr"), Seq("seq"))
      .orderBy("version").collect().map(_.getAs[String]("attr"))
    assert(got.toSeq == Seq("A", "B"))
  }

  test("reserved output columns and empty params are rejected") {
    intercept[IllegalArgumentException](
      Scd2.fromChangeLog(log.withColumnRenamed("attr", "valid_from"),
        Seq("k"), "ts", Seq("valid_from"), Seq("seq")))
    intercept[IllegalArgumentException](
      Scd2.fromChangeLog(log, Seq("k"), "ts", Seq("attr"), Seq.empty))
  }

  test("the plan shuffles once: both windows share one partitioning") {
    val plan = Scd2.fromChangeLog(log, Seq("k"), "ts", Seq("attr"), Seq("seq"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected ONE key exchange, got $exchanges:\n$plan")
  }
}
