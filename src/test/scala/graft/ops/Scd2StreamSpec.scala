package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fixture = Seq(
    (1L, ts("2024-01-01 10:00:00"), "A", "01"),
    (1L, ts("2024-02-01 10:00:00"), "A", "02"), // no-op
    (1L, ts("2024-03-01 10:00:00"), "B", "03"),
    (2L, ts("2024-01-15 10:00:00"), "X", "04")
  ).toDF("k", "obs_ts", "status", "seq")

  private def closed(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("k"), r.getAs[Seq[String]]("attrs"),
      r.getAs[Long]("valid_from_ms"), r.getAs[Long]("valid_to_ms"),
      r.getAs[Int]("version"))).toSet

  test("batch run equals fromChangeLog's closed history") {
    val got = closed(Scd2.historyStream(fixture, "k", "obs_ts",
      Seq("status"), Seq("seq")))
    val want = Scd2.fromChangeLog(fixture, Seq("k"), "obs_ts",
        Seq("status"), Seq("seq"))
      .filter(!col("is_current"))
      .select(col("k").cast("string").as("k"),
        array(col("status").cast("string")).as("attrs"),
        unix_millis(col("valid_from").cast("timestamp")).as("valid_from_ms"),
        unix_millis(col("valid_to").cast("timestamp")).as("valid_to_ms"),
        col("version"))
    assert(got == closed(want))
    // exactly one closed version exists in the fixture (key 1: A closed by B)
    assert(got.size == 1 && got.head._5 == 1)
  }

  test("live stream: versions close across micro-batches, currents stay in state") {
    val dir = Files.createTempDirectory("scd2_stream").toString + "/src"
    fixture.coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = Scd2.historyStream(
        spark.readStream.schema(schema).parquet(dir),
        "k", "obs_ts", Seq("status"), Seq("seq"))
      .writeStream.format("memory").queryName("scd2_stream_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val b1 = closed(spark.sql("SELECT * FROM scd2_stream_test"))
      // batch 1: key 1's A closed by B; key 2's X still current (in state)
      assert(b1.map(x => (x._1, x._2, x._5)) == Set(("1", Seq("A"), 1)))

      // batch 2: a no-op for key 1 (collapses), a change for key 2, a
      // LATE row for key 1 (dropped), and a brand-new key 3
      Seq(
        (1L, ts("2024-04-01 10:00:00"), "B", "05"), // no-op vs current B
        (2L, ts("2024-02-20 10:00:00"), "Y", "06"), // closes X
        (1L, ts("2023-12-01 10:00:00"), "Z", "07"), // late: dropped
        (3L, ts("2024-05-01 10:00:00"), "Q", "08")  // new key: current only
      ).toDF("k", "obs_ts", "status", "seq")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val b2 = closed(spark.sql("SELECT * FROM scd2_stream_test"))
      assert(b2.map(x => (x._1, x._2, x._5)) ==
        Set(("1", Seq("A"), 1), ("2", Seq("X"), 1)))
      // the late Z for key 1 must not have closed B or opened anything
      assert(!b2.exists(x => x._1 == "1" && x._2 == Seq("B")))
      assert(!b2.exists(_._2 == Seq("Z")))
    } finally q.stop()
  }

  test("within-batch disorder is healed by the (ts, tie) sort") {
    val disordered = Seq(
      (1L, ts("2024-03-01 10:00:00"), "B", "03"),
      (1L, ts("2024-01-01 10:00:00"), "A", "01")
    ).toDF("k", "obs_ts", "status", "seq")
    val got = closed(Scd2.historyStream(disordered, "k", "obs_ts",
      Seq("status"), Seq("seq")))
    assert(got.map(x => (x._2, x._5)) == Set((Seq("A"), 1)))
  }
}
