package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val fixture = Seq(
    (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
    (2L, ts("2024-01-01 10:20:00"), "click", 2.0),
    (3L, ts("2024-01-01 10:40:00"), "view", 3.0),
    (4L, ts("2024-01-01 11:10:00"), "click", 4.0),
    (5L, ts("2024-01-01 11:30:00"), "view", 5.0)
  ).toDF("event_id", "ts", "event_type", "value")

  test("windowed stats are correct in batch mode (stream/batch parity)") {
    val r = EventStreams.windowedTypeStats(fixture).collect()
      .map(x => (x.getAs[Timestamp]("window_start").toString,
        x.getAs[String]("event_type"), x.getAs[Long]("events"),
        x.getAs[Double]("sum_value"))).toSet
    assert(r == Set(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 10:00:00.0", "view", 1L, 3.0),
      ("2024-01-01 11:00:00.0", "click", 1L, 4.0),
      ("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
  }

  test("the same transform runs as a real stream with watermark") {
    val dir = Files.createTempDirectory("events_stream").toString + "/src"
    fixture.coalesce(1).write.parquet(dir)
    val q = EventStreams.startWindowedQuery(spark, dir, "windowed_test")
    try {
      q.processAllAvailable()
      // Append mode only emits windows the watermark has closed; feed a
      // late-arriving batch that advances event time past 11:00+10min.
      Seq((6L, ts("2024-01-01 12:30:00"), "click", 6.0))
        .toDF("event_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val out = spark.sql("SELECT event_type, events, sum_value FROM windowed_test")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      // the 10:00 and 11:00 windows are closed by the 12:30 event
      assert(out.contains(("click", 2L, 3.0)))
      assert(out.contains(("view", 1L, 3.0)))
      assert(out.contains(("click", 1L, 4.0)))
      assert(out.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionize counts per-user events with custom state") {
    val r = EventStreams.sessionize(
      fixture.union(fixture).withColumnRenamed("event_id", "user_id")).collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("events"))).toMap
    assert(r == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("streaming ingest: foreachBatch drives the upsert sink (medallion path)") {
    import org.apache.spark.sql.DataFrame
    import graft.io.Writers
    val srcDir = Files.createTempDirectory("stream_src").toString + "/src"
    val sinkDir = Files.createTempDirectory("stream_sink").toString + "/bronze"
    fixture.coalesce(1).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Writers.upsertPath(batch.sparkSession, batch, sinkDir, Seq("event_id"))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(sinkDir).count() == 5)
      // second micro-batch: one replay (same event_id) + one new event
      Seq((5L, ts("2024-01-01 11:30:00"), "view", 5.0),
        (6L, ts("2024-01-01 12:00:00"), "click", 6.0))
        .toDF("event_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val back = spark.read.parquet(sinkDir)
      assert(back.count() == 6) // replayed id upserted, not duplicated
      assert(back.select("event_id").distinct().count() == 6)
    } finally q.stop()
  }

  test("dedupById runs as stateful watermark-bounded dedup on a live stream") {
    val dir = Files.createTempDirectory("dedup_stream").toString + "/src"
    // duplicates inside AND across micro-batches
    fixture.union(fixture.filter(col("event_id") === 1L))
      .coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = EventStreams.dedupById(
        spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("dedup_test").start()
    try {
      q.processAllAvailable()
      // replay id 2 in a later micro-batch: state still inside watermark
      fixture.filter(col("event_id") === 2L)
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val out = spark.sql("SELECT event_id FROM dedup_test")
        .collect().map(_.getLong(0)).sorted
      assert(out.toSeq == Seq(1L, 2L, 3L, 4L, 5L)) // every id exactly once
    } finally q.stop()
  }

  test("curation fingerprint dedup runs on a live document stream") {
    val dir = Files.createTempDirectory("doc_stream").toString + "/src"
    val docs = Seq(
      (1L, "alpha beta gamma", ts("2024-01-01 10:00:00")),
      (2L, "  ALPHA   beta GAMMA ", ts("2024-01-01 10:01:00")), // dup after normalize
      (3L, "delta epsilon", ts("2024-01-01 10:02:00"))
    ).toDF("doc_id", "text", "ingest_ts")
    docs.coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val streamed = graft.curation.Curation.fingerprintDedupStream(
      spark.readStream.schema(schema).parquet(dir))
    // state must be EVICTABLE: plain dropDuplicates on fp alone would
    // never age out (event-time not in the dedup subset) — the plan has
    // to carry the within-watermark dedup operator
    assert(streamed.queryExecution.analyzed.toString
      .contains("DeduplicateWithinWatermark"))
    val q = streamed
      .writeStream.format("memory").queryName("doc_dedup_test").start()
    try {
      q.processAllAvailable()
      // replay the SAME normalized text in a later micro-batch: the
      // fingerprint state (inside watermark) must still suppress it
      Seq((4L, "alpha  beta  gamma", ts("2024-01-01 10:03:00")))
        .toDF("doc_id", "text", "ingest_ts")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id FROM doc_dedup_test")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(out == Seq(1L, 3L)) // one survivor per fingerprint
    } finally q.stop()
  }

  test("session_window aggregation: batch parity on explicit gaps") {
    val ev = Seq(
      (7L, ts("2024-01-01 10:00:00")),
      (7L, ts("2024-01-01 10:10:00")), // same session (10 min gap)
      (7L, ts("2024-01-01 11:30:00")), // new session (80 min gap)
      (8L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val r = EventStreams.sessionWindowStats(ev).collect()
      .map(x => (x.getLong(0), x.getAs[Timestamp]("session_start").toString, x.getLong(3)))
      .toSet
    assert(r == Set(
      (7L, "2024-01-01 10:00:00.0", 2L),
      (7L, "2024-01-01 11:30:00.0", 1L),
      (8L, "2024-01-01 10:00:00.0", 1L)))
  }

  test("session_window runs as a live stream: watermark closes sessions") {
    val dir = Files.createTempDirectory("session_stream").toString + "/src"
    Seq(
      (7L, ts("2024-01-01 10:00:00")),
      (7L, ts("2024-01-01 10:10:00")),
      (8L, ts("2024-01-01 10:05:00"))
    ).toDF("user_id", "ts").coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = EventStreams.sessionWindowStats(
        spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode holds sessions open until the watermark passes
      // session_end: advance event time far enough to close them
      Seq((9L, ts("2024-01-01 13:00:00"))).toDF("user_id", "ts")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val out = spark.sql("SELECT user_id, events FROM session_test")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(out == Set(7L -> 2L, 8L -> 1L)) // both 10:xx sessions closed; 9's still open
    } finally q.stop()
  }

  test("purchaseAttribution matches clicks within the window (batch parity)") {
    val purchases = Seq((7L, ts("2024-01-01 10:30:00"), 100.0))
      .toDF("user_id", "ts", "value")
    val clicks = Seq(
      (7L, ts("2024-01-01 10:10:00")), // inside 30 min
      (7L, ts("2024-01-01 09:50:00")), // too early
      (8L, ts("2024-01-01 10:20:00"))  // other user
    ).toDF("user_id", "ts")
    val r = EventStreams.purchaseAttribution(purchases, clicks, 30).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Timestamp]("click_ts") == ts("2024-01-01 10:10:00"))
  }

  test("purchaseAttribution runs as a stream-stream interval join") {
    val pDir = Files.createTempDirectory("attr_p").toString + "/src"
    val cDir = Files.createTempDirectory("attr_c").toString + "/src"
    Seq((7L, ts("2024-01-01 10:30:00"), 100.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.parquet(pDir)
    Seq((7L, ts("2024-01-01 10:10:00")), (7L, ts("2024-01-01 09:00:00")))
      .toDF("user_id", "ts").coalesce(1).write.parquet(cDir)
    val pS = spark.readStream.schema(spark.read.parquet(pDir).schema).parquet(pDir)
      .withWatermark("ts", "1 hour")
    val cS = spark.readStream.schema(spark.read.parquet(cDir).schema).parquet(cDir)
      .withWatermark("ts", "1 hour")
    val q = EventStreams.purchaseAttribution(pS, cS, 30)
      .writeStream.format("memory").queryName("attr_test").start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT user_id, purchase_value FROM attr_test").collect()
      assert(out.length == 1 && out.head.getLong(0) == 7L && out.head.getDouble(1) == 100.0)
    } finally q.stop()
  }
}
