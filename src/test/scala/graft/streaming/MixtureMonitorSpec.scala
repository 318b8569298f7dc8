package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("batch replay equals a plain per-source sum") {
    val docs = Seq(("a", 10L), ("a", 20L), ("b", 5L))
      .toDF("source", "n")
    val got = MixtureMonitor.tokenTotals(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("a", 2L, 30L), ("b", 1L, 5L)))
  }

  test("conformance: integer shares, tolerance gate, unweighted excluded") {
    val totals = Seq(("a", 1L, 700L), ("b", 1L, 200L), ("c", 1L, 100L))
      .toDF("source", "batch_docs", "tokens_cum")
    val targets = Seq(("a", 500000L), ("b", 250000L))
      .toDF("source", "weight_ppm")
    val out = MixtureMonitor.conformance(totals, targets, tolPpm = 100000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // realized shares use the FULL total (1000) incl. unweighted c
    assert(out("a") === ((700000L, 500000L, 200000L, true)))
    assert(out("b") === ((200000L, 250000L, -50000L, false)))
    assert(!out.contains("c"))
    intercept[IllegalArgumentException](
      MixtureMonitor.conformance(totals, targets, -1L))
  }

  test("live stream: totals accumulate across micro-batches in keyed state") {
    val dir = Files.createTempDirectory("mix_monitor").toString + "/src"
    Seq(("a", 10L), ("b", 4L)).toDF("source", "n")
      .coalesce(1).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = MixtureMonitor.tokenTotals(
        spark.readStream.schema(schema).parquet(dir))
      .writeStream.format("memory").queryName("mix_monitor_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val b1 = spark.sql("SELECT * FROM mix_monitor_test")
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
      assert(b1 === Set(("a", 10L), ("b", 4L)))
      // batch 2: a grows, c appears — a's cumulative must REMEMBER batch 1
      Seq(("a", 7L), ("c", 1L)).toDF("source", "n")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM mix_monitor_test")
        .collect().map(r => (r.getString(0), r.getLong(2)))
      // snapshot stream: latest row per source carries the running total
      assert(rows.toSet === Set(("a", 10L), ("b", 4L), ("a", 17L), ("c", 1L)))
      // conformance over the latest snapshot flags the drifted domain
      val latest = Seq(("a", 1L, 17L), ("b", 1L, 4L), ("c", 1L, 1L))
        .toDF("source", "batch_docs", "tokens_cum")
      val conf = MixtureMonitor.conformance(latest,
          Seq(("a", 500000L), ("b", 400000L)).toDF("source", "weight_ppm"),
          tolPpm = 150000L)
        .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
      assert(conf === Map("a" -> true, "b" -> true)) // 772k vs 500k; 181k vs 400k
    } finally q.stop()
  }
}
