package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Drift monitoring: the batch algebra on a hand-computed fixture, and the
  * streaming monitor's cumulative-state fold — including the replay guard
  * (counts are not idempotent, so a replayed batch must skip the fold and
  * only re-emit its report).
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[String]) = rows.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("report: hand-computed shares and log-free drift terms") {
    val ref = Drift.binCounts(df(Seq("a" * 40, "b" * 10)))
    val nw = Drift.binCounts(df(Seq("c" * 40, "d" * 100)))
    val out = Drift.report(Drift.mergeCounts(ref, nw)).collect()
    assert(out.toSeq === Seq(
      Row("chars", 0L, 1L, 0L, 0.5, 0.0, 0.5, 0.5),
      Row("chars", 1L, 1L, 1L, 0.5, 0.5, 0.0, 0.0),
      Row("chars", 3L, 0L, 1L, 0.0, 0.5, 0.5, 0.5),
      Row("spaces", 0L, 2L, 2L, 1.0, 1.0, 0.0, 0.0)))
  }

  test("streaming monitor folds cumulative state and matches batch replay") {
    val refCounts = Drift.binCounts(df(Seq("a" * 40, "b" * 10)))
      .localCheckpoint(true)
    val base = Files.createTempDirectory("drift_stream").toString
    val srcDir = s"$base/src"
    val statePath = s"$base/state"
    val b1 = Seq((100L, "c" * 40)).toDF("doc_id", "text")
    b1.coalesce(1).write.parquet(srcDir)

    val reports = scala.collection.mutable.Map[Long, Seq[Row]]()
    def run() = Drift.driftIngestStream(
      spark.readStream.schema(b1.schema).parquet(srcDir), refCounts, statePath) {
      r =>
        val rows = r.collect()
        reports(rows.head.getAs[Long]("batch_id")) =
          rows.map(x => Row(x.toSeq.dropRight(1): _*)).toSeq
    }

    val q = run()
    try {
      q.processAllAvailable()
      Seq((101L, "d" * 100), (102L, "e" * 10)).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()

    // after batch 1 the report must equal the batch replay over ALL
    // arrivals — the cumulative fold lost nothing
    val expected = Drift.report(Drift.mergeCounts(refCounts,
      Drift.binCounts(df(Seq("c" * 40, "d" * 100, "e" * 10))))).collect().toSeq
    assert(reports(1L) === expected)
    // state carries the cumulative counts and the fold watermark
    val state = spark.read.parquet(statePath)
    assert(state.select("last_batch").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(1L))

    // replay without a checkpoint: every source file returns as batch 0;
    // the fold must be SKIPPED (last_batch 1 >= 0) — state unchanged, the
    // report still correct because it reads the existing state
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    assert(reports(0L) === expected, "replayed report should serve existing state")
    val state2 = spark.read.parquet(statePath)
    assert(state2.select("last_batch").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(1L), "replay must not re-fold counts")
  }

  test("custom feature sets bin through the same algebra; empty fails loudly") {
    import org.apache.spark.sql.functions._
    // words at width 2: "a b c" -> 3 tokens -> bin 1; "x" -> 1 token -> bin 0
    val feats = Seq(Drift.DriftFeature("words",
      size(split(trim(col("text")), "\\s+")).cast("long"), 2L))
    val out = Drift.binCounts(df(Seq("a b c", "x")), features = Some(feats))
      .orderBy("feature", "bin").collect()
    assert(out.toSeq === Seq(Row("words", 0L, 1L), Row("words", 1L, 1L)))
    // an explicitly-empty dynamically-built set is a configuration bug,
    // not a request for the defaults
    intercept[IllegalArgumentException] {
      Drift.binCounts(df(Seq("a")), features = Some(Nil)).collect()
    }
  }
}
