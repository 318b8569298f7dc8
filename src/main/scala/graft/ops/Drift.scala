package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring shared by the batch report (q159) and the
  * streaming monitor: fixed-edge per-feature histograms with log-free
  * per-bin drift terms.
  *
  * Design constraints (q159's, restated because the stream inherits them):
  * bins have FIXED edges, never data-dependent quantiles, so per-bin
  * counts from ANY two corpus slices merge by addition — which is exactly
  * what lets a streaming monitor fold micro-batches into cumulative state
  * without reprocessing history. The drift terms are log-free BY DESIGN
  * (one or two IEEE ops over integer-derived doubles are bit-identical
  * across engines; PSI's ln() would hash-diverge across libm
  * implementations while ranking snapshots identically).
  */
object Drift {

  /** One monitored feature: an integer-valued column expression binned at
    * fixed `width`, clamped to `maxBin`. Fixed edges are the load-bearing
    * constraint (see object doc) — `width`/`maxBin` are configuration,
    * never data-derived.
    */
  final case class DriftFeature(name: String,
      value: org.apache.spark.sql.Column, width: Long, maxBin: Long = 19L)

  /** The default monitored set: chars at width 32 and spaces at width 8,
    * both clamped to bin 19 — q159's feature set, unchanged.
    */
  def defaultFeatures(text: org.apache.spark.sql.Column): Seq[DriftFeature] = Seq(
    DriftFeature("chars", length(text).cast("long"), 32L),
    DriftFeature("spaces",
      (length(text) - length(regexp_replace(text, " ", ""))).cast("long"), 8L))

  /** Fixed-edge binning for an arbitrary feature set, as one
    * array<struct<feature, bin>> column — every monitored feature derives
    * from the same row in the same scan stage.
    */
  def binStructsFor(features: Seq[DriftFeature]): org.apache.spark.sql.Column = {
    require(features.nonEmpty, "drift needs at least one feature")
    array(features.map(f =>
      struct(lit(f.name).as("feature"),
        least(floor(f.value / lit(f.width)), lit(f.maxBin)).cast("long").as("bin"))): _*)
  }

  /** The fixed-edge binning itself under [[defaultFeatures]]. Exposed
    * (rather than private to [[featureBins]]) so one-scan callers — q159
    * splits ref/new snapshots out of a single documents scan — bin through
    * the SAME expressions the streaming monitor uses; an edge change here
    * moves every surface at once.
    */
  def binStructs(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    binStructsFor(defaultFeatures(text))

  /** Fixed-edge (feature, bin) rows for a document frame. One narrow
    * features-per-doc explode; the text column itself never leaves the
    * scan stage. `features = None` means [[defaultFeatures]] over
    * `textCol` — Option rather than an empty-Seq sentinel, so an
    * explicitly-empty dynamically-built feature list fails loudly in
    * [[binStructsFor]] instead of silently monitoring the default set.
    */
  def featureBins(docs: DataFrame, textCol: String = "text",
      features: Option[Seq[DriftFeature]] = None): DataFrame = {
    val fs = features.getOrElse(defaultFeatures(col(textCol)))
    docs.select(explode(binStructsFor(fs)).as("fb"))
      .select(col("fb.feature"), col("fb.bin"))
  }

  /** Per-(feature, bin) counts — the mergeable monitoring state. */
  def binCounts(docs: DataFrame, textCol: String = "text",
      features: Option[Seq[DriftFeature]] = None): DataFrame =
    featureBins(docs, textCol, features).groupBy("feature", "bin")
      .agg(count(lit(1)).as("n"))

  /** The drift algebra over a (feature, bin, n_ref, n_new) counts frame:
    * per-feature totals broadcast back, shares, and the log-free l1/chi2
    * terms. Exactly q159's final stage — the batch report and the
    * streaming monitor both end here, so the two surfaces cannot drift
    * apart. No chi2 zero-guard needed: a bin row exists only because some
    * document landed in it on at least one side, so share_ref + share_new
    * is positive on every output row.
    */
  def report(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy("feature").agg(
      sum("n_ref").as("t_ref"), sum("n_new").as("t_new"))
    val shareRef = col("n_ref").cast("double") / col("t_ref")
    val shareNew = col("n_new").cast("double") / col("t_new")
    val d = shareRef - shareNew
    counts.join(broadcast(totals), Seq("feature"))
      .select(col("feature"), col("bin"), col("n_ref"), col("n_new"),
        shareRef.as("share_ref"), shareNew.as("share_new"),
        abs(d).as("l1_term"),
        (d * d / (shareRef + shareNew)).as("chi2_term"))
      .orderBy("feature", "bin")
  }

  /** Merge a reference bin-count frame (as `n_ref`) with an arrivals
    * bin-count frame (as `n_new`) into [[report]]'s input shape. Bins
    * present on only one side surface with a zero on the other — they are
    * precisely the drift signal a quantile-binned report would hide.
    */
  def mergeCounts(ref: DataFrame, arrivals: DataFrame): DataFrame =
    ref.select(col("feature"), col("bin"),
        col("n").as("n_ref"), lit(0L).as("n_new"))
      .unionByName(arrivals.select(col("feature"), col("bin"),
        lit(0L).as("n_ref"), col("n").as("n_new")))
      .groupBy("feature", "bin")
      .agg(sum("n_ref").as("n_ref"), sum("n_new").as("n_new"))

  /** Streaming drift monitor: folds each micro-batch's bin counts into
    * cumulative arrival state at `statePath` (parquet, crash-safe staged
    * swap) and hands the full drift report vs the fixed `refCounts`
    * ([[binCounts]] of the reference snapshot) to `sink` after every
    * batch, tagged with `batch_id`.
    *
    * At-least-once safety: counts are NOT idempotent under replay (a
    * re-folded batch double-counts), so the state carries the last folded
    * batch id and a replayed batch SKIPS the fold — it only re-emits the
    * report from existing state (the sink sees replayed reports and
    * should be idempotent per batch_id, same contract as the ingest
    * loops' verdict sinks). The state is the ~40-row bin table — reading
    * and rewriting it per batch is constant work at any corpus scale,
    * and the staged-swap overwrite means a crash mid-rewrite leaves the
    * previous state intact.
    */
  def driftIngestStream(docs: DataFrame, refCounts: DataFrame,
      statePath: String, textCol: String = "text",
      checkpoint: Option[String] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = docs.writeStream.outputMode("append")
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val hPath = new org.apache.hadoop.fs.Path(statePath)
        val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        val prior =
          if (fs.exists(hPath)) Some(s.read.parquet(statePath)) else None
        // coalesce before the read: an all-empty-batch history leaves a
        // ZERO-ROW state parquet, where bare max() is null and getLong
        // would NPE every retry, failing the query permanently. -1 is
        // safe: an empty state can only come from empty batches, whose
        // re-fold adds nothing.
        val lastFolded = prior
          .map(_.agg(coalesce(max("last_batch"), lit(-1L)))
            .collect()(0).getLong(0))
          .getOrElse(-1L)
        val state =
          if (lastFolded >= batchId) prior.get // replay: report only
          else {
            val merged = prior match {
              case Some(p) => p.select(col("feature"), col("bin"), col("n"))
                .unionByName(binCounts(batch, textCol))
                .groupBy("feature", "bin").agg(sum("n").as("n"))
              case None => binCounts(batch, textCol)
            }
            // pin before the swap: the merge plan READS statePath
            val pinned = merged
              .withColumn("last_batch", lit(batchId)).localCheckpoint(true)
            graft.io.Writers.overwrite(pinned, statePath)
            pinned
          }
        sink(report(mergeCounts(refCounts, state.select("feature", "bin", "n")))
          .withColumn("batch_id", lit(batchId)))
      }
      .start()
  }
}
