package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming domain-mix conformance — the MONITOR leg of the DoReMi
  * chain (q237 report → q239 realization → this): as documents flow into
  * a training-data ingest, per-domain cumulative token counts accumulate
  * in keyed state, and each micro-batch's snapshot is compared against
  * the target mixture weights; domains drifting further than a tolerance
  * raise an alert before a skewed epoch gets baked.
  *
  * Shape: ONE `flatMapGroupsWithState` keyed by domain — state is a
  * single long per domain (cumulative tokens), emission is one row per
  * (domain, batch). Conformance itself is a BATCH join over the
  * snapshot (realized share needs the cross-domain total, which no
  * per-key state can see) — integer arithmetic end to end, so the batch
  * replay is oracle-exact. The same function body serves the live
  * stream and the batch replay, q212's one-function discipline.
  */
object MixtureMonitor {

  /** One observed ingest event: a doc's domain and token count. */
  final case class MixObs(source: String, n: Long)

  /** Snapshot row: the domain's doc count in this batch and its
    * cumulative token total across all batches so far.
    */
  final case class MixTotal(source: String, batch_docs: Long, tokens_cum: Long)

  /** Per-domain cumulative token totals. Input needs (strataCol, nCol);
    * works identically over a stream (state persists across
    * micro-batches) and a batch frame (one group pass = the replay).
    */
  def tokenTotals(docs: DataFrame, strataCol: String = "source",
      nCol: String = "n"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(strataCol).cast("string").as("source"),
        col(nCol).cast("long").as("n"))
      .as[MixObs]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, MixTotal](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (src, rows, state: GroupState[Long]) =>
          var add = 0L
          var docs = 0L
          rows.foreach { o => add += o.n; docs += 1 }
          val cum = state.getOption.getOrElse(0L) + add
          state.update(cum)
          Iterator.single(MixTotal(src, docs, cum))
      }
      .toDF()
  }

  /** Conformance report over a totals snapshot: realized ppm (integer
    * floor share of the FULL snapshot total) vs target ppm, alert when
    * |realized − target| > tolPpm. Domains absent from `targets` don't
    * report — the reweighting run owns the domain list (realizeMixture's
    * contract); their tokens still count toward the total, so everyone
    * else's realized share sees them.
    */
  def conformance(totals: DataFrame, targets: DataFrame,
      tolPpm: Long): DataFrame = {
    require(tolPpm >= 0, s"tolerance must be non-negative: $tolPpm")
    val all = totals.agg(sum("tokens_cum").as("_tot"))
    totals.crossJoin(broadcast(all))
      // DECIMAL(38,0) for the share product: cum·10^6 overflows a long
      // past ~9.2e12 cumulative tokens — a day of real ingest. Floor
      // division via the pmod subtraction (Spark decimal divide rounds
      // HALF_UP; the oracle's HUGEINT // floors).
      .withColumn("_num",
        col("tokens_cum").cast("decimal(38,0)") * lit(1000000L).cast("decimal(38,0)"))
      .withColumn("_den", greatest(col("_tot"), lit(1L)).cast("decimal(38,0)"))
      .withColumn("realized_ppm",
        ((col("_num") - col("_num") % col("_den")) / col("_den")).cast("long"))
      .join(broadcast(targets
        .select(col("source"), col("weight_ppm").cast("long").as("target_ppm"))),
        "source")
      .withColumn("delta_ppm", col("realized_ppm") - col("target_ppm"))
      .withColumn("alert", abs(col("delta_ppm")) > tolPpm)
      .select("source", "tokens_cum", "realized_ppm", "target_ppm",
        "delta_ppm", "alert")
  }
}
