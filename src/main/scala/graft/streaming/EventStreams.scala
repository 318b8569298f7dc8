package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming surface over the events table — beyond-reference
  * capability (the reference is batch-only, SURVEY.md §2.10) expressed the
  * Spark-native way: readStream → event-time windowed aggregation with
  * watermark → sink, plus a `mapGroupsWithState` sessionizer for custom
  * state.
  *
  * The same transforms run in batch mode (DataFrame in, DataFrame out), so
  * correctness is testable without a streaming harness and pipelines can be
  * promoted batch→stream without rewrites.
  */
object EventStreams {

  /** Event-time tumbling-window counts/averages per event_type with a
    * 10-minute watermark — late rows beyond the watermark are dropped.
    */
  def windowedTypeStats(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("events"),
        // try_cast: one out-of-range/NaN value must not kill a long-
        // running streaming query with an ANSI cast overflow; such rows
        // null out of the sum instead
        sum(expr("try_cast(value AS DECIMAL(14,2))")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("events"), col("sum_value"))

  final case class SessionState(count: Long, lastTs: Long)
  final case class SessionOut(user_id: Long, events: Long, closed: Boolean)

  /** Per-user session tracker via mapGroupsWithState (processing-time
    * timeout): counts events per user, emitting the running total; sessions
    * idle past the timeout close and reset.
    */
  def sessionize(events: DataFrame, idleMs: Long = 30 * 60 * 1000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.ProcessingTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOut(userId, s.count, closed = true)
          } else {
            // materialize ONCE — `rows` is a one-shot iterator; calling
            // .length would exhaust it and leave maxTs computed over nothing
            val buf = rows.toSeq
            val newCount = state.getOption.map(_.count).getOrElse(0L) + buf.size
            val maxTs = buf.map(_._2.getTime).foldLeft(0L)(math.max)
            state.update(SessionState(newCount, maxTs))
            state.setTimeoutDuration(idleMs)
            SessionOut(userId, newCount, closed = false)
          }
      }
      .toDF()
  }

  /** Event-time session aggregation via `session_window` — the
    * DECLARATIVE sessionizer (vs [[sessionize]]'s explicit state): in
    * streaming mode the state store merges overlapping session windows
    * per key and the watermark both bounds state and closes sessions
    * (append mode emits a session only once no on-time event can extend
    * it). The identical transform runs in batch — q114 oracles it.
    */
  def sessionWindowStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("events"))

  /** Exactly-once-style dedup by event id. In batch mode this is a plain
    * `dropDuplicates`; in streaming mode the SAME call becomes stateful
    * dedup bounded by the watermark (state for ids older than the
    * watermark is evicted — the at-least-once-source → exactly-once-sink
    * pattern at 100 TB/day rates needs the eviction or state grows without
    * bound).
    */
  def dedupById(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Stream-stream-joinable interval join: each purchase matched to the
    * same user's clicks in the preceding `windowMinutes`. The time-range
    * predicate is what lets Structured Streaming bound the join state
    * (both sides' watermarks + the interval give an eviction horizon);
    * in batch mode the identical plan is a plain range join.
    */
  def purchaseAttribution(purchases: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val p = purchases.select(col("user_id"), col("ts").as("purchase_ts"),
      col("value").as("purchase_value"))
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .drop("c_user")
  }

  /** Wire a parquet-directory stream through [[windowedTypeStats]] into an
    * in-memory sink (used by tests and demos).
    */
  def startWindowedQuery(spark: SparkSession, sourceDir: String,
      queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    windowedTypeStats(stream)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .start()
  }
}
