package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation stage a
  * production pipeline runs between ingest and publish (the reference
  * cleans row-at-a-time in Python; a declarative engine asserts the same
  * invariants corpus-wide in one aggregate).
  *
  * Scale shape: ALL row-level rules evaluate in a SINGLE pass — one
  * partial/final hash aggregate carrying (1 + #rules) longs, no matter
  * how many rules or rows; the per-rule report then unpivots the one
  * aggregate row (driver-side constant work). Referential integrity is
  * the one rule that genuinely needs a second relation: a left-anti join
  * against the (distinct) parent keys, broadcastable when the parent key
  * set fits.
  */
object Expectations {

  /** One expectation: `violated` must evaluate to TRUE exactly on rows
    * that break the rule (nulls count as violations — an unknown is not a
    * pass; wrap in `coalesce` at the call site to opt out).
    */
  final case class Rule(name: String, violated: Column)

  /** Evaluate all rules in one aggregate pass. Output: one row per rule,
    * in the given order — (rule, rows, violations, violation_rate).
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggd = df.agg(
      count(lit(1)).as("__rows"),
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(coalesce(r.violated, lit(true)), 1L).otherwise(0L)).as(s"__v$i")
      }: _*)
    // unpivot via the Column API (explode over literal structs), not a
    // stack() SQL string — rule names never pass through the SQL lexer,
    // so quotes/backslashes in a name can't corrupt the report
    val entries = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__v$i").as("violations"))
    }
    aggd.select(col("__rows"), explode(array(entries: _*)).as("__e"))
      .select(col("__e.rule").as("rule"), col("__rows").as("n_rows"),
        col("__e.violations").as("violations"),
        (col("__e.violations").cast("double") / col("__rows")).as("violation_rate"))
  }

  /** Referential-integrity violation rows: child rows whose `childKey` has
    * no match in `parent`'s `parentKey` (null child keys violate too —
    * they reference nothing). Count it for a report row; keep it for
    * quarantine.
    */
  def refViolations(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val parents = parent.select(col(parentKey).as("__pk")).distinct()
    child.join(parents, col(childKey) === col("__pk"), "left_anti")
  }

  /** STREAMING quality gate: per micro-batch, split rows into pass /
    * quarantine on the conjunction of `rules` and hand each side (plus
    * the per-rule report) to its sink — the operational shape where bad
    * rows must not silently vanish OR poison the published table. The
    * split predicate evaluates row-local in the batch's scan stage; the
    * report is the same one-aggregate pass as [[report]]. Sinks run in
    * order (good, quarantined, report) inside the batch transaction.
    *
    * Delivery is AT-LEAST-ONCE per sink, like any foreachBatch: a sink
    * failure or restart re-runs the whole batch. Each sink therefore
    * receives the `batchId` — make the write idempotent on it (overwrite
    * a batchId-keyed partition, or MERGE on (batchId, key)) — and pass
    * `checkpoint` in production so a restart resumes instead of
    * reprocessing history.
    */
  def gateStream(docs: DataFrame, rules: Seq[Rule],
      checkpoint: Option[String] = None)(
      good: (DataFrame, Long) => Unit, quarantined: (DataFrame, Long) => Unit,
      reportSink: (DataFrame, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(rules.nonEmpty, "at least one rule")
    val writer = docs.writeStream.outputMode("append")
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bad = rules.map(r => coalesce(r.violated, lit(true)))
          .reduce(_ || _)
        val tagged = batch.withColumn("__bad", bad).persist()
        try {
          good(tagged.filter(!col("__bad")).drop("__bad"), batchId)
          quarantined(tagged.filter(col("__bad")).drop("__bad"), batchId)
          // aggregate off the persisted split, not the raw batch — the
          // report must not re-read the micro-batch source
          reportSink(report(tagged.drop("__bad"), rules), batchId)
          ()
        } finally tagged.unpersist()
      }
      .start()
  }
}
