package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-style MERGE / CDC-apply on plain frames: one FULL OUTER join on
  * the key applies a change batch carrying an `op` column —
  *
  *  - matched + 'D'   → row deleted
  *  - matched + 'U'/'I' → row replaced by the change row
  *  - unmatched + 'U'/'I' → row inserted
  *  - unmatched + 'D' → no-op (delete of a missing key)
  *
  * This is the batch complement of the streaming foreachBatch upsert and
  * the engine form of `MERGE INTO ... WHEN MATCHED [AND cond] THEN
  * UPDATE/DELETE WHEN NOT MATCHED THEN INSERT`. Both sides shuffle once on
  * the key. Validation + accounting run in ONE eager job over KEYS-ONLY
  * projections (the exchange carries keys + op, never the data columns),
  * so the full-width join below stays lazy and executes exactly once —
  * when the caller consumes the merged frame. At scale the data-carrying
  * exchange dominates MERGE cost; doubling it (the naive "validate by
  * running the join twice" shape) is the thing this layout avoids.
  */
object MergeInto {

  final case class MergeStats(updated: Long, deleted: Long, inserted: Long, kept: Long)

  /** Apply `changes` (same schema as `target` plus `opCol`) to `target`.
    * Returns the merged frame (target schema) and one-job stats.
    *
    * Like SQL MERGE, the change batch must have AT MOST ONE row per key —
    * two change rows matching one target row make the outcome
    * order-dependent (ANSI MERGE raises the same error). Enforced inside
    * the single stats job: duplicate keys throw before anything merges.
    */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op"): (DataFrame, MergeStats) = {
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    require(dataCols.forall(changes.columns.contains),
      s"changes must carry target columns; missing ${dataCols.filterNot(changes.columns.contains)}")

    val t = target.select(
      keys.map(col) ++ dataCols.map(c => col(c).as(s"__t_$c")) :+ lit(1).as("__t"): _*)
    val c = changes.select(
      keys.map(col) ++ dataCols.map(c0 => col(c0).as(s"__s_$c0")) :+
        col(opCol).as("__op") :+ lit(1).as("__s"): _*)
    val joined = t.join(c, keys, "full_outer")

    // one filter covers every delete case: matched 'D' removes the target
    // row, unmatched 'D' contributes nothing. A null/unknown op would be
    // silently swallowed by this predicate (null || null = dropped), which
    // is why the stats job below REJECTS such rows before merged is ever
    // consumed.
    val merged = joined
      .filter(col("__s").isNull || col("__op") =!= "D")
      .select(keys.map(col) ++ dataCols.map(d =>
        when(col("__s").isNotNull, col(s"__s_$d")).otherwise(col(s"__t_$d")).as(d)): _*)

    // Validation + accounting: the SAME full-outer shape, but over
    // keys-only projections. Parquet scans prune to the key columns, the
    // shuffle rows are (keys, op) tuples, and the full-width `joined`
    // lineage above is never executed here — it runs once, lazily, when
    // the caller consumes `merged`. Rejections (null/unknown op, dup
    // change keys) throw from this job before `merged` can be consumed.
    val tk = target.select(keys.map(col) :+ lit(1).as("__t"): _*)
    val ck = changes.select(keys.map(col) :+ col(opCol).as("__op") :+ lit(1).as("__s"): _*)
      .withColumn("__sid", monotonically_increasing_id())
    val changeKey = struct(keys.map(col): _*)
    val st = tk.join(ck, keys, "full_outer").agg(
      coalesce(sum(when(col("__t").isNotNull && col("__s").isNotNull && col("__op") =!= "D", 1L)), lit(0L)),
      coalesce(sum(when(col("__t").isNotNull && col("__s").isNotNull && col("__op") === "D", 1L)), lit(0L)),
      coalesce(sum(when(col("__t").isNull && col("__op") =!= "D", 1L)), lit(0L)),
      coalesce(sum(when(col("__s").isNull, 1L)), lit(0L)),
      countDistinct(col("__sid")), // change ROWS (robust to duplicate target keys)
      countDistinct(when(col("__s").isNotNull, changeKey)),
      coalesce(sum(when(col("__s").isNotNull &&
        (col("__op").isNull || !col("__op").isin("I", "U", "D")), 1L)), lit(0L))).head()
    if (st.getLong(6) > 0L)
      throw new IllegalArgumentException(
        s"MERGE changes contain ${st.getLong(6)} rows with a null/unknown '$opCol' " +
          "(allowed: I, U, D); rejecting rather than silently dropping the matched target rows")
    if (st.getLong(4) != st.getLong(5))
      throw new IllegalArgumentException(
        s"MERGE changes contain duplicate keys (${st.getLong(4)} change rows over " +
          s"${st.getLong(5)} distinct keys); like ANSI MERGE, at most one change row per key is allowed")
    (merged, MergeStats(st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3)))
  }
}
