package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Slowly-changing-dimension TYPE 2 derivation (Kimball's effective-dated
  * dimension) — the missing sibling of the CDC merge sink (io/MergeInto,
  * q91): where MERGE keeps only each key's LATEST state, SCD2 keeps the
  * full history as versioned validity intervals, the shape every
  * warehouse dimension with "as of" queries needs.
  *
  * [[fromChangeLog]] turns a raw change log (many observations per key,
  * possibly repeating the same attribute values) into the SCD2 table:
  * consecutive no-op observations collapse (an observation only opens a
  * new version when some tracked attribute actually changed — null-safe
  * compare, so null->null is "no change" and null->value is a change),
  * each surviving version carries [valid_from, valid_to) with valid_to =
  * the next version's valid_from, the latest version has valid_to NULL
  * and is_current true, and `version` numbers versions 1..n per key.
  *
  * 100 TB shape: everything is two windows PARTITIONED BY the dimension
  * key — per-key work, never a global window; a dimension with billions
  * of keys and bounded history per key partitions evenly by definition.
  * The no-op collapse drops rows BETWEEN the two windows, so the second
  * window (lead/row_number) runs over the already-collapsed frame. Both
  * windows share the same partitioning key, so Catalyst plans ONE
  * exchange: sort-within-partitions twice, shuffle once.
  */
object Scd2 {

  /** @param log      raw change log, one row per observation
    * @param keyCols  dimension/business key columns
    * @param tsCol    observation timestamp (becomes valid_from)
    * @param attrCols tracked attribute columns (a change in any opens a
    *                 new version)
    * @param tieCols  deterministic tiebreak for same-timestamp
    *                 observations (e.g. a log sequence id) — required
    *                 non-empty so re-runs produce identical histories
    */
  def fromChangeLog(log: DataFrame, keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String], tieCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty && tieCols.nonEmpty,
      "keyCols, attrCols and tieCols must be non-empty")
    val reserved = Seq("_chg", "valid_from", "valid_to", "is_current", "version")
    require(!log.columns.exists(reserved.contains),
      s"log must not carry reserved columns ${reserved.mkString(", ")}")
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    // A version opens when ANY tracked attribute null-safe-differs from
    // the previous observation's; lag over an all-attrs struct keeps it
    // one window function regardless of attribute count. The first
    // observation has a null lag struct, which <=> cannot equal a
    // non-null struct, so it always opens version 1 — no rn=1 special
    // case needed.
    val attrs = struct(attrCols.map(col): _*)
    val changed = log
      .withColumn("_chg", !(attrs <=> lag(attrs, 1).over(w)))
      .filter(col("_chg"))
      .drop("_chg")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("version", row_number().over(w))
      .select((keyCols.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"),
          col("version"))): _*)
  }

  /** INCREMENTAL SCD2 — merge a new observation batch into an existing
    * [[fromChangeLog]] table without recomputing history. The warehouse
    * contract: increments are APPEND-ONLY per key — every new
    * observation's timestamp is strictly after the key's current
    * `valid_from` (verified; violations fail loudly with the offending
    * keys, because a late observation landing inside already-collapsed
    * history cannot be merged correctly from the collapsed table — it
    * needs the raw log and a re-derive for that key).
    *
    * Under that contract the merge is exact and LOCAL to each key's
    * tail: closed historical versions pass through untouched, the
    * current version's observation is replayed in front of the new
    * batch through the same [[fromChangeLog]] collapse (its timestamp is
    * strictly smallest, so its tie value can never matter — it rides a
    * NULL tie), and the rebuilt tail is renumbered to continue the
    * key's existing version sequence. Keys absent from the batch are
    * never read past the anti-join, never windowed, never rewritten —
    * the exchange is sized by the INCREMENT, not the dimension.
    * `applyIncrement(fromChangeLog(a), b) == fromChangeLog(a union b)`
    * whenever b is strictly-after — the spec pins the equivalence.
    */
  def applyIncrement(existing: DataFrame, log: DataFrame,
      keyCols: Seq[String], tsCol: String, attrCols: Seq[String],
      tieCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty && tieCols.nonEmpty,
      "keyCols, attrCols and tieCols must be non-empty")
    val outCols = keyCols ++ attrCols ++
      Seq("valid_from", "valid_to", "is_current", "version")
    require(outCols.forall(existing.columns.contains),
      s"existing must be a fromChangeLog table carrying ${outCols.mkString(", ")}")
    val affKeys = log.select(keyCols.map(col): _*).distinct()
    val untouched = existing.join(affKeys, keyCols, "left_anti")
    val affected = existing.join(affKeys, keyCols, "left_semi")
    val curr = affected.filter(col("is_current"))
    // the strictly-after contract, verified: one bounded aggregate over
    // the increment's keys only
    val violations = log.select((keyCols.map(col) :+ col(tsCol)): _*)
      .join(curr.select((keyCols.map(col) :+
        col("valid_from").as("_cur_from")): _*), keyCols)
      .filter(col(tsCol) <= col("_cur_from"))
    val bad = violations.select(keyCols.map(col): _*).distinct().limit(5).collect()
    require(bad.isEmpty,
      s"applyIncrement requires strictly-after observations; late data for " +
        s"keys ${bad.mkString(", ")} needs a re-derive from the raw log")
    // replay each affected key's current version in front of the batch;
    // its ts is strictly smallest, so a NULL tie is safe (and sorts first)
    val currObs = curr.select((keyCols.map(col) ++
      Seq(col("valid_from").as(tsCol)) ++ attrCols.map(col) ++
      tieCols.map(c => lit(null).cast(log.schema(c).dataType).as(c))): _*)
    val obs = currObs.unionByName(
      log.select((keyCols.map(col) ++ Seq(col(tsCol)) ++ attrCols.map(col) ++
        tieCols.map(col)): _*))
    val offsets = curr.select((keyCols.map(col) :+
      (col("version") - 1).as("_voff")): _*)
    val rebuilt = fromChangeLog(obs, keyCols, tsCol, attrCols, tieCols)
      .join(offsets, keyCols, "left")
      .withColumn("version",
        (col("version") + coalesce(col("_voff"), lit(0))).cast("int"))
      .drop("_voff")
    untouched.select(outCols.map(col): _*)
      .unionByName(affected.filter(!col("is_current")).select(outCols.map(col): _*))
      .unionByName(rebuilt.select(outCols.map(col): _*))
  }

  final case class ScdObs(k: String, ts: Long, attrs: Seq[String], tie: String)
  final case class ScdCur(attrs: Seq[String], validFromMs: Long, version: Int)
  final case class ScdClosed(k: String, attrs: Seq[String],
    valid_from_ms: Long, valid_to_ms: Long, version: Int)

  /** STREAMING SCD2 — the CDC-feed form: a live change log drives the
    * dimension continuously, closed versions are emitted as they close
    * (append semantics — a closed interval never changes, so it is safe
    * to append), and each key's CURRENT version lives in the state store
    * (per-key state is one attrs tuple + two scalars — bounded by key
    * cardinality, the same state discipline as the ingest loops). The
    * SAME call runs in batch, where it derives each key's closed history
    * in one pass — the spec pins batch/stream parity against
    * [[fromChangeLog]]`.filter(!is_current)`.
    *
    * Contracts carried over from [[applyIncrement]], adapted to a feed:
    * observations STRICTLY BEFORE the key's current `valid_from` are
    * DROPPED (a stream cannot throw usefully; route late data to a
    * dead-letter with a filter upstream if it must not be lost);
    * same-instant changes are accepted and close the previous version
    * with an empty [t, t) interval — exactly [[fromChangeLog]]'s window
    * semantics, which is what makes the batch replay oracle-equal. Attrs
    * and ties compare on their STRING casts (the state must be
    * schema-stable across attr types); numeric ties that can collide at
    * equal timestamps should be zero-padded by the caller. Within a
    * micro-batch a key's rows are ordered by (ts, tie) before applying —
    * cross-batch disorder falls under the late-data rule.
    */
  def historyStream(log: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String], tieCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty && tieCols.nonEmpty,
      "attrCols and tieCols must be non-empty")
    val spark = log.sparkSession
    import spark.implicits._
    val prepared = log.select(
        col(keyCol).cast("string").as("k"),
        unix_millis(col(tsCol).cast("timestamp")).as("ts"),
        array(attrCols.map(c => col(c).cast("string")): _*).as("attrs"),
        concat_ws("\u0000",
          tieCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*).as("tie"))
      .as[ScdObs]
    prepared
      .groupByKey(_.k)
      .flatMapGroupsWithState[ScdCur, ScdClosed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (k, rows, state: GroupState[ScdCur]) =>
          val obs = rows.toSeq.sortBy(o => (o.ts, o.tie))
          var cur = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[ScdClosed]
          obs.foreach { o =>
            cur match {
              case None =>
                cur = Some(ScdCur(o.attrs, o.ts, 1))
              case Some(c) if o.ts < c.validFromMs =>
                () // late observation: dropped (documented contract)
              case Some(c) if o.attrs == c.attrs =>
                () // no-op observation: collapses
              case Some(c) =>
                out += ScdClosed(k, c.attrs, c.validFromMs, o.ts, c.version)
                cur = Some(ScdCur(o.attrs, o.ts, c.version + 1))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
      .toDF()
  }
}
