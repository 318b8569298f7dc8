package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch frequency estimation (Cormode & Muthukrishnan, J.
  * Algorithms 2005) — the skew-diagnosis sketch: before a big join, ask
  * "which keys are hot enough to need salting?" without a full-cardinality
  * groupBy ever leaving the map side. `depth` independent hash rows of
  * `width` counters each; a key's estimate is the MIN of its `depth`
  * counters, an upper bound on the true count that is tight for heavy
  * hitters (collisions only inflate, and a heavy key dominates every
  * bucket it lands in).
  *
  * Engine-portable by construction: the hash is the md5-prefix bucket
  * (the repo's content-address discipline — no murmur3, which DuckDB
  * can't replay), counters are exact longs, and the estimate is a min of
  * longs, so the sketch is reproducible bit-for-bit in any engine.
  *
  * 100 TB shape: the counter table is depth x width cells REGARDLESS of
  * key cardinality — the groupBy(seed, bucket) collapses map-side to at
  * most depth x width partial rows per task before the (tiny) exchange,
  * and the estimate join broadcasts the finished sketch. The explode by
  * `depth` multiplies scan rows, but those rows are (key, seed) pairs
  * that die in the partial aggregate of the same stage — nothing
  * key-cardinality-sized ever shuffles. Candidate enumeration is the
  * caller's choice: [[estimate]] takes any candidate frame (production:
  * per-partition local top-k, a watchlist, or last run's hot keys);
  * [[heavyHitters]] scores every distinct key — the audit form that also
  * reports the sketch's overestimate against exact counts.
  */
object CountMin {

  /** The depth x width counter table for `keyCol` of `df`:
    * (seed, bucket, c) with seed in [0, depth), bucket in [0, width).
    */
  def sketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16]: $depth")
    require(width >= 2 && width <= (1 << 20), s"width must be in [2, 2^20]: $width")
    df.select(col(keyCol).cast("string").as("_cmk"))
      .select(col("_cmk"), explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .withColumn("bucket", bucketOf(width))
      .groupBy("seed", "bucket").agg(count(lit(1)).as("c"))
  }

  /** CMS estimates for a candidate key frame: one row per candidate with
    * `est` = min over seeds of the key's counter. The sketch side is
    * depth x width rows and broadcasts; the candidate side never sees a
    * counter it doesn't hash to. Candidates absent from the sketched
    * data still land in counters (possibly shared) — their estimate is
    * whatever collision mass sits there, the standard CMS upper bound.
    */
  def estimate(sketchDf: DataFrame, candidates: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val reserved = Seq("_cmk", "seed", "bucket", "c", "est")
    require(!candidates.columns.exists(reserved.contains),
      s"candidates must not carry reserved columns ${reserved.mkString(", ")}")
    val carry = candidates.columns.filter(_ != keyCol).map(col).toSeq
    candidates.withColumn("_cmk", col(keyCol).cast("string"))
      .select(Seq(col(keyCol), col("_cmk")) ++ carry :+
        explode(sequence(lit(0), lit(depth - 1))).as("seed"): _*)
      .withColumn("bucket", bucketOf(width))
      .join(broadcast(sketchDf), Seq("seed", "bucket"))
      .groupBy(Seq(col(keyCol)) ++ carry: _*)
      .agg(min("c").as("est"))
  }

  /** Audit form: estimate EVERY distinct key of `keyCol`, keep those
    * whose estimate reaches `threshold`, and report the exact count
    * beside the estimate so the overestimate (always >= 0) is visible.
    * The full-cardinality distinct is the audit's cost, not the
    * sketch's — production callers pass a bounded candidate frame to
    * [[estimate]] instead.
    */
  def heavyHitters(df: DataFrame, keyCol: String, threshold: Long,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val cand = df.select(col(keyCol)).groupBy(keyCol).agg(count(lit(1)).as("exact"))
    estimate(sketch(df, keyCol, depth, width), cand, keyCol, depth, width)
      .filter(col("est") >= threshold)
      .select(col(keyCol), col("est"), col("exact"),
        (col("est") - col("exact")).as("overestimate"))
      .orderBy(col("est").desc, col(keyCol))
  }

  /** Row `seed`'s bucket for string key column `_cmk`: the top-60-bit
    * md5 prefix of "seed:key" mod width — independent rows come from the
    * seed prefix changing the digest completely.
    */
  private def bucketOf(width: Int) =
    pmod(
      graft.text.TextSketch.md5PrefixLong(
        concat(col("seed").cast("string"), lit(":"), col("_cmk")), 15),
      lit(width.toLong))
}
