package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One correctness-gated query: a Spark plan plus (optionally) the DuckDB
  * oracle SQL the driver checks it against. Oracle-less queries get a weaker
  * rows-only check (used for ops whose exact SQL mirror isn't expressible —
  * e.g. murmur3-based sketches).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared helpers for oracle-exact query plans. */
object Qx {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) (Spark reads it
      // as int64 only under nanosAsLong) and as TIMESTAMP(MICROS) (read as
      // TIMESTAMP_NTZ) across testdata generations; normalize either to a
      // session-tz timestamp so every downstream query sees one type.
      // Micro truncation of the nanos form is harmless — analytics bucket
      // at day/month grain.
      // The two branches agree only under UTC: the Long branch is epoch-UTC
      // nanos while the NTZ cast reads wall-clock in session tz. All entry
      // points set UTC; enforce it so a non-UTC caller can't silently shift
      // instants relative to the DuckDB oracle.
      require(
        spark.conf.get("spark.sql.session.timeZone") == "UTC",
        "graft queries require spark.sql.session.timeZone=UTC (set by GraftSession); " +
          s"got ${spark.conf.get("spark.sql.session.timeZone")}")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
        case org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case other =>
          // A new testdata generation with an unexpected ts physical type must
          // surface as an error, not silent-cast nulls.
          throw new IllegalStateException(
            s"events.ts: unexpected parquet type $other (expected int64-nanos, " +
              "TIMESTAMP, or TIMESTAMP_NTZ)")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Exact-aggregation casts. The testdata's money/measure doubles carry at
    * most 2 decimals, so aggregating them as decimals is EXACT and therefore
    * independent of accumulation order — a raw `sum(double)` would differ in
    * the last bits between Spark's partition-parallel order and DuckDB's,
    * breaking the driver's hash compare. Final results are cast back to
    * double (a deterministic, correctly-rounded conversion in both engines).
    */
  def d12(c: Column): Column = c.cast("decimal(12,2)")

  /** Narrow decimal for small fractions (discount, tax): keeps products
    * within both engines' 38-digit decimal budget.
    */
  def d4(c: Column): Column = c.cast("decimal(4,2)")

  def dbl(c: Column): Column = c.cast("double")

  /** Decimal→double via a STRING round-trip. Use for decimals whose scaled
    * integer value can exceed 2^53: DuckDB's direct wide-decimal→double
    * cast rounds twice (int128→double, then ×10^-scale) and lands an ulp
    * off the correctly-rounded value; string→double parses are correctly
    * rounded in both engines. Mirror as
    * `CAST(CAST(x AS VARCHAR) AS DOUBLE)`.
    */
  def d2d(c: Column): Column = c.cast("string").cast("double")
}
