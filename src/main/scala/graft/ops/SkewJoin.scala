package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when AQE's
  * skew-join split isn't enough (e.g. one key holding >10% of a 100 TB
  * fact table). The big (skewed) side gets a deterministic salt derived
  * from row content; the small side is replicated saltFactor times, so the
  * hot key's rows spread across saltFactor reducers instead of one.
  *
  * Result is row-identical to `big.join(small, keys)` — verified by spec.
  * Use targeted: apply only to the hot keys (split-and-union with a plain
  * join for the cold ones) when replication cost matters.
  */
object SkewJoin {

  /** Deterministic salt for `df`: a whole-row hash mod `saltFactor` —
    * uniform enough to split a hot key across saltFactor partitions, and
    * reproducible (no rand()) so re-runs and retries agree.
    */
  def saltExpr(df: DataFrame, saltFactor: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)).cast("int")

  def saltedInnerJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    val bigSalted = big.withColumn("__salt", saltExpr(big, saltFactor))
    val saltRange = explode(sequence(lit(0), lit(saltFactor - 1)))
    val smallReplicated = small.withColumn("__salt", saltRange)
    bigSalted.join(smallReplicated, keys :+ "__salt")
      .drop("__salt")
  }

  /** Size the salt from OBSERVED skew instead of a guess: estimate the
    * hottest key's row share from a keys-only sample, then split that key
    * into enough salts that each slice carries about one average
    * reducer's load (`share × shuffle.partitions`), clamped to
    * [1, maxFactor]. 1 means "don't salt" — a uniform key distribution
    * pays zero replication.
    *
    * Cost: one sampled keys-only pass over `big` (parquet prunes to the
    * key columns). On a real deployment the share estimate comes for free
    * from ingest-time statistics or a stored count-min sketch; pass it
    * straight to [[saltedInnerJoin]] in that case.
    *
    * @param targetPartitions the reducer count the salt is sized against;
    *   defaults to the session's `spark.sql.shuffle.partitions`. Pass it
    *   explicitly when sizing for a different stage (e.g. an
    *   AQE-coalesced exchange) — or whenever ambient session conf
    *   shouldn't decide the factor.
    */
  def adaptiveSaltFactor(big: DataFrame, keys: Seq[String],
      sampleFraction: Double = 0.01, maxFactor: Int = 64,
      targetPartitions: Option[Int] = None): Int = {
    require(sampleFraction > 0 && sampleFraction <= 1)
    val partitions = targetPartitions.getOrElse(
      big.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val top = big.select(keys.map(col): _*)
      .sample(withReplacement = false, sampleFraction, seed = 42L)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")), sum(col("__n"))).head()
    if (top.isNullAt(0)) 1 // empty sample: nothing to split
    else {
      val share = top.getLong(0).toDouble / math.max(1L, top.getLong(1)).toDouble
      math.max(1, math.min(maxFactor, math.ceil(share * partitions).toInt))
    }
  }

  /** [[saltedInnerJoin]] with the factor measured by
    * [[adaptiveSaltFactor]]; falls back to the plain join when the
    * observed distribution doesn't need salting.
    */
  def saltedInnerJoinAdaptive(big: DataFrame, small: DataFrame,
      keys: Seq[String], sampleFraction: Double = 0.01,
      maxFactor: Int = 64, targetPartitions: Option[Int] = None): DataFrame = {
    val factor = adaptiveSaltFactor(big, keys, sampleFraction, maxFactor, targetPartitions)
    if (factor <= 1) big.join(small, keys)
    else saltedInnerJoin(big, small, keys, factor)
  }

  /** SELECTIVE salting — the production form of the doc comment above
    * ("apply only to the hot keys"): rows whose key is in `hotKeys` go
    * through the salted join, everything else through the plain join,
    * one union. The cold path pays zero replication and the hot path
    * replicates only the hot slice of `small`, so total replication cost
    * is `|hot small rows| × saltFactor` instead of `|small| × saltFactor`.
    *
    * `hotKeys` is the report→action wire from [[CountMin.heavyHitters]]
    * (or any bounded hot-key frame): the CMS diagnoses which keys are
    * hot, this applies the split. The frame is broadcast for the
    * semi/anti splits — it is hot-key-sized by construction (a CMS list
    * at threshold T over N rows has at most N/T keys), never collected
    * to the driver.
    *
    * Result is row-identical to `big.join(small, keys)`: the semi/anti
    * split partitions `big` exactly, and each part joins the `small`
    * rows it can match.
    */
  def selectiveSaltedInnerJoin(big: DataFrame, small: DataFrame,
      keys: Seq[String], hotKeys: DataFrame, saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    require(keys.forall(hotKeys.columns.contains),
      s"hotKeys must carry the join keys ${keys.mkString(", ")}")
    val hot = hotKeys.select(keys.map(col): _*).distinct()
    val bigHot = big.join(broadcast(hot), keys, "left_semi")
    val bigCold = big.join(broadcast(hot), keys, "left_anti")
    val smallHot = small.join(broadcast(hot), keys, "left_semi")
    bigCold.join(small, keys)
      .unionByName(saltedInnerJoin(bigHot, smallHot, keys, saltFactor))
  }
}
