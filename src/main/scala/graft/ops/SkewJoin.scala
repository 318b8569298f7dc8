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

  def saltedInnerJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    // salt from a hash of the whole row (deterministic, no rand()):
    // uniform enough to split a hot key across saltFactor partitions
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)).cast("int"))
    val saltRange = explode(sequence(lit(0), lit(saltFactor - 1)))
    val smallReplicated = small.withColumn("__salt", saltRange)
    bigSalted.join(smallReplicated, keys :+ "__salt")
      .drop("__salt")
  }
}
