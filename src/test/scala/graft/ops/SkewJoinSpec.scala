package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join on skewed data") {
    // 90% of the big side hits one key — the classic hot-key shape
    val big = spark.range(0, 10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(1L).as("k"),
        col("id").as("payload"))
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"),
      (4L, "four"), (5L, "five"), (6L, "six")).toDF("k", "v")

    val plain = big.join(small, Seq("k"))
    val salted = SkewJoin.saltedInnerJoin(big, small, Seq("k"), saltFactor = 8)

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // salt actually spreads the hot key across partitions
    val saltSpread = big
      .withColumn("__salt", pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(saltSpread == 8)
  }
}
