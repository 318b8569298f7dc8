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
      .withColumn("__salt", SkewJoin.saltExpr(big, 8))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(saltSpread == 8)
  }

  test("adaptive factor sizes from observed skew and bounds per-salt load") {
    // 50% of rows on one hot key, the rest uniform over 100 keys
    val big = spark.range(0, 20000)
      .select(when(col("id") % 2 === 0, 0L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val small = spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))

    // explicit target partitions: the factor must come from the DATA, not
    // from whatever shuffle.partitions an earlier suite left on the
    // shared session
    val factor = SkewJoin.adaptiveSaltFactor(big, Seq("k"), sampleFraction = 0.5,
      targetPartitions = Some(4))
    // ~50% share × 4 target partitions → the hot key must split
    assert(factor >= 2, s"expected a real salt for a 50%-hot corpus, got $factor")

    // bounded per-task input: no (key, salt) slice may exceed ~1.5× the
    // hot key's fair share at the chosen factor
    val maxSlice = big.withColumn("__salt", SkewJoin.saltExpr(big, factor))
      .groupBy("k", "__salt").count().agg(max("count")).head().getLong(0)
    assert(maxSlice <= (10000.0 / factor * 1.5).toLong,
      s"hot-key slice $maxSlice exceeds fair-share bound at factor $factor")

    // row identity through the adaptive path
    val plain = big.join(small, Seq("k"))
    val adaptive = SkewJoin.saltedInnerJoinAdaptive(big, small, Seq("k"),
      sampleFraction = 0.5, targetPartitions = Some(4))
    assert(adaptive.count() == plain.count())
    assert(adaptive.exceptAll(plain).isEmpty && plain.exceptAll(adaptive).isEmpty)

    // a uniform corpus measures factor 1: no replication is paid
    val uniform = spark.range(0, 20000)
      .select((col("id") % 100).as("k"), col("id").as("payload"))
    assert(SkewJoin.adaptiveSaltFactor(uniform, Seq("k"), sampleFraction = 0.5,
      targetPartitions = Some(4)) == 1)
  }
}
