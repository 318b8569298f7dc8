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

  test("selective salting is row-identical and replicates only hot small rows") {
    // 60% of rows on 2 hot keys, the rest over 200 cold keys
    val big = spark.range(0, 10000)
      .select(when(col("id") % 5 < 3, col("id") % 2).otherwise(col("id") % 200 + 10)
        .as("k"), col("id").as("payload"))
    val small = big.select("k").distinct().withColumn("w", col("k") * 2)
    val hot = CountMin.heavyHitters(big, "k", threshold = 1000L, depth = 4, width = 2048)
      .select("k")
    assert(hot.count() == 2)

    val plain = big.join(small, Seq("k"))
    val selective = SkewJoin.selectiveSaltedInnerJoin(big, small, Seq("k"), hot, 8)
    assert(selective.count() == plain.count())
    assert(selective.exceptAll(plain).isEmpty && plain.exceptAll(selective).isEmpty)

    // the hot side spreads across all 8 salts; cold keys never enter the
    // salted arm (its big input is exactly the hot rows)
    val bigHot = big.join(org.apache.spark.sql.functions.broadcast(hot), Seq("k"), "left_semi")
    assert(bigHot.select("k").distinct().count() == 2)
    val saltSpread = bigHot.withColumn("__salt", SkewJoin.saltExpr(bigHot, 8))
      .select("__salt").distinct().count()
    assert(saltSpread == 8)
  }

  test("selectiveSaltedInnerJoin requires the join keys on the hot frame") {
    val df = spark.range(0, 10).select(col("id").as("k"))
    intercept[IllegalArgumentException](
      SkewJoin.selectiveSaltedInnerJoin(df, df, Seq("k"),
        spark.range(1).select(col("id").as("other"))))
  }
}
