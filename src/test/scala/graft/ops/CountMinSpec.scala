package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("estimate upper-bounds exact counts and is exact without collisions") {
    // 8 keys into a 4x1024 sketch: collisions are possible but the CMS
    // guarantee (est >= exact, always) must hold regardless; with this
    // few keys the min over 4 rows is exact w.h.p. — assert the bound
    // strictly and exactness as the expected common case per key.
    val df = (0 until 8).flatMap(k => Seq.fill((k + 1) * 10)(k)).toDF("k")
    val sk = CountMin.sketch(df, "k", depth = 4, width = 1024)
    val cand = df.groupBy("k").agg(count(lit(1)).as("exact"))
    val got = CountMin.estimate(sk, cand, "k", depth = 4, width = 1024)
      .collect().map(r => (r.getAs[Int]("k"), r.getAs[Long]("exact"), r.getAs[Long]("est")))
    assert(got.length == 8)
    got.foreach { case (k, exact, est) =>
      assert(exact == (k + 1) * 10L)
      assert(est >= exact, s"CMS must never underestimate (key $k)")
    }
  }

  test("heavyHitters surfaces exactly the keys above threshold") {
    // 3 hot keys (100 rows) among 500 singletons; width 2048 keeps the
    // expected collision mass per bucket (~500*4/2048/4 rows) far below
    // the threshold, so the report is exactly the hot 3.
    val hot = (0 until 3).flatMap(k => Seq.fill(100)(s"hot$k"))
    val cold = (0 until 500).map(i => s"cold$i")
    val df = (hot ++ cold).toDF("k")
    val hh = CountMin.heavyHitters(df, "k", threshold = 50L, depth = 4, width = 2048)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("exact"), r.getAs[Long]("overestimate")))
    assert(hh.map(_._1).toSet == Set("hot0", "hot1", "hot2"))
    hh.foreach { case (_, exact, over) =>
      assert(exact == 100L)
      assert(over >= 0L)
    }
  }

  test("the sketch never exceeds depth x width rows regardless of cardinality") {
    val df = spark.range(0, 20000).select(col("id").as("k"))
    val sk = CountMin.sketch(df, "k", depth = 4, width = 256)
    assert(sk.count() <= 4L * 256)
    // total mass is preserved per row: every key lands once per seed
    val mass = sk.agg(sum("c")).head().getLong(0)
    assert(mass == 4L * 20000)
  }

  test("parameter bounds are enforced") {
    val df = Seq(1, 2).toDF("k")
    intercept[IllegalArgumentException](CountMin.sketch(df, "k", depth = 0))
    intercept[IllegalArgumentException](CountMin.sketch(df, "k", width = 1))
  }
}
