package graft.io

import graft.SparkSpec
import java.nio.file.Files

class WritersSpec extends SparkSpec {
  import spark.implicits._

  test("upsertByKey counts inserted vs updated and incoming wins") {
    val existing = Seq((1, "old-a"), (2, "old-b"), (3, "old-c")).toDF("id", "v")
    val incoming = Seq((2, "new-b"), (4, "new-d")).toDF("id", "v")
    val (merged, stats) = Writers.upsertByKey(existing, incoming, Seq("id"))
    assert(stats == Writers.UpsertStats(inserted = 1, updated = 1, total = 2))
    val byId = merged.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(byId == Map(1 -> "old-a", 2 -> "new-b", 3 -> "old-c", 4 -> "new-d"))
  }

  test("upsertPath bootstraps then merges on disk") {
    val dir = Files.createTempDirectory("upsert").toString + "/t"
    val first = Writers.upsertPath(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, Seq("id"))
    assert(first == Writers.UpsertStats(2, 0, 2))
    val second = Writers.upsertPath(spark, Seq((2, "b2"), (3, "c")).toDF("id", "v"), dir, Seq("id"))
    assert(second == Writers.UpsertStats(1, 1, 2))
    val back = spark.read.parquet(dir).collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(back == Map(1 -> "a", 2 -> "b2", 3 -> "c"))
  }

  test("partitionReplace only overwrites incoming partitions") {
    val dir = Files.createTempDirectory("partrep").toString + "/t"
    Writers.partitionReplace(
      Seq((2021, "x", 1), (2022, "y", 2)).toDF("year", "k", "v"), dir, Seq("year"))
    // replace only 2022
    Writers.partitionReplace(
      Seq((2022, "y2", 20)).toDF("year", "k", "v"), dir, Seq("year"))
    val back = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Int]("year"), r.getAs[String]("k"), r.getAs[Int]("v"))).toSet
    assert(back == Set((2021, "x", 1), (2022, "y2", 20)))
  }
}
