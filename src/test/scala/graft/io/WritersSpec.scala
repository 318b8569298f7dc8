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

  test("upsertPath rejects a duplicate-key FIRST batch without creating the table") {
    val dir = Files.createTempDirectory("upsertdup").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val e = intercept[IllegalArgumentException] {
      Writers.upsertPath(spark, Seq((1, "a"), (1, "a2")).toDF("id", "v"), dir, Seq("id"))
    }
    assert(e.getMessage.contains("duplicate keys"))
    // the bad batch must not have landed as the live table, and no
    // staging debris may survive the rejection
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "._graft_staging")))
    // a clean batch afterwards bootstraps normally
    val stats = Writers.upsertPath(spark, Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    assert(stats == Writers.UpsertStats(1, 0, 1))
  }

  test("overwriteStaged defers visibility until commit") {
    val dir = Files.createTempDirectory("staged").toString + "/t"
    Writers.overwrite(Seq((1, "old")).toDF("id", "v"), dir)
    val commit = Writers.overwriteStaged(Seq((1, "new"), (2, "new2")).toDF("id", "v"), dir)
    // staged but not committed: readers still see the old table
    assert(spark.read.parquet(dir).collect().map(_.getString(1)).toSeq == Seq("old"))
    commit()
    val back = spark.read.parquet(dir).collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(back == Map(1 -> "new", 2 -> "new2"))
  }

  test("overwriteStaged commit creates the table when none existed") {
    val dir = Files.createTempDirectory("stagedfresh").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commit = Writers.overwriteStaged(Seq((1, "a")).toDF("id", "v"), dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir))) // not yet visible
    commit()
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("esBulkLines fails loudly on a null id instead of omitting _id") {
    import org.apache.spark.sql.functions._
    val df = Seq((Some(1L), "x"), (None: Option[Long], "y")).toDF("id", "payload")
    val lines = Writers.esBulkLines(df, "idx", "id", to_json(struct(col("payload"))))
    val e = intercept[Exception] { lines.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("null value in id column")))
  }

  test("upsertPath cleans stale staging/backup dirs and leaves none behind") {
    val dir = Files.createTempDirectory("upsertswap").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Writers.upsertPath(spark, Seq((1, "a")).toDF("id", "v"), dir, Seq("id"))
    // debris from a hypothetical earlier crash mid-swap
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + "._graft_staging"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + "._graft_bak"))
    Writers.upsertPath(spark, Seq((2, "b")).toDF("id", "v"), dir, Seq("id"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "._graft_staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "._graft_bak")))
    val back = spark.read.parquet(dir).collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(back == Map(1 -> "a", 2 -> "b"))
  }

  test("upsertPath recovers the dataset from a crash between the two swap renames") {
    val dir = Files.createTempDirectory("upsertcrash").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Writers.upsertPath(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir, Seq("id"))
    // simulate a crash after `live -> .bak` but before `staging -> live`:
    // the ONLY copy of the data is the backup
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "._graft_bak")))
    val stats = Writers.upsertPath(spark, Seq((2, "b2"), (3, "c")).toDF("id", "v"), dir, Seq("id"))
    // pre-crash rows MUST survive: this is an upsert against restored
    // data, not a bootstrap of an empty path
    assert(stats == Writers.UpsertStats(1, 1, 2))
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

  test("scd2: history preserved, changed keys versioned, unchanged untouched") {
    import org.apache.spark.sql.functions.col
    val t0 = Writers.scd2Init(
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), batchId = 100L)
    // batch 200: id 2 changes, id 3 unchanged, id 4 new
    val t1 = Writers.scd2Apply(t0,
      Seq((2, "b2"), (3, "c"), (4, "d")).toDF("id", "v"),
      key = Seq("id"), tracked = Seq("v"), batchId = 200L)

    val current = t1.filter(col("is_current")).collect()
      .map(r => r.getAs[Int]("id") -> r.getAs[String]("v")).toMap
    assert(current == Map(1 -> "a", 2 -> "b2", 3 -> "c", 4 -> "d"))
    val closed = t1.filter(!col("is_current")).collect()
    assert(closed.length == 1)
    assert(closed.head.getAs[Int]("id") == 2)
    assert(closed.head.getAs[String]("v") == "b")
    assert(closed.head.getAs[Long]("valid_to") == 200L)
    // unchanged key 3 kept its original valid_from (not re-versioned)
    val k3 = t1.filter(col("is_current") && col("id") === 3).head()
    assert(k3.getAs[Long]("valid_from") == 100L)
    // total rows: 4 current + 1 history
    assert(t1.count() == 5)
  }

  test("bucketed tables join without a shuffle exchange") {
    import org.apache.spark.sql.functions.col
    Writers.writeBucketed(
      spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v1"),
      "bkt_left", Seq("k"), buckets = 4)
    Writers.writeBucketed(
      spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS v2"),
      "bkt_right", Seq("k"), buckets = 4)
    try {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected bucket co-location to avoid the shuffle:\n$plan")
      assert(joined.count() == 1000)
      // sanity: the same join on plain (unbucketed) frames does shuffle
      val plain = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v1")
        .join(spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS v2"), "k")
      val planPlain = plain.queryExecution.executedPlan.toString
      assert(planPlain.contains("Exchange") || planPlain.contains("Broadcast"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("compact merges small files, preserves data, no-ops at target") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    spark.range(0, 10000).selectExpr("id", "id * 2 AS v")
      .repartition(20).write.parquet(dir)
    def partFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(partFiles == 20)
    val s1 = Writers.compact(spark, dir, targetBytes = 1L << 30)
    assert(s1.filesBefore == 20 && s1.filesAfter == 1)
    assert(partFiles == 1)
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0)
      == 9999L * 10000L) // sum 2*id over 0..9999
    // second call: already at target -> zero rewrites
    val s2 = Writers.compact(spark, dir, targetBytes = 1L << 30)
    assert(s2.filesBefore == 1 && s2.filesAfter == 1)
  }
}
