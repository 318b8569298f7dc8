package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeIntoSpec extends SparkSpec {

  test("applyCdc covers update / delete / insert / delete-of-missing / keep") {
    import spark.implicits._
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "v", "n")
    val changes = Seq(
      (1L, "a2", 11, "U"), // matched update
      (2L, "b", 20, "D"),  // matched delete
      (4L, "d", 40, "I"),  // insert
      (9L, "x", 99, "D")   // delete of missing key: no-op
    ).toDF("k", "v", "n", "op")

    val (merged, stats) = MergeInto.applyCdc(target, changes, Seq("k"))
    val rows = merged.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.toSeq == Seq((1L, "a2", 11), (3L, "c", 30), (4L, "d", 40)))
    assert(stats == MergeInto.MergeStats(updated = 1, deleted = 1, inserted = 1, kept = 1))
  }

  test("merged schema matches the target schema") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "b", "U")).toDF("k", "v", "op")
    val (merged, _) = MergeInto.applyCdc(target, changes, Seq("k"))
    assert(merged.columns.toSeq == target.columns.toSeq)
  }

  test("duplicate change keys are rejected (ANSI MERGE multiple-match rule)") {
    import spark.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "b", "U"), (1L, "c", "D")).toDF("k", "v", "op")
    val e = intercept[IllegalArgumentException] {
      MergeInto.applyCdc(target, changes, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("duplicate TARGET keys are allowed (each row merges independently)") {
    import spark.implicits._
    val target = Seq((1L, "a"), (1L, "a2"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, "z", "U")).toDF("k", "v", "op")
    val (merged, stats) = MergeInto.applyCdc(target, changes, Seq("k"))
    val rows = merged.orderBy("k", "v").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "z"), (1L, "z"), (2L, "b")))
    assert(stats.updated == 2 && stats.kept == 1)
  }
}
