package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  test("rules fold into one report; nulls violate unless coalesced out") {
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (5L, null), (null, "y"))
      .toDF("v", "s")
    val rep = report(df, Seq(
      Rule("v_small", col("v") > 3), // null v -> violation
      Rule("v_small_null_ok", coalesce(col("v") > 3, lit(false))),
      Rule("s_present", col("s").isNull)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep("v_small") === ((3L, 2L))) // v=5 breaks it, v=null counts too
    assert(rep("v_small_null_ok") === ((3L, 1L))) // only v=5
    assert(rep("s_present") === ((3L, 1L)))
  }

  test("refViolations keeps orphan child rows, including null keys") {
    val child = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (99L, "c"), (null, "d"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val orphans = refViolations(child, "fk", parent, "pk")
      .collect().map(_.getString(1)).sorted.toSeq
    assert(orphans === Seq("c", "d"))
  }
}
