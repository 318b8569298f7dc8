package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Runs every registered query end-to-end on sf0.001 — catches runtime
  * regressions (analysis errors, bad casts, empty-result surprises) before
  * the driver's sf0.01 oracle gate does. Exact-value checks live in the
  * DuckDB harness (tools/oracle_check.py); here we assert execution +
  * plausible shape.
  */
class QueriesSmokeSpec extends SparkSpec {

  // q72's two-nation pair filter legitimately matches nothing at the
  // smallest scale factor (10 suppliers over 25 nations); the sf0.01
  // oracle gate covers it with rows.
  private val mustBeNonEmpty = SparkEntry.queries.keySet -- Set("q72_nation_volume")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, "/root/testdata/sf0.001")
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (mustBeNonEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query with an oracle has matching key sets") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
