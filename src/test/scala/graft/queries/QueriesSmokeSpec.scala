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

  test("CSV upload fixtures leave no graft_csv* temp dirs behind") {
    // VERDICT r15 #3: q276/q285 used to leak one temp dir per invocation;
    // withTempCsvDir now deletes eagerly (safe — both faces driver-decode).
    // Delta-based so a concurrent JVM's fixtures can't fail this suite.
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    def fixtures(): Set[String] = java.nio.file.Files.list(tmp).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("graft_csv")).toSet
    val before = fixtures()
    for (q <- Seq("q276_csv_utf16_ingest", "q285_csv_cjk_ingest",
        "q286_csv_euckr_ingest"))
      assert(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count() > 0)
    val residue = fixtures() -- before
    assert(residue.isEmpty, s"leaked fixture dirs: $residue")
  }
}
