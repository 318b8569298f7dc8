package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operator coverage is registered as [[Q]] values in the
  * `graft.queries` modules; this object only assembles the maps.
  */
object SparkEntry {

  private def modules: Seq[Q] =
    CoreQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ GeoQueries.all ++ HealthQueries.all ++
      ExtraQueries.all ++ TpchQueries.all ++ PipelineQueries.all ++
      CurationQueries.all ++ GraphQueries.all ++ WebQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
