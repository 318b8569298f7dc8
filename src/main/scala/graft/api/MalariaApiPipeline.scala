package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.clean.CleanFunctions._

/** HMIS wide-format → per-(sector, year) API calculator — the reference's
  * pivoted-year-columns loop (malaria_api_calculator_etl_view.py:298-349)
  * re-expressed as a `stack` unpivot + vectorized derivation.
  *
  * Year discovery mirrors the reference's regex over document keys
  * (`Total Cases_(\d{4})`, :152-157) as a scan over the DataFrame schema —
  * schema-on-read replaces per-document probing.
  */
object MalariaApiPipeline {

  private val yearCol = "Total Cases_(\\d{4})".r

  /** Years available in a wide HMIS frame, from its schema. */
  def discoverYears(wide: DataFrame): Seq[Int] =
    wide.columns.collect { case yearCol(y) => y.toInt }.sorted

  /** Unpivot the wide frame to long (province, district, sector, year,
    * total_cases, population, incidence_original) and derive API + WHO
    * risk fields. Rows whose cases/population are unparseable are dropped
    * (the reference `continue`s); missing incidence defaults to 0.
    */
  def calculate(wide: DataFrame, sourceCollection: String): DataFrame = {
    val years = discoverYears(wide)
      .filter(y => wide.columns.contains(s"Pop$y"))
    require(years.nonEmpty, "no Total Cases_<year>/Pop<year> column pairs found")

    val stacked = wide.select(
      cleanText(col("Province")).as("province"),
      cleanText(col("District")).as("district"),
      cleanText(col("Sector")).as("sector"),
      expr(s"stack(${years.length}, " + years.map(y =>
        s"$y, `Total Cases_$y`, `Pop$y`, " +
          (if (wide.columns.contains(s"Incidence_$y")) s"`Incidence_$y`" else "CAST(NULL AS DOUBLE)"))
        .mkString(", ") + ") AS (year, cases_raw, pop_raw, incidence_raw)"))

    // rows whose cases or population don't parse are DROPPED — the
    // reference's `continue` (a zero-fill would fabricate false
    // "No Transmission" records and inflate every summary count); only
    // missing incidence defaults to 0
    val parsed = stacked
      .filter(col("cases_raw").try_cast("double").isNotNull &&
        col("pop_raw").try_cast("double").isNotNull)
      .select(
        col("province"), col("district"), col("sector"), col("year").cast("int").as("year"),
        col("cases_raw").try_cast("double").as("total_cases_d"),
        col("pop_raw").try_cast("double").as("population_d"),
        coalesce(col("incidence_raw").try_cast("double"), lit(0.0)).as("incidence_d"))

    val api = when(col("population_d") > 0,
      col("total_cases_d") / col("population_d") * 1000).otherwise(0.0)

    parsed.select(
      expr("uuid()").as("unique_id"),
      col("province"), col("district"), col("sector"), col("year"),
      col("total_cases_d").cast("int").as("total_cases"),
      col("population_d").cast("int").as("population"),
      bround(api, 2).as("api"),
      riskCategory(api).as("risk_category"),
      bround(col("incidence_d"), 2).as("incidence_original"),
      bround(api, 2).as("cases_per_1000"),
      highBurden(api).as("high_burden"),
      eliminationTarget(api).as("elimination_target"),
      lit(sourceCollection).as("source_collection"),
      formatTimestamp(current_timestamp()).as("created_at"),
      formatTimestamp(current_timestamp()).as("updated_at"))
  }

  /** A10 location hierarchy: province → district → sorted sectors. */
  def locationHierarchy(long: DataFrame): DataFrame =
    long.select("province", "district", "sector").distinct()
      .groupBy("province", "district")
      .agg(sort_array(collect_set(col("sector"))).as("sectors"))
      .orderBy("province", "district")

  /** A11 response summary: totals + risk distribution. */
  def summary(long: DataFrame): DataFrame =
    long.agg(
      count(lit(1)).as("records"),
      sum(col("total_cases").cast("long")).as("total_cases"),
      min("api").as("min_api"),
      max("api").as("max_api"),
      bround(avg("api"), 2).as("avg_api"),
      sum(when(col("high_burden"), 1L).otherwise(0L)).as("high_burden_count"))
}
