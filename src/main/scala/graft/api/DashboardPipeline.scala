package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.clean.CleanFunctions.pctRate

/** The reference's analytics-dashboard API surface
  * (analytics_dashboard/views.py) as declarative jobs over the cleaned lab
  * frame. The reference endpoints return placeholder arithmetic in several
  * spots (get_kpi_data's `total * 0.15`, views.py:260-263); this pipeline
  * computes the data-true versions of the same response shapes — the KPI
  * card, gender breakdown, monthly trend matrix, top-20 villages
  * (views.py:372-381) and location summary — each oracled (q73, q83-q86).
  *
  * Scale notes: every endpoint is one hash-aggregate over the lab frame
  * (map-side partial, narrow shuffle on the group key). The year-over-year
  * change in [[kpiData]] windows over the per-YEAR aggregate — a frame of
  * a few rows — never over raw records.
  */
object DashboardPipeline {

  /** get_kpi_data: totals + data-true period change (latest year vs the
    * one before, the reference's hardcoded "5.2%" slot).
    */
  def kpiData(lab: DataFrame): DataFrame = {
    val byYear = lab.groupBy("year").agg(
      sum(when(col("is_positive"), 1L).otherwise(0L)).as("pos"),
      sum(when(col("test_result") === "Negative", 1L).otherwise(0L)).as("neg"))
    // tiny post-aggregate frame (one row per year): the unpartitioned
    // window is deliberate and safe
    val latest = byYear
      .withColumn("prev_pos", lag("pos", 1).over(Window.orderBy("year")))
      .withColumn("prev_neg", lag("neg", 1).over(Window.orderBy("year")))
      .withColumn("rn", row_number().over(Window.orderBy(desc("year"))))
      .filter(col("rn") === 1)
      .select(col("pos").as("l_pos"), col("neg").as("l_neg"),
        col("prev_pos"), col("prev_neg"))
    val totals = lab.agg(
      count(lit(1)).as("total_tests"),
      sum(when(col("is_positive"), 1L).otherwise(0L)).as("total_positive"),
      sum(when(col("test_result") === "Negative", 1L).otherwise(0L)).as("total_negative"))
    // left join on true, not crossJoin: an empty lab frame has zero
    // latest-year rows, and crossJoin would return NO KPI row at all
    // instead of a zeroed card (pctChangeStr handles the null lat cols)
    totals.join(latest, lit(true), "left").select(
      col("total_tests"), col("total_positive"), col("total_negative"),
      pctRate(col("total_positive"), col("total_tests")).as("avg_positivity_rate"),
      pctChangeStr(col("l_pos"), col("prev_pos")).as("positive_change"),
      pctChangeStr(col("l_neg"), col("prev_neg")).as("negative_change"))
  }

  /** "+5.2%"-style change string (1 decimal, banker's rounding like every
    * other reference rate; 0.0% when there is no prior period).
    */
  private def pctChangeStr(cur: Column, prev: Column): Column =
    concat(
      when(prev.isNull || prev === 0, lit(0.0))
        .otherwise(bround((cur - prev).cast("double") / prev * 100.0, 1))
        .cast("string"),
      lit("%"))

  /** get_gender_analysis: counts per gender, most common first. */
  def genderAnalysis(lab: DataFrame): DataFrame =
    lab.groupBy("gender")
      .agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), col("gender"))

  /** get_monthly_trend: positivity-rate matrix, one row per month with one
    * column per requested year (the reference's labels/series response).
    * Conditional aggregation instead of a Pivot node: one hash-aggregate
    * pass, a static schema, and months with no data in a year get the 0.0
    * no-data rate (a pivot would leave an ambiguous NULL).
    */
  def monthlyTrend(lab: DataFrame, years: Seq[Int]): DataFrame = {
    val cols = years.map(y =>
      pctRate(
        sum(when(col("year") === y && col("is_positive"), 1L).otherwise(0L)),
        count(when(col("year") === y, 1))).as(s"y$y"))
    lab.groupBy("month")
      .agg(cols.head, cols.tail: _*)
      .orderBy("month")
  }

  /** get_location_summary: tests + distinct facilities per location level
    * (district/sector/province), busiest first.
    */
  def locationSummary(lab: DataFrame, level: String = "district"): DataFrame =
    lab.groupBy(level)
      .agg(count(lit(1)).as("total_tests"),
        countDistinct("village").as("num_villages"))
      .orderBy(desc("total_tests"), col(level))

  /** get_villages_data: top-20 villages by positivity (min 10 tests) —
    * the q73/J8 shape, kept here as the API entry point.
    */
  def topVillages(lab: DataFrame, minTests: Int = 10, k: Int = 20): DataFrame =
    lab.groupBy("village")
      .agg(count(lit(1)).as("total_tests"),
        sum(when(col("is_positive"), 1L).otherwise(0L)).as("positive_cases"))
      .filter(col("total_tests") >= minTests)
      .withColumn("positivity_rate",
        pctRate(col("positive_cases"), col("total_tests")))
      .orderBy(desc("positivity_rate"), col("village"))
      .limit(k)
}
