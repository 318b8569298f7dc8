package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.clean.CleanFunctions._

/** The five health-center analytics aggregates (A1-A5 in SURVEY.md §2.4),
  * re-expressed as single declarative `groupBy().agg()` plans so Catalyst
  * plans partial (map-side) aggregation and AQE sizes the shuffle — the
  * reference iterates pandas groups row-at-a-time
  * (`app/etl_app/services/analytics_calculator.py`).
  *
  * Input: a cleaned lab-record DataFrame with columns
  * `year, month, village, district, sector, gender, age_group, test_result,
  * is_positive` (see [[LabTransform]]). `is_positive` may be boolean or 0/1.
  *
  * Scale notes: every aggregate here is a hash-aggregate over low-cardinality
  * keys (year, gender, village…) — at 100 TB these reduce map-side to a few
  * thousand partial rows per task before a tiny shuffle; no sort, no skew risk.
  */
object HealthAnalytics {

  private def pos(c: Column): Column = c.cast("int").cast("long")

  /** A1 yearly slide status (analytics_calculator.py:197-226). */
  def yearlySlideStatus(df: DataFrame): DataFrame =
    df.filter(col("year").isNotNull)
      .groupBy("year")
      .agg(
        count(lit(1)).as("total_tests"),
        sum(pos(col("is_positive"))).as("positive_cases"),
        sum(when(col("test_result") === "Negative", 1L).otherwise(0L)).as("negative_cases"))
      .withColumn("inconclusive_cases",
        col("total_tests") - col("positive_cases") - col("negative_cases"))
      .withColumn("positivity_rate", pctRate(col("positive_cases"), col("total_tests")))
      .withColumn("negativity_rate", pctRate(col("negative_cases"), col("total_tests")))
      .withColumn("inconclusive_rate", pctRate(col("inconclusive_cases"), col("total_tests")))
      .orderBy("year")

  /** A2 gender positivity by year (analytics_calculator.py:87-116). */
  def genderPositivityByYear(df: DataFrame): DataFrame =
    df.filter(col("year").isNotNull && col("gender").isNotNull)
      .groupBy("year", "gender")
      .agg(
        count(lit(1)).as("total_tests"),
        sum(pos(col("is_positive"))).as("positive_cases"),
        sum(when(col("test_result") === "Negative", 1L).otherwise(0L)).as("negative_cases"))
      .withColumn("inconclusive_cases",
        col("total_tests") - col("positive_cases") - col("negative_cases"))
      .withColumn("positivity_rate", pctRate(col("positive_cases"), col("total_tests")))
      .withColumn("negativity_rate", pctRate(col("negative_cases"), col("total_tests")))
      .withColumn("inconclusive_rate", pctRate(col("inconclusive_cases"), col("total_tests")))
      .orderBy("year", "gender")

  /** A3 village positivity by year (analytics_calculator.py:119-149).
    * The reference samples district/sector from the group's first record
    * (`group.iloc[0]`, insertion order); we use `min` as a deterministic
    * stable choice — documented divergence only when a village maps to
    * multiple districts within a year (not the case in reference data).
    */
  def villagePositivityByYear(df: DataFrame): DataFrame =
    df.filter(col("village").isNotNull && col("year").isNotNull && trim(col("village")) =!= "")
      .groupBy("village", "year")
      .agg(
        min(col("district")).as("district"),
        min(col("sector")).as("sector"),
        count(lit(1)).as("total_tests"),
        sum(pos(col("is_positive"))).as("positive_cases"))
      .withColumn("negative_cases", col("total_tests") - col("positive_cases"))
      .withColumn("positivity_rate", pctRate(col("positive_cases"), col("total_tests")))
      .orderBy("village", "year")

  /** A4 monthly positivity (analytics_calculator.py:50-84). */
  def monthlyPositivity(df: DataFrame): DataFrame =
    df.filter(col("year").isNotNull && col("month").isNotNull)
      .groupBy("year", "month")
      .agg(
        count(lit(1)).as("total_tests"),
        sum(pos(col("is_positive"))).as("positive_cases"))
      .withColumn("month_name",
        // try_element_at: under ANSI a missing map key raises, making the
        // "Month N" fallback unreachable for out-of-range months
        coalesce(try_element_at(monthNumToName, col("month").cast("int")),
          concat(lit("Month "), col("month"))))
      .withColumn("positivity_rate", pctRate(col("positive_cases"), col("total_tests")))
      .select("year", "month", "month_name", "total_tests", "positive_cases", "positivity_rate")
      .orderBy("year", "month")

  /** A5 total summary (analytics_calculator.py:151-195): one-row global
    * aggregate + two tiny histogram maps. The histograms are separate
    * `groupBy().count()` plans cross-joined in — each is a couple of rows, so
    * the cross joins are broadcast-trivial.
    */
  def totalSummary(df: DataFrame): DataFrame = {
    val base = df.agg(
      count(lit(1)).as("total_records"),
      sum(pos(col("is_positive"))).as("total_positive_cases"),
      sum(when(col("test_result") === "Negative", 1L).otherwise(0L)).as("total_negative_cases"),
      // counts mirror the *_covered lists below: the empty string (a
      // cleaned-away null location) is not a district — counting it while
      // the list excludes it reported a phantom entry
      countDistinct(when(col("district") =!= "", col("district"))).as("districts_count"),
      countDistinct(when(col("sector") =!= "", col("sector"))).as("sectors_count"),
      countDistinct(when(col("village") =!= "", col("village"))).as("villages_count"),
      min(col("year")).as("min_year"),
      max(col("year")).as("max_year"),
      sort_array(collect_set(col("year").cast("int"))).as("years_covered"),
      sort_array(collect_set(when(col("district") =!= "", col("district")))).as("districts_covered"),
      sort_array(collect_set(when(col("sector") =!= "", col("sector")))).as("sectors_covered"))
      .withColumn("total_inconclusive_cases",
        col("total_records") - col("total_positive_cases") - col("total_negative_cases"))
      .withColumn("overall_pos_rate", pctRate(col("total_positive_cases"), col("total_records")))
      .withColumn("year_range",
        when(col("min_year") === col("max_year"), col("min_year").cast("string"))
          .otherwise(concat_ws("-", col("min_year"), col("max_year"))))

    val genderHist = df.groupBy("gender").agg(count(lit(1)).as("n"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("gender"), col("n")))))
        .as("gender_breakdown"))
    val ageHist = df.groupBy("age_group").agg(count(lit(1)).as("n"))
      .agg(map_from_entries(array_sort(collect_list(struct(col("age_group"), col("n")))))
        .as("age_group_breakdown"))

    base.crossJoin(genderHist).crossJoin(ageHist)
      .select("total_records", "total_positive_cases", "total_negative_cases",
        "total_inconclusive_cases", "overall_pos_rate", "year_range", "years_covered",
        "districts_count", "sectors_count", "villages_count",
        "districts_covered", "sectors_covered", "gender_breakdown", "age_group_breakdown")
  }
}
