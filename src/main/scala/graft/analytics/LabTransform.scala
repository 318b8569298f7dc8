package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.clean.CleanFunctions._

/** The lab-record clean/derive step — a single declarative projection
  * replacing the reference's per-record Python loop
  * (`app/etl_app/services/data_transformer.py:44-92`). One narrow map stage:
  * no shuffle, fully codegen'd, scales linearly with input splits.
  */
object LabTransform {

  private def optCol(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast("string")

  /** Column-name coalescing replacing the reference's field-variant probing
    * (`District` falls back to upload-injected `_metadata_district`, etc. —
    * data_transformer.py:72-74).
    */
  def transform(raw: DataFrame): DataFrame = {
    val age = cleanAge(optCol(raw, "Age"))
    val slide = trim(coalesce(optCol(raw, "Slide Status").cast("string"), lit("")))
    raw.select(
      expr("uuid()").as("unique_id"),
      cleanInteger(optCol(raw, "Year")).as("year"),
      cleanMonth(optCol(raw, "Month")).as("month"),
      cleanText(coalesce(optCol(raw, "District"), optCol(raw, "_metadata_district"))).as("district"),
      cleanText(coalesce(optCol(raw, "Sector"), optCol(raw, "_metadata_sector"))).as("sector"),
      cleanText(coalesce(optCol(raw, "Health Center"), optCol(raw, "_metadata_health_center"))).as("health_center"),
      cleanText(optCol(raw, "Cell")).as("cell"),
      cleanText(optCol(raw, "Village")).as("village"),
      age.as("age"),
      categorizeAge(age).as("age_group"),
      cleanGender(optCol(raw, "Gender")).as("gender"),
      slide.as("slide_status"),
      interpretTestResult(slide).as("test_result"),
      isPositiveCase(slide).as("is_positive"),
      cleanText(optCol(raw, "Case Origin")).as("case_origin"),
      cleanText(optCol(raw, "Province")).as("province"),
      formatTimestamp(current_timestamp()).as("created_at"),
      formatTimestamp(current_timestamp()).as("updated_at"))
  }
}
