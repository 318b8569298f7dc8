package graft.clean

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-level cleaning/derivation library as pure `Column` functions — no UDFs,
  * so every call stays inside Catalyst/whole-stage-codegen.
  *
  * Semantics mirror the reference's helper library
  * (`app/etl_app/utils/helpers.py:142-231`, `app/etl_app/utils/constants.py`,
  * `app/etl_app/services/data_transformer.py:44-92`; see SURVEY.md §2.3).
  * Known landmines preserved deliberately (SURVEY.md §7.4): keyword check
  * order in [[interpretTestResult]], default age 30, banker's rounding via
  * `bround` where the reference uses Python `round`.
  */
object CleanFunctions {

  /** F1 `clean_text`: null → "", else trimmed string. (helpers.py:142-146;
    * the pandas-NaN case maps to null in a typed engine.)
    */
  def cleanText(c: Column): Column = coalesce(trim(c.cast("string")), lit(""))

  /** F2 `clean_integer`: `int(float(x))` (truncation toward zero), null on
    * failure. `try_cast` (not `cast`) because Spark 4's ANSI mode throws on
    * malformed input where the reference swallows the error → null.
    * (helpers.py:149-156)
    */
  def cleanInteger(c: Column): Column = c.try_cast("double").try_cast("int")

  /** F3 `clean_gender`: M/MALE/MAN → Male; F/FEMALE/WOMAN → Female; else
    * Unknown. (helpers.py:159-168, constants.py GENDER_MAPPINGS)
    */
  def cleanGender(c: Column): Column = {
    val u = upper(trim(c.cast("string")))
    when(u.isin("M", "MALE", "MAN"), "Male")
      .when(u.isin("F", "FEMALE", "WOMAN"), "Female")
      .otherwise("Unknown")
  }

  /** F4 `categorize_age`: fixed bins, null → Unknown. (helpers.py:171-186) */
  def categorizeAge(age: Column): Column =
    when(age.isNull, "Unknown")
      .when(age < 5, "Under 5")
      .when(age < 15, "5-14")
      .when(age < 25, "15-24")
      .when(age < 45, "25-44")
      .when(age < 65, "45-64")
      .otherwise("65+")

  private val monthNameToNum: Column = typedLit(Map(
    "january" -> 1, "jan" -> 1, "february" -> 2, "feb" -> 2,
    "march" -> 3, "mar" -> 3, "april" -> 4, "apr" -> 4,
    "may" -> 5, "june" -> 6, "jun" -> 6, "july" -> 7, "jul" -> 7,
    "august" -> 8, "aug" -> 8, "september" -> 9, "sep" -> 9,
    "october" -> 10, "oct" -> 10, "november" -> 11, "nov" -> 11,
    "december" -> 12, "dec" -> 12))

  /** Month number (1-12) → English name, as used by monthly positivity
    * (analytics_calculator.py:66-70).
    */
  val monthNumToName: Column = typedLit(Map(
    1 -> "January", 2 -> "February", 3 -> "March", 4 -> "April",
    5 -> "May", 6 -> "June", 7 -> "July", 8 -> "August",
    9 -> "September", 10 -> "October", 11 -> "November", 12 -> "December"))

  /** F5 `clean_month`: numeric 1-12 (after `int(float(x))`) or month
    * name/abbreviation → int; anything else null. (helpers.py:189-210)
    */
  def cleanMonth(c: Column): Column = {
    val asNum = cleanInteger(c)
    coalesce(
      when(asNum.between(1, 12), asNum),
      // try_element_at, not element_at: under ANSI mode (Spark 4 default)
      // a missing map key RAISES instead of nulling — 'N/A' in a month
      // column must yield null per the reference contract, not kill the job
      try_element_at(monthNameToNum, lower(trim(c.cast("string")))))
  }

  private val positiveKeywords = Seq("POSITIVE", "POS", "+", "P.FALCIPARUM", "P.VIVAX", "MALARIA")
  private val negativeKeywords = Seq("NEGATIVE", "NEG", "-", "NO MALARIA", "CLEAN")

  /** Generic ordered substring-keyword classifier — the reference's
    * classification pattern (helpers.py:213-226) abstracted: the positive
    * list is checked before the negative list, each by raw substring
    * containment on the upper-trimmed input; empty/null gets its own label.
    */
  def keywordClassifier(c: Column, positive: Seq[String], negative: Seq[String],
      posLabel: String, negLabel: String, fallback: String, emptyLabel: String): Column = {
    val s = upper(trim(c.cast("string")))
    val hasPos = positive.map(k => s.contains(k)).reduce(_ || _)
    val hasNeg = negative.map(k => s.contains(k)).reduce(_ || _)
    when(c.isNull || s === "", emptyLabel)
      .when(hasPos, posLabel)
      .when(hasNeg, negLabel)
      .otherwise(fallback)
  }

  /** F6 `interpret_test_result`: substring-keyword classifier. Order matters:
    * positive keywords are checked before negative ones (so "no malaria",
    * containing "MALARIA", reads Positive), and `"+"`/`"-"` are raw substring
    * checks. Empty/null → "Unknown", unmatched → "Inconclusive".
    * (helpers.py:213-226, constants.py TEST_RESULT_KEYWORDS)
    */
  def interpretTestResult(c: Column): Column =
    keywordClassifier(c, positiveKeywords, negativeKeywords,
      "Positive", "Negative", "Inconclusive", "Unknown")

  /** F7 `is_positive_case`. (helpers.py:229-231) */
  def isPositiveCase(c: Column): Column = interpretTestResult(c) === "Positive"

  /** F8 age default: null or outside [0,120] → 30.
    * (data_transformer.py:59-61, constants.py DEFAULT_AGE)
    */
  def cleanAge(c: Column): Column = {
    val a = cleanInteger(c)
    when(a.isNull || a < 0 || a > 120, 30).otherwise(a)
  }

  /** F13 `format_timestamp`: 'YYYY-MM-DD HH:MM'. (helpers.py:11-13) */
  def formatTimestamp(ts: Column): Column = date_format(ts, "yyyy-MM-dd HH:mm")

  /** F15 API (annual parasite incidence): cases/population*1000, 0 when
    * population <= 0. (malaria_api_calculator_etl_view.py:316)
    */
  def apiRate(cases: Column, population: Column): Column =
    when(population > 0, cases.cast("double") / population * 1000).otherwise(0.0)

  /** F16 WHO risk classifier over API; label strings verbatim from the
    * reference (malaria_api_calculator_etl_view.py:318-331 — note the
    * " Risk" suffix on every label except "No Transmission").
    */
  def riskCategory(api: Column): Column =
    when(api === 0, "No Transmission")
      .when(api < 1, "Very Low Risk")
      .when(api < 5, "Low Risk")
      .when(api < 50, "Moderate Risk")
      .when(api < 100, "High Risk")
      .otherwise("Very High Risk")

  /** F16 companions. */
  def highBurden(api: Column): Column = api >= 50
  def eliminationTarget(api: Column): Column = api < 1

  /** F17 slope classifier. (geospatial_merger/processors/batch_processor.py:464-473) */
  def slopeClass(slope: Column): Column =
    when(slope < 5, "Flat")
      .when(slope < 15, "Moderate")
      .when(slope < 30, "Steep")
      .otherwise("Very Steep")

  /** F19 station-name normalizer: lowercase, ", " → "_", " and " → "_and_".
    * (weather_data_prec_temp_upload_views.py:19-27)
    */
  def normalizeStationName(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), ", ", "_"), " and ", "_and_")

  /** F12 deterministic UUIDv5 over the DNS namespace — byte-parity with
    * `uuid.uuid5(uuid.NAMESPACE_DNS, name)` used for weather record ids
    * (weather_data_prec_temp_etl_view.py:72-76). Pure column functions:
    * SHA-1 over namespace-bytes ++ name-bytes, then version/variant nibble
    * patching on the hex string.
    */
  def uuid5Dns(name: Column): Column = {
    val ns = lit("6ba7b8109dad11d180b400c04fd430c8") // NAMESPACE_DNS hex
    val h = sha1(concat(unhex(ns), encode(name.cast("string"), "UTF-8")))
    // variant nibble (hex char 17): keep low 2 bits, force top bits to 10.
    val v = conv(substring(h, 17, 1), 16, 10).cast("int")
    val variantNibble = lower(conv(((v % 4) + 8).cast("string"), 10, 16))
    concat_ws("-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit("5"), substring(h, 14, 3)),
      concat(variantNibble, substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  /** Rate helper used across the analytics suite: `round(n/d*100, 2)` with
    * Python-`round` (banker's) parity via `bround`; 0.0 when d == 0.
    * (analytics_calculator.py, multiple sites)
    */
  def pctRate(n: Column, d: Column): Column =
    when(d > 0, bround(n.cast("double") / d * 100, 2)).otherwise(0.0)
}
