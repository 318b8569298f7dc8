package graft.clean

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.clean.CleanFunctions._

/** Golden tests for the cleaning library, values taken from the reference's
  * semantics (helpers.py) — see SURVEY.md §2.3.
  */
class CleanFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head.get(0)

  test("cleanText trims and null-fills") {
    val df = Seq(Some("  hi  "), None, Some("")).toDF("x")
    assert(df.select(cleanText($"x")).as[String].collect.toSeq == Seq("hi", "", ""))
  }

  test("cleanInteger coerces int(float(x))") {
    val df = Seq("42", "42.7", "-3.9", "abc", "").toDF("x")
    assert(df.select(cleanInteger($"x")).collect.map(r => Option(r.get(0))).toSeq ==
      Seq(Some(42), Some(42), Some(-3), None, None))
  }

  test("cleanGender maps variants") {
    val df = Seq("M", " male ", "WOMAN", "f", "x", null).toDF("x")
    assert(df.select(cleanGender($"x")).as[String].collect.toSeq ==
      Seq("Male", "Male", "Female", "Female", "Unknown", "Unknown"))
  }

  test("categorizeAge bins") {
    val df = Seq(Some(0), Some(4), Some(5), Some(14), Some(15), Some(24), Some(25),
      Some(44), Some(45), Some(64), Some(65), Some(99), None).toDF("x")
    assert(df.select(categorizeAge($"x")).as[String].collect.toSeq ==
      Seq("Under 5", "Under 5", "5-14", "5-14", "15-24", "15-24", "25-44",
        "25-44", "45-64", "45-64", "65+", "65+", "Unknown"))
  }

  test("cleanMonth numbers, names, abbrevs") {
    val df = Seq("1", "12", "12.0", "13", "jan", " January ", "DEC", "may", "xx", null)
      .toDF("x")
    assert(df.select(cleanMonth($"x")).collect.map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1), Some(12), Some(12), None, Some(1), Some(1), Some(12), Some(5), None, None))
  }

  test("interpretTestResult keyword order and substrings") {
    val cases = Seq(
      "POSITIVE" -> "Positive", "pos" -> "Positive", "+" -> "Positive",
      "P.falciparum seen" -> "Positive", "malaria detected" -> "Positive",
      "NEGATIVE" -> "Negative", "neg" -> "Negative", "-" -> "Negative",
      // reference quirk preserved: positive keywords are checked FIRST, and
      // "no malaria" contains "MALARIA" → Positive (helpers.py:221-224)
      "no malaria" -> "Positive", "clean slide" -> "Negative",
      // positive keywords win over negative when both present
      "positive-ish" -> "Positive",
      "weird" -> "Inconclusive", "" -> "Unknown")
    val df = cases.map(_._1).toDF("x")
    assert(df.select(interpretTestResult($"x")).as[String].collect.toSeq ==
      cases.map(_._2))
    val dfNull = Seq[Option[String]](None).toDF("x")
    assert(dfNull.select(interpretTestResult($"x")).as[String].head == "Unknown")
  }

  test("cleanAge defaults to 30 outside [0,120]") {
    val df = Seq("25", "-1", "121", "abc", null).toDF("x")
    assert(df.select(cleanAge($"x")).as[Int].collect.toSeq == Seq(25, 30, 30, 30, 30))
  }

  test("apiRate and riskCategory") {
    val df = Seq((100, 10000), (0, 500), (10, 0)).toDF("cases", "pop")
    val api = df.select(apiRate($"cases", $"pop")).as[Double].collect.toSeq
    assert(api == Seq(10.0, 0.0, 0.0))
    val rc = Seq(0.0, 0.5, 1.0, 4.9, 5.0, 49.9, 50.0, 99.9, 100.0).toDF("api")
      .select(riskCategory($"api")).as[String].collect.toSeq
    assert(rc == Seq("No Transmission", "Very Low Risk", "Low Risk", "Low Risk",
      "Moderate Risk", "Moderate Risk", "High Risk", "High Risk", "Very High Risk"))
  }

  test("slopeClass bins") {
    val r = Seq(0.0, 4.9, 5.0, 14.9, 15.0, 29.9, 30.0).toDF("s")
      .select(slopeClass($"s")).as[String].collect.toSeq
    assert(r == Seq("Flat", "Flat", "Moderate", "Moderate", "Steep", "Steep", "Very Steep"))
  }

  test("uuid5Dns matches RFC 4122 / python uuid.uuid5") {
    // uuid.uuid5(uuid.NAMESPACE_DNS, 'python.org') — well-known RFC test value
    assert(one(uuid5Dns(lit("python.org"))) == "886313e1-3b8a-5372-9b90-0c9aee199e5d")
    assert(one(uuid5Dns(lit("example.com"))) == "cfbff0d1-9375-5685-968c-48ce8b15ae17")
  }

  test("normalizeStationName") {
    val r = Seq("Kigali, Gasabo and Kicukiro").toDF("x")
      .select(normalizeStationName($"x")).as[String].head
    assert(r == "kigali_gasabo_and_kicukiro")
  }

  test("pctRate banker's rounding parity") {
    val df = Seq((2L, 3L), (0L, 2L), (1L, 0L)).toDF("n", "d")
    assert(df.select(pctRate($"n", $"d")).as[Double].collect.toSeq ==
      Seq(66.67, 0.0, 0.0))
  }
}
