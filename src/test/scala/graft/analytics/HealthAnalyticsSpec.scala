package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Golden-value port of the reference's analytics suite
  * (tests/test_analytics_calculator.py) — same 5-row fixture, same expected
  * numbers.
  */
class HealthAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sample = Seq(
    (2023, 1, "Village A", "Dist1", "Sec1", "Male", "15-24", "Positive", 1),
    (2023, 1, "Village A", "Dist1", "Sec1", "Female", "25-44", "Negative", 0),
    (2023, 2, "Village B", "Dist1", "Sec1", "Male", "5-14", "Positive", 1),
    (2024, 1, "Village A", "Dist1", "Sec1", "Female", "45-64", "Negative", 0),
    (2024, 1, "Village C", "Dist1", "Sec1", "Male", "Under 5", "Inconclusive", 0)
  ).toDF("year", "month", "village", "district", "sector", "gender",
    "age_group", "test_result", "is_positive")

  test("A1 yearly slide status") {
    val r = HealthAnalytics.yearlySlideStatus(sample).collect()
    assert(r.length == 2)
    val y23 = r.find(_.getAs[Int]("year") == 2023).get
    assert(y23.getAs[Long]("total_tests") == 3)
    assert(y23.getAs[Long]("positive_cases") == 2)
    assert(y23.getAs[Long]("negative_cases") == 1)
    assert(y23.getAs[Double]("positivity_rate") == 66.67)
    val y24 = r.find(_.getAs[Int]("year") == 2024).get
    assert(y24.getAs[Long]("total_tests") == 2)
    assert(y24.getAs[Long]("positive_cases") == 0)
    assert(y24.getAs[Long]("inconclusive_cases") == 1)
    assert(y24.getAs[Double]("positivity_rate") == 0.0)
  }

  test("A2 gender positivity by year") {
    val r = HealthAnalytics.genderPositivityByYear(sample).collect()
    val m23 = r.find(x => x.getAs[Int]("year") == 2023 && x.getAs[String]("gender") == "Male").get
    assert(m23.getAs[Long]("total_tests") == 2)
    assert(m23.getAs[Long]("positive_cases") == 2)
    assert(m23.getAs[Double]("positivity_rate") == 100.0)
    val f23 = r.find(x => x.getAs[Int]("year") == 2023 && x.getAs[String]("gender") == "Female").get
    assert(f23.getAs[Long]("total_tests") == 1)
    assert(f23.getAs[Long]("positive_cases") == 0)
    assert(f23.getAs[Double]("positivity_rate") == 0.0)
  }

  test("A3 village positivity by year") {
    val r = HealthAnalytics.villagePositivityByYear(sample).collect()
    val va23 = r.find(x => x.getAs[String]("village") == "Village A" && x.getAs[Int]("year") == 2023).get
    assert(va23.getAs[Long]("total_tests") == 2)
    assert(va23.getAs[Long]("positive_cases") == 1)
    assert(va23.getAs[Double]("positivity_rate") == 50.0)
    assert(va23.getAs[String]("district") == "Dist1")
  }

  test("A4 monthly positivity") {
    val r = HealthAnalytics.monthlyPositivity(sample).collect()
    val m1 = r.find(x => x.getAs[Int]("year") == 2023 && x.getAs[Int]("month") == 1).get
    assert(m1.getAs[Long]("total_tests") == 2)
    assert(m1.getAs[Double]("positivity_rate") == 50.0)
    assert(m1.getAs[String]("month_name") == "January")
    val m2 = r.find(x => x.getAs[Int]("year") == 2023 && x.getAs[Int]("month") == 2).get
    assert(m2.getAs[Long]("total_tests") == 1)
    assert(m2.getAs[Double]("positivity_rate") == 100.0)
  }

  test("A5 total summary") {
    val s = HealthAnalytics.totalSummary(sample).head
    assert(s.getAs[Long]("total_records") == 5)
    assert(s.getAs[Long]("total_positive_cases") == 2)
    assert(s.getAs[Double]("overall_pos_rate") == 40.0)
    assert(s.getAs[Long]("districts_count") == 1)
    assert(s.getAs[Long]("villages_count") == 3)
    assert(s.getAs[String]("year_range") == "2023-2024")
    assert(s.getAs[scala.collection.Seq[Int]]("years_covered").toSeq == Seq(2023, 2024))
    val gb = s.getAs[Map[String, Long]]("gender_breakdown")
    assert(gb == Map("Male" -> 3L, "Female" -> 2L))
    val ab = s.getAs[Map[String, Long]]("age_group_breakdown")
    assert(ab.values.sum == 5L)
  }

  test("empty input yields empty aggregates") {
    val empty = sample.limit(0)
    assert(HealthAnalytics.yearlySlideStatus(empty).count() == 0)
    assert(HealthAnalytics.monthlyPositivity(empty).count() == 0)
  }

  test("LabTransform end-to-end on raw columns") {
    val raw = Seq(
      ("2023", "Jan", "Gasabo", "Remera", "HC1", "CellA", "V1", "25", "M", "POSITIVE", "local", "Kigali"),
      ("2023.0", "2", null, "Remera", "HC1", "CellA", "V2", "200", "woman", "no malaria", "local", "Kigali"),
      ("bad", "xx", "Gasabo", null, "HC2", null, "V1", null, "??", "", null, null)
    ).toDF("Year", "Month", "District", "Sector", "Health Center", "Cell",
      "Village", "Age", "Gender", "Slide Status", "Case Origin", "Province")
    val t = LabTransform.transform(raw).collect()
    val r0 = t(0)
    assert(r0.getAs[Int]("year") == 2023)
    assert(r0.getAs[Int]("month") == 1)
    assert(r0.getAs[String]("test_result") == "Positive")
    assert(r0.getAs[Boolean]("is_positive"))
    assert(r0.getAs[Int]("age") == 25)
    assert(r0.getAs[String]("age_group") == "25-44")
    val r1 = t(1)
    assert(r1.getAs[String]("district") == "")     // null → ""
    assert(r1.getAs[Int]("age") == 30)             // 200 out of range → default
    assert(r1.getAs[String]("gender") == "Female")
    // reference quirk: "no malaria" contains positive keyword "MALARIA",
    // and positives are checked first (helpers.py:221-224) → Positive
    assert(r1.getAs[String]("test_result") == "Positive")
    val r2 = t(2)
    assert(Option(r2.getAs[Integer]("year")).isEmpty)
    assert(r2.getAs[String]("test_result") == "Unknown")
    assert(r2.getAs[String]("gender") == "Unknown")
  }
}
