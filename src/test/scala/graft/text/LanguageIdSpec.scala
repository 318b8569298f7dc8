package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LanguageIdSpec extends SparkSpec {
  import spark.implicits._

  test("profile scoring counts non-overlapping n-gram occurrences") {
    val df = Seq("the thing and the others").toDF("x")
    val s = df.select(LanguageId.score(col("x"),
      Seq("the")).as("s")).head.getInt(0)
    // 'the' matches in "the", "the", and inside "o[the]rs"
    assert(s == 3)
  }

  test("predict is deterministic and total") {
    val docs = Seq(
      "the quick brown fox and the lazy dog going over the fence",
      "schneller einfacher und der die das ein ich und",
      "xyz qqq zzz")
    val out = docs.toDF("x").select(LanguageId.predict(col("x"))).as[String].collect()
    assert(out.forall(LanguageId.profiles.map(_._1).contains))
    // english stopword-heavy text scores en or de ('und' absent here)
    assert(out(0) == "en")
    assert(out(1) == "de")
    // no signal at all -> first profile in order wins (deterministic)
    assert(out(2) == LanguageId.profiles.head._1)
  }
}
