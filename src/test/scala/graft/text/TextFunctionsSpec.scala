package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def strs(c: org.apache.spark.sql.Column, input: Seq[String]) =
    input.toDF("x").select(c).collect().map(_.get(0))

  test("tokens and counts") {
    val df = Seq("the quick  brown fox", "a b").toDF("x")
    assert(df.select(size(tokens($"x"))).as[Int].collect().toSeq == Seq(4, 2))
    assert(df.select(bpeishCount($"x")).as[Long].collect().toSeq == Seq(4L, 2L))
    // BPE-ish splits punctuation and digit runs
    assert(Seq("don't stop123 now!").toDF("x")
      .select(bpeishCount($"x")).as[Long].head == 7L) // don,',t,stop,123,now,!
  }

  test("shingles produce overlapping k-grams") {
    val df = Seq("a b c d e").toDF("x")
    val sh = df.select(shingles(tokens($"x"), 3)).as[Seq[String]].head
    assert(sh == Seq("a b c", "b c d", "c d e"))
    // fewer than k tokens -> empty
    assert(Seq("a b").toDF("x").select(shingles(tokens($"x"), 3)).as[Seq[String]].head.isEmpty)
    // exactly k tokens -> one shingle
    assert(Seq("x y z").toDF("x").select(shingles(tokens($"x"), 3)).as[Seq[String]].head == Seq("x y z"))
  }

  test("jaccard set semantics") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    assert(df.select(jaccard($"a", $"b")).as[Double].head == 0.5)
    val same = Seq((Seq("a", "b"), Seq("a", "b"))).toDF("a", "b")
    assert(same.select(jaccard($"a", $"b")).as[Double].head == 1.0)
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    assert(empty.select(jaccard($"a", $"b")).as[Double].head == 0.0)
  }

  test("minhash is identical for identical shingle sets and seed-dependent") {
    val df = Seq("w1 w2 w3 w4 w5").toDF("x").select(shingles(tokens($"x"), 3).as("sh"))
    val h0a = df.select(minhash($"sh", 0)).as[String].head
    val h0b = df.select(minhash($"sh", 0)).as[String].head
    val h1 = df.select(minhash($"sh", 1)).as[String].head
    assert(h0a == h0b)
    assert(h0a != h1)
    assert(h0a.matches("[0-9a-f]{16}"))
  }

  test("simhash60: identical docs match, near docs are close, ties -> 1") {
    val df = Seq(
      "spark query engine filter join group sort window",
      "spark query engine filter join group sort window",
      "spark query engine filter join group sort shuffle",
      "totally different words entirely unrelated content here now"
    ).toDF("x").select(simhash60(tokens($"x")).as("fp"))
    val fps = df.as[Long].collect()
    assert(fps(0) == fps(1))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fps(0), fps(2)) < hamming(fps(0), fps(3)))
    assert(fps.forall(fp => fp >= 0 && fp < (1L << 60)))
  }

  test("fingerprint normalizes whitespace and case") {
    val r = strs(fingerprint(col("x")), Seq("Hello  World", "hello world", " HELLO WORLD "))
    assert(r(0) == r(1) && r(1) == r(2))
  }

  test("quality features") {
    val (nTok, nChar, awl, stopR) = qualityFeatures(col("x"))
    val r = Seq("the cat sat on the mat").toDF("x")
      .select(nTok.as("t"), nChar.as("c"), awl.as("a"), stopR.as("s")).head
    assert(r.getAs[Int]("t") == 6)
    assert(r.getAs[Int]("c") == 22)
    assert(r.getAs[Double]("a") == 17.0 / 6) // 17 letters / 6 words
    assert(r.getAs[Double]("s") == 2.0 / 6) // "the" twice
  }
}
