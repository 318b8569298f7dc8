package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training semantics on a hand-computable corpus (the Sennrich et
  * al. example shape), plus the integration the trainer exists for:
  * its vocab drives q136's subword tokenizer and compresses the corpus
  * relative to the character baseline. The sf0.01 oracle gate (q180)
  * proves DuckDB parity of all 8 rounds; these pin the merge order,
  * tie-breaks, alphabet gating, and the left-to-right non-overlapping
  * merge application by hand.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("fit learns the hand-computed merge order with lexicographic ties") {
    // words: low x3, lower x2, newest x4, widest x1
    // round 1: (w,e) 6 -> we     round 2: (l,o) 5 ties (s,t) 5, 'l' < 's'
    // round 3: (s,t) 5 -> st     round 4: (e,we) 4 ties (n,e) 4, 'e' < 'n'
    val d = Seq(
      "low low low newest newest",
      "lower lower newest newest widest").toDF("text")
    val m = BpeTrainer.fit(spark, d, merges = 4)
    assert(m.merges === Seq(
      ("w", "e", 6L), ("l", "o", 5L), ("s", "t", 5L), ("e", "we", 4L)))
    assert(m.alphabet === Seq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w"))
    assert(m.vocab.containsSlice(Seq("we", "lo", "st", "ewe")))
  }

  test("merge application is left-to-right non-overlapping") {
    // 'aaaa' x2, 'ab' x1: round 1 (a,a) 6 -> aa ((aa)(aa), never re-fusing)
    // round 2: (aa,aa) 2 beats (a,b) 1 -> aaaa
    val d = Seq("aaaa aaaa ab").toDF("text")
    val m = BpeTrainer.fit(spark, d, merges = 2)
    assert(m.merges === Seq(("a", "a", 6L), ("aa", "aa", 2L)))
  }

  test("alphabet gate: non-lowercase words never reach training") {
    val d = Seq("abc abc ABC a1c !!").toDF("text")
    val m = BpeTrainer.fit(spark, d, merges = 1)
    assert(m.alphabet === Seq("a", "b", "c"))
    assert(m.merges === Seq(("a", "b", 2L))) // only the two 'abc'
  }

  test("exhaustion: fewer merges than asked when no pairs remain") {
    val d = Seq("ab ab").toDF("text")
    val m = BpeTrainer.fit(spark, d, merges = 5)
    assert(m.merges === Seq(("a", "b", 2L))) // after 'ab' fuses, no pairs
  }

  test("wordpiece objective diverges from BPE where likelihood beats count") {
    // 'aa' x3, 'ab' x1: symbol counts a=7, b=1.
    // BPE: (a,a) count 3 beats (a,b) count 1.
    // WordPiece: score(a,b) = 1/(7*1) = 0.143 > score(a,a) = 3/49 = 0.061.
    val d = Seq("aa aa aa ab").toDF("text")
    assert(BpeTrainer.fit(spark, d, merges = 1).merges === Seq(("a", "a", 3L)))
    assert(BpeTrainer.fitWordPiece(spark, d, merges = 1).merges
      === Seq(("a", "b", 1L)))
  }

  test("trained vocab drives q136's tokenizer and compresses the corpus") {
    SubwordTokenizer.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = BpeTrainer.fit(spark, docs, merges = 8)
    assert(m.merges.size === 8)
    def totals(vocab: Seq[String]): (Long, Long) = {
      val seg = SubwordTokenizer.tokenize(col("text"), vocab)
      val r = docs.select(seg.as("seg"))
        .agg(sum(col("seg.n_pieces").cast("long")).as("pieces"),
          sum(col("seg.n_unk").cast("long")).as("unk"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // q136's exact surface, re-run under the trained vocab vs the
    // character baseline: same unknowns (identical alphabet), strictly
    // fewer pieces (each greedy longest-match can only fuse characters)
    val (basePieces, baseUnk) = totals(m.alphabet)
    val (trainedPieces, trainedUnk) = totals(m.vocab)
    assert(trainedUnk === baseUnk)
    assert(trainedPieces < basePieces,
      s"trained vocab must compress: $trainedPieces vs baseline $basePieces")
    // and the trained pieces really appear in segmentations: the top
    // merge's output occurs in at least one joined segmentation
    val topPiece = m.merges.head._1 + m.merges.head._2
    val hits = docs
      .select(SubwordTokenizer.tokenize(col("text"), m.vocab).as("seg"))
      .filter(col("seg.joined").contains(topPiece)).count()
    assert(hits > 0, s"piece '$topPiece' never used")
  }
}
