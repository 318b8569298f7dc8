package graft.text

import graft.SparkSpec
import graft.text.Unigram.UnigramModel

/** Unigram-LM tokenizer verification. The lattice math (forward-backward
  * expected counts, Viterbi) is checked against EXHAUSTIVE ENUMERATION of
  * every segmentation — an independent implementation of the same
  * definition, not a replay of the code under test — plus EM
  * monotonicity, pinned tie-breaks, partitioning-independence of
  * training (the micro-quantization contract), and artifact parity.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent ground truth: enumerate all segmentations ------------

  private def allSegs(w: String, maxLen: Int,
      vocab: Set[String]): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(maxLen, w.length)).flatMap { k =>
      val h = w.substring(0, k)
      if (vocab(h)) allSegs(w.substring(k), maxLen, vocab).map(h :: _)
      else Seq.empty
    }

  private val toyProb = Map(
    "a" -> 0.3, "b" -> 0.2, "ab" -> 0.25, "ba" -> 0.05,
    "aba" -> 0.15, "bb" -> 0.05)

  test("expected counts match exhaustive enumeration (forward-backward is exact)") {
    for (w <- Seq("ab", "aba", "abab", "ababa", "bbbb", "abba", "aabbaabb")) {
      val segs = allSegs(w, 3, toyProb.keySet)
      val z = segs.map(_.map(toyProb).product).sum
      val expect = segs.flatMap(s => s.map(p => p -> s.map(toyProb).product / z))
        .groupBy { case (p, _) => p }
        .map { case (p, xs) =>
          p -> segs.map(s => s.count(_ == p) * s.map(toyProb).product / z).sum }
      val (got, logZ) = Unigram.expectedCounts(w, toyProb, 3)
      assert(math.abs(logZ - math.log(z)) < 1e-12, s"$w: logZ")
      assert(got.keySet == expect.filter(_._2 > 0).keySet, s"$w: piece set")
      for ((p, e) <- expect if e > 0)
        assert(math.abs(got(p) - e) < 1e-12, s"$w piece $p: ${got(p)} vs $e")
    }
  }

  test("unreachable words: empty counts, -inf logZ") {
    val (c, z) = Unigram.expectedCounts("xyz", toyProb, 3)
    assert(c.isEmpty && z.isNegInfinity)
  }

  test("viterbi equals the enumeration argmax under the pinned tie-break") {
    val lp = toyProb.map { case (p, v) => p -> math.log(v) }
    for (w <- Seq("ab", "aba", "abab", "ababa", "abba", "bbab", "aabbaabb")) {
      val segs = allSegs(w, 3, toyProb.keySet)
      val best = segs.minBy(s =>
        (-s.map(lp).sum, s.length, s.mkString(" ")))
      assert(Unigram.viterbi(w, lp, 3) == best, w)
    }
    assert(Unigram.viterbi("xay", lp, 3).isEmpty) // 'x' unsegmentable -> Nil
  }

  test("viterbiScored: D-packing extracts the enumeration's (max score, min tokens)") {
    val sc = Map("a" -> 2, "b" -> 1, "ab" -> 5, "ba" -> 3, "aba" -> 9)
    for (w <- Seq("ab", "aba", "abab", "ababa", "bbbb", "abba", "aabb")) {
      val segs = allSegs(w, 3, sc.keySet)
      val bestScore = segs.map(_.map(sc).sum).max
      val minTokens = segs.filter(_.map(sc).sum == bestScore).map(_.length).min
      assert(Unigram.viterbiScored(w, sc, 3).contains((bestScore, minTokens)), w)
    }
    assert(Unigram.viterbiScored("zz", sc, 3).isEmpty)
  }

  // ---- seed ---------------------------------------------------------------

  test("seedVocab: substring weights by hand, alphabet always present") {
    // corpus: 'ab ab cd' -> words ab(2) cd(1)
    val docs = Seq("ab ab cd").toDF("text")
    val seed = Unigram.seedVocab(docs, "text", maxPieceLen = 2, seedSize = 3).toMap
    // substrings of ab (freq 2): a, b, ab each weight 2; of cd: c, d, cd weight 1
    assert(seed("a") == 2L && seed("b") == 2L && seed("ab") == 2L)
    // seedSize 3 keeps the weight-2 trio, but the alphabet chars c, d ride along
    assert(seed.contains("c") && seed.contains("d"))
    assert(!seed.contains("cd")) // multi-char piece below the cut is dropped
  }

  // ---- EM + prune ----------------------------------------------------------

  private val corpus = Seq(
    "moneo moneo imputo imputo imputo praebalteata",
    "moneo imputo cummi cummi praebalteata valens",
    "valens valens moneo imputo cummi").toDF("text")

  test("fit: reaches vocab target, keeps alphabet, drops unused seeds") {
    val m = Unigram.fit(spark, corpus, vocabSize = 30, maxPieceLen = 4,
      seedSize = 80, emIters = 2)
    assert(m.pieces.size <= 30)
    val alphabet = "abcelimnopstuv".map(_.toString).toSet // corpus chars
    assert(alphabet.subsetOf(m.vocab.toSet))
    // every corpus word still segments under the fitted model
    val lp = m.logProb
    for (w <- Seq("moneo", "imputo", "cummi", "praebalteata", "valens"))
      assert(Unigram.viterbi(w, lp, m.maxPieceLen).nonEmpty, w)
  }

  test("fit below the alphabet floor returns promptly with the alphabet") {
    // vocabSize below the un-prunable floor (corpus alphabet): once every
    // multi-char piece is gone no pruning progress is possible — fit must
    // break out instead of burning the remaining guard rounds' E-steps
    val m = Unigram.fit(spark, corpus, vocabSize = 5, maxPieceLen = 4,
      seedSize = 40, emIters = 1)
    val alphabet = "moneo imputo praebalteata cummi valens"
      .replace(" ", "").map(_.toString).toSet
    assert(m.vocab.toSet == alphabet) // over-target but correct: the floor
    // structural, not wall-clock: pruning 25%/round from ≤40 seed pieces
    // exhausts the multi-char pieces well inside 30 rounds; a fit that
    // kept spinning to the guard would report exactly 64
    assert(m.fitRounds < 30, s"fit spun the guard loop: ${m.fitRounds} rounds")
  }

  test("fit is partitioning-independent (micro-quantized sums are associative)") {
    val m1 = Unigram.fit(spark, corpus.repartition(1), vocabSize = 30,
      maxPieceLen = 4, seedSize = 80)
    val m8 = Unigram.fit(spark, corpus.repartition(8), vocabSize = 30,
      maxPieceLen = 4, seedSize = 80)
    assert(m1.pieces == m8.pieces)
  }

  test("one EM sweep never decreases the corpus likelihood") {
    val seed = Unigram.seedVocab(corpus, "text", maxPieceLen = 4, seedSize = 60)
    val p0 = { val t = seed.map(_._2).sum.toDouble
      seed.map { case (p, w) => p -> w / t }.toMap }
    val ll0 = Unigram.corpusLogLikelihoodMicros(spark, corpus, "text", p0, 4)
    // one E+M update
    import org.apache.spark.sql.functions._
    val words = Unigram.wordTable(corpus, "text")
    val bc = spark.sparkContext.broadcast(p0)
    val c1 = words.as[(String, Long)].flatMap { case (w, f) =>
        Unigram.expectedCounts(w, bc.value, 4)._1.toSeq
          .map { case (p, e) => (p, math.rint(e * f * 1e6).toLong) }
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .collect().map { case (p, c) => p -> c }.toMap
    val t1 = c1.values.sum.toDouble
    val p1 = c1.map { case (p, c) => p -> c / t1 }
    val ll1 = Unigram.corpusLogLikelihoodMicros(spark, corpus, "text", p1, 4)
    // exact EM is monotone; micro-quantization perturbs by < 1e-3 overall
    assert(ll1 >= ll0 - 1000L, s"$ll1 < $ll0")
  }

  // ---- artifact -----------------------------------------------------------

  test("save/load round-trips bit-identically; reloaded Viterbi agrees") {
    val m = Unigram.fit(spark, corpus, vocabSize = 30, maxPieceLen = 4,
      seedSize = 80)
    // under the shutdown-cleaned scratch root: no residue after the JVM
    val path = graft.io.Scratch.dir("graft_unigram")
    Unigram.save(spark, m, path)
    val l = Unigram.load(spark, path)
    assert(l.pieces == m.pieces && l.maxPieceLen == m.maxPieceLen)
    for (w <- Seq("moneo", "imputo", "praebalteata"))
      assert(Unigram.viterbi(w, l.logProb, 4) == Unigram.viterbi(w, m.logProb, 4))
  }

  test("model invariants: positive micros, derived log-probs normalize") {
    val m = UnigramModel(Seq(("a", 2000000L), ("b", 1000000L), ("ab", 1000000L)), 2)
    assert(math.abs(m.logProb.values.map(math.exp).sum - 1.0) < 1e-12)
    // logProb is computed as log(c) - log(total) — same value as
    // log(c/total) up to one ulp, never asserted bit-equal
    assert(math.abs(m.logProb("a") - math.log(0.5)) < 1e-15)
  }
}
