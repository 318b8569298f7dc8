package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer (Kudo 2018, "Subword Regularization";
  * the SentencePiece `--model_type=unigram` algorithm) — the fourth and
  * final member of the subword family (word-BPE q180, byte-BPE q270,
  * WordPiece q184 live in [[BpeTrainer]]): where BPE GROWS a vocabulary
  * bottom-up by fusing pairs, unigram SHRINKS one top-down — seed with
  * high-frequency substrings, fit piece probabilities by EM over the
  * segmentation lattice (a word's likelihood sums over ALL ways to split
  * it), and iteratively prune the pieces whose removal costs the corpus
  * likelihood least, until the target size. Inference is Viterbi: the
  * single best segmentation under the fitted log-probabilities.
  *
  * Determinism discipline (the repo's hash-oracle requirement): EM is
  * float math, but every per-word quantity is computed ROW-LOCALLY in a
  * fixed order and then quantized to integer MICROS before the
  * cross-partition sum — longs add associatively, so expected counts
  * (and the likelihood ledger) are bit-identical across partitionings
  * and cluster sizes. Prune scores and M-step renormalization happen
  * driver-side over the (bounded, vocabulary-sized) count table with
  * pinned tie-breaks (score asc, piece asc). Training is therefore a
  * pure function of the corpus.
  *
  * 100 TB shape: identical to [[BpeTrainer]] — the corpus collapses to
  * the distinct-word frequency table in one scan; each E-step is one
  * flatMap over that table emitting narrow (piece, micro-count) pairs
  * into a map-side-combining sum; every driver collect is bounded by
  * the seed size (thousands of rows), never by the corpus.
  */
object Unigram {

  /** A fitted model: `pieces` maps piece -> expected count in MICROS
    * (the integer the trainer actually accumulates — stored exactly, so
    * save/load round-trips are bit-identical); log-probabilities derive
    * on demand. Single-character pieces are never pruned, so any
    * alphabet word segments.
    */
  /** `fitRounds` = EM+prune loop iterations [[fit]] actually executed
    * (0 for loaded/hand-built models; NOT persisted by [[save]]): it
    * exists so specs can assert structurally that fit stopped — e.g. at
    * the un-prunable alphabet floor — instead of racing a wall clock.
    */
  final case class UnigramModel(pieces: Seq[(String, Long)], maxPieceLen: Int,
      fitRounds: Int = 0) {
    lazy val logProb: Map[String, Double] = {
      val total = pieces.map(_._2).sum.toDouble
      pieces.map { case (p, c) => p -> (math.log(c.toDouble) - math.log(total)) }.toMap
    }
    def vocab: Seq[String] = pieces.map(_._1)
  }

  // ---------------------------------------------------------------- lattice

  /** Forward-backward over one word's segmentation lattice: returns the
    * expected count of every piece occurrence plus log Z (the word's
    * log-likelihood summed over ALL segmentations). Linear-domain
    * doubles — pieces carry probabilities >= 1/total and words are
    * pretokens (bounded length), so no underflow window exists; the
    * guard makes the bound loud rather than assumed.
    */
  def expectedCounts(word: String, prob: Map[String, Double],
      maxPieceLen: Int): (Map[String, Double], Double) = {
    val n = word.length
    require(n <= 64, s"pretoken too long for the linear-domain lattice: $n")
    val alpha = new Array[Double](n + 1); alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var k = 1
      var acc = 0.0
      while (k <= math.min(maxPieceLen, i)) {
        val p = prob.getOrElse(word.substring(i - k, i), 0.0)
        if (p > 0) acc += alpha(i - k) * p
        k += 1
      }
      alpha(i) = acc
      i += 1
    }
    val z = alpha(n)
    if (z == 0.0) return (Map.empty, Double.NegativeInfinity)
    val beta = new Array[Double](n + 1); beta(n) = 1.0
    i = n - 1
    while (i >= 0) {
      var k = 1
      var acc = 0.0
      while (k <= math.min(maxPieceLen, n - i)) {
        val p = prob.getOrElse(word.substring(i, i + k), 0.0)
        if (p > 0) acc += p * beta(i + k)
        k += 1
      }
      beta(i) = acc
      i -= 1
    }
    val counts = scala.collection.mutable.Map.empty[String, Double]
    i = 0
    while (i < n) {
      var k = 1
      while (k <= math.min(maxPieceLen, n - i)) {
        val piece = word.substring(i, i + k)
        val p = prob.getOrElse(piece, 0.0)
        if (p > 0) {
          val e = alpha(i) * p * beta(i + k) / z
          if (e > 0) counts.update(piece, counts.getOrElse(piece, 0.0) + e)
        }
        k += 1
      }
      i += 1
    }
    (counts.toMap, math.log(z))
  }

  /** Viterbi segmentation under float log-probs: maximize the summed
    * log-probability; ties (rare in float, pinned anyway) break on
    * fewer pieces, then the lexicographically smallest piece sequence.
    * Unsegmentable words (a character outside the model) return Nil —
    * loud at the caller, never a silent char-fallback.
    */
  def viterbi(word: String, logp: Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val n = word.length
    // best(i) = (score, tokens, pieces-reversed) for word[0, i)
    val best = new Array[(Double, Int, List[String])](n + 1)
    best(0) = (0.0, 0, Nil)
    var i = 1
    while (i <= n) {
      var choice: (Double, Int, List[String]) = null
      var k = 1
      while (k <= math.min(maxPieceLen, i)) {
        val piece = word.substring(i - k, i)
        val lp = logp.get(piece)
        if (lp.isDefined && best(i - k) != null) {
          val (s0, t0, ps0) = best(i - k)
          val cand = (s0 + lp.get, t0 + 1, piece :: ps0)
          def lexLt(a: List[String], b: List[String]): Boolean = (a, b) match {
            case (Nil, Nil) => false
            case (Nil, _) => true
            case (_, Nil) => false
            case (x :: xs, y :: ys) => if (x != y) x < y else lexLt(xs, ys)
          }
          val better = choice == null ||
            cand._1 > choice._1 ||
            (cand._1 == choice._1 && (cand._2 < choice._2 ||
              (cand._2 == choice._2 && lexLt(cand._3.reverse, choice._3.reverse))))
          if (better) choice = cand
        }
        k += 1
      }
      best(i) = choice
      i += 1
    }
    if (best(n) == null) Nil else best(n)._3.reverse
  }

  /** Integer-scored Viterbi for the SQL-replayable face: maximize
    * D = sum over pieces of (128 * score(piece) - 1), one integer
    * objective that IS the lexicographic (max total score, then min
    * piece count) order whenever piece counts stay under 128 — token
    * counts are bounded by the pretoken length, which the require pins.
    * Returns (best total score, its piece count), extracted from D by
    * the exact identities score = (D + 127) div 128 and
    * tokens = 128 * score - D. The DuckDB oracle replays the identical
    * DP as a recursive CTE, so both engines must land on the same D for
    * every word.
    */
  def viterbiScored(word: String, score: Map[String, Int],
      maxPieceLen: Int): Option[(Int, Int)] = {
    val n = word.length
    require(n < 128, s"pretoken too long for the D-packed objective: $n")
    val MinD = Int.MinValue / 2
    val d = Array.fill(n + 1)(MinD); d(0) = 0
    var i = 1
    while (i <= n) {
      var k = 1
      while (k <= math.min(maxPieceLen, i)) {
        val s = score.get(word.substring(i - k, i))
        if (s.isDefined && d(i - k) > MinD) {
          val cand = d(i - k) + 128 * s.get - 1
          if (cand > d(i)) d(i) = cand
        }
        k += 1
      }
      i += 1
    }
    if (d(n) <= MinD) None
    else {
      val sc = Math.floorDiv(d(n) + 127, 128)
      Some((sc, 128 * sc - d(n)))
    }
  }

  // ------------------------------------------------------------------- seed

  /** Pretokens longer than this are dropped at the gate — the
    * SentencePiece trainer applies the same cap (its
    * max_sentence(piece)_length guards), and the bound is what lets the
    * lattice run in the linear probability domain
    * ([[expectedCounts]]'s underflow window) and the scored Viterbi use
    * the 128-packed objective. A 64-char run of [a-z] with no space is
    * junk (concatenation artifacts, DNA-like strings), not vocabulary.
    */
  val MaxWordLen: Int = 64

  /** The distinct-word frequency table (same gate as [[BpeTrainer]]:
    * post-normalization `^[a-z]+$` pretokens, capped at [[MaxWordLen]] —
    * oracle SQL replaying this table must carry the same length bound).
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) <= MaxWordLen)
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))

  /** Seed vocabulary: every substring of length 1..maxPieceLen of every
    * corpus word, weighted by word frequency (a word contributes its
    * freq once per OCCURRENCE of the substring), top `seedSize` by
    * (weight desc, piece asc) — with the full single-character alphabet
    * always included so every word stays segmentable. One narrow
    * (piece, weight) aggregate; the collect is bounded by seedSize.
    */
  def seedVocab(docs: DataFrame, textCol: String = "text",
      maxPieceLen: Int = 4, seedSize: Int = 200): Seq[(String, Long)] = {
    // one aggregation pays for both collects (top-K and the ≤-alphabet
    // single-char rows) — without the cache the two collects would each
    // re-run the full wordTable + substring explode
    val pieces = seedPieceFrame(docs, textCol, maxPieceLen).cache()
    try {
      val top = pieces
        .orderBy(desc("weight"), col("piece"))
        .limit(seedSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val alphabet = pieces.filter(length(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      (top ++ alphabet.filterNot(a => top.exists(_._1 == a._1)))
        .sortBy { case (p, wgt) => (-wgt, p) }
    } finally pieces.unpersist()
  }

  /** The exploded (piece, weight) frame behind [[seedVocab]] — public so
    * the oracle-facing query aggregates the exact same frame.
    */
  def seedPieceFrame(docs: DataFrame, textCol: String,
      maxPieceLen: Int): DataFrame =
    wordTable(docs, textCol)
      .select(col("freq"), explode(flatten(
        transform(sequence(lit(1), least(length(col("word")), lit(maxPieceLen))),
          k => transform(sequence(lit(1), length(col("word")) - k + 1),
            i => col("word").substr(i, k))))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("weight"))

  // --------------------------------------------------------------------- EM

  /** One EM expectation sweep: expected piece counts in micros (exact
    * longs, associative) and the corpus log-likelihood in micros.
    * Distributed over the word table; per-word math is row-local.
    */
  private def eStep(spark: SparkSession, words: DataFrame,
      prob: Map[String, Double], maxPieceLen: Int): (Map[String, Long], Long) = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(prob)
    try {
      val agg = words.as[(String, Long)].flatMap { case (w, f) =>
          val (counts, logZ) = expectedCounts(w, bc.value, maxPieceLen)
          val ll = if (logZ.isNegInfinity) 0L else math.rint(logZ * f * 1e6).toLong
          counts.toSeq.sortBy(_._1).map { case (p, e) =>
            (p, math.rint(e * f * 1e6).toLong, 0L)
          } :+ (("", 0L, ll))
        }
        .toDF("piece", "micros", "ll")
        .groupBy("piece").agg(sum("micros").as("micros"), sum("ll").as("ll"))
        .collect()
      val counts = agg.filter(_.getString(0).nonEmpty)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val ll = agg.map(_.getLong(2)).sum
      (counts, ll)
    } finally bc.destroy() // fit runs ~dozens of sweeps; stale broadcasts add up
  }

  private def normalize(counts: Map[String, Long]): Map[String, Double] = {
    val total = counts.values.sum.toDouble
    counts.map { case (p, c) => p -> c.toDouble / total }
  }

  /** Fit a unigram model: seed -> (EM x emIters -> prune worst
    * `pruneFraction` of multi-char pieces by likelihood loss) until the
    * vocabulary is at most `vocabSize`, then a final EM. The prune
    * criterion is SentencePiece's: removing piece p costs
    * expCount(p) * (logprob(p) - altLogProb(p)), where alt is p's best
    * segmentation into the REMAINING pieces (driver-side Viterbi over
    * the bounded vocab — pieces are <= maxPieceLen chars). Single
    * characters are never pruned; pieces the lattice never uses
    * (expected count rounds to 0 micros) prune first.
    */
  def fit(spark: SparkSession, docs: DataFrame, textCol: String = "text",
      vocabSize: Int = 120, maxPieceLen: Int = 4, seedSize: Int = 200,
      emIters: Int = 2, pruneFraction: Double = 0.25): UnigramModel = {
    val words = wordTable(docs, textCol).cache()
    val seed = seedVocab(docs, textCol, maxPieceLen, seedSize)
    var counts: Map[String, Long] = seed.map { case (p, w) => p -> w * 1000000L }.toMap
    try {
      var guard = 0
      var floorHit = false
      while (counts.size > vocabSize && guard < 64 && !floorHit) {
        guard += 1
        var it = 0
        while (it < emIters) {
          val (c, _) = eStep(spark, words, normalize(counts), maxPieceLen)
          // alphabet survives even when the lattice stops visiting it
          counts = counts.map { case (p, old) =>
            p -> (if (p.length == 1) math.max(c.getOrElse(p, 0L), 1L)
                  else c.getOrElse(p, 0L))
          }
          it += 1
        }
        val prob = normalize(counts)
        val lp = prob.map { case (p, v) => p -> math.log(v) }
        val multi = counts.filter(_._1.length > 1).toSeq
        val losses = multi.map { case (p, c) =>
          // an unused piece (0 micros) costs nothing to remove — pruned
          // first, and the guard keeps 0 * (-inf) NaNs out of the sort
          val loss = if (c == 0L) Double.NegativeInfinity else {
            val altLp = lp - p
            val alt = viterbi(p, altLp, maxPieceLen)
            val altScore = if (alt.isEmpty) Double.NegativeInfinity
              else alt.map(altLp).sum
            // likelihood lost if p is removed and its mass re-segments
            c / 1e6 * (lp(p) - altScore)
          }
          (p, loss)
        }
        val targetMulti = math.max(0, vocabSize - counts.count(_._1.length == 1))
        val mustDrop = math.max(0, multi.size - targetMulti)
        if (mustDrop == 0) {
          // vocabSize is below the un-prunable floor (the alphabet):
          // every multi-char piece is already gone, so no further
          // iteration can shrink the vocabulary — return the over-target
          // alphabet now instead of burning the remaining guard rounds'
          // distributed E-steps on zero progress
          floorHit = true
        } else {
          val dropN = math.min(mustDrop,
            math.max(1, (multi.size * pruneFraction).toInt))
          val dropped = losses.sortBy { case (p, l) => (l, p) }.take(dropN).map(_._1).toSet
          counts = counts.filter { case (p, _) => p.length == 1 || !dropped.contains(p) }
        }
      }
      val (fin, _) = eStep(spark, words, normalize(counts), maxPieceLen)
      val finAdj = counts.keys.map { p =>
        p -> (if (p.length == 1) math.max(fin.getOrElse(p, 0L), 1L)
              else fin.getOrElse(p, 0L))
      }.filter { case (p, c) => c > 0L }.toSeq.sortBy { case (p, c) => (-c, p) }
      UnigramModel(finAdj, maxPieceLen, fitRounds = guard)
    } finally words.unpersist()
  }

  /** Corpus log-likelihood in micros under `prob` — the EM monotonicity
    * witness the spec asserts.
    */
  def corpusLogLikelihoodMicros(spark: SparkSession, docs: DataFrame,
      textCol: String, prob: Map[String, Double], maxPieceLen: Int): Long =
    eStep(spark, wordTable(docs, textCol), prob, maxPieceLen)._2

  // --------------------------------------------------------------- artifact

  /** Persist the model — the exact integer micro-counts, so the loaded
    * model's probabilities (and every downstream Viterbi) are
    * bit-identical to the fresh ones.
    */
  def save(spark: SparkSession, model: UnigramModel, path: String): Unit = {
    import spark.implicits._
    model.pieces.zipWithIndex
      .map { case ((p, c), i) => (i.toLong, p, c, model.maxPieceLen) }
      .toDF("rank", "piece", "micros", "max_piece_len")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): UnigramModel = {
    val rows = spark.read.parquet(path)
      .orderBy("rank")
      .collect()
    require(rows.nonEmpty, s"empty unigram model at $path")
    UnigramModel(
      rows.map(r => (r.getAs[String]("piece"), r.getAs[Long]("micros"))).toSeq,
      rows.head.getAs[Int]("max_piece_len"))
  }
}
