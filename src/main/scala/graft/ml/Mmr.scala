package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998) — the
  * diversification pass behind a retrieval endpoint: from a candidate
  * pool ranked by relevance, greedily pick items that balance relevance
  * against redundancy with what's already picked:
  *
  *   score(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} cos(c, s)
  *
  * Scale shape: MMR is quadratic in the CANDIDATE pool, so the pool must
  * be bounded upstream (an ANN/brute-force top-n per query); given that,
  * the greedy is row-local per query and runs inside `mapGroups` — one
  * shuffle on query_id, no cross-query state, no driver loop. Float
  * parity discipline: every dot is the same left fold both engines use
  * (acc + x ascending — VecDot / DuckDB list_reduce), and the penalty
  * weight is computed as `1.0 − λ` (NOT a pre-rounded literal), so the
  * DuckDB oracle's unrolled greedy matches bit-for-bit.
  */
object Mmr {

  /** One candidate: id, vector (doubles), query relevance. */
  final case class Cand(id: Long, vec: Seq[Double], rel: Double)

  /** One selection: 1-based rank, candidate id, the score it was picked
    * at (rank 1's score is its raw relevance — nothing to be redundant
    * with yet).
    */
  final case class Pick(rank: Int, id: Long, score: Double)

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Row-local greedy over a bounded candidate pool. Deterministic:
    * ties on score break toward the smaller id (the engines' shared
    * ORDER BY score DESC, id convention).
    */
  def select(cands0: Seq[Cand], k: Int, lam: Double): Seq[Pick] = {
    require(k >= 1, s"k must be positive: $k")
    require(lam >= 0.0 && lam <= 1.0, s"lambda out of [0,1]: $lam")
    val pen = 1.0 - lam
    // zero-norm vectors have no cosine to anything: their 0/0 = NaN
    // similarities would leak a -Infinity maxSim (scoring the degenerate
    // candidate +Infinity) — drop them up front instead.
    val cands = cands0.filter(c => dot(c.vec, c.vec) > 0.0)
    val norms = cands.map(c => math.sqrt(dot(c.vec, c.vec)))
    val n = cands.length
    val picked = Array.fill(n)(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[Pick]
    var rank = 1
    while (rank <= math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val score =
            if (rank == 1) cands(i).rel
            else {
              var maxSim = Double.NegativeInfinity
              var j = 0
              while (j < n) {
                if (picked(j)) {
                  val s = dot(cands(i).vec, cands(j).vec) / (norms(i) * norms(j))
                  if (s > maxSim) maxSim = s
                }
                j += 1
              }
              lam * cands(i).rel - pen * maxSim
            }
          if (score > bestScore ||
            (score == bestScore && (best < 0 || cands(i).id < cands(best).id))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      // every remaining candidate scored NaN (e.g. rel=NaN from upstream):
      // both comparisons are false for NaN, so no best was chosen — stop
      // with the picks made so far instead of indexing picked(-1)
      if (best < 0) return out.toSeq
      picked(best) = true
      out += Pick(rank, cands(best).id, bestScore)
      rank += 1
    }
    out.toSeq
  }

  /** Batch form: candidates grouped by query — ONE shuffle on query_id,
    * then the greedy runs inside each group. Input columns must be
    * (query_id: long, vec_id: long, embedding: array<double>, rel:
    * double); output is (query_id, rank, vec_id, score).
    */
  def diversifyBatch(cands: DataFrame, k: Int, lam: Double): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Long, Seq[Double], Double)] = cands
      .selectExpr("query_id", "vec_id",
        "CAST(embedding AS array<double>) AS embedding", "CAST(rel AS DOUBLE)")
      .as[(Long, Long, Seq[Double], Double)]
    ds.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val pool = it.map(r => Cand(r._2, r._3, r._4)).toSeq
        select(pool, k, lam).map(p => (qid, p.rank, p.id, p.score))
      }
      .toDF("query_id", "rank", "vec_id", "score")
  }
}
