package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-driven BPE vocabulary TRAINING — the learning step the subword
  * stack was missing: [[SubwordTokenizer]] applies a given vocab (q136)
  * and q176 measures a vocab's coverage curve, but nothing LEARNED a
  * vocab from the corpus. This is the classic distributed reduction
  * (Sennrich et al., "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016): start from characters, repeat `merges`
  * times — count adjacent symbol pairs weighted by word frequency (one
  * narrow groupBy per round), pick the most frequent pair (tie-break
  * lexicographic, so training is deterministic across engines and
  * cluster sizes), fuse it everywhere row-locally.
  *
  * Design for replayability: a word's segmentation is carried as ONE
  * string with each symbol wrapped in parens — `cat` segmented to
  * [c, a, t] is `(c)(a)(t)` — so applying merge (a, b) is a literal,
  * non-overlapping, left-to-right `replace("(a)(b)" -> "(ab)")`, which is
  * exactly BPE's merge-application rule AND has identical semantics in
  * every SQL engine (the q180 oracle replays training with the same
  * representation). Per-symbol wrapping means adjacent matches never
  * share boundary characters, so `(a)(a)(a)` under merge (a,a) becomes
  * `(aa)(a)`, never re-consuming the fused symbol. Training input is
  * gated to `^[a-z]+$` words (the post-normalization alphabet a real
  * trainer assumes; parens can then never collide with symbol text).
  *
  * 100 TB shape: the corpus collapses to the DISTINCT-WORD frequency
  * table in one scan (vocabulary-sized, zipf-bounded — millions of rows,
  * not corpus rows, and it is what every round iterates over); each
  * round is one map-side-combining aggregate over narrow (a, b, freq)
  * triples plus a bounded top-1 collect, and merge application is a
  * row-local string replace. Rounds are bounded by `merges` — the
  * driver loop is configuration, never data.
  */
object BpeTrainer {

  /** A trained model: the corpus alphabet (sorted single characters) and
    * the learned merges in application order, each with the pair count
    * that won its round.
    */
  final case class BpeModel(alphabet: Seq[String],
      merges: Seq[(String, String, Long)]) {
    /** Pieces for [[SubwordTokenizer.tokenize]]: alphabet + every merge
      * output (a fused pair is by construction the concatenation of its
      * halves), deduplicated, stable order.
      */
    def vocab: Seq[String] =
      (alphabet ++ merges.map { case (a, b, _) => a + b }).distinct
  }

  /** The distinct-word frequency table the rounds iterate over — the one
    * corpus scan either trainer makes.
    */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))

  /** Adjacent-pair counts over a segmentation frame: (a, b, cnt). */
  private def pairCounts(seg: DataFrame): DataFrame = {
    val syms = split(expr("substring(seg, 2, length(seg) - 2)"), "\\)\\(")
    seg
      .select(col("freq"), syms.as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2)," +
          " i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))
  }

  /** The shared training loop: `pickTop` ranks a round's pair counts
    * (given the round's segmentation frame) and returns the winner.
    */
  private def trainLoop(spark: SparkSession, docs: DataFrame, merges: Int,
      textCol: String)(
      pickTop: DataFrame => Array[org.apache.spark.sql.Row]): BpeModel = {
    require(merges >= 0, s"merges must be >= 0, got $merges")
    val words = wordTable(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val alphabet = words
        .select(explode(split(col("word"), "")).as("c"))
        .filter(col("c") =!= "").distinct()
        .orderBy("c").collect().map(_.getString(0)).toSeq
      var seg = words.withColumn("seg",
        regexp_replace(col("word"), "(.)", "($1)"))
      var learned = List.empty[(String, String, Long)]
      var step = 0
      var exhausted = false
      while (step < merges && !exhausted) {
        val top = pickTop(seg)
        if (top.isEmpty) exhausted = true
        else {
          val (a, b, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          learned = (a, b, c) :: learned
          seg = seg.withColumn("seg",
            replace(col("seg"), lit(s"($a)($b)"), lit(s"($a$b)")))
          // bound the lineage: without a cut, round i's aggregate replays
          // i chained replaces, making a real (30k-merge) training run
          // quadratic in plan depth. The table is vocabulary-sized, so an
          // eager local checkpoint every 16 rounds is cheap and keeps
          // every round's plan shallow.
          if (step % 16 == 15) seg = seg.localCheckpoint(true)
        }
        step += 1
      }
      BpeModel(alphabet, learned.reverse)
    } finally {
      words.unpersist()
      ()
    }
  }

  /** Learn `merges` BPE merges from `docs(textCol)`: each round fuses the
    * most FREQUENT adjacent pair. Returns fewer when the corpus runs out
    * of adjacent pairs first (every word fused to a single symbol).
    */
  def fit(spark: SparkSession, docs: DataFrame, merges: Int,
      textCol: String = "text"): BpeModel =
    trainLoop(spark, docs, merges, textCol) { seg =>
      pairCounts(seg)
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
    }

  /** WordPiece-style training: each round fuses the pair maximizing the
    * LIKELIHOOD score count(a,b) / (count(a) * count(b)) — pairs that
    * co-occur far more than their parts' popularity predicts, which
    * favors morpheme-like units over raw frequency (BPE's rule fuses
    * whatever is commonest; this fuses what is most surprising). Symbol
    * counts come from the same segmentation frame as the pair counts, so
    * one round costs two narrow aggregates + two broadcast joins. The
    * score is one long→double conversion per operand, one multiply, one
    * divide — all IEEE, bit-identical across engines (the repo's
    * log-free discipline), with (score DESC, a, b) ordering making ties
    * deterministic. The merged piece is position-free (no ##
    * continuation marker), matching what [[SubwordTokenizer]]'s greedy
    * longest-match inference consumes.
    */
  def fitWordPiece(spark: SparkSession, docs: DataFrame, merges: Int,
      textCol: String = "text"): BpeModel =
    trainLoop(spark, docs, merges, textCol) { seg =>
      val syms = split(expr("substring(seg, 2, length(seg) - 2)"), "\\)\\(")
      val symCnt = seg
        .select(col("freq"), explode(syms).as("s"))
        .groupBy("s").agg(sum("freq").as("sc"))
      pairCounts(seg)
        .join(broadcast(symCnt.select(col("s").as("a"), col("sc").as("ca"))), Seq("a"))
        .join(broadcast(symCnt.select(col("s").as("b"), col("sc").as("cb"))), Seq("b"))
        .withColumn("score",
          col("cnt").cast("double") / (col("ca").cast("double") * col("cb").cast("double")))
        .orderBy(desc("score"), col("a"), col("b"))
        .select(col("a"), col("b"), col("cnt"))
        .limit(1).collect()
    }
}
