package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * that won its round. `rounds` is the number of DRIVER rounds training
    * actually ran — equal to `merges.length` for sequential training,
    * smaller when `batchedRounds` fused several provably-commuting merges
    * per round (the model-scale wall-time lever; the merges themselves
    * are identical either way).
    */
  final case class BpeModel(alphabet: Seq[String],
      merges: Seq[(String, String, Long)], rounds: Int = 0) {
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

  /** GPT-2-style pretokenizer, ASCII form: a token is an optionally
    * space-prefixed letter run, digit run, or punctuation run, or a bare
    * space run — the split production byte-level tokenizers apply before
    * BPE (GPT-2's regex, with `\p{L}/\p{N}` narrowed to ASCII classes so
    * Java and RE2 agree character-for-character). Matches cover the
    * whole string; nothing is dropped.
    */
  val BytePretokenPattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** A pretoken's UTF-8 bytes, one SHIFTED char per byte: byte b becomes
    * codepoint 256+b (U+0100..U+01FF). The shift keeps the training
    * representation collision-free by construction — no byte can render
    * as '(' or ')' — where GPT-2's printable-byte table maps '(' to
    * itself and would collide with the paren algebra. Both engines
    * compute it from the hex of the UTF-8 encoding with the same
    * arithmetic, so segmentations stay bit-identical.
    */
  def shiftedBytes(tok: Column): Column = {
    val hx = hex(encode(tok, "UTF-8"))
    def h2(b: Column): Column = lpad(hex(b), 2, "0")
    array_join(
      transform(sequence(lit(1), (length(hx) / 2).cast("int")), i => {
        val cp = conv(hx.substr(i * 2 - 1, lit(2)), 16, 10).cast("int") + 256
        // codepoints 0x100..0x1FF are two UTF-8 bytes: C4..C7 then 80|low6
        decode(unhex(concat(h2(shiftright(cp, 6) + 192),
          h2(cp.bitwiseAND(63) + 128))), "UTF-8")
      }), "")
  }

  /** The distinct-PRETOKEN frequency table for byte-level training: raw
    * text (no case/alphabet gate — byte-level handles anything) split by
    * [[BytePretokenPattern]], each pretoken re-expressed as its shifted
    * byte string.
    */
  private def byteWordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(regexp_extract_all(col(textCol),
        lit(BytePretokenPattern), lit(0))).as("tok"))
      .select(shiftedBytes(col("tok")).as("word"))
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

  /** The SAFE merge batch for one BPE round, from the round's ranked
    * pair list (`ranked` = the top `n + 1` pairs in the training order
    * (cnt DESC, a, b)): the longest PREFIX of the ranked list, capped at
    * `n`, whose pairs are mutually non-adjacent (no shared symbol),
    * trimmed to pairs whose count STRICTLY exceeds the first excluded
    * pair's; falls back to top-1 when trimming empties the batch (a pure
    * sequential step is always safe). Applying the batch in one pass is
    * bit-identical to applying its merges one sequential round at a
    * time, by three facts:
    *
    *  1. batch pairs don't perturb each other: merging (a, b) changes
    *     only the counts of pairs of the form (*, a), (b, *) and (a, b)
    *     itself, so a disjoint-symbol pair's count — and its
    *     segmentation matches — are untouched, and the literal
    *     `(a)(b)` patterns of disjoint pairs can never overlap in the
    *     paren representation (application order inside the pass is
    *     irrelevant);
    *  2. old pairs outside the batch can't overtake: a prefix means
    *     every pair ranked above the last accepted one is IN the batch,
    *     outside counts only ever decrease, and the (cnt DESC, a, b)
    *     tie-break keeps an equal-count outsider below where the
    *     original ranking put it;
    *  3. NEW pairs created mid-batch can't overtake: a pair born of
    *     merge k has the fused symbol in it, and its count is bounded by
    *     an old pair adjacent to merge k — which, by mutual
    *     non-adjacency, is NOT in the batch, hence ranks below the whole
    *     prefix, hence (after the strict-boundary trim) has count
    *     strictly below every batch pair's. Strictness is what closes
    *     the tie window: a new pair with a count merely EQUAL to a batch
    *     pair's could win on the lexicographic tie-break, so boundary
    *     ties trim.
    *
    * The tempting alternative — SKIP a conflicting pair and keep taking
    * lower-ranked disjoint ones — is NOT sequential-equivalent: the
    * skipped pair's count may not actually decrease (only (*, a) /
    * (b, *) forms do), in which case sequential training would pick it
    * before every lower-ranked pair the skip rule accepted. Hence
    * prefix-stop, not skip (BpeSpec pins a corpus where the skip rule
    * provably diverges).
    */
  private[text] def safeBatch(ranked: Seq[(String, String, Long)],
      n: Int): Seq[(String, String, Long)] = {
    if (ranked.isEmpty) return Nil
    val syms = scala.collection.mutable.Set.empty[String]
    val acc = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var i = 0
    var stopped = false
    while (i < ranked.length && acc.length < n && !stopped) {
      val (a, b, _) = ranked(i)
      if (syms.contains(a) || syms.contains(b)) stopped = true
      else { acc += ranked(i); syms += a; syms += b; i += 1 }
    }
    val boundary = if (i < ranked.length) ranked(i)._3 else -1L
    val trimmed = acc.takeWhile(_._3 > boundary).toSeq
    if (trimmed.isEmpty) Seq(ranked.head) else trimmed
  }

  /** The shared training loop: `pickRanked(seg, limit)` ranks a round's
    * pair counts (given the round's segmentation frame) and returns the
    * top `limit` rows in training order; [[safeBatch]] then accepts as
    * many as provably commute (1 when `batchedRounds` is 1 — the
    * sequential form).
    */
  private def trainLoop(spark: SparkSession, wordFreq: DataFrame, merges: Int,
      batchedRounds: Int)(
      pickRanked: (DataFrame, Int) => Array[org.apache.spark.sql.Row]): BpeModel = {
    require(merges >= 0, s"merges must be >= 0, got $merges")
    require(batchedRounds >= 1, s"batchedRounds must be >= 1, got $batchedRounds")
    val words = wordFreq
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val alphabet = words
        .select(explode(split(col("word"), "")).as("c"))
        .filter(col("c") =!= "").distinct()
        .orderBy("c").collect().map(_.getString(0)).toSeq
      var seg = words.withColumn("seg",
        regexp_replace(col("word"), "(.)", "($1)"))
      val learned = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
      var sinceCheckpoint = 0
      var rounds = 0
      var exhausted = false
      while (learned.length < merges && !exhausted) {
        rounds += 1
        val want = math.min(batchedRounds, merges - learned.length)
        val top = pickRanked(seg, want + 1)
        if (top.isEmpty) exhausted = true
        else {
          val ranked = top.map(r =>
            (r.getString(0), r.getString(1), r.getLong(2))).toSeq
          val batch = safeBatch(ranked, want)
          learned ++= batch
          seg = batch.foldLeft(seg) { case (s, (a, b, _)) =>
            s.withColumn("seg",
              replace(col("seg"), lit(s"($a)($b)"), lit(s"($a$b)")))
          }
          sinceCheckpoint += batch.length
          // bound the lineage: without a cut, round i's aggregate replays
          // every prior replace, making a real (30k-merge) training run
          // quadratic in plan depth. The table is vocabulary-sized, so an
          // eager local checkpoint every ~16 merges is cheap and keeps
          // every round's plan shallow.
          if (sinceCheckpoint >= 16) {
            seg = seg.localCheckpoint(true)
            sinceCheckpoint = 0
          }
        }
      }
      BpeModel(alphabet, learned.toList, rounds)
    } finally {
      words.unpersist()
      ()
    }
  }

  /** Learn `merges` BPE merges from `docs(textCol)`: each round fuses the
    * most FREQUENT adjacent pair. Returns fewer when the corpus runs out
    * of adjacent pairs first (every word fused to a single symbol).
    *
    * `batchedRounds` is the driver-round batching the model-scale story
    * needs: sequential training runs ONE merge per driver round — exact,
    * but a production 32k-merge vocabulary becomes ~32k sequential Spark
    * jobs whose scheduling overhead dominates wall time. With
    * `batchedRounds = N`, each round collects the top N+1 ranked pairs
    * and applies the [[safeBatch]] prefix — every batched merge is
    * PROVABLY the merge sequential training would have made (the result
    * is bit-identical, spec-checked on adversarial fixtures and replayed
    * by the q189 oracle against a sequential DuckDB derivation), and the
    * round count drops toward merges/N on natural corpora, where
    * top-ranked pairs rarely share symbols. Falls back to effectively
    * sequential rounds exactly where the ranking forces it.
    */
  def fit(spark: SparkSession, docs: DataFrame, merges: Int,
      textCol: String = "text", batchedRounds: Int = 1): BpeModel =
    trainLoop(spark, wordTable(docs, textCol), merges, batchedRounds) { (seg, limit) =>
      pairCounts(seg)
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(limit).collect()
    }

  /** BYTE-level BPE (the GPT-2/tiktoken production shape): pretokenize
    * with [[BytePretokenPattern]], re-express each pretoken as shifted
    * UTF-8 bytes ([[shiftedBytes]] — one char per byte, so ANY input
    * trains: case, digits, punctuation, non-ASCII), then run the exact
    * same frequency objective, paren algebra, and `batchedRounds`
    * commutation machinery as [[fit]]. Merges/alphabet in the returned
    * model are shifted-char strings; [[byteString]] renders them as
    * dash-joined byte values for reports.
    */
  def fitBytes(spark: SparkSession, docs: DataFrame, merges: Int,
      textCol: String = "text", batchedRounds: Int = 1): BpeModel =
    trainLoop(spark, byteWordTable(docs, textCol), merges, batchedRounds) { (seg, limit) =>
      pairCounts(seg)
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(limit).collect()
    }

  /** A shifted-char piece as its underlying bytes, dash-joined decimal
    * ("104-101" = the bytes of "he") — the report rendering both the
    * Spark rows and the DuckDB oracle derive with plain arithmetic.
    */
  def byteString(piece: String): String =
    piece.map(c => (c.toInt - 256).toString).mkString("-")

  /** Persist a trained model as a SERVED ARTIFACT (the tokenizer joins
    * the ANN index / inverted index / packed corpus family): two
    * parquet tables — `merges` (step, a, b, cnt; step carries the
    * application order, the part of a BPE model that IS the model) and
    * `alphabet` (idx, sym). Load reconstructs the model bit-for-bit, so
    * a trained-once vocabulary serves every later encode job without
    * retraining — at 100 TB, training reads the corpus once; encoding
    * under a loaded artifact reads only these kilobyte tables.
    */
  def save(spark: SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b, c), i) => (i + 1L, a, b, c) }
      .toDF("step", "a", "b", "cnt")
      .repartition(1).write.mode("overwrite").parquet(s"$path/merges")
    model.alphabet.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("idx", "sym")
      .repartition(1).write.mode("overwrite").parquet(s"$path/alphabet")
  }

  /** Load a [[save]]d model: merges back in training order. */
  def load(spark: SparkSession, path: String): BpeModel = {
    import spark.implicits._
    val merges = spark.read.parquet(s"$path/merges")
      .orderBy("step").select("a", "b", "cnt")
      .as[(String, String, Long)].collect().toSeq
    val alphabet = spark.read.parquet(s"$path/alphabet")
      .orderBy("idx").select("sym").as[String].collect().toSeq
    BpeModel(alphabet, merges)
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
    *
    * Deliberately NO `batchedRounds` here: [[fit]]'s prefix-batch proof
    * does not transfer to the likelihood objective, because the score is
    * NON-LOCAL — merging (a, b) consumes cnt(a,b) occurrences of symbol
    * a and of symbol b, so every pair sharing a symbol with a batch
    * merge sees its DENOMINATOR shrink and its score RISE, and a pair
    * ranked arbitrarily far below the batch can overtake it mid-batch
    * (under BPE, by contrast, outside counts only ever fall). The rise
    * is unbounded without that pair's own count, which no fixed-size
    * collect of the top of the ranking can provide — exact WordPiece
    * batching would need a full recount per accepted merge, i.e. a
    * sequential round. Production WordPiece trainers batch anyway and
    * accept the drift; this trainer's contract is oracle-exactness, so
    * it keeps the sequential form (at equal `merges` both trainers cost
    * the same number of rounds; [[fit]] with batching is the
    * vocabulary-scale path).
    */
  def fitWordPiece(spark: SparkSession, docs: DataFrame, merges: Int,
      textCol: String = "text"): BpeModel =
    trainLoop(spark, wordTable(docs, textCol), merges, batchedRounds = 1) { (seg, limit) =>
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
        .limit(limit).collect()
    }
}
