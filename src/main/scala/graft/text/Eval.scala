package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level text-generation eval statistics — the BLEU family
  * (Papineni et al. 2002) reduced to its EXACT sufficient statistics:
  * per group, the clipped n-gram matches and totals for n = 1..maxN
  * plus candidate/reference length sums. The geometric mean and the
  * brevity penalty's exp() are one libm call away for any consumer, but
  * the statistics themselves are pure integers — order-independent,
  * bit-stable across engines and partitionings, hash-oracle-able (the
  * repo's integer-exactness discipline: ship the exact sufficient
  * statistics, leave the float cosmetics to the caller). Milli-scaled
  * modified precisions (1000·match div total) ride along for direct
  * consumption.
  *
  * Shape: n-gram multisets explode to (pair, n, gram, count) rows; the
  * clipped match is ONE inner join on (pair, n, gram) taking
  * least(cand, ref) — the only exchange carries narrow gram rows,
  * never documents. No window anywhere.
  */
object Eval {

  /** n-grams of a token array as space-joined strings; empty when the
    * text has fewer than `n` tokens (Spark's `sequence(1, 0)` would
    * DESCEND — the guard is load-bearing).
    */
  private def grams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array())

  /** BLEU sufficient statistics per `groupCol`. Input: one row per
    * (candidate, reference) pair. Output per group: pairs, cand_tokens,
    * ref_tokens, and per n in 1..maxN `match_n`, `total_n`,
    * `p{n}_milli` (= 1000·match div total, null when total is 0).
    *
    * Plan shape: BLEU clips per PAIR, and both texts of a pair live on
    * ONE row — so the clipped matches compute as a row-local codegen'd
    * projection ([[clippedOverlap]]: sort + two-pointer merge per n) and
    * the ONLY exchange anywhere is the final per-group rollup. No
    * (pair, n, gram) shuffle, no join; gram strings never leave their
    * row. `pairCol` stays in the signature for call-site clarity but no
    * pair identity is needed beyond the row itself.
    */
  def bleuStats(pairs: DataFrame, groupCol: String = "lang",
      pairCol: String = "pair_id", candCol: String = "cand_text",
      refCol: String = "ref_text", maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN out of range: $maxN")
    val toksC = split(trim(col(candCol)), "\\s+")
    val toksR = split(trim(col(refCol)), "\\s+")
    // spread BEFORE the per-row gram work: eval pairs usually arrive off
    // a tiny broadcast join planned into a single scan partition, which
    // would serialize the whole projection onto one core
    val base = spread(pairs.select(col(groupCol),
      toksC.as("tc"), toksR.as("tr")))
    val perRow = base.select(col(groupCol) ::
      size(col("tc")).cast("long").as("clen") ::
      size(col("tr")).cast("long").as("rlen") ::
      (1 to maxN).map(n =>
        clippedOverlap(grams(col("tc"), n), grams(col("tr"), n)).as(s"m$n")).toList: _*)
    val aggs =
      count(lit(1)).as("pairs") ::
      sum("clen").as("cand_tokens") :: sum("rlen").as("ref_tokens") ::
      (1 to maxN).flatMap(n => Seq(
        sum(col(s"m$n")).as(s"match_$n"),
        sum(greatest(col("clen") - lit(n - 1), lit(0L))).as(s"total_$n"))).toList
    val m = (1 to maxN).foldLeft(
        perRow.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)) { (d, n) =>
      d.withColumn(s"p${n}_milli",
        when(col(s"total_$n") > 0,
          expr(s"1000 * match_$n div total_$n")).otherwise(lit(null)))
    }
    m.select(col(groupCol) +: col("pairs") +: col("cand_tokens") +:
      col("ref_tokens") +:
      (1 to maxN).flatMap(n => Seq(col(s"match_$n"), col(s"total_$n"),
        col(s"p${n}_milli"))): _*)
  }

  /** Longest-common-subsequence length of two token arrays — the
    * two-row dynamic program, row-local, O(|a|·|b|) with O(|b|) state.
    * Static target for both interpreted eval and generated code.
    */
  def lcsLen(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val as = Array.tabulate(n)(a.getUTF8String)
    val bs = Array.tabulate(m)(b.getUTF8String)
    val dp = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      var prev = 0 // dp[i-1][j-1]
      var j = 1
      while (j <= m) {
        val tmp = dp(j)
        dp(j) =
          if (as(i - 1) == bs(j - 1)) prev + 1
          else math.max(dp(j), dp(j - 1))
        prev = tmp
        j += 1
      }
      i += 1
    }
    dp(m)
  }

  /** `lcs_length(cand_tokens, ref_tokens)` as a Column (fully codegen —
    * a `defineCodeGen` call into [[lcsLen]], the UnicodeNorm
    * discipline). Cost bound: eval pairs are summary-length texts; the
    * DP is row-local and never touches an exchange.
    */
  def lcsLength(cand: Column, ref: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(LcsLength(
      ColumnBridge.expression(cand), ColumnBridge.expression(ref)))
  }

  /** Levenshtein edit distance between two TOKEN arrays (unit costs) —
    * WER's numerator. Token-level, not character-level: substituting a
    * five-letter word costs 1, not 5. Two-row DP, row-local, O(|a|·|b|)
    * with O(|b|) state — the [[lcsLen]] discipline. Static target for
    * both interpreted eval and generated code.
    */
  def editDistance(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0) return m
    if (m == 0) return n
    val as = Array.tabulate(n)(a.getUTF8String)
    val bs = Array.tabulate(m)(b.getUTF8String)
    val dp = Array.tabulate(m + 1)(identity)
    var i = 1
    while (i <= n) {
      var prev = dp(0) // dp[i-1][j-1]
      dp(0) = i
      var j = 1
      while (j <= m) {
        val tmp = dp(j)
        val sub = if (as(i - 1) == bs(j - 1)) prev else prev + 1
        dp(j) = math.min(sub, math.min(dp(j) + 1, dp(j - 1) + 1))
        prev = tmp
        j += 1
      }
      i += 1
    }
    dp(m)
  }

  /** [[editDistance]] as a fully-codegen Column. */
  def tokenEditDistance(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(TokenEditDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Word-error-rate sufficient statistics per `groupCol` — the ASR/MT
    * eval the BLEU family lacks (BLEU rewards overlap; WER charges every
    * insertion/deletion/substitution): per group, pair count, summed
    * token edit distance, candidate/reference token sums, and
    * wer_milli = 1000·edits div ref_tokens. Row-local DP
    * ([[tokenEditDistance]]) + one narrow rollup, the
    * [[bleuStats]]/[[chrFStats]] plan shape.
    */
  def werStats(pairs: DataFrame, groupCol: String = "lang",
      candCol: String = "cand_text", refCol: String = "ref_text"): DataFrame = {
    val toksC = split(trim(col(candCol)), "\\s+")
    val toksR = split(trim(col(refCol)), "\\s+")
    spread(pairs.select(col(groupCol), toksC.as("tc"), toksR.as("tr")))
      .select(col(groupCol),
        tokenEditDistance(col("tc"), col("tr")).cast("long").as("edits"),
        size(col("tc")).cast("long").as("clen"),
        size(col("tr")).cast("long").as("rlen"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("pairs"),
        sum("edits").as("edits_sum"),
        sum("clen").as("cand_tokens"),
        sum("rlen").as("ref_tokens"))
      .withColumn("wer_milli",
        when(col("ref_tokens") > 0,
          expr("1000 * edits_sum div ref_tokens")).otherwise(lit(null)))
  }

  /** Multiset clipped-overlap size of two string arrays:
    * sum over distinct values g of min(count_a(g), count_b(g)) — BLEU's
    * clipped match, computed where both gram lists already live (the
    * row), via sort + two-pointer merge, O(G log G) and allocation-lean.
    * Static target for both interpreted eval and generated code.
    */
  def clippedOverlapCount(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    val as = Array.tabulate(n)(a.getUTF8String)
    val bs = Array.tabulate(m)(b.getUTF8String)
    java.util.Arrays.sort(as.asInstanceOf[Array[Object]])
    java.util.Arrays.sort(bs.asInstanceOf[Array[Object]])
    var i = 0; var j = 0; var matched = 0L
    while (i < n && j < m) {
      val c = as(i).compareTo(bs(j))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else {
        val v = as(i)
        var ci = 0; var cj = 0
        while (i < n && as(i) == v) { ci += 1; i += 1 }
        while (j < m && bs(j) == v) { cj += 1; j += 1 }
        matched += math.min(ci, cj)
      }
    }
    matched
  }

  /** [[clippedOverlapCount]] as a fully-codegen Column (the LcsLength
    * discipline) — lets the BLEU/chrF statistics run as ONE row-local
    * projection with no (pair, n, gram) exchange anywhere.
    */
  def clippedOverlap(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ClippedOverlap(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Corpus-level ROUGE-L sufficient statistics per `groupCol`: pair
    * count, summed LCS and token lengths, and the corpus-level
    * precision / recall / F1 in integer milli-units — P = LCS/|C|,
    * R = LCS/|R|, and F1 = 2·LCS/(|C|+|R|) (the harmonic mean collapses
    * to that closed form at β=1 over summed stats). Pure integers
    * (order-independent, hash-oracle-able); null millis on empty sides.
    */
  def rougeLStats(pairs: DataFrame, groupCol: String = "lang",
      candCol: String = "cand_tokens", refCol: String = "ref_tokens"): DataFrame =
    pairs.select(col(groupCol),
        lcsLength(col(candCol), col(refCol)).cast("long").as("lcs"),
        size(col(candCol)).cast("long").as("clen"),
        size(col(refCol)).cast("long").as("rlen"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("pairs"),
        sum("lcs").as("lcs_sum"),
        sum("clen").as("cand_tokens"),
        sum("rlen").as("ref_tokens"))
      .select(col(groupCol), col("pairs"), col("lcs_sum"),
        col("cand_tokens"), col("ref_tokens"),
        when(col("cand_tokens") > 0,
          expr("1000 * lcs_sum div cand_tokens")).as("p_milli"),
        when(col("ref_tokens") > 0,
          expr("1000 * lcs_sum div ref_tokens")).as("r_milli"),
        when(col("cand_tokens") + col("ref_tokens") > 0,
          expr("2000 * lcs_sum div (cand_tokens + ref_tokens)")).as("f1_milli"))

  /** Distinct-n diversity statistics (Li et al. 2016's distinct-n, the
    * standard corpus-diversity report): per group and n in 1..maxN, the
    * total and distinct n-gram counts and distinct_milli = 1000·distinct
    * div total. Two narrow aggregates; grams shuffle as strings once
    * (count-distinct needs the gram as the key — same shape as BM25's
    * df), documents never do.
    */
  def distinctNgramStats(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", maxN: Int = 3): DataFrame =
    ngramFrame(docs, groupCol, textCol, maxN)
      .groupBy(groupCol, "n")
      .agg(count(lit(1)).as("total_ngrams"),
        countDistinct(col("gram")).as("distinct_ngrams"))
      .withColumn("distinct_milli",
        expr("1000 * distinct_ngrams div total_ngrams"))

  /** Scan-parallelism floor: when the input arrives narrower than half
    * the session's parallelism (a single unsplittable file — one parquet
    * row group, one gzip member — the droplet layouts real lakes
    * accumulate), redistribute ONCE at ingest so the CPU-heavy explode
    * below it isn't serialized onto one core. On a properly-laid-out
    * corpus (thousands of splits at 100 TB) the branch is a no-op; the
    * videoAssetsWithNearDups synthesis path applies the same corrective.
    *
    * The probe reads the INITIAL physical plan
    * (`queryExecution.sparkPlan`), which Catalyst builds without running
    * anything — an `.rdd.getNumPartitions` probe here would finalize the
    * adaptive plan and eagerly materialize every upstream shuffle stage
    * at DataFrame-CONSTRUCTION time (executed again by the real action),
    * turning a pure query-builder API into one that launches jobs.
    * [[estimateParts]] walks the plan the way rows actually flow: a
    * shuffle exchange resets the partition count, a broadcast build side
    * contributes nothing to the probe side's partitioning, and narrow
    * operators carry the leaf scans' split counts through.
    *
    * `sparkPlan` predates EnsureRequirements, so join/aggregate exchanges
    * are NOT in that tree yet (only explicit repartitions are — verified
    * empirically on 4.1.2: a forced sort-merge join's sparkPlan has zero
    * ShuffleExchangeLike nodes). The shuffle test therefore looks for the
    * operators that will FORCE an exchange during preparation: any node
    * requiring a non-trivial, non-broadcast child distribution
    * (sort-merge / shuffled-hash joins, shuffle aggregates, global
    * sorts). A pre-satisfied distribution (both sides already bucketed)
    * false-positives into the byte branch, which is harmless: the floor
    * only acts when the whole input is under advisory×parallelism bytes.
    *
    * MISFIRE CEILING (the heuristic's worst case, pinned by EvalSpec's
    * boundary test): leaf bytes are on-disk COMPRESSED parquet while
    * AQE's advisory applies to (larger) shuffle bytes, so the floor can
    * fire on inputs AQE would have kept wide. The extra work is one
    * round-robin pass over an input that is by the firing condition
    * under advisory×parallelism bytes on disk — 2 GiB at the 64 MB/32
    * defaults — i.e. O(seconds) once, at exactly the sizes where a wrong
    * coalesce would cost minutes of serialized gram CPU downstream.
    */
  private def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.plans.physical.{
      BroadcastDistribution, UnspecifiedDistribution}
    val sess = df.sparkSession
    val want = sess.sparkContext.defaultParallelism
    val plan = df.queryExecution.sparkPlan
    val shuffled = plan.exists { n =>
      n.isInstanceOf[ShuffleExchangeLike] ||
        n.requiredChildDistribution.exists {
          case UnspecifiedDistribution => false
          case _: BroadcastDistribution => false
          case _ => true
        }
    }
    val aqeCoalesce =
      sess.conf.get("spark.sql.adaptive.enabled", "true").toBoolean &&
        sess.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true").toBoolean
    if (shuffled && aqeCoalesce) {
      // the runtime exchange will claim shuffle.partitions, but AQE
      // coalescing is BYTE-driven: a small-byte exchange collapses to 1-2
      // runtime partitions regardless, re-serializing the CPU-dense gram
      // work downstream (the old post-AQE .rdd probe caught this; a lazy
      // probe must predict it). Leaf bytes are the reliable static signal
      // — join-output stats amplify multiplicatively — so when the ENTIRE
      // input is small enough that AQE would coalesce below the session
      // parallelism, force the floor: trivially cheap at exactly the
      // sizes where it fires, a no-op at lake scale. The inserted
      // repartition is user-specified, which AQE coalescing exempts.
      val advisory = sess.sessionState.conf.getConfString(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "67108864")
      val advisoryBytes = org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(advisory)
      knownLeafBytes(plan) match {
        case Some(leafBytes) =>
          if (leafBytes < advisoryBytes * want) df.repartition(want) else df
        case None =>
          // no sized leaves anywhere (pure RDD/local input): bytes can't
          // be predicted, so fall back to the split-count estimate rather
          // than unconditionally re-shuffling arbitrarily large inputs
          val est = estimateParts(plan).getOrElse(1)
          if (est.toLong * 2 < want) df.repartition(want) else df
      }
    } else {
      val est = estimateParts(plan).getOrElse(1)
      if (est.toLong * 2 < want) df.repartition(want) else df
    }
  }

  /** Total bytes of the plan's leaves — file scans plus cached relations
    * (via their statistics, computed without launching jobs) — or None
    * unless EVERY leaf is sized: a partial sum over a plan that mixes
    * one small file scan with an unsized (RDD/local/v2) leaf would
    * drastically UNDERestimate the input and fire the floor on
    * arbitrarily large joins, voiding the documented misfire ceiling.
    * Any unsized leaf therefore sends the caller to the split-count
    * estimate instead. Recurses through the leaf wrappers that hide real
    * scans: InMemoryTableScanExec's cached plan and
    * AdaptiveSparkPlanExec's initial plan.
    */
  private def knownLeafBytes(
      p: org.apache.spark.sql.execution.SparkPlan): Option[Long] = {
    val leafSizes: Seq[Option[Long]] = p.collectLeaves().map {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        Some(s.relation.location.sizeInBytes)
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        knownLeafBytes(c.relation.cachedPlan)
          .orElse(Some(c.relation.computeStats().sizeInBytes
            .min(BigInt(Long.MaxValue)).toLong))
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        knownLeafBytes(a.inputPlan)
      case _ => None
    }
    if (leafSizes.nonEmpty && leafSizes.forall(_.isDefined))
      Some(leafSizes.flatten.sum)
    else None
  }

  /** Estimated output-partition count of an un-executed physical plan —
    * None for subtrees that never set the downstream partitioning (a
    * broadcast build side) or that we can't see into (exotic leaves,
    * conservatively treated as single-partition by the caller).
    */
  private def estimateParts(
      p: org.apache.spark.sql.execution.SparkPlan): Option[Int] = p match {
    case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike =>
      None // build side: the join's output keeps the PROBE side's splits
    case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
      Some(s.numPartitions)
    case s: org.apache.spark.sql.execution.FileSourceScanExec =>
      // split arithmetic over the already-listed FileIndex — no job
      Some(s.inputRDD.getNumPartitions)
    case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      // a cached frame carries the partitioning of the plan that was
      // cached — recurse into it rather than forcing a re-shuffle of
      // something the user deliberately materialized
      estimateParts(c.relation.cachedPlan)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      // AQE wrapper (a LeafExecNode — e.g. what InMemoryRelation caches):
      // walk its INITIAL plan, which exists without executing anything;
      // touching executedPlan here could finalize an unfinished AQE run
      estimateParts(a.inputPlan)
    case r: org.apache.spark.sql.execution.RDDScanExec =>
      Some(r.rdd.getNumPartitions) // an existing RDD: reading its
    case r: org.apache.spark.sql.execution.ExternalRDDScanExec[_] =>
      Some(r.rdd.getNumPartitions) // partition array runs nothing
    case r: org.apache.spark.sql.execution.RangeExec =>
      Some(r.numSlices)
    case _: org.apache.spark.sql.execution.LocalTableScanExec =>
      // local rows slice to leafNodeDefaultParallelism; anything narrower
      // is fewer rows than cores — no starvation possible
      Some(Int.MaxValue)
    case leaf if leaf.children.isEmpty => None
    case other => other.children.flatMap(estimateParts(_)).reduceOption(_ max _)
  }

  /** The exploded (group, n, gram) frame both distinct-n faces aggregate —
    * public so callers can compose exact + approx counters over ONE
    * explode/shuffle. The gram strings are the ONLY key exchange;
    * documents cross at most the ingest-spread corrective above (never a
    * key exchange).
    */
  def ngramFrame(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN out of range: $maxN")
    val toks = split(trim(col(textCol)), "\\s+")
    spread(docs.select(col(groupCol), col(textCol)))
      .select(col(groupCol),
        explode(flatten(array((1 to maxN).map(n =>
          transform(grams(toks, n), x => struct(lit(n).as("n"), x.as("gram")))): _*)))
          .as("g"))
      .select(col(groupCol), col("g.n").as("n"), col("g.gram").as("gram"))
  }

  /** The 100-TB face of [[distinctNgramStats]]: the distinct count rides
    * an HLL++ sketch (`approx_count_distinct`, relative standard
    * deviation `rsd`) instead of an exact distinct — sketches partial-
    * aggregate and MERGE, so the gram key space never needs a global
    * exact-distinct shuffle and the report's cost stops scaling with
    * vocabulary size. The exact face keeps the hash oracle (q273); this
    * is the recipe a 100-TB diversity report actually runs, and
    * EvalApproxSpec pins its relative error against the exact row at
    * sf0.1.
    */
  def distinctNgramStatsApprox(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", maxN: Int = 3, rsd: Double = 0.01): DataFrame =
    ngramFrame(docs, groupCol, textCol, maxN)
      .groupBy(groupCol, "n")
      .agg(count(lit(1)).as("total_ngrams"),
        approx_count_distinct(col("gram"), rsd).as("approx_distinct_ngrams"))
      .withColumn("approx_distinct_milli",
        expr("1000 * approx_distinct_ngrams div total_ngrams"))

  /** chrF sufficient statistics (Popović 2015) per `groupCol` — the
    * character-level companion to [[bleuStats]]: texts lose ALL
    * whitespace (chrF's definition: character n-grams never span what a
    * tokenizer would split), then per n in 1..maxN the clipped char
    * n-gram matches plus BOTH sides' totals, because chrF is an
    * F-score — recall needs the reference denominators BLEU never
    * ships. Pure integers (match_n / ctotal_n / rtotal_n, plus
    * milli-scaled precision/recall); the β=2 harmonic combination over
    * n is the caller's float cosmetics, exactly like BLEU's geometric
    * mean. Same plan shape as [[bleuStats]]: one narrow (pair, n, gram)
    * exchange, no window, documents never shuffle. chrF++ = these
    * statistics unioned with [[bleuStats]]' word 1-2-grams.
    */
  def chrFStats(pairs: DataFrame, groupCol: String = "lang",
      pairCol: String = "pair_id", candCol: String = "cand_text",
      refCol: String = "ref_text", maxN: Int = 6): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN out of range: $maxN")
    // explicit whitespace class (Java's \s includes \x0B, RE2's does
    // not) — the WebText cross-engine regex discipline
    def squash(c: Column): Column = regexp_replace(c, "[ \\t\\n\\r\\f]+", "")
    def charGrams(s: Column, n: Int): Column =
      when(length(s) >= n,
        transform(sequence(lit(1), length(s) - lit(n - 1)), i => s.substr(i, lit(n))))
        .otherwise(array())
    // bleuStats' plan shape at character grain: clipping is per pair,
    // both sides live on the row, so matches are a row-local codegen'd
    // projection ([[clippedOverlap]]) and the only exchange is the
    // per-group rollup — crucial here, where 6 char-gram orders explode
    // ~6x harder than BLEU's word grams
    val base = spread(pairs.select(col(groupCol),
      squash(col(candCol)).as("sc"), squash(col(refCol)).as("sr")))
    val perRow = base.select(col(groupCol) ::
      length(col("sc")).cast("long").as("clen") ::
      length(col("sr")).cast("long").as("rlen") ::
      (1 to maxN).map(n =>
        clippedOverlap(charGrams(col("sc"), n), charGrams(col("sr"), n))
          .as(s"m$n")).toList: _*)
    val aggs =
      count(lit(1)).as("pairs") ::
      sum("clen").as("cand_chars") :: sum("rlen").as("ref_chars") ::
      (1 to maxN).flatMap(n => Seq(
        sum(col(s"m$n")).as(s"match_$n"),
        sum(greatest(col("clen") - lit(n - 1), lit(0L))).as(s"ctotal_$n"),
        sum(greatest(col("rlen") - lit(n - 1), lit(0L))).as(s"rtotal_$n"))).toList
    val m = (1 to maxN).foldLeft(
        perRow.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)) { (d, n) =>
      d.withColumn(s"prec${n}_milli",
          when(col(s"ctotal_$n") > 0,
            expr(s"1000 * match_$n div ctotal_$n")).otherwise(lit(null)))
        .withColumn(s"rec${n}_milli",
          when(col(s"rtotal_$n") > 0,
            expr(s"1000 * match_$n div rtotal_$n")).otherwise(lit(null)))
    }
    m.select(col(groupCol) +: col("pairs") +: col("cand_chars") +:
      col("ref_chars") +:
      (1 to maxN).flatMap(n => Seq(col(s"match_$n"), col(s"ctotal_$n"),
        col(s"rtotal_$n"), col(s"prec${n}_milli"), col(s"rec${n}_milli"))): _*)
  }
}

/** Token-level Levenshtein distance as one BinaryExpression (codegen'd
  * wrapper over [[Eval.editDistance]]).
  */
case class TokenEditDistance(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Eval.editDistance(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.text.Eval.editDistance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(left = newLeft, right = newRight)
}

/** Multiset clipped overlap as one BinaryExpression (codegen'd wrapper
  * over [[Eval.clippedOverlapCount]]).
  */
case class ClippedOverlap(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Eval.clippedOverlapCount(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.text.Eval.clippedOverlapCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(left = newLeft, right = newRight)
}

/** The LCS dynamic program as one BinaryExpression (codegen'd wrapper
  * over [[Eval.lcsLen]]).
  */
case class LcsLength(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Eval.lcsLen(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.text.Eval.lcsLen($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(left = newLeft, right = newRight)
}
