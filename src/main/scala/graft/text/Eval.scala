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
    */
  def bleuStats(pairs: DataFrame, groupCol: String = "lang",
      pairCol: String = "pair_id", candCol: String = "cand_text",
      refCol: String = "ref_text", maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN out of range: $maxN")
    val toksC = split(trim(col(candCol)), "\\s+")
    val toksR = split(trim(col(refCol)), "\\s+")
    val base = pairs.select(col(groupCol), col(pairCol).as("pair"),
      toksC.as("tc"), toksR.as("tr"))
    def gramCounts(toks: Column): Column =
      explode(flatten(array((1 to maxN).map(n =>
        transform(grams(toks, n), g => struct(lit(n).as("n"), g.as("gram")))): _*)))
    val cand = base.select(col(groupCol), col("pair"), gramCounts(col("tc")).as("g"))
      .groupBy(col(groupCol), col("pair"), col("g.n").as("n"), col("g.gram").as("gram"))
      .agg(count(lit(1)).as("c_cnt"))
    val ref = base.select(col("pair"), gramCounts(col("tr")).as("g"))
      .groupBy(col("pair"), col("g.n").as("n"), col("g.gram").as("gram"))
      .agg(count(lit(1)).as("r_cnt"))
    val matches = cand.join(ref, Seq("pair", "n", "gram"))
      .groupBy(groupCol, "n")
      .agg(sum(least(col("c_cnt"), col("r_cnt"))).as("matched"))
    val totals = base.select(col(groupCol), col("pair"),
        size(col("tc")).cast("long").as("clen"),
        size(col("tr")).cast("long").as("rlen"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("pairs"),
        sum("clen").as("cand_tokens"), sum("rlen").as("ref_tokens"),
        struct((1 to maxN).map(n =>
          sum(greatest(col("clen") - lit(n - 1), lit(0L))).as(s"t$n")): _*).as("tot"))
    val m = (1 to maxN).foldLeft(
        totals.join(matches.groupBy(groupCol).agg(
          map_from_entries(collect_list(struct(col("n"), col("matched"))))
            .as("mm")), Seq(groupCol), "left_outer")) { (d, n) =>
      d.withColumn(s"match_$n",
          coalesce(element_at(col("mm"), n), lit(0L)))
        .withColumn(s"total_$n", col(s"tot.t$n"))
        .withColumn(s"p${n}_milli",
          when(col(s"total_$n") > 0,
            expr(s"1000 * match_$n div total_$n")).otherwise(lit(null)))
    }
    m.select(col(groupCol) +: col("pairs") +: col("cand_tokens") +:
      col("ref_tokens") +:
      (1 to maxN).flatMap(n => Seq(col(s"match_$n"), col(s"total_$n"),
        col(s"p${n}_milli"))): _*)
  }
}
