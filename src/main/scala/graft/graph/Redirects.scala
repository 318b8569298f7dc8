package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution by POINTER JUMPING — the crawl-graph
  * operator that maps every fetched URL to its final target (3xx chains,
  * short-link hops, mirror canonicalization). The naive per-hop loop is
  * O(longest chain) sequential joins; pointer jumping doubles the
  * resolved distance every round — `rounds` self-joins resolve chains up
  * to 2^rounds hops, the only shape that survives a 100 TB link graph
  * (chains of length 100 cost 7 rounds, not 100).
  *
  * Input: (src, dst) single-successor redirect edges (a src appears
  * once — enforced loudly; a multi-map would silently fork chains).
  * Output per SOURCE node: (src, final, hops) where `final` has no
  * outgoing edge. Nodes that never redirect are not rows (resolve joins
  * against sources only). Cycles (or chains longer than 2^rounds) leave
  * `final` still-redirecting; they surface as `resolved = false` rather
  * than looping forever — the caller's quality gate drops or retries.
  *
  * Each round persists the narrow (src, next, hops) frame and
  * localCheckpoints lineage (the LinkGraph iteration discipline) — plan
  * depth stays constant per round instead of doubling.
  */
object Redirects {

  def resolve(edges: DataFrame, rounds: Int = 6,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(rounds >= 1 && rounds <= 20, s"rounds out of range: $rounds")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // single-successor contract: a forked src has no well-defined chain
    val forked = e.groupBy("src").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).collect()
    require(forked.isEmpty,
      s"resolve: src ${forked.headOption.map(_.get(0)).orNull} has multiple " +
        "redirect targets — redirect edges must be single-successor")
    var f = e.select(col("src"), col("dst").as("next"), lit(1L).as("hops"))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val hop = f.select(col("src").as("next"), col("next").as("nn"),
        col("hops").as("h2"))
      f = f.join(hop, Seq("next"), "left_outer")
        .select(col("src"),
          coalesce(col("nn"), col("next")).as("next"),
          (col("hops") + coalesce(col("h2"), lit(0L))).as("hops"))
        .localCheckpoint(true)
      r += 1
    }
    // resolved = the landing node has no outgoing edge
    val stillRedirects = e.select(col("src").as("next"), lit(1).as("_open"))
    f.join(stillRedirects, Seq("next"), "left_outer")
      .select(col("src"), col("next").as("final"), col("hops"),
        col("_open").isNull.as("resolved"))
  }
}
