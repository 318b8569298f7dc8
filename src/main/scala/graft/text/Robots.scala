package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt gating — the crawl-side compliance operator (RFC 9309
  * subset): which fetched URLs was the crawler allowed to fetch, and
  * which must be dropped from the corpus. A curation pipeline re-checks
  * this at INGEST time (the crawl may predate a rule change), which
  * makes it a join-shaped corpus operator, not a crawler detail.
  *
  * Parsing ([[parse]], row-local): line-oriented; groups open with one
  * or more `User-agent:` lines and close at the next one after rules
  * began; only groups naming `*` (or the given agent, case-insensitive)
  * contribute; `Allow:`/`Disallow:` values are path prefixes; an EMPTY
  * Disallow value is the RFC's "allow everything" no-op and is dropped;
  * unknown directives and comments (#) are skipped.
  *
  * Matching ([[gate]]): a URL path is governed by its LONGEST matching
  * rule prefix; on a length tie Allow wins (the least-restrictive rule,
  * Google semantics); no matching rule means allowed. The rule table is
  * tiny by construction (per-host robots.txt), so the match is a
  * broadcast prefix-join followed by ONE max-struct aggregate —
  * `max(struct(len, allow))` IS the (longest, allow-on-tie) rule pick,
  * shuffle-bounded by the URL count, never a window.
  */
object Robots {

  final case class Rule(host: String, allow: Boolean, prefix: String)

  /** Extract the rules governing `agent` from one robots.txt body. */
  def parse(host: String, robotsTxt: String,
      agent: String = "*"): Seq[Rule] = {
    val out = Seq.newBuilder[Rule]
    var groupAgents = List.empty[String]
    var groupOpen = false // true while collecting agent lines
    var applies = false
    robotsTxt.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val name = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        name match {
          case "user-agent" =>
            if (!groupOpen) { groupAgents = Nil; groupOpen = true }
            groupAgents ::= value.toLowerCase
            applies = groupAgents.contains("*") ||
              groupAgents.contains(agent.toLowerCase)
          case "allow" | "disallow" =>
            groupOpen = false
            // empty Disallow = "allow everything", the RFC no-op
            if (applies && value.nonEmpty)
              out += Rule(host, name == "allow", value)
          // RFC 9309: unrecognized lines are skipped outright — they
          // neither close agent collection nor split a group, so
          // `User-agent: a / Crawl-delay: 5 / User-agent: b / Disallow: /x`
          // attributes the rule to BOTH a and b.
          case _ => ()
        }
      }
    }
    out.result()
  }

  /** Verdict per (id, host, path) row against a rules frame
    * (host, allow, prefix): `verdict` in {allowed, disallowed} plus the
    * governing rule's prefix length (0 = no rule matched). One broadcast
    * prefix-join + one max-struct aggregate.
    */
  def gate(urls: DataFrame, rules: DataFrame): DataFrame = {
    val r = rules.select(col("host"), col("allow"),
      col("prefix"), length(col("prefix")).as("rlen"))
    urls.join(broadcast(r),
        urls("host") === r("host") && urls("path").startsWith(r("prefix")),
        "left_outer")
      .groupBy(urls("id"), urls("host"), urls("path"))
      .agg(max(struct(col("rlen"), col("allow"))).as("win"))
      .select(col("id"), col("host"), col("path"),
        coalesce(col("win.rlen"), lit(0)).cast("long").as("matched_len"),
        when(col("win.rlen").isNull || col("win.allow"), "allowed")
          .otherwise("disallowed").as("verdict"))
  }

  /** [[parse]] lifted over a (host, robots_txt) frame — row-local. */
  def parseAll(robots: Dataset[(String, String)],
      agent: String = "*"): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.flatMap { case (h, txt) => parse(h, txt, agent) }.toDF()
  }
}
