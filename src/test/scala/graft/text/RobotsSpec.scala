package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** robots.txt semantics pinned by hand: group selection (multi-agent
  * groups, the '*' group, named-agent targeting), the empty-Disallow
  * no-op, comment stripping, longest-match with Allow winning ties, and
  * the default-allow fallback. The corpus-scale gating plumbing is
  * q256's oracle job.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("group selection: '*' groups apply, named groups do not") {
    val txt = "User-agent: GoodBot\nDisallow: /a\n\n" +
      "User-agent: *\nDisallow: /b\n"
    assert(Robots.parse("h", txt) === Seq(Robots.Rule("h", false, "/b")))
    // targeting GoodBot picks up BOTH its group and '*'
    assert(Robots.parse("h", txt, agent = "goodbot").toSet ===
      Set(Robots.Rule("h", false, "/a"), Robots.Rule("h", false, "/b")))
  }

  test("multi-agent groups: consecutive User-agent lines share rules") {
    val txt = "User-agent: A\nUser-agent: *\nDisallow: /x\nAllow: /x/ok\n"
    assert(Robots.parse("h", txt) ===
      Seq(Robots.Rule("h", false, "/x"), Robots.Rule("h", true, "/x/ok")))
    // a LATER User-agent line (after rules began) starts a NEW group
    val two = "User-agent: *\nDisallow: /x\nUser-agent: B\nDisallow: /y\n"
    assert(Robots.parse("h", two) === Seq(Robots.Rule("h", false, "/x")))
  }

  test("empty Disallow is the allow-all no-op; comments and unknowns skip") {
    val txt = "User-agent: *\n# full access\nDisallow:\n" +
      "Crawl-delay: 5\nDisallow: /q # trailing comment\n"
    assert(Robots.parse("h", txt) === Seq(Robots.Rule("h", false, "/q")))
  }

  test("unknown directives neither close agent collection nor split a group") {
    // RFC 9309: consecutive User-agent lines merge even across an
    // unrecognized line — the rule below applies to BOTH a and b
    val txt = "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /x\n"
    assert(Robots.parse("h", txt, agent = "a") ===
      Seq(Robots.Rule("h", false, "/x")))
    assert(Robots.parse("h", txt, agent = "b") ===
      Seq(Robots.Rule("h", false, "/x")))
    // and an unknown line after rules began does NOT reopen the group:
    // the later User-agent still starts a fresh group
    val after = "User-agent: *\nDisallow: /x\nCrawl-delay: 9\n" +
      "User-agent: c\nDisallow: /y\n"
    assert(Robots.parse("h", after) === Seq(Robots.Rule("h", false, "/x")))
    assert(Robots.parse("h", after, agent = "c").toSet ===
      Set(Robots.Rule("h", false, "/x"), Robots.Rule("h", false, "/y")))
  }

  test("gate: longest match wins, Allow wins ties, default is allow") {
    val rules = Seq(
      ("h", false, "/p"), ("h", true, "/p/ok"),
      ("h", false, "/tie"), ("h", true, "/tie")).toDF("host", "allow", "prefix")
    val urls = Seq(
      (1L, "h", "/p/x"), (2L, "h", "/p/ok/x"), (3L, "h", "/tie/x"),
      (4L, "h", "/free"), (5L, "other", "/p/x")).toDF("id", "host", "path")
    val got = Robots.gate(urls, rules)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 2L, "disallowed"), // /p
      (2L, 5L, "allowed"), // /p/ok beats /p on length
      (3L, 4L, "allowed"), // exact length tie -> Allow
      (4L, 0L, "allowed"), // no rule
      (5L, 0L, "allowed"))) // rules are per-host
  }
}
