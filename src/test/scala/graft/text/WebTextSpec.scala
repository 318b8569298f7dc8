package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The web-curation scalar rules, pinned by hand: extraction's subtree
  * drops, tag-to-space word preservation, the entity double-escape rule
  * (amp decodes LAST), and canonicalization's scheme-conditional port
  * drop, tracker filtering, param sorting and null sentinel. The
  * cross-engine equality of both chains is q253/q254's oracle job;
  * these pin the intended semantics so a refactor can't silently trade
  * them away.
  */
class WebTextSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(WebText.htmlText(col("h"))).head().getString(0)

  private def canon(url: String): Option[String] =
    Option(Seq(url).toDF("u").select(WebText.canonicalUrl(col("u")))
      .head().getString(0))

  test("script/style subtrees drop wholesale, including embedded '<'") {
    assert(extract("<p>a</p><script>if (1 < 2) { x(); }</script><p>b</p>")
      === "a b")
    assert(extract("<style>p > em { color: red }</style>hello") === "hello")
    assert(extract("<SCRIPT a=b>x</SCRIPT>keep") === "keep") // case-insensitive
  }

  test("tags become spaces: adjacent words never fuse") {
    assert(extract("<b>one</b><i>two</i>") === "one two")
    assert(extract("a<br/>b") === "a b")
  }

  test("entities: named set decodes once, single-pass (double-escape rule)") {
    assert(extract("x &amp; y") === "x & y")
    assert(extract("&lt;tag&gt;") === "<tag>")
    // &amp;lt; is an ESCAPED '&lt;' — must yield the literal text '&lt;',
    // never a '<' (rescanning amp's output would create one)
    assert(extract("&amp;lt;") === "&lt;")
    // the symmetric direction: &#38; is the NUMERIC escape of '&' — the
    // decoded '&' must not combine with the following 'lt;' into a new
    // reference (a numeric-then-named two-pass gets this wrong)
    assert(extract("&#38;lt;") === "&lt;")
    assert(extract("&#38;amp;") === "&amp;")
    assert(extract("&amp;amp;") === "&amp;")
    assert(extract("a&nbsp;b") === "a b")
    assert(extract("&copy;") === "&copy;") // outside the documented subset
  }

  test("whitespace collapses and trims") {
    assert(extract("  a \t\n b \r\n ") === "a b")
  }

  test("numeric references: decimal, hex, astral; invalid pass through") {
    assert(extract("r&#233;sum&#xE9;") === "résumé")
    assert(extract("a&#x2014;b") === "a—b") // em dash, 3-byte UTF-8
    assert(extract("&#X2014;") === "—") // capital X form
    assert(extract("&#65;&#66;") === "AB") // adjacent refs both decode
    // astral plane: 4-byte UTF-8 (emoji)
    assert(extract("&#x1F600;") === new String(Character.toChars(0x1F600)))
    assert(extract("&#128512;") === new String(Character.toChars(0x1F600)))
    // double-escape: &amp;#65; is an ESCAPED '&#65;' — single-pass
    // decode never rescans amp's output, so no reference materializes
    assert(extract("&amp;#65;") === "&#65;")
    // invalid references pass through undecoded: out of range, surrogate,
    // zero, unterminated, over-long digits, bare &#
    assert(extract("&#1114112;") === "&#1114112;")
    assert(extract("&#xD800;") === "&#xD800;")
    assert(extract("&#0;") === "&#0;")
    assert(extract("&#65") === "&#65")
    assert(extract("&#12345678;") === "&#12345678;")
    assert(extract("&#;") === "&#;")
    // boundary: last valid codepoint decodes
    assert(extract("&#x10FFFF;") === new String(Character.toChars(0x10FFFF)))
    assert(extract("&#1114111;") === new String(Character.toChars(0x10FFFF)))
  }

  test("canonical: scheme-conditional default ports") {
    assert(canon("HTTP://EX.COM:80/p") === Some("http://ex.com/p"))
    assert(canon("https://ex.com:443/p") === Some("https://ex.com/p"))
    // mismatched pairs KEEP the port
    assert(canon("https://ex.com:80/p") === Some("https://ex.com:80/p"))
    assert(canon("http://ex.com:443/p") === Some("http://ex.com:443/p"))
    assert(canon("http://ex.com:8080/p") === Some("http://ex.com:8080/p"))
  }

  test("canonical: trackers drop, params sort, fragment drops, path case kept") {
    assert(canon("https://Ex.com/A/B?z=1&utm_source=f&a=2#frag")
      === Some("https://ex.com/A/B?a=2&z=1"))
    assert(canon("https://ex.com/p?utm_a=1&utm_b=2") === Some("https://ex.com/p"))
    assert(canon("https://ex.com?a=1") === Some("https://ex.com/?a=1"))
    assert(canon("https://ex.com#only-frag") === Some("https://ex.com/"))
  }

  test("canonical: non-URLs yield the null sentinel") {
    assert(canon("not a url") === None)
    assert(canon("://missing-scheme.com/") === None)
    assert(canon("http://") === None)
  }

  private def tables(html: String): Seq[Seq[Seq[String]]] =
    Seq(html).toDF("h").select(WebText.htmlTables(col("h")))
      .head().getSeq[Seq[Seq[String]]](0)

  test("tables: th/td cells, multiple tables, entity-decoded cell text") {
    val html = "<p>x</p><table><tr><th>A</th><th>B &amp; C</th></tr>" +
      "<tr><td> 1 </td><td><b>2</b></td></tr></table>" +
      "<table class=\"z\"><tr><td>only</td></tr></table>"
    assert(tables(html) === Seq(
      Seq(Seq("A", "B & C"), Seq("1", "2")),
      Seq(Seq("only"))))
    assert(tables("<p>no tables here</p>") === Seq.empty)
  }

  private def links(html: String): Seq[(String, String)] =
    Seq(html).toDF("h").select(WebText.htmlLinks(col("h")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1)))

  test("links: href/anchor pairs stay aligned, anchors entity-decode") {
    val html = "<a href=\"https://a.example/\">one &amp; only</a> text " +
      "<a class=\"x\" href=\"/rel\"><b>two</b></a>"
    assert(links(html) === Seq(
      ("https://a.example/", "one & only"), ("/rel", "two")))
    assert(links("<p>no links</p>") === Seq.empty)
  }
}
