package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-curation scalar surface: HTML boilerplate extraction and URL
  * canonicalization — the two normalizations every crawl-derived LLM
  * corpus runs before any dedup or quality pass (CCNet and its
  * descendants start from HTML, and URL-level dedup needs canonical
  * keys). Both are COMPOSED FROM BUILT-INS (regexp_replace /
  * regexp_extract / array ops — codegen'd, no UDF, no custom
  * expression), and every rule is chosen to have an exact DuckDB
  * replay so the oracle can recompute the result from the same source
  * string: the engines must agree regex-for-regex.
  *
  * Regex notes (cross-engine exactness): whitespace classes are the
  * EXPLICIT `[ \t\n\r\f]` (Java's `\s` includes \x0B, RE2's does not);
  * script/style stripping uses `(?is)` + non-greedy `.*?`, identical
  * semantics in both engines; entity decoding covers the named set
  * amp/lt/gt/quot/apos/nbsp plus NUMERIC character references
  * (`&#NNNN;` decimal, `&#xHH;` hex — see [[decodeHtmlEntities]]).
  */
object WebText {

  private val Space = "[ \\t\\n\\r\\f]"

  /** Lossless entity-or-text tokenization: a position either starts a
    * bounded numeric reference, one of the six named entities, a
    * maximal `&`-free run, or a bare `&`. Digit-count bounds (7 dec /
    * 6 hex) keep the codepoint inside int range; longer digit strings
    * simply fail the entity alternatives and pass through as text.
    * Shared verbatim with the DuckDB oracle replay
    * (WebQueries.duckExtract).
    */
  val EntityToken: String =
    "&#[0-9]{1,7};|&#[xX][0-9a-fA-F]{1,6};|" +
      "&(?:lt|gt|quot|apos|nbsp|amp);|[^&]+|&"

  /** Decode HTML character references in ONE pass — numeric (`&#8212;`
    * and `&#x2014;` alike, valid codepoints 1..U+10FFFF surrogates
    * excluded) AND the named six (amp/lt/gt/quot/apos/nbsp); invalid
    * or out-of-range references pass through UNdecoded on both engines
    * (the oracle guards with the same validity CASE over the same
    * [[EntityToken]] tokenization). Single-pass means each reference
    * decodes exactly once and decoded output is never rescanned, so
    * NEITHER escape direction double-decodes: `&amp;#65;` stays the
    * literal `&#65;` and `&#38;lt;` stays the literal `&lt;` — exactly
    * what a real HTML parser renders. A fully-codegen native
    * expression ([[DecodeHtmlEntities]]) — a `transform` HOF here
    * would drop the whole extraction projection to interpreted
    * evaluation.
    */
  def decodeHtmlEntities(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DecodeHtmlEntities(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Visible text of an HTML document: drop script/style subtrees, turn
    * every remaining tag into a space (word-boundary preserving), decode
    * all character references — numeric and named — in ONE pass
    * ([[decodeHtmlEntities]]), collapse whitespace runs, trim. The
    * single pass IS the double-escape rule: `&amp;lt;` yields the
    * literal `&lt;` and `&#38;lt;` the literal `&lt;` too — decoded
    * output is never rescanned, so no ordering of passes can
    * re-decode another pass's output.
    */
  def htmlText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    trim(regexp_replace(decodeHtmlEntities(noTags), s"$Space+", " "))
  }

  /** Rows-of-cells of every <table> in an HTML document, as
    * array<array<array<string>>> (tables -> rows -> cells), each cell
    * reduced to visible text via [[htmlText]]. Pure built-in
    * regexp_extract_all + transform chain — same cross-engine regex
    * discipline as [[htmlText]] ((?is) + non-greedy), so the oracle
    * replays it verbatim. Scope: non-nested tables (a nested table's
    * cells parse into the OUTER table's cell text — documented, both
    * engines identical).
    */
  def htmlTables(html: Column): Column =
    transform(
      regexp_extract_all(html, lit("(?is)<table[^>]*>(.*?)</table>"), lit(1)),
      tbl => transform(
        regexp_extract_all(tbl, lit("(?is)<tr[^>]*>(.*?)</tr>"), lit(1)),
        row => transform(
          regexp_extract_all(row, lit("(?is)<t[dh][^>]*>(.*?)</t[dh]>"), lit(1)),
          cell => htmlText(cell))))

  /** (href, anchor-text) pairs of every <a> tag, in document order —
    * the link-graph feed ([[graft.graph.LinkGraph]] anchors start here).
    * Two aligned extract_all passes over the same tag pattern zipped
    * positionally (one regex, two groups — the counts cannot differ);
    * anchor text is [[htmlText]]-reduced.
    */
  def htmlLinks(html: Column): Column = {
    val tag = "(?is)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>"
    zip_with(
      regexp_extract_all(html, lit(tag), lit(1)),
      transform(regexp_extract_all(html, lit(tag), lit(2)), htmlText(_)),
      (h, t) => struct(h.as("href"), t.as("anchor")))
  }

  /** Canonical form of an absolute http(s) URL — the dedup key:
    *  - scheme and host lowercase;
    *  - default port dropped (http:80, https:443), explicit others kept;
    *  - empty path becomes "/";
    *  - query params: drop `utm_*` trackers, sort the rest bytewise,
    *    rejoin with '&' (no '?' survives an emptied query);
    *  - fragment dropped.
    * Non-URL input (no scheme://host) canonicalizes to NULL — a loud
    * sentinel for the caller's quality gate, not a silent passthrough.
    */
  def canonicalUrl(url: Column): Column = {
    val re = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
    val scheme = lower(regexp_extract(url, re, 1))
    val hostPort = lower(regexp_extract(url, re, 2))
    val path = regexp_extract(url, re, 3)
    val query = regexp_extract(url, re, 4)
    val host = element_at(split(hostPort, ":", 2), 1)
    val port = when(size(split(hostPort, ":", 2)) === 2,
      element_at(split(hostPort, ":", 2), 2)).otherwise(lit(""))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val sortedQ = array_join(array_sort(params), "&")
    val canon = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
    when(scheme === "" || host === "", lit(null).cast("string")).otherwise(canon)
  }
}
