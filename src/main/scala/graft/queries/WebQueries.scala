package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.WarcCodec
import graft.text.WebText
import Qx.t

/** The WEB-INGESTION tier — the CommonCrawl-shaped front of an LLM data
  * pipeline, which the engine's curation chain (CCNet/dedup/decon) so far
  * assumed away: WARC container parsing (q252), HTML boilerplate
  * extraction (q253), URL canonicalization (q254), and the composed
  * crawl-to-curation chain as one plan (q255). Container synthesis is
  * closed-form in doc_id (the q194 discipline), so every oracle either
  * predicts the facts without parsing a byte (q252) or replays the
  * EXACT extraction rules on the same source string (q253-q255) — the
  * regex chains are chosen for engine-identical semantics and the
  * Scala template constants are interpolated into BOTH faces so they
  * cannot drift.
  *
  * 100 TB shape: WARC files arrive as whole-file rows (Spark's
  * binaryFile source at scale); record framing, gzip member chaining,
  * HTTP splitting and text extraction all run ROW-LOCAL inside the scan
  * stage — payloads never shuffle; only (bucket, host, narrow counts)
  * rows reach an exchange. Extraction and canonicalization are built-in
  * expression chains (codegen'd, no UDF), so they ride whole-stage
  * codegen inside the same stage.
  */
object WebQueries {

  // the synthetic page template — interpolated into Spark AND DuckDB
  // faces (no apostrophes: the string embeds into SQL literals verbatim)
  private val PreA = "<html><head><title>Doc "
  private val PreB = "</title><style a=\"b\">body{color:#000}</style>" +
    "<script type=\"text/javascript\">var x = 1 < 2;</script></head>" +
    "<body><nav><a href=\"/home\">Home</a> | <a href=\"/about\">About</a>" +
    "</nav><h1>Doc "
  private val PreC = "</h1><p>"
  private val Post = "</p><footer>&copy; 2026 Example &amp; Sons " +
    "&lt;contact&gt;</footer></body></html>"

  private def htmlOf(id: Long, text: String): String =
    PreA + id + PreB + id + PreC + text + Post

  /** The same page, built in DuckDB. */
  private val duckHtml =
    s"'$PreA' || doc_id || '$PreB' || doc_id || '$PreC' || text || '$Post'"

  /** The q253 extraction chain, replayed in DuckDB on expression `x` —
    * regex-for-regex identical to [[WebText.htmlText]] (explicit
    * whitespace class; amp decodes last).
    */
  private def duckExtract(x: String): String = {
    val noScript = s"regexp_replace($x, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    val noTags = s"regexp_replace($noStyle, '<[^>]*>', ' ', 'g')"
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (f, r)) => s"replace($c, '$f', '$r')" }
    s"trim(regexp_replace($ent, '[ \\t\\n\\r\\f]+', ' ', 'g'))"
  }

  val all: Seq[Q] = Seq(

    // ---- WARC container ingest ---------------------------------------------
    // Documents are packed 25-per-file into real WARC/1.0 containers
    // (warcinfo + one HTTP-response record per page; odd buckets gzip
    // one member PER RECORD — the CommonCrawl layout, so gzip member
    // chaining is exercised by construction, not just by the spec).
    // Parsing honors Content-Length framing (bodies may contain
    // anything), and the oracle predicts every fact — record counts,
    // exact HTML byte totals, distinct hosts — in closed form from
    // doc_id without touching a byte of container.
    Q("q252_warc_ingest",
      (s, dir) => {
        import s.implicits._
        val files = t(s, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .groupByKey(_._1 / 25)
          .mapGroups { (bucket, it) =>
            val pages = it.toSeq.sortBy(_._1).map { case (id, text) =>
              (s"https://www.example${id % 7}.com/p/$id",
                htmlOf(id, text).getBytes("UTF-8"))
            }
            (bucket, WarcCodec.encode(pages, gzipped = bucket % 2 == 1))
          }
        files.flatMap { case (bucket, bytes) =>
          WarcCodec.records(bytes).map { r =>
            val bodyBytes =
              if (r.warcType == "response") WarcCodec.http(r.payload).body.length.toLong
              else 0L
            (bucket, r.warcType, bodyBytes, r.targetUri)
          }
        }.toDF("bucket", "wtype", "body_bytes", "uri")
          .groupBy("bucket")
          .agg(count(lit(1)).as("records"),
            sum(when(col("wtype") === "response", 1L).otherwise(0L)).as("responses"),
            sum("body_bytes").as("html_bytes"),
            countDistinct(when(col("wtype") === "response",
              regexp_extract(col("uri"), "://([^/]+)/", 1))).as("hosts"))
          .orderBy("bucket")
      },
      Some(s"""
        SELECT doc_id // 25 AS bucket,
          COUNT(*) + 1 AS records,
          COUNT(*) AS responses,
          CAST(SUM(strlen($duckHtml)) AS BIGINT) AS html_bytes,
          CAST(COUNT(DISTINCT doc_id % 7) AS BIGINT) AS hosts
        FROM documents GROUP BY 1 ORDER BY 1"""))
    ,

    // ---- HTML boilerplate extraction ---------------------------------------
    // The first transform of every crawl-derived corpus: visible text
    // out of markup. Script/style subtrees drop, tags become spaces
    // (word boundaries preserved), the named entities decode (amp LAST —
    // the double-escape rule), whitespace collapses. Pure built-in
    // regexp_replace chain (codegen'd, constant depth); the oracle
    // replays the identical chain on the identical template, so one
    // divergent regex semantics flips every hash.
    Q("q253_html_extract",
      (s, dir) => {
        val html = concat(lit(PreA), col("doc_id").cast("string"), lit(PreB),
          col("doc_id").cast("string"), lit(PreC), col("text"), lit(Post))
        t(s, dir, "documents")
          .select(col("doc_id"), WebText.htmlText(html).as("x"))
          .select(col("doc_id"),
            length(col("x")).cast("long").as("n_chars"),
            md5(col("x")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some(s"""
        SELECT doc_id,
          CAST(length(${duckExtract(duckHtml)}) AS BIGINT) AS n_chars,
          md5(${duckExtract(duckHtml)}) AS text_md5
        FROM documents ORDER BY doc_id"""))
    ,

    // ---- URL canonicalization ----------------------------------------------
    // The dedup key for URL-level exact dedup: lowercase scheme/host,
    // scheme-conditional default-port drop (http:80 / https:443 — the
    // synthesis plants MISMATCHED pairs like https://...:80 that must
    // keep their port), utm_* trackers dropped, surviving params sorted,
    // fragment dropped, empty path -> '/', path case PRESERVED. Both
    // faces synthesize the same messy URL from doc_id and canonicalize
    // independently.
    Q("q254_url_canonicalize",
      (s, dir) => {
        val id = col("doc_id")
        val scheme = when(id % 2 === 0, "HTTP").otherwise("https")
        val port = when(id % 3 === 0, ":80")
          .when(id % 5 === 0, ":443").otherwise("")
        val path = when(id % 11 === 0, "")
          .otherwise(concat(lit("/P/"), id.cast("string")))
        val url = concat(scheme, lit("://WWW.Example"), (id % 7).cast("string"),
          lit(".COM"), port, path,
          lit("?b="), (id % 4).cast("string"),
          lit("&utm_source=feed&a="), (id % 3).cast("string"),
          lit("&utm_medium=x#sec"), (id % 2).cast("string"))
        t(s, dir, "documents")
          .select(col("doc_id"), url.as("url"),
            WebText.canonicalUrl(url).as("canonical"))
          .orderBy("doc_id")
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
            (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
              || '://WWW.Example' || (doc_id % 7) || '.COM'
              || (CASE WHEN doc_id % 3 = 0 THEN ':80'
                       WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
              || (CASE WHEN doc_id % 11 = 0 THEN ''
                       ELSE '/P/' || doc_id END)
              || '?b=' || (doc_id % 4) || '&utm_source=feed&a='
              || (doc_id % 3) || '&utm_medium=x#sec' || (doc_id % 2) AS url
          FROM documents),
        parts AS (
          SELECT doc_id, url,
            lower(regexp_extract(url,
              '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 1)) AS scheme,
            lower(regexp_extract(url,
              '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 2)) AS hostport,
            regexp_extract(url,
              '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 3) AS path,
            regexp_extract(url,
              '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 4) AS query
          FROM u),
        hp AS (
          SELECT *, string_split(hostport, ':') AS hpl FROM parts),
        norm AS (
          SELECT doc_id, url, scheme, path, query,
            hpl[1] AS host,
            CASE WHEN len(hpl) = 2 THEN hpl[2] ELSE '' END AS port
          FROM hp),
        q AS (
          SELECT *,
            array_to_string(list_sort(list_filter(string_split(query, '&'),
              p -> p <> '' AND substr(p, 1, 4) <> 'utm_')), '&') AS sq
          FROM norm)
        SELECT doc_id, url,
          CASE WHEN scheme = '' OR host = '' THEN NULL
               ELSE scheme || '://' || host
                 || (CASE WHEN port <> ''
                          AND NOT (scheme = 'http' AND port = '80')
                          AND NOT (scheme = 'https' AND port = '443')
                     THEN ':' || port ELSE '' END)
                 || (CASE WHEN path = '' THEN '/' ELSE path END)
                 || (CASE WHEN sq = '' THEN '' ELSE '?' || sq END)
          END AS canonical
        FROM q ORDER BY doc_id"""))
    ,

    // ---- the composed crawl chain: WARC -> extract -> canonical host ------
    // One plan from container bytes to per-host curation stats — the
    // front half of the pipeline q191's CCNet chain starts AFTER. Every
    // stage is the already-oracled operator (q252 framing, q253
    // extraction, q254 canonicalization) composed row-local; only the
    // final (host, counts) rows shuffle. The oracle rebuilds the same
    // pages in SQL and replays extraction + host derivation.
    Q("q255_crawl_chain",
      (s, dir) => {
        import s.implicits._
        val files = t(s, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .groupByKey(_._1 / 25)
          .mapGroups { (bucket, it) =>
            val pages = it.toSeq.sortBy(_._1).map { case (id, text) =>
              (s"HTTPS://WWW.Example${id % 7}.COM:443/p/$id?utm_source=x&q=${id % 3}",
                htmlOf(id, text).getBytes("UTF-8"))
            }
            (bucket, WarcCodec.encode(pages, gzipped = bucket % 2 == 1))
          }
        val pages = files.flatMap { case (_, bytes) =>
          WarcCodec.records(bytes).collect {
            case r if r.warcType == "response" =>
              (r.targetUri, new String(WarcCodec.http(r.payload).body, "UTF-8"))
          }
        }.toDF("uri", "html")
        pages
          .select(
            regexp_extract(WebText.canonicalUrl(col("uri")),
              "^[a-z.+-]+://([^/:?#]+)", 1).as("host"),
            WebText.htmlText(col("html")).as("x"))
          .groupBy("host")
          .agg(count(lit(1)).as("docs"),
            sum(size(split(col("x"), " "))).cast("long").as("tokens"),
            sum(length(col("x"))).cast("long").as("chars"))
          .orderBy("host")
      },
      Some(s"""
        WITH x AS (
          SELECT 'www.example' || (doc_id % 7) || '.com' AS host,
            ${duckExtract(duckHtml)} AS x
          FROM documents)
        SELECT host, COUNT(*) AS docs,
          CAST(SUM(len(string_split(x, ' '))) AS BIGINT) AS tokens,
          CAST(SUM(length(x)) AS BIGINT) AS chars
        FROM x GROUP BY 1 ORDER BY 1"""))
  )
}
