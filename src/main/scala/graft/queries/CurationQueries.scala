package graft.queries

import Qx._

/** Second wave of training-data curation operators: chunk-level exact
  * dedup (sub-document granularity — the unit modern pipelines dedup at),
  * an ordered quality-filter cascade with first-fail attribution (the
  * funnel report every curation run ships with), BM25 ranked retrieval
  * (corpus search for inspection/decontamination triage), and
  * deterministic stratified sampling (fixed-size per-stratum draws for
  * eval sets).
  *
  * The Spark side of every entry delegates to the PUBLIC
  * [[graft.curation.Curation]] API (column-parameterized, reusable over
  * any corpus schema); this module contributes the testdata bindings and
  * the DuckDB oracle mirrors. Scale notes live with the API; the common
  * theme is that document text never shuffles — only 32-char hashes,
  * token keys, and ids do.
  */
object CurationQueries {

  private val duckTokens = "string_split_regex(trim(text), '\\s+')"

  val all: Seq[Q] = Seq(

    // ---- chunk-level exact dedup ------------------------------------------
    // Documents are chunked into consecutive non-overlapping 20-token
    // windows; a chunk is duplicated when its text occurs anywhere else in
    // the corpus (same doc or not). Per-source report: total docs, chunks,
    // duplicated chunks, and docs where >= half the chunks are duplicated
    // (the "mostly boilerplate" flag). Sub-document dedup catches shared
    // headers/footers that document-fingerprint dedup (q31/q34) misses.
    //
    // 100 TB shape: chunking and hashing are row-local in the scan stage;
    // what shuffles is (doc_id, source, md5) — never text. The global
    // multiplicity comes from a count window over the md5 partition, so
    // the corpus text is scanned + chunked ONCE (a groupBy-count + join
    // formulation would re-read and re-hash every document for the count
    // branch — 2x the scan cost at 100 TB for the same one shuffle).
    // Integer threshold math (dup*2 >= chunks) keeps the oracle exact.
    Q("q116_chunk_dedup",
      (s, dir) => graft.curation.Curation.chunkDedupReport(t(s, dir, "documents")),
      Some(s"""
        WITH w AS (
          SELECT doc_id, source, $duckTokens AS w FROM documents),
        ch AS (
          SELECT doc_id, source,
            unnest(list_transform(generate_series(0, len(w)//20 - 1),
              i -> md5(array_to_string(w[i*20+1 : i*20+20], ' ')))) AS h
          FROM w),
        cn AS (SELECT doc_id, source,
                 COUNT(*) OVER (PARTITION BY h) AS cnt FROM ch),
        per_doc AS (
          SELECT doc_id, source, COUNT(*) AS chunks,
            SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS dup
          FROM cn GROUP BY 1, 2),
        per_src AS (
          SELECT source, SUM(chunks) AS pc, SUM(dup) AS pd,
            SUM(CASE WHEN dup * 2 >= chunks THEN 1 ELSE 0 END) AS pf
          FROM per_doc GROUP BY 1),
        src AS (SELECT source, COUNT(*) AS docs FROM documents GROUP BY 1)
        SELECT src.source, src.docs,
          CAST(COALESCE(pc, 0) AS BIGINT) AS total_chunks,
          CAST(COALESCE(pd, 0) AS BIGINT) AS dup_chunks,
          CAST(COALESCE(pf, 0) AS BIGINT) AS flagged_docs
        FROM src LEFT JOIN per_src USING (source) ORDER BY source"""))
    ,

    // ---- quality-filter cascade with first-fail attribution ---------------
    // C4/Gopher-style rule battery applied as an ORDERED cascade: each doc
    // is attributed to the FIRST rule it fails (or 'kept'), and the report
    // is the survival funnel — stage, docs dropped there, survivors after.
    // That attribution/funnel view (not just per-rule booleans — q33/q104
    // cover those) is what curation runs publish to compare pipelines.
    //
    // All five features come from ONE token explode + two-level keyed agg
    // (same shape as the Gopher filter q104): per-(doc, token) counts,
    // then per-doc n/vocab/max-single/stopword sums — narrow longs all the
    // way, text never leaves the scan stage. Thresholds are integer
    // cross-multiplications (dup of the published ratio rules) so the
    // DuckDB mirror is exact with no float boundary risk.
    Q("q117_filter_funnel",
      (s, dir) => graft.curation.Curation.filterFunnel(t(s, dir, "documents")),
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest($duckTokens) AS tok FROM documents),
        tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        feats AS (
          SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS vocab, MAX(cnt) AS max_single,
            SUM(CASE WHEN tok IN ('the','a','of','and','in','to','is')
                THEN cnt ELSE 0 END) AS stop_cnt
          FROM tc GROUP BY 1),
        staged AS (
          SELECT CASE WHEN n < 15 THEN 1 WHEN n > 95 THEN 2
                      WHEN max_single * 5 > n THEN 3
                      WHEN vocab * 5 < n * 2 THEN 4
                      WHEN stop_cnt * 50 < n THEN 5 ELSE 6 END AS stage,
                 CASE WHEN n < 15 THEN 'too_short' WHEN n > 95 THEN 'too_long'
                      WHEN max_single * 5 > n THEN 'repetitive'
                      WHEN vocab * 5 < n * 2 THEN 'low_vocab'
                      WHEN stop_cnt * 50 < n THEN 'low_stopword'
                      ELSE 'kept' END AS rule
          FROM feats),
        funnel AS (
          SELECT stage, rule,
            CASE WHEN rule = 'kept' THEN 0 ELSE COUNT(*) END AS dropped
          FROM staged GROUP BY 1, 2)
        SELECT CAST(stage AS BIGINT) AS stage, rule,
          CAST(dropped AS BIGINT) AS dropped,
          CAST((SELECT COUNT(*) FROM documents)
            - SUM(dropped) OVER (ORDER BY stage
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS survivors_after
        FROM funnel ORDER BY stage"""))
    ,

    // ---- BM25 ranked retrieval --------------------------------------------
    // Top-15 documents for the query {spark, window, hash} under BM25
    // (k1 = 1.2, b = 0.75) with the log-free idf weight
    // (N - df + 0.5)/(df + 0.5) — a strictly monotone transform of the
    // classic log idf, chosen because every arithmetic op is then an IEEE
    // +|*|/ that both engines round identically (ln() is only
    // 1-ulp-accurate and engine-specific, which would break the driver's
    // hash compare). Per-term contributions are cast to DECIMAL(24,10)
    // before the per-doc sum so the reduction is associative — a raw
    // double sum would depend on partition order.
    //
    // 100 TB shape: tokens are filtered to the query terms INSIDE the
    // row-local lambda, so only (doc_id, dl, term) rows for matching terms
    // reach the exchange — the corpus itself never shuffles. df (3 rows)
    // and the corpus stats (1 row) are broadcast.
    // k1+1.0 and 1.0-b fold to exactly the 2.2 / 0.25 literals the
    // oracle spells (verified IEEE identities), so the generic API stays
    // hash-exact under the gate
    Q("q118_bm25",
      (s, dir) => graft.curation.Curation.bm25(
        t(s, dir, "documents"), Seq("spark", "window", "hash")),
      Some(s"""
        WITH tk AS (
          SELECT doc_id, len($duckTokens) AS dl,
            unnest(list_filter($duckTokens,
              t -> t IN ('spark', 'window', 'hash'))) AS term
          FROM documents),
        tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2, 3),
        stats AS (
          SELECT COUNT(*) AS n,
            CAST(SUM(len($duckTokens)) AS DOUBLE) / COUNT(*) AS avgdl
          FROM documents),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        contrib AS (
          SELECT doc_id,
            CAST(((CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
              * ((CAST(tf AS DOUBLE) * 2.2)
                 / (CAST(tf AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
              AS DECIMAL(24,10)) AS c
          FROM tf JOIN df USING (term), stats)
        SELECT doc_id, COUNT(*) AS matched_terms, CAST(SUM(c) AS DOUBLE) AS score
        FROM contrib GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 15"""))
    ,

    // ---- deterministic stratified sampling --------------------------------
    // Fixed-size per-stratum draw: 20 docs per language, selected by
    // ranking on md5(doc_id) — an engine-independent, content-addressed
    // order (same property as the q30b hash split), so the sample is
    // reproducible across engines, runs, and cluster sizes. This is the
    // eval-set / human-inspection draw every curation pipeline needs.
    //
    // 100 TB shape: the projection narrows to (lang, doc_id, n_chars)
    // BEFORE the window, so the per-stratum sort shuffles ids, not text.
    // With heavier strata, swap the window for ops.TopKPerGroup (the
    // partial-aggregating top-k used by q67), which caps per-partition
    // state at k rows; at 5 strata x 20 rows the window is already tiny.
    Q("q119_stratified_sample",
      (s, dir) => graft.curation.Curation.stratifiedSample(
        t(s, dir, "documents"), "lang", 20, carryCols = Seq("n_chars")),
      Some("""
        SELECT lang, rk, doc_id, n_chars FROM (
          SELECT lang, doc_id, n_chars,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents)
        WHERE rk <= 20 ORDER BY lang, rk"""))
    ,

    // ---- training-shard packing -------------------------------------------
    // Pack documents into ~2000-token shards per language: docs are laid
    // out in the deterministic md5(doc_id) order and a shard boundary
    // falls every 2000 tokens of running offset (a doc belongs to the
    // shard its FIRST token lands in). The report is per-shard fill —
    // docs and tokens — which is what a dataloader needs to size epochs
    // and what makes packing reproducible across engines and runs.
    //
    // 100 TB shape: the running offset is a window cumsum partitioned by
    // language over (lang, doc_id, n) — token counts come from one
    // row-local pass in the scan stage and only those narrow triples
    // shuffle. A GLOBAL pack order would serialize on one partition; the
    // per-stratum partitioning is what keeps every stream independent (at
    // real scale the stratum key gains a hash-bucket component, same as
    // q30b, so each packer sees bounded data). Shard ids use integer
    // division of exact long offsets — no float boundary risk.
    Q("q120_shard_pack",
      (s, dir) => graft.curation.Curation.packShards(t(s, dir, "documents")),
      Some(s"""
        WITH d AS (
          SELECT lang, doc_id, len($duckTokens) AS n FROM documents),
        c AS (
          SELECT lang, doc_id, n,
            SUM(n) OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM d)
        SELECT lang, CAST((cum - n) // 2000 AS BIGINT) AS shard,
          COUNT(*) AS docs, CAST(SUM(n) AS BIGINT) AS tokens
        FROM c GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
