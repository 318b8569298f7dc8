package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, quality metrics, fingerprinting, and the
  * hash machinery behind MinHash/SimHash dedup. Everything is a pure
  * `Column` function (higher-order array functions, no UDFs) so each doc is
  * processed row-local inside codegen — the only shuffles in the dedup
  * pipelines are the final candidate-pair joins.
  *
  * Hashes are built from `md5` hex substrings rather than murmur3 so results
  * are engine-portable (the DuckDB oracle mirrors them exactly).
  */
object TextFunctions {

  /** Whitespace tokenization (the "whitespace" token counter). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — a cheap proxy for subword token counts.
    */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Word k-shingles as space-joined strings; empty array when the doc has
    * fewer than k tokens.
    *
    * Implementation note: built by zipping k shifted slices rather than
    * `transform(sequence(...), i -> element_at(toks, i+j))` — higher-order
    * lambdas are interpreted (no codegen), so an outer column expression
    * referenced inside one is RE-EVALUATED per element; with `toks` being a
    * regex split that made shingling O(tokens²) per doc. The zip form only
    * touches the lambda variable, so the split runs k times per row, not
    * k times per shingle.
    */
  def shingles(toks: Column, k: Int): Column = {
    val zipped = arrays_zip((0 until k).map(j => slice(toks, lit(j + 1), size(toks))): _*)
    val joined = transform(zipped,
      x => concat_ws(" ", (0 until k).map(j => x.getField(j.toString)): _*))
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(slice(joined, lit(1), size(toks) - (k - 1)))
  }

  /** One MinHash signature component: min over shingles of a seeded,
    * engine-portable hash (first 16 md5 hex chars of "seed#shingle").
    */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, sh => substring(md5(concat(lit(s"$seed#"), sh)), 1, 16)))

  /** 60-bit token hash: first 15 md5 hex chars parsed as an integer —
    * fits a signed long, mirrors DuckDB's CAST('0x'||hex AS BIGINT).
    */
  def tokenHash60(tok: Column): Column =
    TextSketch.md5PrefixLong(tok, 15)

  /** 60-bit SimHash over a token array — computed entirely row-local via
    * higher-order functions (no explode/groupBy): for each bit, tokens
    * vote +1/-1 by their hash bit; the fingerprint takes the majority sign
    * (ties → 1).
    */
  def simhash60(toks: Column): Column = {
    val hashes = transform(toks, tokenHash60(_))
    val n = size(hashes)
    val terms: Seq[Column] = (0 until 60).map { b =>
      val ones = size(filter(hashes, h => shiftright(h, b).bitwiseAND(1) === 1))
      when(ones * 2 >= n, lit(1L << b)).otherwise(0L)
    }
    terms.reduce(_ + _)
  }

  /** Document fingerprint: md5 of the normalized text (lowercased,
    * whitespace collapsed to single spaces, trimmed).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact Jaccard over two shingle arrays via the inclusion–exclusion
    * size formula (set semantics, engine-portable).
    */
  def jaccard(a: Column, b: Column): Column = {
    val da = size(array_distinct(a))
    val db = size(array_distinct(b))
    val du = size(array_distinct(concat(a, b)))
    when(du === 0, 0.0).otherwise((da + db - du).cast("double") / du)
  }

  private val stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Stopword count over a token array. */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, tk => tk.isin(stopwords: _*)))

  /** Quality score in [0,1]: blended length/word-shape/stopword signals,
    * the shape of the reference-era heuristic quality filters.
    */
  def qualityFeatures(text: Column): (Column, Column, Column, Column) = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nChar = length(text)
    val avgWordLen = (nChar - nTok + 1).cast("double") / nTok
    val stopRatio = stopwordCount(toks).cast("double") / nTok
    (nTok, nChar, avgWordLen, stopRatio)
  }
}
