package graft.text

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED inverted text index — the [[graft.ml.AnnIndex]] discipline
  * applied to ranked retrieval: build once, then every query reads ONLY
  * the term buckets it needs. [[graft.curation.Curation.bm25]] recomputes
  * tf/df/stats from the corpus per call (right for one-off analysis); a
  * serving path cannot rescan 100 TB of text per query, so [[build]]
  * materializes the classic IR layout:
  *
  *   - `path/postings/tb=<b>/` — (term, doc_id, dl, tf, df) partitioned
  *     by the term's md5 bucket. df is DENORMALIZED onto each posting
  *     (the index is an immutable snapshot — the Lucene segment model —
  *     so df cannot drift), which keeps the query path join-free.
  *   - `path/stats/` — one (n, avgdl) row.
  *   - `_GRAFT_BUILD_COMPLETE` marker written last (the AnnIndex
  *     discipline: a reader never trusts a partial build).
  *
  * [[query]] prunes partitions to the query terms' buckets (the bucket
  * ids are computed DRIVER-side from the same md5 math — no job), pushes
  * the term equality into the parquet scan, and reruns bm25's exact
  * arithmetic over the posting rows — bit-identical results to the
  * inline form, which is what lets q118's oracle check the round-trip.
  * Per query the work is: one 1-row stats read + a scan of |terms|
  * buckets out of [[Buckets]] — independent of corpus size. Text never
  * appears in the index at all; the biggest column is the term itself.
  */
object InvertedIndex {

  val Buckets = 64
  private val BuildMarker = "_GRAFT_BUILD_COMPLETE"
  private def postingsDir(path: String) = s"$path/postings"
  private def statsDir(path: String) = s"$path/stats"

  /** The term's bucket: top-60-bit md5 prefix mod [[Buckets]] — the
    * repo's content-address discipline, replayed driver-side in
    * [[bucketOf]] for pruning.
    */
  def termBucket(term: Column): Column =
    pmod(conv(substring(md5(term), 1, 15), 16, 10).cast("long"),
      lit(Buckets.toLong))

  /** Driver-side twin of [[termBucket]] (same md5-prefix math). */
  def bucketOf(term: String): Long = {
    val h = Md5Hash.first15(term)
    ((h % Buckets) + Buckets) % Buckets
  }

  def build(spark: SparkSession, docs: DataFrame, path: String,
      textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val toks = TextFunctions.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"), size(toks).as("dl"),
      explode(toks).as("term"))
    val tf = base.groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .withColumn("tb", termBucket(col("term")))
      .write.mode(SaveMode.Overwrite).partitionBy("tb")
      .parquet(postingsDir(path))
    docs.agg(count(lit(1)).as("n"),
        (sum(size(toks)).cast("double") / count(lit(1))).as("avgdl"))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(statsDir(path))
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(root, BuildMarker), true).close()
  }

  /** BM25 top-k over the persisted postings — [[Curation.bm25]]'s exact
    * arithmetic (log-free idf, decimal-cast contributions so the
    * reduction is order-independent), reading only the query terms'
    * buckets.
    */
  def query(spark: SparkSession, path: String, terms: Seq[String],
      topK: Int = 15, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(root, BuildMarker)),
      s"no build marker at $path — refusing to query a partial index")
    val st = spark.read.parquet(statsDir(path)).head()
    val n = st.getLong(0)
    val avgdl = st.getDouble(1)
    val buckets = terms.map(bucketOf).distinct
    val p = spark.read.parquet(postingsDir(path))
      .filter(col("tb").isin(buckets: _*) && col("term").isin(terms: _*))
    val tfD = col("tf").cast("double")
    val idf = ((lit(n) - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val denom = tfD + lit(k1) *
      (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / lit(avgdl)))
    val contrib = idf * ((tfD * lit(k1 + 1.0)) / denom)
    p.select(col("doc_id"), contrib.cast("decimal(24,10)").as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("matched_terms"),
        sum(col("c")).cast("double").as("score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(topK)
  }
}
