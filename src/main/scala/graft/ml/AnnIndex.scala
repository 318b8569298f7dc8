package graft.ml

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF×PQ index layout — the operationalization of the q148
  * composition: q148 (and the oracle that checks it) deliberately times
  * train + encode + query in one plan, but a production deployment builds
  * the index ONCE and amortizes it across every query. This object is
  * that split, with the layout chosen so the FILE SYSTEM enforces the IVF
  * contract:
  *
  *  - [[build]] trains the coarse codebook ([[KMeans.fitCodebook]]) and
  *    the PQ sub-codebooks ([[Pq.fit]]), encodes every vector to
  *    (vec_id, codes, cell), and writes the rows `partitionBy(cell)` —
  *    one directory per inverted list. Codebooks land beside the index
  *    as tiny parquet sidecars.
  *  - [[query]] loads the sidecar codebooks (k×dim — bounded by
  *    construction), ranks the coarse centroids against the query vector
  *    (a pushed-down point lookup of one embeddings row), collects the
  *    `nprobe` probe cells (bounded), and scans ONLY those cells'
  *    directories via partition pruning (`PartitionFilters` on `cell` —
  *    plan-asserted in AnnIndexSpec). The float corpus is never read at
  *    query time; the ADC scan touches nprobe/ncells of the CODE data by
  *    file layout, not by filter luck.
  *
  * Same arithmetic as q148 end to end (training, assignment, encoding,
  * ADC fold), so a built-index query is hash-exact against q148's oracle
  * — q154 proves it.
  */
object AnnIndex {

  final case class Codebooks(
      coarse: Seq[(Long, Seq[Double], Double)],
      pq: Seq[Pq.SubCodebook])

  private def indexDir(path: String) = s"$path/index"
  private def coarseDir(path: String) = s"$path/codebook_coarse"
  private def pqDir(path: String) = s"$path/codebook_pq"

  /** Train + encode + write the index at `path` (overwrites). */
  def build(spark: SparkSession, vecs: DataFrame, path: String,
      k: Int = 16, iters: Int = 2, m: Int = 4, pqK: Int = 4): Codebooks = {
    import spark.implicits._
    VecOps.register(spark)
    val coarse = KMeans.fitCodebook(spark, vecs, k = k, iters = iters)
    val cbs = Pq.fit(spark, vecs, m = m, k = pqK, iters = iters)
    val clean = vecs.filter(col("embedding").isNotNull)
    Pq.encode(clean, cbs)
      .withColumn("v_nrm", VecOps.norm(col("embedding")))
      .withColumn("cell", VecOps.argmaxCell(col("embedding"), col("v_nrm"), coarse))
      .select(col("vec_id"), col("codes"), col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(indexDir(path))
    coarse.toDF("c_id", "centroid", "c_nrm")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(coarseDir(path))
    cbs.zipWithIndex
      .flatMap { case (cb, mi) => cb.zipWithIndex.map { case (c, ci) => (mi, ci, c) } }
      .toDF("m", "c_id", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(pqDir(path))
    Codebooks(coarse, cbs)
  }

  /** Index maintenance: encode NEW vectors under the SAVED codebooks and
    * append them to their cell directories — no retraining, no rewrite of
    * existing lists (dynamic-partition append touches only the arriving
    * cells' directories). This is the ingest-time operation a live corpus
    * needs; retrain + [[build]] periodically when drift accumulates
    * (recall is re-measured by the q149-style check either way).
    */
  def append(spark: SparkSession, vecs: DataFrame, path: String): Unit = {
    VecOps.register(spark)
    val cb = loadCodebooks(spark, path)
    val clean = vecs.filter(col("embedding").isNotNull)
    Pq.encode(clean, cb.pq)
      .withColumn("v_nrm", VecOps.norm(col("embedding")))
      .withColumn("cell", VecOps.argmaxCell(col("embedding"), col("v_nrm"), cb.coarse))
      .select(col("vec_id"), col("codes"), col("cell"))
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(indexDir(path))
  }

  /** Load the sidecar codebooks (bounded: k coarse rows + m×pqK PQ rows). */
  def loadCodebooks(spark: SparkSession, path: String): Codebooks = {
    val coarse = spark.read.parquet(coarseDir(path))
      .select("c_id", "centroid", "c_nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val pqRows = spark.read.parquet(pqDir(path))
      .select("m", "c_id", "centroid").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val pq = pqRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toSeq }
    Codebooks(coarse, pq)
  }

  /** ADC top-k against the built index for query vector `qid` of `vecs`
    * (read through two pushed-down point lookups — the corpus itself is
    * never scanned). Output matches q148: (vec_id, cell, codes, adc_dist).
    */
  def query(spark: SparkSession, vecs: DataFrame, path: String,
      qid: Long, nprobe: Int, topK: Int): DataFrame = {
    VecOps.register(spark)
    val cb = loadCodebooks(spark, path)
    import spark.implicits._
    // rank the coarse centroids against the query vector; keep nprobe
    // cells — a driver-side bounded collect (nprobe rows)
    val cbDf = cb.coarse.toDF("c_id", "c_emb", "c_nrm")
    val probeCells = vecs.filter(col("vec_id") === qid)
      .select(col("embedding").as("q_emb"),
        VecOps.norm(col("embedding")).as("q_nrm"))
      .crossJoin(broadcast(cbDf))
      .withColumn("c_sim",
        VecOps.dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .orderBy(desc("c_sim"), col("c_id"))
      .limit(nprobe)
      .select(col("c_id")).collect().map(_.getLong(0)).toSeq
    val q = vecs.filter(col("vec_id") === qid && col("embedding").isNotNull)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    // the probed cells become PARTITION filters: only their directories
    // are listed and read
    spark.read.parquet(indexDir(path))
      .filter(col("cell").isInCollection(probeCells) && col("vec_id") =!= qid)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        concat_ws("|", col("codes")).as("codes"),
        Pq.adcDist(Pq.adcTable(q, cb.pq)).as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(topK)
  }
}
