package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.clean.CleanFunctions.formatTimestamp

/** Bronze (raw) layer — the reference's per-dataset Mongo collections
  * (`healthcenter-data-{district}-{sector}-{year}` + `*_metadata` siblings,
  * health_center_lab__data_upload_views.py:19-29, 92-106) become ONE
  * parquet table partitioned by the same fields the reference bakes into
  * collection names. Collection-name filtering turns into partition
  * pruning; the metadata sibling becomes a tiny `_meta` table derived at
  * ingest.
  *
  * Scale: partition columns (dataset, district, sector, year) keep
  * per-partition file counts bounded and make the dominant access pattern
  * (district/sector/year slices) a metadata-only prune — no data read for
  * non-matching slices, which is what replaces the reference's "early
  * metadata filtering before data fetch" (SURVEY.md §4).
  */
object Bronze {

  val metadataColumns: Seq[String] =
    Seq("_upload_id", "_dataset_name", "_district", "_sector", "_year", "_upload_time")

  /** Stamp upload-lineage metadata columns (the `_`-prefixed fields the
    * reference's upload views inject) and append into the partitioned
    * bronze table.
    */
  def ingest(df: DataFrame, bronzeDir: String, datasetName: String,
      district: String, sector: String, year: Int): Unit = {
    // ONE id per ingest call (the reference injects one upload id per
    // request): a per-row uuid() would make "the rows of upload X"
    // unidentifiable for audit/rollback
    val uploadId = java.util.UUID.randomUUID().toString
    val stamped = df
      .withColumn("_upload_id", lit(uploadId))
      .withColumn("_dataset_name", lit(datasetName))
      .withColumn("_district", lit(district.toLowerCase))
      .withColumn("_sector", lit(sector.toLowerCase))
      .withColumn("_year", lit(year))
      .withColumn("_upload_time", formatTimestamp(current_timestamp()))
    stamped.write
      .mode("append")
      .partitionBy("_dataset_name", "_district", "_sector", "_year")
      .parquet(bronzeDir)
  }

  /** The signature-store sibling of a bronze documents table. */
  def signatureDir(bronzeDir: String): String = s"${bronzeDir}_sigs"

  /** Document-corpus ingest: append the batch into bronze AND upsert its
    * MinHash signatures into the store sibling, so incremental near-dup
    * ([[graft.curation.Curation.incrementalNearDup]]) later reads stored
    * (doc_id, sig) rows — ingest is the LAST time this text is scanned
    * for dedup purposes. Signatures are keyed-upserted, so re-ingesting a
    * doc_id refreshes its signature instead of duplicating it.
    *
    * @return the signature upsert's accounting (inserted = new doc ids,
    *   updated = re-ingested ids whose signature was refreshed)
    */
  def ingestDocuments(df: DataFrame, bronzeDir: String, datasetName: String,
      district: String, sector: String, year: Int,
      idCol: String = "doc_id", textCol: String = "text"): graft.io.Writers.UpsertStats = {
    ingest(df, bronzeDir, datasetName, district, sector, year)
    val sigs = graft.curation.Curation.minhashSignatures(df, idCol, textCol)
    graft.io.Writers.upsertPath(
      df.sparkSession, sigs, signatureDir(bronzeDir), Seq("doc_id"))
  }

  /** Read a bronze slice; the filters land on partition columns so Spark
    * prunes directories without reading data files.
    */
  def read(spark: SparkSession, bronzeDir: String,
      datasetName: Option[String] = None,
      district: Option[String] = None,
      sector: Option[String] = None,
      years: Seq[Int] = Nil): DataFrame = {
    val base = spark.read.parquet(bronzeDir)
    Seq(
      datasetName.map(col("_dataset_name") === _),
      district.map(d => col("_district") === d.toLowerCase),
      sector.map(x => col("_sector") === x.toLowerCase),
      Option(years).filter(_.nonEmpty).map(ys => col("_year").isin(ys: _*)))
      .flatten.foldLeft(base)(_ filter _)
  }

  /** The `*_metadata` sibling documents as a derived table: per partition,
    * record count + column inventory (metadata doc parity, upload views
    * :92-106).
    */
  def metaTable(spark: SparkSession, bronzeDir: String): DataFrame = {
    val df = spark.read.parquet(bronzeDir)
    val dataCols = df.columns.filterNot(metadataColumns.contains)
    df.groupBy("_dataset_name", "_district", "_sector", "_year")
      .agg(count(lit(1)).as("records_count"),
        max("_upload_time").as("last_upload_time"))
      .withColumn("columns", typedLit(dataCols.toSeq))
  }
}
