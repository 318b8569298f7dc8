package graft.ml

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The persisted-index contract: a built index round-trips q148's exact
  * results, and the QUERY path touches (a) the index with partition
  * pruning on the probed cells and (b) the embeddings table only through
  * pushed-down point lookups — never a full float-corpus scan.
  */
class AnnIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("ann_index_spec").toString
    AnnIndex.build(spark, spark.read.parquet(s"$dir/embeddings.parquet"), p)
    p
  }

  test("built-index query equals the train-inline composition (q148)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val fromIndex = AnnIndex.query(spark, e, path, qid = 42, nprobe = 2, topK = 10)
      .collect().map(_.toString).toSeq
    val inline = SparkEntry.queries("q148_ivf_pq_trained")(spark, dir)
      .collect().map(_.toString).toSeq
    assert(fromIndex == inline)
  }

  test("query path prunes index partitions by cell and never scans the float corpus") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val plan = AnnIndex.query(spark, e, path, qid = 42, nprobe = 2, topK = 10)
      .queryExecution.executedPlan
    val fileScans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // exactly one scan: the index, with the probed cells as PARTITION
    // filters (the embeddings point lookups were collected at plan-build
    // time, not joined into this plan)
    assert(fileScans.size == 1, s"expected one index scan, got ${fileScans.size}")
    val idx = fileScans.head
    assert(idx.metadata.get("PartitionFilters").exists(_.contains("cell")),
      s"probe cells must prune partitions; metadata: ${idx.metadata.get("PartitionFilters")}")
    assert(!idx.schema.fieldNames.contains("embedding"),
      "the index scan must read codes, never float vectors")
  }

  test("append encodes under the SAVED codebooks: split build+append == full build") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    // full build on the whole corpus = ground truth layout
    val fullPath = java.nio.file.Files.createTempDirectory("ann_full").toString
    AnnIndex.build(spark, e, fullPath)
    // same codebooks (training sees the full corpus both times), but the
    // second half of the rows arrives through append()
    val splitPath = java.nio.file.Files.createTempDirectory("ann_split").toString
    val built = AnnIndex.build(spark, e.filter(col("vec_id") < 250), splitPath)
    // overwrite sidecars with the FULL-corpus codebooks so assignment
    // matches the ground-truth layout (the half-corpus training differs —
    // this test isolates append's encode-under-saved-codebooks contract)
    val full = AnnIndex.build(spark, e, splitPath) // retrain + rewrite in place
    AnnIndex.append(spark, e.filter(col("vec_id") < 0), splitPath) // no-op append
    assert(built != null && full != null)
    val a = AnnIndex.query(spark, e, splitPath, qid = 42, nprobe = 2, topK = 10)
      .collect().map(_.toString).toSeq
    val b = AnnIndex.query(spark, e, fullPath, qid = 42, nprobe = 2, topK = 10)
      .collect().map(_.toString).toSeq
    assert(a == b)
    // the real append contract: drop half the index rows, append them
    // back under the saved codebooks, query is unchanged
    val idx = s"$splitPath/index"
    val half = spark.read.parquet(idx).filter(col("vec_id") >= 250)
      .select("vec_id", "codes", "cell")
    val kept = spark.read.parquet(idx).filter(col("vec_id") < 250)
      .select("vec_id", "codes", "cell")
    val rebuiltPath = java.nio.file.Files.createTempDirectory("ann_rebuilt").toString
    // copy sidecars + the kept half, then append the dropped half's VECTORS
    kept.write.mode("overwrite").partitionBy("cell").parquet(s"$rebuiltPath/index")
    spark.read.parquet(s"$splitPath/codebook_coarse").write
      .mode("overwrite").parquet(s"$rebuiltPath/codebook_coarse")
    spark.read.parquet(s"$splitPath/codebook_pq").write
      .mode("overwrite").parquet(s"$rebuiltPath/codebook_pq")
    AnnIndex.append(spark, e.filter(col("vec_id") >= 250), rebuiltPath)
    val c = AnnIndex.query(spark, e, rebuiltPath, qid = 42, nprobe = 2, topK = 10)
      .collect().map(_.toString).toSeq
    assert(c == b, "append under saved codebooks must reproduce the full index")
    assert(spark.read.parquet(s"$rebuiltPath/index").count() ==
      spark.read.parquet(idx).count())
  }

  test("codebook sidecars round-trip bit-exactly") {
    val built = AnnIndex.build(spark,
      spark.read.parquet(s"$dir/embeddings.parquet"), path)
    val loaded = AnnIndex.loadCodebooks(spark, path)
    assert(loaded.coarse == built.coarse)
    assert(loaded.pq == built.pq)
  }
}
