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

  test("codebook sidecars round-trip bit-exactly") {
    val built = AnnIndex.build(spark,
      spark.read.parquet(s"$dir/embeddings.parquet"), path)
    val loaded = AnnIndex.loadCodebooks(spark, path)
    assert(loaded.coarse == built.coarse)
    assert(loaded.pq == built.pq)
  }
}
