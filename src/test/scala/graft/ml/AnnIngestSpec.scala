package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming embedding-ingest contract: live two-batch drive whose
  * verdicts are re-derived through the SINGLE-query path
  * ([[AnnIndex.query]] — driver-side ADC table, isInCollection pruning:
  * a genuinely different code path from the loop's distributed
  * [[AnnIndex.searchRows]]) against replayed index states, plus index
  * growth, retry-exclusion, and per-cell file bounds.
  */
class AnnIngestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val eps = 0.95

  test("2-batch embedding ingest: verdicts replay through query(); files bounded") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = java.nio.file.Files.createTempDirectory("ann_ingest").toString
    AnnIndex.build(spark, e.filter(col("vec_id") < 250), p)

    val srcDir = java.nio.file.Files.createTempDirectory("ann_ingest_src").toString + "/src"
    val b1 = e.filter(col("vec_id") >= 250 && col("vec_id") < 260)
      .select("vec_id", "embedding")
    val b2 = e.filter(col("vec_id") >= 260 && col("vec_id") < 270)
      .select("vec_id", "embedding")
    b1.coalesce(1).write.parquet(srcDir)

    val phases = scala.collection.mutable.ArrayBuffer[Map[Long, String]]()
    val q = AnnIngest.annDedupIngestStream(
      spark.readStream.schema(b1.schema).parquet(srcDir), p, eps,
      maxFilesPerCell = 2) { v =>
      phases += v.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    try {
      q.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    assert(phases.size == 2)

    // ---- independent replay: the single-query path against rebuilt
    // index states (build is bit-reproducible, so state0 is a rebuild,
    // not a file copy; state1 = state0 + batch-1's accepted vectors)
    def expected(batch: DataFrame, statePath: String): Map[Long, String] = {
      val cb = AnnIndex.loadCodebooks(spark, statePath)
      val tmpIdx = java.nio.file.Files.createTempDirectory("ann_inbatch").toString
      Pq.encode(batch.filter(col("embedding").isNotNull), cb.pq)
        .withColumn("v_nrm", VecOps.norm(col("embedding")))
        .withColumn("cell", VecOps.argmaxCell(col("embedding"), col("v_nrm"), cb.coarse))
        .select(col("vec_id"), col("codes"), col("cell"))
        .write.partitionBy("cell").parquet(s"$tmpIdx/index")
      spark.read.parquet(s"$statePath/codebook_coarse")
        .write.parquet(s"$tmpIdx/codebook_coarse")
      spark.read.parquet(s"$statePath/codebook_pq")
        .write.parquet(s"$tmpIdx/codebook_pq")
      batch.select("vec_id").collect().map(_.getLong(0)).sorted.map { id =>
        val vsIdx = AnnIndex.query(spark, e, statePath, id, nprobe = 2, topK = 10)
          .filter(col("adc_dist") <= eps).limit(1).count() > 0
        val inBatch = AnnIndex.query(spark, e, tmpIdx, id, nprobe = 2, topK = 10)
          .filter(col("adc_dist") <= eps && col("vec_id") < id).limit(1).count() > 0
        id -> (if (vsIdx) "dropped_vs_index"
               else if (inBatch) "dropped_in_batch"
               else "accepted")
      }.toMap
    }
    val state = java.nio.file.Files.createTempDirectory("ann_ingest_state").toString
    AnnIndex.build(spark, e.filter(col("vec_id") < 250), state)
    val exp1 = expected(b1, state)
    assert(phases(0) == exp1, s"batch-1 verdicts: got ${phases(0)}, want $exp1")
    val accepted1 = phases(0).collect { case (id, "accepted") => id }.toSeq
    AnnIndex.append(spark, e.filter(col("vec_id").isInCollection(accepted1)), state)
    val exp2 = expected(b2, state)
    assert(phases(1) == exp2, s"batch-2 verdicts: got ${phases(1)}, want $exp2")

    // ---- the q179 symmetry: the factored-out batch verdict function
    // (the EXACT code the loop runs per micro-batch) replays both batches
    // against reconstructed index states and must agree with the stream.
    // State reconstruction rides the final index itself: its rows are
    // initial (vec_id < 250) + accepted arrivals, all encoded under the
    // same codebooks, so filtering by id range IS the historical state.
    val cb = AnnIndex.loadCodebooks(spark, p)
    val idx = AnnIndex.readIndex(spark, p)
    val replay1 = AnnIngest
      .verdicts(spark, b1, idx.filter(col("vec_id") < 250), cb,
        eps, nprobe = 2, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replay1 == phases(0),
      s"batch-1 function replay: got $replay1, want ${phases(0)}")
    val replay2 = AnnIngest
      .verdicts(spark, b2, idx.filter(col("vec_id") < 260), cb,
        eps, nprobe = 2, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replay2 == phases(1),
      s"batch-2 function replay: got $replay2, want ${phases(1)}")

    // index contents: the initial build + accepted arrivals, nothing else
    val accepted = phases.flatMap(_.collect { case (id, "accepted") => id }).toSet
    val initial = e.filter(col("vec_id") < 250 && col("embedding").isNotNull)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ids = spark.read.parquet(s"$p/index").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == initial ++ accepted)

    // per-cell file bound held across both appends
    val cells = new java.io.File(s"$p/index").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cells.nonEmpty)
    cells.foreach { c =>
      val n = c.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n <= 2, s"${c.getName} holds $n files, threshold 2")
    }
  }

  test("operational lifecycle: ingest, drift trigger, rebuildAndSwap, ingest") {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = java.nio.file.Files.createTempDirectory("ann_lifecycle").toString + "/idx"
    // deliberately stale: codebooks trained on a thin slice
    AnnIndex.build(spark, e.filter(col("vec_id") < 100), p)

    def ingestOnce(batch: org.apache.spark.sql.DataFrame,
        tag: String): Map[Long, String] = {
      val srcDir = java.nio.file.Files
        .createTempDirectory(s"ann_lc_$tag").toString + "/src"
      batch.coalesce(1).write.parquet(srcDir)
      var got = Map.empty[Long, String]
      val q = AnnIngest.annDedupIngestStream(
        spark.readStream.schema(batch.schema).parquet(srcDir), p, eps) { v =>
        got = v.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      }
      try q.processAllAvailable() finally q.stop()
      got
    }
    val v1 = ingestOnce(
      e.filter(col("vec_id") >= 250 && col("vec_id") < 260)
        .select("vec_id", "embedding"), "b1")
    assert(v1.size === 10)

    // the q170 drift check: occupancy of the (stale) index layout vs a
    // fresh arrival slice assigned under the SAVED codebooks
    val cbStale = AnnIndex.loadCodebooks(spark, p)
    val refCounts = AnnIndex.readIndex(spark, p)
      .groupBy(col("cell").cast("long").as("bin"))
      .agg(count(lit(1)).as("n")).withColumn("feature", lit("cell"))
    val arrivals = e.filter(col("vec_id") % 3 === 0 && col("embedding").isNotNull)
      .withColumn("v_nrm", VecOps.norm(col("embedding")))
      .withColumn("bin", VecOps
        .argmaxCell(col("embedding"), col("v_nrm"), cbStale.coarse).cast("long"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .withColumn("feature", lit("cell"))
    val l1 = graft.ops.Drift.report(graft.ops.Drift.mergeCounts(
        refCounts.select("feature", "bin", "n"),
        arrivals.select("feature", "bin", "n")))
      .agg(sum("l1_term")).collect()(0).getDouble(0)
    assert(l1 > 0.0, "stale codebooks must show occupancy drift")

    // the ACTION: retrain on what the index holds, swap the root
    val held = e.join(AnnIndex.readIndex(spark, p).select("vec_id"),
      Seq("vec_id"), "left_semi")
    val heldIds = held.select("vec_id").collect().map(_.getLong(0)).toSet
    AnnIndex.rebuildAndSwap(spark, held, p)
    assert(spark.read.parquet(s"$p/index").select("vec_id")
      .collect().map(_.getLong(0)).toSet === heldIds)

    // ingest continues against the swapped index, encoding under the
    // NEW codebooks
    val b2 = e.filter(col("vec_id") >= 260 && col("vec_id") < 270)
      .select("vec_id", "embedding")
    val v2 = ingestOnce(b2, "b2")
    assert(v2.size === 10)
    val accepted2 = v2.collect { case (id, "accepted") => id }.toSet
    val ids = spark.read.parquet(s"$p/index").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === heldIds ++ accepted2)
    // a b2-accepted row's codes must be the SWAPPED codebooks' encoding
    if (accepted2.nonEmpty) {
      val cbNew = AnnIndex.loadCodebooks(spark, p)
      val want = Pq.encode(b2.filter(col("vec_id").isInCollection(accepted2)), cbNew.pq)
        .select("vec_id", "codes").as[(Long, Seq[Long])].collect().toMap
      val gotCodes = spark.read.parquet(s"$p/index")
        .filter(col("vec_id").isInCollection(accepted2))
        .select("vec_id", "codes").as[(Long, Seq[Long])].collect().toMap
      assert(gotCodes === want,
        "post-swap appends must encode under the swapped codebooks")
    }
  }
}
