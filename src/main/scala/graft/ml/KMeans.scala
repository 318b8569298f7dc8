package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lloyd k-means for IVF codebook training, Spark-shaped: each iteration
  * is ONE pass over the corpus — assignment is the row-local
  * [[VecArgmaxCell]] argmax against the broadcast codebook (no join, no
  * shuffle of vectors), and the centroid update is a k-row aggregate of
  * per-dimension decimal sums (map-side partial, exact and
  * order-independent). Driver state is k×(dims+1) numbers per iteration —
  * the classic scalable k-means loop (codebooks are small by construction;
  * corpora are not).
  *
  * Determinism/exactness: init = the first k vectors by id; means divide
  * exactly-scaled integer decimal sums (same trick as q43, 2^44 scaling
  * for float24 mantissas ≥ 2^-21); every double op sequences identically
  * to the DuckDB oracle mirror (q92). Empty cells keep their previous
  * centroid.
  */
object KMeans {

  val Scale = 17592186044416.0 // 2^44

  /** Cosine-metric codebook: (c_id, centroid, norm), sorted by c_id. */
  def fitCodebook(spark: SparkSession, vecs: DataFrame, k: Int, iters: Int,
      dims: Int = 64): Seq[(Long, Seq[Double], Double)] = {
    VecOps.register(spark)
    def norm(c: Seq[Double]): Double =
      math.sqrt(c.foldLeft(0.0)((acc, v) => acc + v * v))

    // null embeddings are ungroupable (argmax yields a null cell) and
    // would NPE the driver-side collects below — gate them out up front,
    // mirroring the null gating in q35/q36
    val clean = vecs.filter(col("embedding").isNotNull)

    // init = the first k vectors BY ID (orderBy+limit, not `vec_id < k`:
    // sparse or offset id spaces would otherwise yield a partial or empty
    // codebook and a null-cell NPE in the first iteration)
    var codebook: Seq[(Long, Seq[Double], Double)] = clean
      .orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => {
        val c = r.getSeq[Double](1)
        (r.getLong(0), c, norm(c))
      }).sortBy(_._1).toSeq
    require(codebook.nonEmpty, "k-means: no non-null embeddings to initialize from")

    val withNrm = clean.select(col("vec_id"), col("embedding"),
      VecOps.norm(col("embedding")).as("v_nrm"))

    for (_ <- 1 to iters) {
      val dimSums = (0 until dims).map(i =>
        // try_element_at: a short vector contributes null (skipped by sum)
        // for missing dims instead of an ANSI INVALID_ARRAY_INDEX error
        sum((try_element_at(col("embedding"), lit(i + 1)).cast("double") * Scale)
          .cast("decimal(38,0)")).as(s"s$i"))
      val agg = withNrm
        .withColumn("cell", VecOps.argmaxCell(col("embedding"), col("v_nrm"), codebook))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"), dimSums: _*)
        .collect()
        .map { r =>
          val n = r.getLong(1)
          val c = (0 until dims).map(i =>
            // toString->parseDouble is guaranteed correctly rounded; it
            // mirrors the oracle's VARCHAR round-trip (see Qx.d2d)
            java.lang.Double.parseDouble(r.getDecimal(2 + i).toPlainString) / n / Scale)
          r.getLong(0) -> c
        }.toMap
      codebook = codebook.map { case (id, prev, prevNrm) =>
        agg.get(id) match {
          case Some(c) => (id, c, norm(c))
          case None => (id, prev, prevNrm) // empty cell: keep centroid
        }
      }
    }
    codebook
  }
}
