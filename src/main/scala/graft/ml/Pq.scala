package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization — the memory side of the canonical large-scale ANN
  * stack (IVF partitions the corpus, PQ compresses the residents): each
  * vector's M subspaces are quantized to one of K centroids, shrinking a
  * 64-dim float vector to M small codes, and queries scan codes with an
  * asymmetric-distance (ADC) lookup table instead of touching floats.
  *
  * Spark shape, every stage:
  *  - training is M independent L2 Lloyd loops on `slice`d subvectors —
  *    assignment is a row-local codegen'd expression over BROADCAST
  *    (literal) centroids, the update a K-row aggregate of per-dim exact
  *    decimal sums (the [[KMeans]] discipline, L2 instead of cosine);
  *  - encoding is row-local (no shuffle, no join): M chained-`when`
  *    argmins in the scan stage;
  *  - ADC search precomputes the M×K distance table ONCE (driver-side,
  *    K·M·subDim flops) and scans codes with `element_at` lookups — at
  *    100 TB the table is still M×256 doubles and the scan reads only
  *    code columns (M bytes/vector instead of 512).
  *
  * Exactness: distance folds run in element order (`aggregate` over
  * `zip_with` ↔ DuckDB `list_reduce`), argmin ties break to the lowest
  * centroid id in both engines, means divide exactly-scaled decimal sums —
  * the full pipeline (train → encode → ADC top-k) is hash-exact against
  * the q129 oracle.
  */
object Pq {

  /** One subspace's codebook: K centroids of `subDim` doubles, indexed by
    * centroid id 0..K-1.
    */
  type SubCodebook = Seq[Seq[Double]]

  /** Squared L2 distance between a subvector column and a literal
    * centroid, folded in element order (bit-reproducible across engines:
    * the oracle's `list_reduce` folds the same sequence). Native
    * [[PqSqDist]] — one JVM loop per row, identical values and null
    * semantics to the `aggregate(zip_with(...))` HOF chain it replaces
    * (guide §4: the chain paid an interpreted lambda frame per element).
    */
  private def sqDistTo(sub: Column, c: Seq[Double]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(PqSqDist(Seq(
      ColumnBridge.expression(sub),
      ColumnBridge.expression(typedLit(c.toIndexedSeq)))))
  }

  /** Subvector m of a 64-wide embedding column (1-based slice). */
  private def subvec(vec: Column, m: Int, subDim: Int): Column =
    slice(vec.cast("array<double>"), m * subDim + 1, subDim)

  /** Row-local L2 argmin over a literal codebook; ties break to the
    * LOWEST centroid index, matching the oracle's `ROW_NUMBER ... ORDER
    * BY dist, c_id`. Native [[PqArgminCell]] — bit-identical to the
    * previous `least + when`-chain over per-centroid HOF distances (which
    * evaluated K interpreted folds per row TWICE: once inside `least`,
    * once in the matching `when` arm).
    */
  private def argminCell(sub: Column, cb: SubCodebook): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(PqArgminCell(Seq(
      ColumnBridge.expression(sub),
      ColumnBridge.expression(typedLit(cb.map(_.toIndexedSeq).toIndexedSeq)))))
  }

  /** Train M sub-codebooks with `iters` Lloyd iterations each. Init per
    * subspace = the subvectors of the first K vectors by id ([[KMeans]]'s
    * deterministic init); empty cells keep their previous centroid.
    */
  def fit(spark: SparkSession, vecs: DataFrame, m: Int, k: Int, iters: Int,
      dims: Int = 64): Seq[SubCodebook] = {
    val subDim = dims / m
    require(m * subDim == dims, s"$m subspaces must divide $dims dims")
    val clean = vecs.filter(col("embedding").isNotNull)
    val initRows = clean.orderBy(col("vec_id")).limit(k)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0))
    require(initRows.length == k, s"PQ init needs $k vectors, got ${initRows.length}")

    // All M subspace loops advance together: one corpus pass per Lloyd
    // iteration computes every subspace's (cell, n, per-dim decimal sums)
    // — the per-(mi, cell) groups are identical to M independent passes
    // (subspaces never interact), so the learned codebooks are
    // bit-identical while the corpus is scanned `iters` times instead of
    // `m × iters` (guide §1.2: the distributed algorithm first — don't
    // re-read what one pass can aggregate).
    var cbs: IndexedSeq[SubCodebook] = (0 until m).map(mi =>
      initRows.map(v => v.slice(mi * subDim, (mi + 1) * subDim)).toSeq)
    for (_ <- 1 to iters) {
      val perM = array((0 until m).map { mi =>
        val sub = subvec(col("embedding"), mi, subDim)
        struct(lit(mi).as("mi"), argminCell(sub, cbs(mi)).as("cell"),
          sub.as("sub"))
      }: _*)
      val agg = clean
        .select(explode(perM).as("x"))
        .select(col("x.mi").as("mi"), col("x.cell").as("cell"),
          col("x.sub").as("sub"))
        .groupBy("mi", "cell")
        .agg(count(lit(1)).as("n"), (0 until subDim).map(i =>
          sum((try_element_at(col("sub"), lit(i + 1)) * KMeans.Scale)
            .cast("decimal(38,0)")).as(s"s$i")): _*)
        .collect()
        .map { r =>
          val n = r.getLong(2)
          (r.getInt(0), r.getLong(1)) -> (0 until subDim).map(i =>
            java.lang.Double.parseDouble(r.getDecimal(3 + i).toPlainString) / n / KMeans.Scale)
        }.toMap
      cbs = cbs.zipWithIndex.map { case (cb, mi) =>
        cb.zipWithIndex.map { case (prev, id) =>
          agg.getOrElse((mi, id.toLong), prev)
        }
      }
    }
    cbs
  }

  /** Encode every vector to its M codes — entirely row-local in the scan
    * stage. Output: input columns + `codes ARRAY<BIGINT>[M]`.
    */
  def encode(vecs: DataFrame, codebooks: Seq[SubCodebook], dims: Int = 64): DataFrame = {
    val m = codebooks.length
    val subDim = dims / m
    vecs.withColumn("codes", array(codebooks.zipWithIndex.map { case (cb, mi) =>
      argminCell(subvec(col("embedding"), mi, subDim), cb)
    }: _*))
  }

  /** ADC distance table for a query vector: table(m)(k) = squared L2 from
    * the query's m-th subvector to centroid k, folded in the SAME element
    * order as the in-plan expression (0.0 + e1 + e2 + … — the leading
    * +0.0 is exact for the non-negative squares, so the driver-side fold
    * bit-matches the engines' list folds).
    */
  def adcTable(query: Seq[Double], codebooks: Seq[SubCodebook],
      dims: Int = 64): Seq[Seq[Double]] = {
    val m = codebooks.length
    val subDim = dims / m
    codebooks.zipWithIndex.map { case (cb, mi) =>
      val q = query.slice(mi * subDim, (mi + 1) * subDim)
      cb.map { c =>
        var acc = 0.0
        var i = 0
        while (i < subDim) { val d = q(i) - c(i); acc += d * d; i += 1 }
        acc
      }
    }
  }

  /** Approximate top-k by ADC: one row-local pass over the coded corpus,
    * summing M table lookups per row (fixed m-order, bit-reproducible),
    * then a TakeOrderedAndProject. The corpus' float vectors are never
    * read — this is the query path PQ exists for.
    */
  def adcTopK(coded: DataFrame, table: Seq[Seq[Double]], topK: Int): DataFrame =
    coded.select(col("vec_id"), col("codes"), adcDist(table).as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
      .limit(topK)

  /** The ADC distance column alone (over a `codes` column), for callers
    * that compose PQ with other pruning — e.g. the IVF×PQ layout, which
    * joins a probe-cell filter BEFORE this projection.
    */
  def adcDist(table: Seq[Seq[Double]]): Column =
    table.zipWithIndex.map { case (t, mi) =>
      element_at(lit(t.toArray), element_at(col("codes"), mi + 1).cast("int") + 1)
    }.reduce(_ + _)

  /** The ADC distance table as an IN-PLAN column over a query-vector
    * column — [[adcTable]] computed row-locally for EVERY query row
    * instead of driver-side for one. table[m+1][k+1] = squared L2 from
    * the row's m-th subvector to centroid k, with the identical fold
    * order (`aggregate` from 0.0 ↔ the driver loop's `acc += d*d` ↔ the
    * oracle's `list_reduce`), so a batch of queries is bit-identical to
    * running [[adcTable]] per query. This is what lets a MILLION-query
    * batch search stay one distributed plan: the M×K-double table rides
    * on each query row; no per-query driver round-trip exists.
    */
  def adcTableCol(q: Column, codebooks: Seq[SubCodebook], dims: Int = 64): Column = {
    val m = codebooks.length
    val subDim = dims / m
    array(codebooks.zipWithIndex.map { case (cb, mi) =>
      array(cb.map(c => sqDistTo(subvec(q, mi, subDim), c)): _*)
    }: _*)
  }

  /** ADC distance from an [[adcTableCol]]-shaped column riding on the row
    * (batch-query form of [[adcDist]]): fixed-m-order sum of table
    * lookups, reading only the `codes` column of the corpus side.
    */
  def adcDistFromTable(table: Column, m: Int): Column =
    (0 until m).map { mi =>
      element_at(element_at(table, mi + 1),
        element_at(col("codes"), mi + 1).cast("int") + 1)
    }.reduce(_ + _)
}
