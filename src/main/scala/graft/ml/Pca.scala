package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA / whitening for embedding columns — the dimensionality-reduction
  * step in front of ANN indexing (project 64-dim vectors to the top-r
  * principal axes; optionally whiten so each axis has unit variance).
  *
  * Spark-first shape, the MLlib summary-statistics discipline:
  *   1. ONE distributed pass folds every vector into a fixed-size partial
  *      (count, d sums, d(d+1)/2 upper-triangle product sums) per
  *      partition — `mapPartitions` emitting a single row, merged by a
  *      `Dataset.reduce`. The shuffle carries numPartitions × ~2 k doubles
  *      TOTAL, independent of row count: at 100 TB this is the same
  *      constant-size exchange as at 1 GB.
  *   2. The d×d covariance is eigendecomposed ON THE DRIVER (cyclic
  *      Jacobi, deterministic sweep order, sign-canonicalized
  *      eigenvectors) — O(d³) on a 64×64 matrix is microseconds and
  *      needs no distribution.
  *   3. The projection matrix broadcasts back as literals inside a
  *      codegen'd arithmetic expression — no UDF, no per-row allocation
  *      beyond the output array.
  *
  * Covariance uses the population convention (divide by n). Projection
  * centers by the mean, then dots with each component; `whiten = true`
  * additionally scales each axis by 1/sqrt(eigenvalue) (axes with
  * eigenvalue ≤ 1e-12 are left unscaled rather than exploded).
  */
object Pca {

  final case class Model(
      n: Long,
      dropped: Long, // null / wrong-length input rows excluded from the fit
      mean: Array[Double],
      eigenvalues: Array[Double], // descending, length r
      components: Array[Array[Double]], // r × d, unit-norm rows
      totalVariance: Double) {
    def varianceExplained: Double =
      if (totalVariance <= 0) 0.0 else eigenvalues.sum / totalVariance
  }

  /** One-pass moment accumulation + driver-side eigensolve.
    * `vecs` must expose `col` as array<float|double> of length `dims`;
    * null and wrong-length rows are excluded and COUNTED (Model.dropped)
    * — a fit over a mostly-invalid corpus is visible, not silent.
    */
  def fit(vecs: DataFrame, colName: String, dims: Int, r: Int): Model = {
    require(r >= 1 && r <= dims, s"rank out of range: $r of $dims")
    val spark = vecs.sparkSession
    import spark.implicits._
    val tri = dims * (dims + 1) / 2
    val ds = vecs.select(col(colName).cast("array<double>"))
      .as[Seq[Double]]
    val partials = ds.mapPartitions { it =>
      var n = 0L
      var bad = 0L
      val s = new Array[Double](dims)
      val p = new Array[Double](tri)
      it.foreach { v =>
        if (v == null || v.length != dims) bad += 1
        else {
          n += 1
          var i = 0
          var k = 0
          while (i < dims) {
            val vi = v(i)
            s(i) += vi
            var j = i
            while (j < dims) { p(k) += vi * v(j); j += 1; k += 1 }
            i += 1
          }
        }
      }
      Iterator.single((n, bad, s, p))
    }
    val (n, dropped, s, p) = partials.reduce { (a, b) =>
      val s = new Array[Double](dims)
      val p = new Array[Double](tri)
      var i = 0
      while (i < dims) { s(i) = a._3(i) + b._3(i); i += 1 }
      var k = 0
      while (k < tri) { p(k) = a._4(k) + b._4(k); k += 1 }
      (a._1 + b._1, a._2 + b._2, s, p)
    }
    require(n >= 2,
      s"PCA needs at least 2 valid rows, got $n ($dropped dropped as " +
        "null/wrong-length)")
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](dims, dims)
    var k = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val c = p(k) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; k += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(idx => -evals(idx)).take(r)
    val comps = order.map { idx =>
      val v = Array.tabulate(dims)(d => evecs(d)(idx))
      // sign canon: largest-|component| entry is positive — removes the
      // eigenvector sign ambiguity so repeated fits agree.
      val m = v.indices.maxBy(d => math.abs(v(d)))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    Model(n, dropped, mean, order.map(evals(_)).toArray, comps,
      totalVariance = (0 until dims).map(d => cov(d)(d)).sum)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector COLUMNS). Deterministic sweep order; converges far past
    * tolerance in <15 sweeps for d ≤ 128.
    */
  private[ml] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < 30 && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x => x
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - sn * aiq
              a(i)(q) = sn * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - sn * aqi
              a(q)(i) = sn * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - sn * viq
              v(i)(q) = sn * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Projection column for component `j` of `model`: a flat 2·d-term
    * arithmetic expression over `vec` — fully codegen'd, no UDF.
    */
  def projection(model: Model, vec: Column, j: Int, whiten: Boolean): Column = {
    val comp = model.components(j)
    val dot = comp.indices.map { i =>
      (try_element_at(vec, lit(i + 1)).cast("double") - lit(model.mean(i))) *
        lit(comp(i))
    }.reduce(_ + _)
    val ev = model.eigenvalues(j)
    if (whiten && ev > 1e-12) dot / lit(math.sqrt(ev)) else dot
  }

  /** Project `vecs` onto the model's r axes: adds columns pc0..pc{r-1}. */
  def project(model: Model, vecs: DataFrame, colName: String,
      whiten: Boolean = false): DataFrame =
    model.components.indices.foldLeft(vecs) { (df, j) =>
      df.withColumn(s"pc$j", projection(model, col(colName), j, whiten))
    }

  /** INTEGER-EXACT dominant principal axis via fixed-point power
    * iteration — the oracle-checkable twin of [[fit]]'s float Jacobi path.
    *
    * Recurrence (documented; the DuckDB oracle implements it verbatim in
    * HUGEINT arithmetic):
    *   w      = floor(e · 2^20)            (×2^k is EXACT in IEEE, so both
    *                                        engines quantize identically)
    *   C      = n·Σ w wᵀ − (Σw)(Σw)ᵀ       (n² × covariance, all integer)
    *   v₀     = 1024 (every dim)
    *   u      = C·v;  m = max(1, max|u|);  v' = floordiv(1024·u, m)
    * after `iters` rounds the axis is returned as (dim 1-based, v) with
    * v ∈ [−1024, 1024]. floordiv is FLOOR division (both engines' truncate
    * semantics differ on negatives, so it's built from pmod explicitly).
    *
    * Scale: the only distributed work is the same single constant-size
    * moment pass as [[fit]], in longs (partial products bounded by
    * rows·2^40 — the require below guards the long budget loudly); the
    * 64×64 iteration runs on the driver in BigInt, mirroring the oracle's
    * 128-bit integers exactly.
    */
  def dominantAxisFixedPoint(vecs: DataFrame, colName: String, dims: Int,
      iters: Int): Seq[(Int, Long)] = {
    require(iters >= 1 && iters <= 16, s"iters out of range: $iters")
    val spark = vecs.sparkSession
    import spark.implicits._
    val tri = dims * (dims + 1) / 2
    val ds = vecs.select(col(colName).cast("array<double>"))
      .filter(col(colName).isNotNull && size(col(colName)) === dims)
      .as[Seq[Double]]
    val partials = ds.mapPartitions { it =>
      var n = 0L
      var maxW = 0L
      val s = new Array[Long](dims)
      val p = new Array[Long](tri)
      val w = new Array[Long](dims)
      it.foreach { v =>
        n += 1
        var i = 0
        while (i < dims) {
          w(i) = math.floor(v(i) * 1048576.0).toLong
          // track the largest quantized magnitude so the driver can check
          // the REAL overflow budget (n * maxW^2) instead of silently
          // wrapping the partial sums on out-of-range embeddings
          val a = math.abs(w(i))
          if (a > maxW) maxW = a
          i += 1
        }
        i = 0
        var k = 0
        while (i < dims) {
          s(i) += w(i)
          var j = i
          while (j < dims) { p(k) += w(i) * w(j); j += 1; k += 1 }
          i += 1
        }
      }
      Iterator.single((n, s, p, maxW))
    }
    val (n, s, p, maxW) = partials.reduce { (a, b) =>
      val s = new Array[Long](dims); val p = new Array[Long](tri)
      var i = 0
      while (i < dims) { s(i) = a._2(i) + b._2(i); i += 1 }
      var k = 0
      while (k < tri) { p(k) = a._3(k) + b._3(k); k += 1 }
      (a._1 + b._1, s, p, math.max(a._4, b._4))
    }
    require(n >= 2, s"power iteration needs at least 2 rows, got $n")
    // long budget for the partial product sums: every |w_i w_j| <= maxW^2
    // and n rows sum, so n * maxW^2 < 2^62 keeps every partial (and the
    // driver-side reduce) inside a long with 2x headroom. Input-adaptive:
    // unit-norm embeddings (maxW <= 2^20) allow ~2^22 rows; the loud
    // failure names the actual magnitudes instead of silently wrapping.
    require(n < (1L << 20),
      s"fixed-point moment pass sized for <2^20 rows, got $n — widen the " +
        "partials to BigInt (or shard the pass) before raising this")
    require(maxW < (1L << 31) && (maxW == 0L || n <= (1L << 62) / (maxW * maxW)),
      s"fixed-point moment pass overflow budget exceeded: $n rows with " +
        s"max quantized magnitude $maxW (n * maxW^2 must stay below 2^62) " +
        "— rescale the embeddings or shard the pass")
    def fdiv(a: BigInt, b: BigInt): BigInt = { // floor division, b > 0
      val m = ((a % b) + b) % b
      (a - m) / b
    }
    val c = Array.ofDim[BigInt](dims, dims)
    var k = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val v = BigInt(n) * BigInt(p(k)) - BigInt(s(i)) * BigInt(s(j))
        c(i)(j) = v; c(j)(i) = v
        j += 1; k += 1
      }
      i += 1
    }
    var vec = Array.fill[BigInt](dims)(BigInt(1024))
    for (_ <- 1 to iters) {
      val u = Array.tabulate(dims) { ii =>
        var acc = BigInt(0)
        var jj = 0
        while (jj < dims) { acc += c(ii)(jj) * vec(jj); jj += 1 }
        acc
      }
      val m = u.map(_.abs).max.max(BigInt(1))
      vec = u.map(x => fdiv(x * 1024, m))
    }
    (0 until dims).map(d => (d + 1, vec(d).toLong))
  }
}
