package graft.ml

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen solves a known symmetric system") {
    val (evals, evecs) = Pca.jacobiEigen(Array(
      Array(2.0, 1.0),
      Array(1.0, 2.0)))
    val sorted = evals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector for eval 3 is (1,1)/sqrt(2) up to sign
    val hi = evals.indexOf(evals.max)
    val v = Array(evecs(0)(hi), evecs(1)(hi))
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v(0) - v(1)) < 1e-12) // same sign, equal components
  }

  // deterministic anisotropic cloud: variance ~25 along u, ~4 along w,
  // ~0 elsewhere (8 dims) — no RNG, values from a fixed recurrence.
  private def cloud: Seq[(Long, Seq[Double])] = {
    val d = 8
    val u = Array.tabulate(d)(i => if (i == 2) 1.0 else 0.0)
    val w = Array.tabulate(d)(i => if (i == 5) 1.0 else 0.0)
    (0 until 400).map { k =>
      val a = 5.0 * math.sin(k * 0.7) // spread ±5 → variance ≈ 12.5
      val b = 2.0 * math.cos(k * 1.3)
      k.toLong -> (0 until d).map(i => 3.0 + a * u(i) + b * w(i)).toSeq
    }
  }

  test("fit recovers the two planted axes in order") {
    val m = Pca.fit(cloud.toDF("vec_id", "embedding"), "embedding", dims = 8, r = 2)
    assert(m.n === 400)
    assert(m.eigenvalues(0) > m.eigenvalues(1) && m.eigenvalues(1) > 1.0)
    // top component is ±e2, second is ±e5 (sign-canon makes them positive)
    assert(math.abs(m.components(0)(2) - 1.0) < 1e-6)
    assert(math.abs(m.components(1)(5) - 1.0) < 1e-6)
    // unit norm + orthogonality
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(m.components(0), m.components(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-9)
    // two axes carry ~all variance
    assert(m.varianceExplained > 0.999)
  }

  test("projected data has diagonal covariance equal to the eigenvalues") {
    val df = cloud.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", dims = 8, r = 2)
    val rows = Pca.project(m, df, "embedding")
      .select("pc0", "pc1").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = rows.length
    val (m0, m1) = (rows.map(_._1).sum / n, rows.map(_._2).sum / n)
    val v0 = rows.map(p => (p._1 - m0) * (p._1 - m0)).sum / n
    val v1 = rows.map(p => (p._2 - m1) * (p._2 - m1)).sum / n
    val cx = rows.map(p => (p._1 - m0) * (p._2 - m1)).sum / n
    assert(math.abs(v0 - m.eigenvalues(0)) < 1e-6 * math.max(1.0, v0))
    assert(math.abs(v1 - m.eigenvalues(1)) < 1e-6 * math.max(1.0, v1))
    assert(math.abs(cx) < 1e-6)
    // whitened axes have unit variance
    val wrows = Pca.project(m, df, "embedding", whiten = true)
      .select("pc0").collect().map(_.getDouble(0))
    val wm = wrows.sum / n
    val wv = wrows.map(x => (x - wm) * (x - wm)).sum / n
    assert(math.abs(wv - 1.0) < 1e-6)
  }

  test("fixed-point power iteration agrees with the Jacobi top component") {
    val df = cloud.toDF("vec_id", "embedding")
    val jac = Pca.fit(df, "embedding", dims = 8, r = 1).components(0)
    val fp = Pca.dominantAxisFixedPoint(df, "embedding", dims = 8, iters = 6)
      .map(_._2.toDouble).toArray
    val nrm = math.sqrt(fp.map(x => x * x).sum)
    val cos = jac.zip(fp).map { case (a, b) => a * b / nrm }.sum
    assert(math.abs(cos) > 0.999,
      s"fixed-point axis diverged from Jacobi: |cos|=$cos")
  }

  test("nulls and wrong-length vectors are dropped; tiny input rejected") {
    val messy = Seq(
      (1L, Seq(1.0, 2.0)), (2L, Seq(2.0, 1.0)), (3L, null),
      (4L, Seq(1.0, 2.0, 3.0))).asInstanceOf[Seq[(Long, Seq[Double])]]
      .toDF("vec_id", "embedding")
    val m = Pca.fit(messy, "embedding", dims = 2, r = 1)
    assert(m.n === 2)
    assert(m.dropped === 2) // the null row and the 3-dim row, counted
    intercept[IllegalArgumentException] {
      Pca.fit(Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding"),
        "embedding", dims = 2, r = 1)
    }
    intercept[IllegalArgumentException] {
      Pca.fit(messy, "embedding", dims = 2, r = 3)
    }
  }
}
