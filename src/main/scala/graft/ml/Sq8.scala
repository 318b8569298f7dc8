package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the third index-compression tier beside
  * [[Pq]] (and the binary sign-bit LSH of q41): every dimension is
  * quantized INDEPENDENTLY to 8 bits over its corpus [min, max] range
  * (the faiss `SQ8` layout). 4× smaller than float32 with far better
  * fidelity than PQ at equal simplicity: no codebook training loops, no
  * subspace structure — just two narrow aggregates for the per-dim
  * ranges and a row-local encode.
  *
  * Determinism contract (the repo's oracle discipline): training is
  * arithmetic-free (per-dim MIN/MAX over identical float values — exact
  * equality in any engine), and encode/distance use short fixed-order
  * IEEE chains (`(v - min) * 255.0 / (max - min)`, floor; reconstruction
  * `min + code * (max - min) / 255.0`; left-to-right squared-diff fold),
  * each written identically in the DuckDB replay — bit-identical across
  * engines, like the WordPiece score and the PQ ADC folds.
  *
  * 100 TB shape: fit is ONE map-side-combining aggregate (128 doubles of
  * state); the params broadcast as two 64-double literals; encode and
  * distance are row-local inside whole-stage-codegen-friendly HOFs —
  * the scan never shuffles floats, and a search over the coded corpus
  * moves 64-byte rows, not 256-byte float vectors.
  */
object Sq8 {

  final case class Params(mins: Seq[Double], maxs: Seq[Double])

  /** Per-dimension [min, max] over the non-null corpus — one aggregate
    * pass, no arithmetic (exact in any engine).
    */
  def fit(vecs: DataFrame, dims: Int = 64): Params = {
    val aggs = (0 until dims).flatMap { i =>
      val v = try_element_at(col("embedding"), lit(i + 1)).cast("double")
      Seq(min(v).as(s"mn$i"), max(v).as(s"mx$i"))
    }
    val r = vecs.filter(col("embedding").isNotNull)
      .agg(aggs.head, aggs.tail: _*).collect()(0)
    Params(
      (0 until dims).map(i => r.getDouble(2 * i)),
      (0 until dims).map(i => r.getDouble(2 * i + 1)))
  }

  /** Row-local encode to (vec_id, codes ARRAY<INT>): code_d =
    * floor((v_d - min_d) * 255 / (max_d - min_d)), clamped to [0, 255];
    * a constant dimension (max == min) codes 0. Null embeddings drop.
    */
  def encode(vecs: DataFrame, p: Params): DataFrame = {
    val mn = lit(p.mins.toArray)
    val mx = lit(p.maxs.toArray)
    vecs.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        zip_with(col("embedding").cast("array<double>"),
          sequence(lit(1), lit(p.mins.length)),
          (v, i) => {
            val lo = element_at(mn, i.cast("int"))
            val hi = element_at(mx, i.cast("int"))
            when(hi === lo, lit(0))
              .otherwise(least(lit(255), greatest(lit(0),
                floor((v - lo) * lit(255.0) / (hi - lo)).cast("int"))))
          }).as("codes"))
  }

  /** Asymmetric distance of a CODED row to the exact query vector `q`:
    * Σ_d (q_d − (min_d + code_d·(max_d − min_d)/255))², folded
    * left-to-right from 0.0 — the [[Pq.adcDist]] discipline, replayed
    * verbatim by the oracle's `list_reduce`.
    */
  def dist(q: Seq[Double], p: Params): Column = {
    val mn = lit(p.mins.toArray)
    val mx = lit(p.maxs.toArray)
    val qL = lit(q.toArray)
    aggregate(
      sequence(lit(1), lit(q.length)),
      lit(0.0),
      (acc, i) => {
        val ii = i.cast("int")
        val lo = element_at(mn, ii)
        val r = lo + element_at(col("codes"), ii).cast("double") *
          (element_at(mx, ii) - lo) / lit(255.0)
        val d = element_at(qL, ii) - r
        acc + d * d
      })
  }
}
