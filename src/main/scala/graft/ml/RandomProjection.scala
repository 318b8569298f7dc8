package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss sign-projection sketch for embedding columns:
  * y_j = Σ_i w_i · s(i,j) with s ∈ {±1} drawn from md5("jl#i#j") — the
  * Achlioptas (2003) database-friendly projection, content-addressed so
  * every engine, run and cluster derives the SAME matrix with no stored
  * state. Inputs quantize to w = floor(e·2^20) (IEEE-exact ×2^k), so the
  * sketch is INTEGER-exact: sums of longs commute, results are
  * bit-stable across partitionings and hash-oracle-able.
  *
  * Scale shape: the sign matrix is a d×r literal baked into a codegen'd
  * arithmetic expression (no UDF, no join against a matrix table, no
  * broadcast needed — it's part of the plan); the sketch is one
  * projection-only scan. Distances in sketch space approximate original
  * distances within the JL bound, at r/d the storage and compare cost —
  * the cheap pre-filter in front of exact reranking.
  */
object RandomProjection {

  /** ±1 matrix [inputDim][outputDim], 0-based, from md5 parity. */
  def signMatrix(dims: Int, outDims: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dims, outDims) { (i, j) =>
      md.reset()
      val h = md.digest(s"jl#$i#$j".getBytes("UTF-8"))
      // parity of the first hex nibble — mirrors the oracle's
      // CAST('0x' || substr(md5(...), 1, 1) AS INT) % 2
      if (((h(0) >> 4) & 0xf) % 2 == 0) 1 else -1
    }
  }

  /** Adds column `jl`: array<long> of length `outDims`. The quantized
    * inputs materialize as an `array(...)` of `dims` FLAT expressions —
    * deliberately not a `transform(...)` HOF, whose interpreted lambda
    * would sit in the hot path; everything here stays inside whole-stage
    * codegen.
    *
    * The quantized array sits behind a Generate barrier (the q48/scoresArray
    * discipline): without it CollapseProject inlines the 64-expression
    * array construction into every one of the outDims×dims element_at
    * references — ~65k expression nodes, a janino source explosion that
    * OOMs the driver at bench scale. With the barrier each quantize
    * expression evaluates exactly once per row.
    */
  def sketch(vecs: DataFrame, colName: String, dims: Int,
      outDims: Int): DataFrame = {
    require(dims >= 1 && outDims >= 1 && outDims <= dims,
      s"bad dims: $dims -> $outDims")
    val s = signMatrix(dims, outDims)
    val w: Column = array((0 until dims).map { i =>
      floor(try_element_at(col(colName), lit(i + 1)).cast("double")
        * lit(1048576.0)).cast("long")
    }: _*)
    val ys = (0 until outDims).map { j =>
      (0 until dims).map { i =>
        if (s(i)(j) > 0) element_at(col("_jl_w"), i + 1)
        else -element_at(col("_jl_w"), i + 1)
      }.reduce(_ + _)
    }
    vecs.select(col("*"), explode(array(w)).as("_jl_w"))
      .withColumn("jl", array(ys: _*))
      .drop("_jl_w")
  }
}
