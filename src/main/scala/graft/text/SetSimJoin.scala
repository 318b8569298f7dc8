package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtered set-similarity join (the PPJoin family — Xiao et al.,
  * WWW 2008): find all document pairs whose token-set Jaccard meets a
  * threshold WITHOUT enumerating all pairs. This is the exact-similarity
  * complement to the MinHash/LSH near-dup path (TextSketch): LSH is
  * probabilistic and needs a verify pass anyway; prefix filtering is
  * EXACT — zero false negatives by construction — at the cost of a
  * candidate blow-up when the threshold is low.
  *
  * How it scales: each doc keeps only its PREFIX — the p rarest tokens,
  * p = n − ceil(θ·n) + 1 — and two docs can only reach Jaccard ≥ θ if
  * their prefixes share a token. Rarity-first ordering is what bounds the
  * candidate join's skew: a prefix token's group size in the candidate
  * join is its corpus frequency, and prefixes are built from the LEAST
  * frequent tokens each doc has. The global ordering is (freq, token),
  * realized per-doc with a row-local sort_array over (freq, token)
  * structs after one freq join — deliberately NOT a global row_number
  * window, which would funnel the token dictionary through one task.
  *
  * The threshold is a rational (num/den), and the acceptance test
  *   J(a,b) ≥ num/den  ⇔  (num+den)·|a∩b| ≥ num·(|a|+|b|)
  * is evaluated in exact integer arithmetic, so results are bit-stable
  * and oracle-checkable.
  */
object SetSimJoin {

  /** `docs`: (id: long, tokens: array<string>, already distinct).
    * Returns (doc_a, doc_b, inter, na, nb) with doc_a < doc_b and
    * Jaccard(a,b) ≥ num/den.
    */
  def jaccardJoin(docs: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && num <= den, s"threshold must be in (0,1]: $num/$den")
    // persist: this frame feeds the freq aggregate, the prefix build and
    // BOTH verify arms — unpersisted, the token derivation (often a
    // shingle transform) re-runs four times.
    val d = docs.select(col("id"), col("tokens"), size(col("tokens")).as("n"))
      .filter(col("n") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val freq = d.select(explode(col("tokens")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    // per-doc rarity order: one join token→freq, then a ROW-LOCAL struct
    // sort — no global rank window (which would funnel the dictionary
    // through one task). prefix p = n − ceil(θn) + 1, integer form.
    val prefixes = d
      .select(col("id"), col("n"), explode(col("tokens")).as("token"))
      .join(freq, "token")
      .groupBy("id", "n")
      .agg(sort_array(collect_list(struct(col("freq"), col("token"))))
        .as("ordered"))
      .withColumn("p",
        col("n") - expr(s"(($num * n) + ${den - 1}) div $den") + lit(1))
      .select(col("id"), col("n"),
        explode(expr("transform(slice(ordered, 1, p), x -> x.token)"))
          .as("ptoken"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidates: prefix-token equi-join, id order + length filter
    // (den·min ≥ num·max is necessary for J ≥ num/den).
    val a = prefixes.toDF("id_a", "na", "ptoken")
    val b = prefixes.toDF("id_b", "nb", "ptoken")
    val cand = a.join(b, "ptoken")
      .filter(col("id_a") < col("id_b") &&
        lit(den) * least(col("na"), col("nb")) >=
          lit(num) * greatest(col("na"), col("nb")))
      .select("id_a", "id_b").distinct()
    // verify: pull both token arrays (narrow, co-partitioned by id) and
    // intersect ROW-LOCALLY; exact integer acceptance.
    val ta = d.select(col("id").as("id_a"), col("tokens").as("toks_a"))
    val tb = d.select(col("id").as("id_b"), col("tokens").as("toks_b"))
    val out = cand.join(ta, "id_a").join(tb, "id_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("na", size(col("toks_a")))
      .withColumn("nb", size(col("toks_b")))
      .filter(lit(num + den) * col("inter") >= lit(num) * (col("na") + col("nb")))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("inter").cast("long").as("inter"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))
      // materialize (bounded by the accepted pair set) and release the
      // per-call persists — repeated invocations (e.g. via the
      // graft_jaccard_join TVF) must not leak cached RDDs.
      .localCheckpoint(eager = true)
    d.unpersist()
    prefixes.unpersist()
    out
  }
}
