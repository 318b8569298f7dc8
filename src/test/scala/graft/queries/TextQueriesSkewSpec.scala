package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew-resilience property for the blocked n-gram Jaccard pipeline
  * (q37): a Zipfian-hot last-token block must NOT go quadratic. With 30%
  * of a corpus sharing one last token, the exact all-pairs scheme would
  * emit ~n²/2 candidate pairs from that block; the capped scheme
  * re-blocks oversized blocks by content (MinHash bands), so dissimilar
  * docs that merely share an ending never pair — while genuine near-dups
  * still collide in a band and survive to the verified output.
  */
class TextQueriesSkewSpec extends SparkSpec {

  private def corpus(): org.apache.spark.sql.DataFrame = {
    // 300 hot-block docs (shared last token, pairwise-dissimilar content),
    // 700 cold docs (unique last tokens), plus two planted near-dup pairs:
    // one inside the hot block (overflow/MinHash path), one inside a
    // 40-doc warm block (exact all-pairs path).
    val hot = (0 until 300).map { i =>
      (i.toLong, (0 until 10).map(j => s"t${i}x$j").mkString(" ") + " zzend")
    }
    val cold = (0 until 700).map { i =>
      (1000L + i, (0 until 10).map(j => s"c${i}y$j").mkString(" ") + s" u$i")
    }
    val warm = (0 until 40).map { i =>
      (2000L + i, (0 until 10).map(j => s"m${i}z$j").mkString(" ") + " midtok")
    }
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val hotDup = Seq(
      (9001L, s"$base zzend"),
      (9002L, s"${base.split(' ').drop(1).mkString(" ")} zzend"))
    val warmDup = Seq(
      (9003L, s"one two three four five six seven eight nine ten midtok"),
      (9004L, s"xx two three four five six seven eight nine ten midtok"))
    spark.createDataFrame(hot ++ cold ++ warm ++ hotDup ++ warmDup)
      .toDF("doc_id", "text")
  }

  test("hot block stays sub-quadratic: candidates bounded by content bands") {
    val docs = TextQueries.jaccardBlockedDocs(spark, corpus())
    val nCandidates = TextQueries.ngramJaccardCandidates(docs).count()
    // exact all-pairs over the 302-doc hot block alone would be
    // 302*301/2 = 45,451 pairs; the banded overflow path should emit only
    // content-collisions (planted dups + chance), orders of magnitude less
    assert(nCandidates < 2000,
      s"candidate pairs not bounded under hot-block skew: $nCandidates")
    // the 42-doc warm block IS under the cap: exact all-pairs contributes
    // 42*41/2 = 861 pairs, so candidates must be at least that (sanity
    // that the exact path still runs)
    assert(nCandidates >= 861L, s"exact small-block path missing: $nCandidates")
  }

  test("near-dups survive both the overflow path and the exact path") {
    val docs = TextQueries.jaccardBlockedDocs(spark, corpus())
    val pairs = TextQueries.ngramJaccardPairs(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((9001L, 9002L)), "hot-block near-dup lost by banding")
    assert(pairs.contains((9003L, 9004L)), "warm-block near-dup lost by exact path")
    // no false positives among the dissimilar hot-block docs
    assert(!pairs.exists { case (a, b) => a < 300 && b < 300 },
      "dissimilar hot-block docs reported as near-dups")
  }
}
