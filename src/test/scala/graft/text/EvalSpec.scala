package graft.text

import graft.SparkSpec

/** BLEU sufficient statistics pinned by hand on the Papineni-style toy
  * pair: clipping (a candidate gram never scores above its reference
  * count), per-n totals, length sums, group separation, and the
  * short-text guard (texts with fewer than n tokens contribute empty
  * n-gram sets, never a descending-sequence artifact).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: Seq[(Long, String, String, String)]) =
    Eval.bleuStats(rows.toDF("pair_id", "lang", "cand_text", "ref_text"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("clipping: repeated candidate grams count at most the reference count") {
    // the classic degenerate candidate: "the the the the" vs "the cat"
    // unigram matches clip at ref's count of 'the' = 1; no bigram match
    val m = stats(Seq((1L, "en", "the the the the", "the cat")))("en")
    assert(m.getAs[Long]("pairs") === 1L)
    assert(m.getAs[Long]("cand_tokens") === 4L && m.getAs[Long]("ref_tokens") === 2L)
    assert(m.getAs[Long]("match_1") === 1L && m.getAs[Long]("total_1") === 4L)
    assert(m.getAs[Long]("p1_milli") === 250L)
    assert(m.getAs[Long]("match_2") === 0L && m.getAs[Long]("total_2") === 3L)
  }

  test("exact match: every n scores full") {
    val m = stats(Seq((1L, "en", "a b c d", "a b c d")))("en")
    (1 to 4).foreach { n =>
      assert(m.getAs[Long](s"match_$n") === (5 - n).toLong)
      assert(m.getAs[Long](s"total_$n") === (5 - n).toLong)
      assert(m.getAs[Long](s"p${n}_milli") === 1000L)
    }
  }

  test("short texts: fewer than n tokens yield zero totals and null p") {
    val m = stats(Seq((1L, "en", "x y", "x y")))("en")
    assert(m.getAs[Long]("match_3") === 0L && m.getAs[Long]("total_3") === 0L)
    assert(m.isNullAt(m.fieldIndex("p3_milli")))
    assert(m.getAs[Long]("match_2") === 1L && m.getAs[Long]("total_2") === 1L)
  }

  test("groups aggregate independently and sum over pairs") {
    val m = stats(Seq(
      (1L, "en", "a b", "a b"), (2L, "en", "c d", "c x"),
      (3L, "fr", "e f", "g h")))
    assert(m("en").getAs[Long]("pairs") === 2L)
    assert(m("en").getAs[Long]("match_1") === 3L) // a b + c
    assert(m("en").getAs[Long]("total_1") === 4L)
    assert(m("en").getAs[Long]("match_2") === 1L) // only 'a b'
    assert(m("fr").getAs[Long]("match_1") === 0L)
    assert(m("fr").getAs[Long]("p1_milli") === 0L)
  }

  // ---- ROUGE-L / LCS -------------------------------------------------------

  private def lcs(a: String, b: String): Int = {
    import org.apache.spark.sql.functions._
    Seq((a, b)).toDF("c", "r")
      .select(Eval.lcsLength(split(col("c"), " "), split(col("r"), " ")))
      .head().getInt(0)
  }

  test("LCS: hand-computed values, order sensitivity, duplicates, empties") {
    assert(lcs("a b c d", "b d e") === 2) // b, d
    assert(lcs("a b", "b a") === 1) // ORDER matters: no n-gram trick sees this
    assert(lcs("a a b a", "a b a a") === 3) // duplicate-heavy alignment
    assert(lcs("x y z", "p q r") === 0)
    assert(lcs("same same", "same same") === 2)
    // the classic: LCS("ABCBDAB","BDCABA") = 4 (e.g. B C A B), tokenized
    assert(lcs("A B C B D A B", "B D C A B A") === 4)
  }

  test("rougeLStats: corpus millis from summed stats; F1 closed form") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("en", "a b c d", "a x c y"), // LCS 2 (a c), clen 4, rlen 4
      ("en", "p q", "p q"), // LCS 2, 2, 2
      ("de", "m", "n")) // LCS 0, 1, 1
      .toDF("lang", "c", "r")
      .select(col("lang"), split(col("c"), " ").as("ct"), split(col("r"), " ").as("rt"))
    val out = Eval.rougeLStats(df, "lang", "ct", "rt")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("en").getAs[Long]("lcs_sum") === 4L)
    assert(out("en").getAs[Long]("cand_tokens") === 6L)
    assert(out("en").getAs[Long]("p_milli") === 666L) // 4000 div 6
    assert(out("en").getAs[Long]("f1_milli") === 666L) // 8000 div 12
    assert(out("de").getAs[Long]("lcs_sum") === 0L)
    assert(out("de").getAs[Long]("p_milli") === 0L)
  }

  test("distinctNgramStats: totals, distincts, milli ratio by hand") {
    val docs = Seq(
      ("a", "x y x y"), // uni: 4 total, 2 distinct; bi: 3 total ('x y','y x','x y') 2 distinct
      ("a", "x y"), // uni: +2 total, same 2 distinct; bi: +1 'x y'
      ("b", "u v w")) // uni 3/3, bi 2/2, tri 1/1
      .toDF("source", "text")
    val out = Eval.distinctNgramStats(docs, "source", "text", maxN = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(out(("a", 1)).getAs[Long]("total_ngrams") === 6L)
    assert(out(("a", 1)).getAs[Long]("distinct_ngrams") === 2L)
    assert(out(("a", 1)).getAs[Long]("distinct_milli") === 333L)
    assert(out(("a", 2)).getAs[Long]("total_ngrams") === 4L)
    assert(out(("a", 2)).getAs[Long]("distinct_ngrams") === 2L)
    assert(out(("b", 3)).getAs[Long]("total_ngrams") === 1L)
    assert(out(("b", 3)).getAs[Long]("distinct_milli") === 1000L)
    // doc 'x y' has no trigram: group (a, 3) counts only the first doc's 2
    assert(out(("a", 3)).getAs[Long]("total_ngrams") === 2L)
  }

  test("tokenEditDistance: hand values and recursive-definition property") {
    import org.apache.spark.sql.functions._
    def dist(a: Seq[String], b: Seq[String]): Int =
      Seq((a, b)).toDF("a", "b")
        .select(Eval.tokenEditDistance(col("a"), col("b"))).head().getInt(0)
    assert(dist(Seq("a", "b", "c"), Seq("a", "b", "c")) === 0)
    assert(dist(Seq("a", "b", "c"), Seq("a", "x", "c")) === 1) // substitution
    assert(dist(Seq("a", "b"), Seq("a", "b", "c")) === 1) // insertion
    assert(dist(Seq("a", "b", "c"), Seq("b", "c")) === 1) // deletion
    assert(dist(Nil, Seq("x", "y")) === 2)
    assert(dist(Seq("x", "y"), Nil) === 2)
    // token grain, not characters: one long-word substitution costs 1
    assert(dist(Seq("kitten", "sat"), Seq("sitting", "sat")) === 1)
    // property: equals the textbook recursion on pseudo-random sequences
    def naive(a: List[String], b: List[String]): Int = (a, b) match {
      case (Nil, _) => b.length
      case (_, Nil) => a.length
      case (x :: xs, y :: ys) =>
        math.min(naive(xs, ys) + (if (x == y) 0 else 1),
          math.min(naive(xs, b) + 1, naive(a, ys) + 1))
    }
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 15) {
      val a = List.fill(rnd.nextInt(8))(('a' + rnd.nextInt(3)).toChar.toString)
      val b = List.fill(rnd.nextInt(8))(('a' + rnd.nextInt(3)).toChar.toString)
      assert(dist(a, b) === naive(a, b), s"$a vs $b")
    }
  }

  test("werStats: golden values over a two-group corpus") {
    val out = Eval.werStats(Seq(
        (1L, "en", "the cat sat", "the cat sat"), // 0 edits
        (2L, "en", "a b c d", "a x c"), // sub + del -> 2
        (3L, "de", "ja", "ja nein")) // 1 insertion
        .toDF("pair_id", "lang", "cand_text", "ref_text"))
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("pairs") === 2L)
    assert(en.getAs[Long]("edits_sum") === 2L)
    assert(en.getAs[Long]("cand_tokens") === 7L && en.getAs[Long]("ref_tokens") === 6L)
    assert(en.getAs[Long]("wer_milli") === 333L) // 1000*2 div 6
    val de = out("de")
    assert(de.getAs[Long]("edits_sum") === 1L && de.getAs[Long]("wer_milli") === 500L)
  }

  test("clippedOverlap: sort-merge count equals the naive per-value minimum") {
    import org.apache.spark.sql.functions._
    def overlap(a: Seq[String], b: Seq[String]): Long =
      Seq((a, b)).toDF("a", "b")
        .select(Eval.clippedOverlap(col("a"), col("b"))).head().getLong(0)
    // hand values
    assert(overlap(Seq("x", "x", "y"), Seq("x", "y", "y")) === 2L) // min(2,1)+min(1,2)
    assert(overlap(Seq("a"), Seq("b")) === 0L)
    assert(overlap(Nil, Seq("a")) === 0L)
    assert(overlap(Seq("q", "q", "q"), Seq("q")) === 1L) // clipping
    // property: equals the naive definition on pseudo-random multisets
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val a = Seq.fill(rnd.nextInt(30))(('a' + rnd.nextInt(4)).toChar.toString)
      val b = Seq.fill(rnd.nextInt(30))(('a' + rnd.nextInt(4)).toChar.toString)
      val naive = (a ++ b).distinct.map(v =>
        math.min(a.count(_ == v), b.count(_ == v)).toLong).sum
      assert(overlap(a, b) === naive, s"$a vs $b")
    }
  }

  test("eval builders are lazy: construction launches no Spark jobs") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.functions._
    val sc = spark.sparkContext
    // job properties are thread-local: tag this thread so concurrently
    // running suites' jobs can't pollute the count
    val tag = "graft.eval.lazyprobe"
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (j.properties != null && j.properties.getProperty(tag) != null)
          seen.incrementAndGet()
    }
    // inputs built BEFORE the tag: spark.read.parquet may run its own
    // schema-inference job, which is not the contract under test
    val d = sf("documents").select(col("doc_id"), col("lang"), col("text"))
    val pairs = d.join(
        d.select((col("doc_id") + 1).as("doc_id"), col("text").as("ref_text")),
        Seq("doc_id"))
      .select(col("lang"), col("text").as("cand_text"), col("ref_text"))
    sc.addSparkListener(listener)
    sc.setLocalProperty(tag, "1")
    try {
      // the round-14 regression: spread() probed .rdd.getNumPartitions,
      // which finalizes AQE and runs every upstream stage HERE, at
      // DataFrame-construction time (and again at the real action)
      Eval.bleuStats(pairs); Eval.chrFStats(pairs); Eval.werStats(pairs)
      Eval.distinctNgramStats(d, groupCol = "lang", textCol = "text")
      // marker action (exactly one job, no shuffle); listener delivery is
      // in-order per bus, so once it lands any construction-time job from
      // this thread would already have been counted
      spark.range(1).collect()
      val deadline = System.nanoTime() + 10000000000L
      while (seen.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(seen.get() === 1,
        "constructing eval frames launched Spark jobs (AQE finalized at build time)")
    } finally {
      sc.setLocalProperty(tag, null)
      sc.removeSparkListener(listener)
    }
  }

  test("spread: cached input at session parallelism is never re-shuffled") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val docs = sf("documents").select(col("source"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism).cache()
    docs.count() // materialize the cache
    try {
      // the partitioning probe must see THROUGH InMemoryTableScan into
      // the cached plan's partitioning instead of treating the cache as
      // an opaque single-partition leaf and re-shuffling it
      val plan = Eval.ngramFrame(docs).queryExecution.sparkPlan
      val exchanges = plan.collect { case e: ShuffleExchangeLike => e }
      assert(exchanges.isEmpty,
        s"cached input at full parallelism was re-shuffled:\n$plan")
    } finally { docs.unpersist(); () }
  }

  test("spread: small shuffle-joined input still gets the parallelism floor") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    // force a shuffle join: the static exchange then claims
    // shuffle.partitions, but AQE coalescing would collapse this
    // small-byte exchange to 1-2 runtime partitions and serialize the
    // gram explode — the floor must fire on the leaf-bytes signal
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val d = sf("documents").select(col("doc_id"), col("lang"), col("text"))
      val pairs = d.join(
          d.select((col("doc_id") + 1).as("doc_id"), col("text").as("ref_text")),
          Seq("doc_id"))
        .select(col("lang"), col("text").as("cand_text"), col("ref_text"))
      val want = spark.sparkContext.defaultParallelism
      val plan = Eval.bleuStats(pairs).queryExecution.sparkPlan
      val floor = plan.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning == RoundRobinPartitioning(want) => e
      }
      assert(floor.nonEmpty,
        s"no parallelism-floor repartition($want) in the shuffled-input plan:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("spread: multi-split shuffle-joined input — floor comes from the byte branch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    // ADVICE r15: on 4.1.2, EnsureRequirements inserts join/aggregate
    // exchanges only into executedPlan, so a probe that looks for
    // ShuffleExchangeLike in sparkPlan never sees a join-forced shuffle.
    // This fixture has >= parallelism/2 FILE SPLITS, so the split-count
    // fallback (est*2 < want) CANNOT fire — if the parallelism floor
    // appears, it can only have come from detecting the shuffle-forcing
    // join operator and taking the leaf-bytes AQE-coalesce branch.
    val want = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("graft_spread_splits")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      sf("documents").select(col("doc_id"), col("lang"), col("text"))
        .repartition(want).write.mode("overwrite").parquet(s"$dir/docs")
      val d = spark.read.parquet(s"$dir/docs")
      val splits = d.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s.inputRDD.getNumPartitions
      }.head
      assert(splits >= want / 2, s"fixture must be multi-split, got $splits")
      val pairs = d.join(
          d.select((col("doc_id") + 1).as("doc_id"), col("text").as("ref_text")),
          Seq("doc_id"))
        .select(col("lang"), col("text").as("cand_text"), col("ref_text"))
      val plan = Eval.bleuStats(pairs).queryExecution.sparkPlan
      val floor = plan.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning == RoundRobinPartitioning(want) => e
      }
      assert(floor.nonEmpty,
        s"no parallelism-floor repartition($want) over a multi-split shuffled input:\n$plan")
      // boundary pin (misfire ceiling): with the advisory shrunk to 1 byte,
      // leafBytes >= advisory*want, so AQE would NOT coalesce below the
      // session parallelism and the floor must stand down — the byte
      // threshold, not the mere presence of a join, is what fires it
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1b")
      val plan2 = Eval.bleuStats(pairs).queryExecution.sparkPlan
      val floor2 = plan2.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning == RoundRobinPartitioning(want) => e
      }
      assert(floor2.isEmpty,
        s"floor fired above the advisory-byte threshold:\n$plan2")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      graft.io.Scratch.deleteRecursively(dir)
    }
  }

  test("spread: RDD-backed shuffle-joined input at parallelism is not re-shuffled") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    // ADVICE r15 (low): the byte probe sums only sizeable leaves; an
    // RDD-backed input has none, and must fall back to the split-count
    // estimate instead of being unconditionally re-shuffled
    val want = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val rdd = spark.sparkContext
        .parallelize(1 to 400, want).map(i => (i.toLong, s"tok$i text body"))
      val d = spark.createDataFrame(rdd).toDF("doc_id", "text")
      val pairs = d.join(
          d.select((col("doc_id") + 1).as("doc_id"), col("text").as("ref_text")),
          Seq("doc_id"))
        .select(lit("xx").as("lang"), col("text").as("cand_text"), col("ref_text"))
      val plan = Eval.bleuStats(pairs).queryExecution.sparkPlan
      val floor = plan.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning == RoundRobinPartitioning(want) => e
      }
      assert(floor.isEmpty,
        s"RDD input already at parallelism $want was re-shuffled:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("spread: mixed file+RDD leaves fall to the split estimate, not a partial byte sum") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning
    // a plan with ONE sized leaf (the small parquet) and one unsized
    // RDD leaf must NOT sum only the sized leaf — that partial sum
    // underestimates arbitrarily large RDD inputs and would fire the
    // floor (an extra full shuffle) on exactly the frames that least
    // need it; all-leaves-or-nothing sends this to the split estimate,
    // where the RDD side already carries the session parallelism
    val want = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val d = sf("documents").select(col("doc_id"), col("text"))
      val rdd = spark.sparkContext
        .parallelize(1 to 400, want).map(i => (i.toLong, s"ref body $i"))
      val refs = spark.createDataFrame(rdd).toDF("doc_id", "ref_text")
      val pairs = d.join(refs, Seq("doc_id"))
        .select(lit("xx").as("lang"), col("text").as("cand_text"), col("ref_text"))
      val plan = Eval.bleuStats(pairs).queryExecution.sparkPlan
      val floor = plan.collect {
        case e: ShuffleExchangeExec
          if e.outputPartitioning == RoundRobinPartitioning(want) => e
      }
      assert(floor.isEmpty,
        s"partial leaf-byte sum re-shuffled a mixed file+RDD input at parallelism $want:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("chrFStats: whitespace removal, clipping, recall side, by hand") {
    // cand 'ab ba' -> 'abba' (4 chars), ref 'ab ab' -> 'abab'
    // 1-grams: cand {a:2,b:2}, ref {a:2,b:2} -> match 4 of 4 (P=R=1000)
    // 2-grams: cand {ab,bb,ba}, ref {ab:2,ba} -> clip: ab 1, ba 1 = 2 of 3
    val out = Eval.chrFStats(
      Seq((1L, "en", "ab ba", "ab ab")).toDF("pair_id", "lang", "cand_text", "ref_text"),
      maxN = 3).collect().map(r => r.getString(0) -> r).toMap
    val m = out("en")
    assert(m.getAs[Long]("cand_chars") === 4L && m.getAs[Long]("ref_chars") === 4L)
    assert(m.getAs[Long]("match_1") === 4L &&
      m.getAs[Long]("ctotal_1") === 4L && m.getAs[Long]("rtotal_1") === 4L)
    assert(m.getAs[Long]("prec1_milli") === 1000L && m.getAs[Long]("rec1_milli") === 1000L)
    assert(m.getAs[Long]("match_2") === 2L && m.getAs[Long]("ctotal_2") === 3L)
    assert(m.getAs[Long]("prec2_milli") === 666L && m.getAs[Long]("rec2_milli") === 666L)
    // 3-grams: cand {abb,bba}, ref {aba,bab} -> 0 matches
    assert(m.getAs[Long]("match_3") === 0L && m.getAs[Long]("ctotal_3") === 2L)
    // asymmetric lengths drive P and R apart: cand 'aaa', ref 'aaaaaa'
    // 1-grams match 3 (clip at cand count): P = 3/3, R = 3/6
    val asym = Eval.chrFStats(
      Seq((1L, "en", "aaa", "aaaaaa")).toDF("pair_id", "lang", "cand_text", "ref_text"),
      maxN = 1).collect().head
    assert(asym.getAs[Long]("match_1") === 3L)
    assert(asym.getAs[Long]("prec1_milli") === 1000L)
    assert(asym.getAs[Long]("rec1_milli") === 500L)
    // short side: empty-after-squash candidate yields zero totals, null P
    val empty = Eval.chrFStats(
      Seq((1L, "en", " \t ", "ab")).toDF("pair_id", "lang", "cand_text", "ref_text"),
      maxN = 1).collect().head
    assert(empty.getAs[Long]("ctotal_1") === 0L)
    assert(empty.isNullAt(empty.fieldIndex("prec1_milli")))
    assert(empty.getAs[Long]("rtotal_1") === 2L && empty.getAs[Long]("rec1_milli") === 0L)
  }
}
