package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list, via alternating
  * large-star / small-star contraction (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014 — public algorithm).
  *
  * Each round is two groupBy+join passes over the CURRENT edge set — no
  * per-node neighbor lists are ever collected (the classic label-
  * propagation formulation buffers whole neighborhoods; this one keeps
  * every aggregation state a single min). The edge set only shrinks
  * toward the star forest, and convergence is O(log n) rounds, so the
  * driver loop runs a handful of cheap iterations even at graph sizes
  * where a single-machine union-find is impossible.
  *
  * Scale notes: every shuffle is keyed on a node id (narrow rows of two
  * longs); `localCheckpoint` truncates the iterative lineage each round
  * (without it the plan doubles per iteration and the optimizer chokes
  * long before the data does).
  */
object ConnectedComponents {

  /** edges(src, dst) → (node, root) where root is the smallest node id in
    * the component. Nodes with no edges don't appear — callers left-join
    * and coalesce to self. Self-loops and duplicates are tolerated.
    *
    * Size-aware: an edge set under `driverThreshold` (after dedup) is
    * solved by one collect + union-find — O(E α(E)) on the driver beats
    * ~log n shuffle rounds when E is perimeter-sized, which is exactly
    * what [[graft.geo.RasterPolygonize]]'s contracted graphs are. Larger
    * graphs take the distributed large-star/small-star path; the
    * threshold is the handover dial, not a capacity limit.
    */
  def run(edges: DataFrame, maxIters: Int = 50,
      driverThreshold: Long = 100000L): DataFrame = {
    var e = edges
      // normalize to LongType up front: the driver path reads getLong and
      // int-typed edge columns would ClassCastException there while the
      // distributed path accepted them — behavior must not flip on volume,
      // and both paths now return (node, root) as longs
      .select(greatest(col("src"), col("dst")).cast("long").as("u"),
        least(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    val nEdges = e.count()
    if (nEdges <= driverThreshold) return runOnDriver(e)

    // one alternating large-star/small-star contraction round; output
    // edges are distinct (u > v) pairs
    def round(in: DataFrame): DataFrame = {
      // large-star: attach every strictly-larger neighbor of u to the min
      // of u's closed neighborhood
      val sym = in.unionAll(in.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(greatest(col("v"), col("m")).as("u"),
          least(col("v"), col("m")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star: attach every smaller neighbor (and u itself) to the
      // min of u's smaller neighborhood; ls edges are already (u > v)
      val mins2 = ls.groupBy("u").agg(min("v").as("m"))
      ls.join(mins2, "u")
        .select(col("v").as("n"), col("m"))
        .unionAll(mins2.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
    }

    var prevSig: Option[(Long, Long)] = None
    var iter = 0
    var converged = nEdges == 0L
    while (!converged && iter < maxIters) {
      val ss = round(e).localCheckpoint()
      // order-independent signature instead of a full set-compare: two
      // exceptAll jobs per round would double the loop cost (xor fold:
      // no ANSI overflow, edges are distinct so no self-cancellation)
      val sigRow = ss.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      val sig = (sigRow.getLong(0), if (sigRow.isNullAt(1)) 0L else sigRow.getLong(1))
      converged = prevSig.contains(sig) || sig._1 == 0L
      prevSig = Some(sig)
      e = ss
      iter += 1
    }
    // non-convergence must be LOUD: intermediate edges are not (node,
    // component-min) pairs, and emitting them would corrupt every
    // downstream component id with no error
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds")
    // the signature is probabilistic: a (count, xor-of-hash) collision
    // between consecutive NON-equal edge sets would silently accept a
    // non-converged state. One exact check at the end — a single extra
    // round plus exceptAll, O(1) of total loop cost — removes the
    // collision bound from the correctness argument entirely. (Both sides
    // are distinct sets, so equal counts + empty one-way difference
    // implies set equality.)
    if (prevSig.exists(_._1 > 0L)) {
      val next = round(e)
      val sameCount = next.count() == prevSig.get._1
      if (!sameCount || next.exceptAll(e).limit(1).count() > 0L)
        throw new IllegalStateException(
          "connected components: signature collision — edge set accepted as " +
            "converged was not a fixpoint")
    }
    e.select(col("u").as("node"), col("v").as("root"))
  }

  /** Exact same contract as [[run]], solved with an in-memory union-find
    * over a collected (small) edge list.
    */
  private def runOnDriver(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = new scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var root = parent.getOrElseUpdate(x, x)
      while (parent(root) != root) root = parent(root)
      var cur = x
      while (parent(cur) != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    for ((a, b) <- pairs) {
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val out = parent.keysIterator
      .map(n => n -> find(n))
      .filter { case (n, r) => n != r }
      .toSeq
    spark.createDataset(out).toDF("node", "root")
  }
}
