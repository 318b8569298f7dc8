package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.graph.LinkGraph
import Qx._

/** Link-graph document weighting — the CommonCrawl-style quality prior
  * (PageRank over the hyperlink graph; incoming anchor text as a signal
  * column). The synthetic corpus has no real hyperlinks, so both engines
  * derive the SAME deterministic graph from the data itself:
  *
  *   - a CHAIN edge from each doc to the next doc_id within its language
  *     (a reading-order / sitemap-like link), and
  *   - a HUB edge from each doc to the lowest doc_id of its source (every
  *     site links to its front page) — giving per-source hubs whose
  *     in-degree scales with site size, exactly the structure PageRank is
  *     meant to separate.
  *
  * The derivation is plain SQL (window lead + group-min), so the DuckDB
  * oracle reconstructs it verbatim and the integer-exact PageRank in
  * [[graft.graph.LinkGraph]] matches hash-for-hash.
  */
object GraphQueries {

  /** (src, dst, anchor) — anchor is the first 24 chars of the SOURCE
    * doc's text (what a crawler would see as the link's context).
    *
    * Scale note: the lead-within-lang window here is DERIVATION-ONLY —
    * it manufactures a link graph from a corpus that has none, so the
    * oracle can reconstruct it; its per-lang partitioning would serialize
    * at 100 TB. The operators under test (pagerank/hits/anchorsByTarget)
    * take an EDGE TABLE as input — in production the edges arrive
    * extracted (one row-local pass over documents), and no window exists
    * anywhere in the operators themselves (plan-asserted).
    */
  private def docLinks(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        substring(col("text"), 1, 24).as("anchor"))
    val chain = d
      .withColumn("dst",
        lead(col("doc_id"), 1).over(
          Window.partitionBy("lang").orderBy("doc_id")))
      .filter(col("dst").isNotNull)
      .select(col("doc_id").as("src"), col("dst"), col("anchor"))
    val hubs = d.groupBy("source").agg(min("doc_id").as("hub_id"))
    val hub = d.join(hubs, "source")
      .filter(col("doc_id") =!= col("hub_id"))
      .select(col("doc_id").as("src"), col("hub_id").as("dst"), col("anchor"))
    chain.unionByName(hub)
  }

  private val edgeSql =
    """edges AS (
      |  SELECT src, dst, anchor FROM (
      |    SELECT doc_id AS src,
      |      LEAD(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS dst,
      |      substr(text, 1, 24) AS anchor
      |    FROM documents) WHERE dst IS NOT NULL
      |  UNION ALL
      |  SELECT d.doc_id AS src, h.hub_id AS dst,
      |    substr(d.text, 1, 24) AS anchor
      |  FROM documents d
      |  JOIN (SELECT source, MIN(doc_id) AS hub_id
      |        FROM documents GROUP BY 1) h ON d.source = h.source
      |  WHERE d.doc_id <> h.hub_id)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- PageRank document weighting (integer-exact, 3 rounds) ------------
    Q("q224_pagerank",
      (s, dir) => {
        val pr = LinkGraph.pagerank(
          docLinks(s, dir).select("src", "dst"), iters = 3, scale = 1000000L)
        pr.orderBy("node_id").select(col("node_id").as("doc_id"), col("pr"))
      },
      Some(s"""
        WITH $edgeSql,
        e AS (SELECT src, dst FROM edges),
        nodes AS (SELECT DISTINCT src AS node_id FROM e
                  UNION SELECT dst FROM e),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
        r0 AS (SELECT node_id, CAST(1000000 AS BIGINT) AS pr FROM nodes),
        r1 AS (SELECT n.node_id,
                 150000 + (85 * COALESCE(x.in_sum, 0)) // 100 AS pr
               FROM nodes n LEFT JOIN (
                 SELECT e.dst, SUM(r.pr // d.outdeg) AS in_sum
                 FROM e JOIN deg d ON e.src = d.src
                        JOIN r0 r ON e.src = r.node_id
                 GROUP BY 1) x ON n.node_id = x.dst),
        r2 AS (SELECT n.node_id,
                 150000 + (85 * COALESCE(x.in_sum, 0)) // 100 AS pr
               FROM nodes n LEFT JOIN (
                 SELECT e.dst, SUM(r.pr // d.outdeg) AS in_sum
                 FROM e JOIN deg d ON e.src = d.src
                        JOIN r1 r ON e.src = r.node_id
                 GROUP BY 1) x ON n.node_id = x.dst),
        r3 AS (SELECT n.node_id,
                 150000 + (85 * COALESCE(x.in_sum, 0)) // 100 AS pr
               FROM nodes n LEFT JOIN (
                 SELECT e.dst, SUM(r.pr // d.outdeg) AS in_sum
                 FROM e JOIN deg d ON e.src = d.src
                        JOIN r2 r ON e.src = r.node_id
                 GROUP BY 1) x ON n.node_id = x.dst)
        SELECT node_id AS doc_id, CAST(pr AS BIGINT) AS pr
        FROM r3 ORDER BY 1""")),

    // ---- HITS hub/authority (integer-exact, 2 rounds) ----------------------
    // Kleinberg's mutual recursion over the same derived graph: per-source
    // hubs accumulate authority from the chain structure; the floordiv
    // rescale (max → 1024) keeps every score integral so both engines
    // match hash-exact. Two narrow long-keyed aggregates per round.
    Q("q230_hits",
      (s, dir) => LinkGraph.hits(
        docLinks(s, dir).select("src", "dst"), iters = 2, scale = 1024L)
        .orderBy("node_id"),
      Some(s"""
        WITH $edgeSql,
        e AS (SELECT src, dst FROM edges),
        nodes AS (SELECT DISTINCT src AS node_id FROM e
                  UNION SELECT dst FROM e),
        h0 AS (SELECT node_id, CAST(1024 AS BIGINT) AS h FROM nodes),
        a1r AS (SELECT e.dst, SUM(h0.h) AS r FROM e
                JOIN h0 ON h0.node_id = e.src GROUP BY 1),
        a1 AS (SELECT n.node_id, (1024 * COALESCE(x.r, 0)) // m.m AS a
               FROM nodes n LEFT JOIN a1r x ON n.node_id = x.dst
               CROSS JOIN (SELECT GREATEST(MAX(ABS(r)), 1) AS m FROM a1r) m),
        h1r AS (SELECT e.src, SUM(a1.a) AS r FROM e
                JOIN a1 ON a1.node_id = e.dst GROUP BY 1),
        h1 AS (SELECT n.node_id, (1024 * COALESCE(x.r, 0)) // m.m AS h
               FROM nodes n LEFT JOIN h1r x ON n.node_id = x.src
               CROSS JOIN (SELECT GREATEST(MAX(ABS(r)), 1) AS m FROM h1r) m),
        a2r AS (SELECT e.dst, SUM(h1.h) AS r FROM e
                JOIN h1 ON h1.node_id = e.src GROUP BY 1),
        a2 AS (SELECT n.node_id, (1024 * COALESCE(x.r, 0)) // m.m AS a
               FROM nodes n LEFT JOIN a2r x ON n.node_id = x.dst
               CROSS JOIN (SELECT GREATEST(MAX(ABS(r)), 1) AS m FROM a2r) m),
        h2r AS (SELECT e.src, SUM(a2.a) AS r FROM e
                JOIN a2 ON a2.node_id = e.dst GROUP BY 1),
        h2 AS (SELECT n.node_id, (1024 * COALESCE(x.r, 0)) // m.m AS h
               FROM nodes n LEFT JOIN h2r x ON n.node_id = x.src
               CROSS JOIN (SELECT GREATEST(MAX(ABS(r)), 1) AS m FROM h2r) m)
        SELECT h2.node_id, CAST(h2.h AS BIGINT) AS hub,
               CAST(a2.a AS BIGINT) AS auth
        FROM h2 JOIN a2 ON h2.node_id = a2.node_id
        ORDER BY 1""")),

    // ---- personalized PageRank: trusted-seed quality prior ----------------
    // Teleport mass lands only on the per-source hub docs (the trusted
    // set); a doc's rank IS its reachability from trust — the WebText
    // quality-filter discipline, integer-exact. Unreachable docs hold 0.
    Q("q242_personalized_pagerank",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val seeds = docs.groupBy("source").agg(min("doc_id").as("node_id"))
          .select("node_id")
        LinkGraph.pagerankPersonalized(
          docLinks(s, dir).select("src", "dst"), seeds,
          iters = 3, scale = 1000000L)
          .filter(col("pr") > 0).orderBy("node_id")
          .select(col("node_id").as("doc_id"), col("pr"))
      },
      Some(s"""
        WITH $edgeSql,
        e AS (SELECT src, dst FROM edges),
        nodes AS (SELECT DISTINCT src AS node_id FROM e
                  UNION SELECT dst FROM e),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
        seeds AS (SELECT MIN(doc_id) AS node_id FROM documents GROUP BY source),
        sn AS (SELECT n.node_id,
                 CASE WHEN s.node_id IS NULL THEN 0 ELSE 1 END AS s
               FROM nodes n LEFT JOIN seeds s ON n.node_id = s.node_id),
        r0 AS (SELECT node_id, CAST(s * 1000000 AS BIGINT) AS pr FROM sn),
        r1 AS (SELECT sn.node_id,
                 sn.s * 150000 + (85 * COALESCE(x.in_sum, 0)) // 100 AS pr
               FROM sn LEFT JOIN (
                 SELECT e.dst, SUM(r.pr // d.outdeg) AS in_sum
                 FROM e JOIN deg d ON e.src = d.src
                        JOIN r0 r ON e.src = r.node_id
                 GROUP BY 1) x ON sn.node_id = x.dst),
        r2 AS (SELECT sn.node_id,
                 sn.s * 150000 + (85 * COALESCE(x.in_sum, 0)) // 100 AS pr
               FROM sn LEFT JOIN (
                 SELECT e.dst, SUM(r.pr // d.outdeg) AS in_sum
                 FROM e JOIN deg d ON e.src = d.src
                        JOIN r1 r ON e.src = r.node_id
                 GROUP BY 1) x ON sn.node_id = x.dst),
        r3 AS (SELECT sn.node_id,
                 sn.s * 150000 + (85 * COALESCE(x.in_sum, 0)) // 100 AS pr
               FROM sn LEFT JOIN (
                 SELECT e.dst, SUM(r.pr // d.outdeg) AS in_sum
                 FROM e JOIN deg d ON e.src = d.src
                        JOIN r2 r ON e.src = r.node_id
                 GROUP BY 1) x ON sn.node_id = x.dst)
        SELECT node_id AS doc_id, CAST(pr AS BIGINT) AS pr
        FROM r3 WHERE pr > 0 ORDER BY 1""")),

    // ---- label propagation: hub langs spread through the link graph -------
    // Seeds = each source's hub doc labeled with its lang (the sparse
    // hand-audit stand-in); two rounds of clamped mode-voting spread the
    // labels along chain+hub edges. Mode ties break toward the larger
    // label (max (count, label) struct == ORDER BY cnt DESC, label DESC),
    // so both engines agree exactly.
    Q("q241_label_propagation",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val seeds = docs
          .join(docs.groupBy("source").agg(min("doc_id").as("node_id")),
            col("doc_id") === col("node_id"), "left_semi")
          .select(col("doc_id").as("node_id"), col("lang").as("label"))
        LinkGraph.labelPropagation(
          docLinks(s, dir).select("src", "dst"), seeds, iters = 2)
          .orderBy("node_id")
      },
      Some(s"""
        WITH $edgeSql,
        e AS (SELECT src, dst FROM edges),
        nodes AS (SELECT DISTINCT src AS node_id FROM e
                  UNION SELECT dst FROM e),
        seeds AS (
          SELECT d.doc_id AS node_id, d.lang AS label
          FROM documents d
          JOIN (SELECT source, MIN(doc_id) AS hub_id
                FROM documents GROUP BY 1) h
            ON d.doc_id = h.hub_id),
        l0 AS (SELECT n.node_id, s.label
               FROM nodes n LEFT JOIN seeds s ON n.node_id = s.node_id),
        v1 AS (SELECT e.dst, l.label, COUNT(*) AS cnt
               FROM e JOIN l0 l ON l.node_id = e.src
               WHERE l.label IS NOT NULL GROUP BY 1, 2),
        m1 AS (SELECT dst, label AS new_label FROM (
                 SELECT dst, label, ROW_NUMBER() OVER (PARTITION BY dst
                   ORDER BY cnt DESC, label DESC) AS rn FROM v1)
               WHERE rn = 1),
        l1 AS (SELECT n.node_id,
                 COALESCE(s.label, m.new_label, l.label) AS label
               FROM nodes n
               LEFT JOIN seeds s ON n.node_id = s.node_id
               LEFT JOIN l0 l ON n.node_id = l.node_id
               LEFT JOIN m1 m ON n.node_id = m.dst),
        v2 AS (SELECT e.dst, l.label, COUNT(*) AS cnt
               FROM e JOIN l1 l ON l.node_id = e.src
               WHERE l.label IS NOT NULL GROUP BY 1, 2),
        m2 AS (SELECT dst, label AS new_label FROM (
                 SELECT dst, label, ROW_NUMBER() OVER (PARTITION BY dst
                   ORDER BY cnt DESC, label DESC) AS rn FROM v2)
               WHERE rn = 1),
        l2 AS (SELECT n.node_id,
                 COALESCE(s.label, m.new_label, l.label) AS label
               FROM nodes n
               LEFT JOIN seeds s ON n.node_id = s.node_id
               LEFT JOIN l1 l ON n.node_id = l.node_id
               LEFT JOIN m2 m ON n.node_id = m.dst)
        SELECT node_id, label FROM l2 WHERE label IS NOT NULL
        ORDER BY 1""")),

    // ---- community quality: conductance of the LP partition ----------------
    // The evaluation leg for q241: for each propagated label, internal
    // edges (both ends in the community), cut edges (exactly one end in),
    // and conductance ≈ cut/(2·internal+cut) as an exact integer
    // milli-fraction — low conductance = a real community, high = labels
    // bleeding across structure. One edge pass joined twice against the
    // (narrow) label frame; unlabeled endpoints count toward the cut.
    Q("q247_lp_conductance",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val seeds = docs
          .join(docs.groupBy("source").agg(min("doc_id").as("node_id")),
            col("doc_id") === col("node_id"), "left_semi")
          .select(col("doc_id").as("node_id"), col("lang").as("label"))
        val labels = LinkGraph.labelPropagation(
          docLinks(s, dir).select("src", "dst"), seeds, iters = 2)
        val e = docLinks(s, dir).select("src", "dst")
          .join(labels.toDF("src", "l_src"), Seq("src"), "left")
          .join(labels.toDF("dst", "l_dst"), Seq("dst"), "left")
        val perLabel = e
          .select(explode(array(
            struct(col("l_src").as("label"),
              when(col("l_src") <=> col("l_dst"), 1L).otherwise(0L).as("internal"),
              when(col("l_src") <=> col("l_dst"), 0L).otherwise(1L).as("cut")),
            struct(col("l_dst").as("label"),
              lit(0L).as("internal"), // internal edges counted once, on src side
              when(col("l_src") <=> col("l_dst"), 0L).otherwise(1L).as("cut"))))
            .as("x"))
          .select(col("x.label"), col("x.internal"), col("x.cut"))
          .filter(col("label").isNotNull)
        perLabel.groupBy("label")
          .agg(sum("internal").as("internal_edges"),
            sum("cut").as("cut_edges"))
          .withColumn("conductance_milli",
            expr("(1000 * cut_edges) div " +
              "greatest(2 * internal_edges + cut_edges, 1L)"))
          .orderBy("label")
      },
      Some(s"""
        WITH $edgeSql,
        e0 AS (SELECT src, dst FROM edges),
        nodes AS (SELECT DISTINCT src AS node_id FROM e0
                  UNION SELECT dst FROM e0),
        seeds AS (
          SELECT d.doc_id AS node_id, d.lang AS label
          FROM documents d
          JOIN (SELECT source, MIN(doc_id) AS hub_id
                FROM documents GROUP BY 1) h
            ON d.doc_id = h.hub_id),
        l0 AS (SELECT n.node_id, s.label
               FROM nodes n LEFT JOIN seeds s ON n.node_id = s.node_id),
        v1 AS (SELECT e0.dst, l.label, COUNT(*) AS cnt
               FROM e0 JOIN l0 l ON l.node_id = e0.src
               WHERE l.label IS NOT NULL GROUP BY 1, 2),
        m1 AS (SELECT dst, label AS new_label FROM (
                 SELECT dst, label, ROW_NUMBER() OVER (PARTITION BY dst
                   ORDER BY cnt DESC, label DESC) AS rn FROM v1)
               WHERE rn = 1),
        l1 AS (SELECT n.node_id,
                 COALESCE(s.label, m.new_label, l.label) AS label
               FROM nodes n
               LEFT JOIN seeds s ON n.node_id = s.node_id
               LEFT JOIN l0 l ON n.node_id = l.node_id
               LEFT JOIN m1 m ON n.node_id = m.dst),
        v2 AS (SELECT e0.dst, l.label, COUNT(*) AS cnt
               FROM e0 JOIN l1 l ON l.node_id = e0.src
               WHERE l.label IS NOT NULL GROUP BY 1, 2),
        m2 AS (SELECT dst, label AS new_label FROM (
                 SELECT dst, label, ROW_NUMBER() OVER (PARTITION BY dst
                   ORDER BY cnt DESC, label DESC) AS rn FROM v2)
               WHERE rn = 1),
        l2 AS (SELECT n.node_id,
                 COALESCE(s.label, m.new_label, l.label) AS label
               FROM nodes n
               LEFT JOIN seeds s ON n.node_id = s.node_id
               LEFT JOIN l1 l ON n.node_id = l.node_id
               LEFT JOIN m2 m ON n.node_id = m.dst),
        le AS (
          SELECT e0.src, e0.dst, ls.label AS l_src, ld.label AS l_dst
          FROM e0
          LEFT JOIN l2 ls ON e0.src = ls.node_id
          LEFT JOIN l2 ld ON e0.dst = ld.node_id),
        contrib AS (
          SELECT l_src AS label,
            CASE WHEN l_src IS NOT DISTINCT FROM l_dst THEN 1 ELSE 0 END
              AS internal,
            CASE WHEN l_src IS NOT DISTINCT FROM l_dst THEN 0 ELSE 1 END
              AS cut
          FROM le
          UNION ALL
          SELECT l_dst AS label, 0 AS internal,
            CASE WHEN l_src IS NOT DISTINCT FROM l_dst THEN 0 ELSE 1 END
              AS cut
          FROM le)
        SELECT label,
          CAST(SUM(internal) AS BIGINT) AS internal_edges,
          CAST(SUM(cut) AS BIGINT) AS cut_edges,
          CAST((1000 * SUM(cut))
            // GREATEST(2 * SUM(internal) + SUM(cut), 1) AS BIGINT)
            AS conductance_milli
        FROM contrib WHERE label IS NOT NULL
        GROUP BY 1 ORDER BY 1""")),

    // ---- incoming anchor-text aggregation ---------------------------------
    Q("q225_anchor_text",
      (s, dir) =>
        LinkGraph.anchorsByTarget(docLinks(s, dir), cap = 16)
          .orderBy("doc_id"),
      Some(s"""
        WITH $edgeSql,
        inl AS (SELECT dst, COUNT(*) AS n_inlinks FROM edges GROUP BY 1),
        capped AS (
          SELECT dst, string_agg(anchor, '|' ORDER BY anchor) AS anchors
          FROM (
            SELECT dst, anchor,
              ROW_NUMBER() OVER (PARTITION BY dst ORDER BY anchor) AS rn
            FROM (SELECT DISTINCT dst, anchor FROM edges))
          WHERE rn <= 16 GROUP BY 1)
        SELECT inl.dst AS doc_id, inl.n_inlinks, capped.anchors
        FROM inl JOIN capped ON inl.dst = capped.dst
        ORDER BY 1"""))
  )
}
