package graft.queries

import org.apache.spark.sql.functions._
import Qx._

/** Classic decision-support join/agg shapes (TPC-H Q3/Q4/Q7 analogs on the
  * synthetic star schema) — exercising join reorder, semi-join
  * decorrelation, and multi-dimension aggregation at bench scale — plus
  * the reference dashboard's top-k positivity query (J8/O4).
  */
object TpchQueries {

  val all: Seq[Q] = Seq(

    // ---- Q3 shape: shipping priority (join + agg + top-k) -----------------
    Q("q70_shipping_priority",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15"))
        val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(dbl(sum(d12(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))))).as("revenue"))
          .orderBy(desc("revenue"), col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---- Q4 shape: order-priority check via EXISTS semi-join --------------
    Q("q71_order_priority_exists",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-07-01"))
        val lateItems = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        o.join(lateItems, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY 1 ORDER BY 1""")),

    // ---- Q7 shape: volume between two nation pairs ------------------------
    Q("q72_nation_volume",
      (s, dir) => {
        val supNation = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val custNation = t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("cn_key"))
          .select(col("c_custkey"), col("cust_nation"))
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(supNation, col("l_suppkey") === col("s_suppkey"))
          .join(custNation, col("o_custkey") === col("c_custkey"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("int").as("ship_year"))
          .agg(dbl(sum(d12(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))))).as("volume"),
            count(lit(1)).as("shipments"))
          .orderBy("supp_nation", "cust_nation", "ship_year")
      },
      Some("""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
          CAST(year(l_shipdate) AS INTEGER) AS ship_year,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume,
          COUNT(*) AS shipments
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // ---- Q18 shape: large orders via HAVING + semi-join -------------------
    Q("q74_large_orders",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val bigOrders = l.groupBy("l_orderkey")
          .agg(dbl(sum(d12(col("l_quantity")))).as("total_qty"))
          .filter(col("total_qty") > 150)
        o.join(bigOrders, col("o_orderkey") === bigOrders("l_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
          .limit(25)
      },
      Some("""
        WITH big AS (
          SELECT l_orderkey,
            CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY 1
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 150)
        SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM orders
          JOIN big ON o_orderkey = big.l_orderkey
          JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""")),

    // ---- Q22 shape: scalar avg subquery + anti join -----------------------
    Q("q75_dormant_rich_customers",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(year(col("o_orderdate")) >= 1999)
        val avgBal = c.filter(col("c_acctbal") > 0)
          .agg((dbl(sum(d12(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(o, col("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy((col("c_custkey") % 7).as("cust_group"))
          .agg(count(lit(1)).as("numcust"),
            dbl(sum(d12(col("c_acctbal")))).as("totacctbal"))
          .orderBy("cust_group")
      },
      Some("""
        WITH avg_bal AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS v
          FROM customer WHERE c_acctbal > 0)
        SELECT c_custkey % 7 AS cust_group, COUNT(*) AS numcust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer, avg_bal
        WHERE c_acctbal > avg_bal.v
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND year(o_orderdate) >= 1999)
        GROUP BY 1 ORDER BY 1""")),

    // ---- Q17 shape: small-quantity revenue vs per-part average ------------
    // The broadcast-aggregate-join decorrelation: the per-part average
    // quantity (the correlated subquery in the classic formulation)
    // computes ONCE as a keyed aggregate and joins back — at scale the
    // aggregate side is |parts|-sized, far under the fact table, and the
    // brand filter prunes both sides before the join. Threshold math is
    // IEEE-identical in both engines: avg = CAST(decimal sum AS
    // DOUBLE)/count, then one multiply by 0.2, parenthesized the same.
    Q("q125_small_qty_revenue",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val p = t(s, dir, "part").filter(col("p_brand") === "Brand#23")
        val avgQ = l.groupBy(col("l_partkey").as("pk"))
          .agg((dbl(sum(d12(col("l_quantity")))) / count(lit(1))).as("avg_qty"))
        l.join(p, col("l_partkey") === col("p_partkey"))
          .join(avgQ, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg((dbl(sum(d12(col("l_extendedprice")))) / lit(7.0)).as("avg_yearly"),
            count(lit(1)).as("small_lots"))
      },
      Some("""
        WITH avg_q AS (
          SELECT l_partkey AS pk,
            CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
          FROM lineitem GROUP BY 1)
        SELECT
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
          COUNT(*) AS small_lots
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN avg_q ON l_partkey = pk
        WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty""")),

    // ---- F14/F19 sanitize chain under the oracle --------------------------
    Q("q76_name_sanitize",
      (s, dir) => t(s, dir, "supplier")
        .select(regexp_replace(
          regexp_replace(lower(trim(col("s_name"))), "[^a-z0-9]+", "_"),
          "_+", "_").as("sanitized"))
        .groupBy(substring(col("sanitized"), -2, 2).as("suffix"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("sanitized")).as("distinct_names"))
        .orderBy("suffix"),
      Some("""
        WITH s AS (
          SELECT regexp_replace(
            regexp_replace(lower(trim(s_name)), '[^a-z0-9]+', '_', 'g'),
            '_+', '_', 'g') AS sanitized
          FROM supplier)
        SELECT right(sanitized, 2) AS suffix, COUNT(*) AS cnt,
          COUNT(DISTINCT sanitized) AS distinct_names
        FROM s GROUP BY 1 ORDER BY 1""")),

    // ---- J8/O4: dashboard top-20 villages by positivity (min 10 tests) ----
    Q("q73_top_villages",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val lab = o.select(
          concat(lit("V"), col("o_custkey") % 40).as("village"),
          (col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH").as("is_positive"))
        graft.api.DashboardPipeline.topVillages(lab, minTests = 10, k = 20)
      },
      Some("""
        WITH lab AS (
          SELECT 'V' || CAST(o_custkey % 40 AS VARCHAR) AS village,
            o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_positive
          FROM orders),
        agg AS (
          SELECT village, COUNT(*) AS total_tests,
            CAST(SUM(CASE WHEN is_positive THEN 1 ELSE 0 END) AS BIGINT) AS positive_cases
          FROM lab GROUP BY 1 HAVING COUNT(*) >= 10)
        SELECT village, total_tests, positive_cases,
          CASE WHEN total_tests > 0
            THEN round_even(CAST(positive_cases AS DOUBLE) / total_tests * 100, 2)
            ELSE 0.0 END AS positivity_rate
        FROM agg ORDER BY positivity_rate DESC, village LIMIT 20""")),

    // ---- Q5 shape: local-supplier volume (6-table join) -------------------
    // The canonical join-reorder stress: fact tables join on their keys
    // while region/nation/supplier ride broadcasts; the local-supplier
    // predicate (c_nationkey = s_nationkey) correlates two dim joins.
    Q("q87_local_supplier_volume",
      (s, dir) => {
        val asia = broadcast(t(s, dir, "nation")
          .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey")))
        val sup = broadcast(t(s, dir, "supplier"))
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1996)
        val l = t(s, dir, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(asia, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(dbl(sum(d12(col("l_extendedprice")) *
            (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))))).as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""
        SELECT n_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ---- Q10 shape: returned-item reporting (top 20 by lost revenue) ------
    Q("q88_returned_items",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = broadcast(t(s, dir, "nation"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-10-01") &&
            col("o_orderdate") < lit("1997-01-01"))
        val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(dbl(sum(d12(col("l_extendedprice")) *
            (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))))).as("revenue"))
          .orderBy(desc("revenue"), col("c_custkey"))
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name, c_acctbal, n_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ---- Q14 shape: promo revenue share per month -------------------------
    // Conditional-aggregate ratio: both sums stay decimal (exact) and only
    // the final ratio goes through doubles, identically ordered on both
    // engines.
    Q("q89_promo_share",
      (s, dir) => {
        val p = broadcast(t(s, dir, "part"))
        val l = t(s, dir, "lineitem")
          .filter(year(col("l_shipdate")) === 1996)
        val vol = d12(col("l_extendedprice")) *
          (lit(1).cast("decimal(3,2)") - d4(col("l_discount")))
        l.join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(month(col("l_shipdate")).cast("int").as("month"))
          .agg(
            dbl(sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0).cast("decimal(12,2)")))).as("promo_revenue"),
            dbl(sum(vol)).as("total_revenue"))
          .withColumn("promo_share",
            when(col("total_revenue") > 0,
              col("promo_revenue") / col("total_revenue") * 100.0).otherwise(0.0))
          .orderBy("month")
      },
      Some("""
        SELECT CAST(month(l_shipdate) AS INTEGER) AS month,
          CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
          CASE WHEN CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) > 0
            THEN CAST(SUM(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
              / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) * 100.0
            ELSE 0.0 END AS promo_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) = 1996
        GROUP BY 1 ORDER BY 1""")),

    // ---- Q8 shape: national market share per year -------------------------
    Q("q90_market_share",
      (s, dir) => {
        val america = broadcast(t(s, dir, "nation").as("cn")
          .join(t(s, dir, "region").filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("c_nkey")))
        val supNation = broadcast(t(s, dir, "supplier")
          .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation")))
        val p = broadcast(t(s, dir, "part").filter(col("p_type") === "ECONOMY"))
        val vol = d12(col("l_extendedprice")) *
          (lit(1).cast("decimal(3,2)") - d4(col("l_discount")))
        t(s, dir, "lineitem")
          .join(p, col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(america, col("c_nationkey") === col("c_nkey"))
          .join(supNation, col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
          .agg(
            dbl(sum(when(col("supp_nation") === "NATION_3", vol)
              .otherwise(lit(0).cast("decimal(12,2)")))).as("nation_volume"),
            dbl(sum(vol)).as("total_volume"))
          .withColumn("mkt_share",
            when(col("total_volume") > 0,
              col("nation_volume") / col("total_volume")).otherwise(0.0))
          .orderBy("o_year")
      },
      Some("""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
            THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS nation_volume,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_volume,
          CASE WHEN CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) > 0
            THEN CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
              THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
              / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
            ELSE 0.0 END AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        GROUP BY 1 ORDER BY 1""")),

    // ---- Q15 shape: top supplier by window revenue (scalar-max subquery) --
    // The revenue CTE feeds both the ranking and the max — in Spark the
    // one-row max side is broadcast back against the same aggregate, so
    // ties surface exactly like the reference view formulation.
    Q("q113_top_supplier",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val sup = t(s, dir, "supplier")
        // referenced by both the ranking join and the scalar max — persist
        // so the lineitem scan+agg lineage runs ONCE (same discipline as
        // q35's pairs; a global window would single-partition the frame)
        val revenue = l
          .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(dbl(sum(d12(col("l_extendedprice")) *
            (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))))).as("total_revenue"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val maxRev = revenue.agg(max("total_revenue").as("mx"))
        sup.join(revenue, col("s_suppkey") === col("supplier_no"))
          .join(broadcast(maxRev), col("total_revenue") === col("mx"))
          .select("s_suppkey", "s_name", "total_revenue")
          .orderBy("s_suppkey")
      },
      Some("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey""")),

    // ---- Q6 shape: forecast-revenue — pure scan-side filter + one agg -----
    // The canonical pushdown probe: every predicate lands in
    // PushedFilters, nothing shuffles but one partial-agg row per task.
    Q("q108_forecast_revenue",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        l.filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
          .agg(dbl(sum(d12(col("l_extendedprice")) * d4(col("l_discount")))).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""
        SELECT
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
          AND l_quantity < 24""")),

    // ---- Q13 shape: order-count distribution incl. zero-order customers ---
    // The classic outer-join trap: the order filter must live in the JOIN
    // condition — in a WHERE it would silently turn the join inner and
    // drop the zero-order bucket.
    Q("q109_custdist",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""
        WITH per AS (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY 1)
        SELECT c_count, COUNT(*) AS custdist
        FROM per GROUP BY 1 ORDER BY custdist DESC, c_count DESC""")),

    // ---- Q19 shape: disjunctive-band join (equi key + OR residual) --------
    // Catalyst must extract the common l_partkey = p_partkey conjunct so
    // this stays a hash join with a residual filter — a naive planner
    // sees the OR and falls back to a cartesian nested loop.
    Q("q110_disjunctive_bands",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        val bands =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey") && bands)
          .agg(dbl(sum(d12(col("l_extendedprice")) *
            (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))))).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""
        SELECT
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey AND (
          (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11) OR
          (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20) OR
          (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""")),

    // ---- Q2 shape: min-cost supplier per part (agg + join-on-aggregate) ---
    // The schema has no partsupp table, so the observed supply cost proxies
    // it: min discounted price per (part, supplier) from lineitem. The Q2
    // skeleton survives intact — an aggregate correlated to each part
    // (the per-part minimum) decides which (part, supplier) rows survive,
    // and ALL tied suppliers are kept. Spark shape: two partial-agg
    // passes over the same narrow frame + an equi-join on (part, cost) —
    // the decorrelated form Catalyst would rewrite the scalar subquery to
    // anyway, stated directly.
    Q("q137_min_cost_supplier",
      (s, dir) => {
        val cost = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part").filter(col("p_size") < 10)
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(dbl(min(d12(col("l_extendedprice")) *
            (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))))).as("supply_cost"))
        val best = cost.groupBy(col("l_partkey").as("b_part"))
          .agg(min(col("supply_cost")).as("best_cost"))
        cost.join(best, col("l_partkey") === col("b_part") &&
            col("supply_cost") === col("best_cost"))
          .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
            col("s_name"), col("supply_cost"))
          .orderBy("p_partkey", "s_suppkey")
      },
      Some("""
        WITH cost AS (
          SELECT l_partkey, l_suppkey,
            CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
              AS supply_cost
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_size < 10 GROUP BY 1, 2),
        best AS (SELECT l_partkey, MIN(supply_cost) AS best_cost FROM cost GROUP BY 1)
        SELECT c.l_partkey AS p_partkey, s.s_suppkey, s.s_name, c.supply_cost
        FROM cost c
          JOIN best b ON c.l_partkey = b.l_partkey AND c.supply_cost = b.best_cost
          JOIN supplier s ON c.l_suppkey = s.s_suppkey
        ORDER BY 1, 2""")),

    // ---- Q11 shape: important parts (global-threshold scalar subquery) ----
    // Parts whose total traded value exceeds a fraction of the GLOBAL
    // value: the one-row global aggregate broadcasts into the per-part
    // HAVING — Spark's decorrelated plan for Q11's scalar subquery, and
    // the only sane 100-TB shape (the global sum is a second partial-agg
    // pass, never a driver-side constant baked per run). Decimal sums on
    // both sides keep the threshold compare exact.
    Q("q138_important_parts",
      (s, dir) => {
        val value = t(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(d12(col("l_extendedprice")) *
            (lit(1).cast("decimal(3,2)") - d4(col("l_discount")))).as("val_dec"))
        val total = value.agg(sum(col("val_dec")).as("total_dec"))
        // the threshold compare runs in DOUBLES: Spark's ANSI decimal
        // multiply rounds decimal(38,4)*decimal(6,4) at a different scale
        // than DuckDB's exact decimal(38,8), so a decimal-typed threshold
        // can disagree between engines near a boundary — one IEEE multiply
        // + compare is bit-identical in both
        value.crossJoin(broadcast(total))
          .filter(dbl(col("val_dec")) > dbl(col("total_dec")) * lit(0.0006))
          .select(col("l_partkey").as("p_partkey"), dbl(col("val_dec")).as("part_value"))
          .orderBy(desc("part_value"), col("p_partkey"))
      },
      Some("""
        WITH value AS (
          SELECT l_partkey,
            SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS val_dec
          FROM lineitem GROUP BY 1),
        total AS (SELECT SUM(val_dec) AS total_dec FROM value)
        SELECT l_partkey AS p_partkey, CAST(val_dec AS DOUBLE) AS part_value
        FROM value, total
        WHERE CAST(val_dec AS DOUBLE)
          > CAST(total_dec AS DOUBLE) * CAST(0.0006 AS DOUBLE)
        ORDER BY 2 DESC, 1""")),

    // ---- Q21 shape: the only-late supplier on multi-supplier orders -------
    // Q21's double correlated EXISTS/NOT EXISTS, stated as the per-order
    // aggregate Spark decorrelates it to: an item is late when it shipped
    // more than 90 days after the order date (the schema has no
    // commit/receipt dates); supplier S is charged for order O when S was
    // late on O, O involves >1 supplier, and S is the ONLY late supplier.
    // One narrow (orderkey, suppkey, late) aggregation feeds both exists
    // conditions — no correlated re-scan of lineitem per supplier.
    Q("q139_waiting_suppliers",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val perSupp = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(when(col("l_shipdate") > date_add(col("o_orderdate"), 90), 1L)
            .otherwise(0L)).as("late"))
        val perOrder = perSupp.groupBy(col("l_orderkey").as("po_key"))
          .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"))
        perSupp.join(perOrder, col("l_orderkey") === col("po_key"))
          .filter(col("late") === 1L && col("n_supp") > 1L && col("n_late") === 1L)
          .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), col("s_name"))
          .limit(10)
      },
      Some("""
        WITH per_supp AS (
          SELECT l_orderkey, l_suppkey,
            MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        per_order AS (
          SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
          FROM per_supp GROUP BY 1)
        SELECT s_name, COUNT(*) AS numwait
        FROM per_supp p
          JOIN per_order o ON p.l_orderkey = o.l_orderkey
          JOIN supplier ON p.l_suppkey = s_suppkey
        WHERE p.late = 1 AND o.n_supp > 1 AND o.n_late = 1
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 10""")),

    // ---- Q9 shape: product-type profit by nation and year -----------------
    // The widest TPC-H join tree (5 tables here — the testdata has no
    // partsupp, so supply cost is proxied as 10% of p_retailprice x qty,
    // keeping Q9's profit-arithmetic shape: revenue minus a cost term
    // joined in from the part dimension). All dims ride broadcasts; the
    // only exchanges are lineitem⋈orders on the orderkey and the final
    // (nation, year) aggregate. Profit stays decimal through the sum
    // (exact, order-free) and crosses to double once.
    Q("q146_product_profit",
      (s, dir) => {
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_name").contains("red"))
          .select("p_partkey", "p_retailprice"))
        val sup = broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"))
        val n = broadcast(t(s, dir, "nation").select("n_nationkey", "n_name"))
        val o = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
        val l = t(s, dir, "lineitem")
        l.join(p, col("l_partkey") === col("p_partkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg(dbl(sum(
            d12(col("l_extendedprice")) *
              (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))) -
              d12(col("p_retailprice")) * d12(col("l_quantity")) *
                lit(0.10).cast("decimal(3,2)"))).as("profit"))
          .orderBy(col("nation"), desc("o_year"))
      },
      Some("""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
          CAST(SUM(
            CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
            - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))
              * CAST(0.10 AS DECIMAL(3,2))) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC""")),

    // ---- Q16 shape: supplier counts per part attribute --------------------
    // partsupp is surrogated by DISTINCT (l_partkey, l_suppkey) off
    // lineitem — the observed supplier relation; "complaint" suppliers
    // (negative balance) leave via a broadcast LEFT ANTI join, and the
    // per-attribute distinct-supplier count is the two-level exact
    // count-distinct Spark plans as partial aggregation on the pair key.
    Q("q147_parts_supplier_count",
      (s, dir) => {
        val ps = t(s, dir, "lineitem")
          .select("l_partkey", "l_suppkey").distinct()
        val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#2" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size"))
        ps.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#2' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))
    ,

    // ---- Q20 shape: suppliers with surplus stock of selected parts --------
    // Q20's nested semi-join ladder (nation -> supplier -> partsupp with a
    // correlated lineitem sum), decorrelated the way Spark should plan
    // it: ONE conditional aggregate per (partkey, suppkey) yields both
    // the all-time and the 1996 shipped quantity — no per-pair re-scan —
    // and "stock" is surrogated by all-time shipped volume (no partsupp
    // table), keeping the shape: a pair qualifies when its surrogate
    // stock exceeds twice its 1996 movement. Part filter broadcasts into
    // the lineitem scan; the qualifying pair set collapses to a DISTINCT
    // suppkey semi-join; the nation dim rides a broadcast and the report
    // lists qualifying suppliers per nation (the testdata's synthetic
    // nations are too thin at sf0.001 for Q20's single-nation cut to
    // return rows). Decimal sums keep the threshold compare exact in
    // both engines.
    Q("q174_surplus_suppliers",
      (s, dir) => {
        val parts = broadcast(t(s, dir, "part")
          .filter(col("p_name").contains("red")).select("p_partkey"))
        val perPair = t(s, dir, "lineitem")
          .join(parts, col("l_partkey") === col("p_partkey"))
          .groupBy("l_partkey", "l_suppkey")
          .agg(sum(d12(col("l_quantity"))).as("qty_all"),
            sum(when(year(col("l_shipdate")) === 1996, d12(col("l_quantity"))))
              .as("qty96"))
          .filter(col("qty96").isNotNull && col("qty_all") > col("qty96") * 2)
        t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(perPair.select(col("l_suppkey")).distinct(),
            col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("n_name", "s_name", "s_acctbal")
          .orderBy("n_name", "s_name")
      },
      Some("""
        WITH pp AS (
          SELECT l_partkey, l_suppkey,
            SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_all,
            SUM(CASE WHEN year(l_shipdate) = 1996
              THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS qty96
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE '%red%'
          GROUP BY 1, 2)
        SELECT n_name, s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT DISTINCT l_suppkey FROM pp
            WHERE qty96 IS NOT NULL AND qty_all > qty96 * 2)
        ORDER BY n_name, s_name""")),

    // ---- Q12 shape: shipping-mode priority split --------------------------
    // TPC-H Q12 counts urgent vs non-urgent orders per ship mode under date
    // predicates. The synthetic lineitem has no l_shipmode/commitdate, so the
    // shape keeps Q12's essence — a fact→dim join rolled up into TWO
    // conditional counts per category under a scan-side date window — with
    // l_linestatus standing in for the mode. Scale: the orders side is
    // joined on its key, both conditional sums fold into ONE map-side
    // aggregate after the join (no second pass), and the date predicate
    // lands in PushedFilters on the lineitem scan.
    Q("q222_priority_split",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
        val o = t(s, dir, "orders")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_linestatus")
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT" ||
              col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(col("o_orderpriority") =!= "1-URGENT" &&
              col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
              .as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""
        SELECT l_linestatus,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
              THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY 1"""))
  )
}
