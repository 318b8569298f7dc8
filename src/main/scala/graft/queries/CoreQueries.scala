package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Qx._

/** Core relational operator coverage over the synthetic star schema —
  * scans/filters (SURVEY.md §2.2), aggregations (§2.4), joins (§2.5),
  * windows (§2.6), sorts/limits (§2.7), set ops (§2.8) — each re-expressed
  * as the reference's operator shape on the TPC-H-ish tables, with a DuckDB
  * oracle mirror.
  *
  * Scale notes (100 TB design intent, verified via `.explain`):
  *  - dimension joins (nation/region/customer-side lookups) stay below the
  *    broadcast threshold → BroadcastHashJoin, no shuffle of the fact table;
  *  - every aggregate is a hash aggregate with map-side partial rows;
  *  - top-k goes through TakeOrderedAndProject (no global sort);
  *  - filters/projections reach the Parquet scan (PushedFilters/ReadSchema).
  */
object CoreQueries {

  val all: Seq[Q] = Seq(

    // ---- Aggregation spine (A1/A6-style pricing summary; TPC-H Q1 shape) --
    Q("q01_pricing_summary",
      (s, dir) => {
        val l = t(s, dir, "lineitem").filter(col("l_shipdate") <= lit("1998-09-02"))
        l.groupBy("l_returnflag", "l_linestatus")
          .agg(
            dbl(sum(d12(col("l_quantity")))).as("sum_qty"),
            dbl(sum(d12(col("l_extendedprice")))).as("sum_base_price"),
            dbl(sum(d12(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))))).as("sum_disc_price"),
            dbl(sum(d12(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))) * (lit(1).cast("decimal(3,2)") + d4(col("l_tax"))))).as("sum_charge"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", col("sum_qty") / col("count_order"))
          .withColumn("avg_price", col("sum_base_price") / col("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
          COUNT(*) AS count_order,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- S6/P5: filtered scan with pushdown + pruning ---------------------
    Q("q02_filtered_scan",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1998-01-01"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        ORDER BY o_orderkey""")),

    // ---- P1: case-insensitive exact-match filter --------------------------
    Q("q03_ci_filter",
      (s, dir) => t(s, dir, "customer")
        .filter(lower(trim(col("c_mktsegment"))) === "building")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE lower(trim(c_mktsegment)) = 'building'
        ORDER BY c_custkey""")),

    // ---- P2: year-set filter ----------------------------------------------
    Q("q04_year_in_filter",
      (s, dir) => t(s, dir, "orders")
        .filter(year(col("o_orderdate")).isin(1995, 1997, 1999))
        .groupBy(year(col("o_orderdate")).cast("int").as("order_year"))
        .agg(count(lit(1)).as("order_cnt"),
          dbl(sum(d12(col("o_totalprice")))).as("total_price"))
        .orderBy("order_year"),
      Some("""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
          COUNT(*) AS order_cnt,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders WHERE year(o_orderdate) IN (1995, 1997, 1999)
        GROUP BY 1 ORDER BY 1""")),

    // ---- P3: range/validity predicate (between) ---------------------------
    Q("q05_range_filter",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_quantity").between(10, 20) && col("l_discount") >= 0.05)
        .agg(count(lit(1)).as("cnt"),
          dbl(sum(d12(col("l_extendedprice")))).as("sum_price")),
      Some("""
        SELECT COUNT(*) AS cnt,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 AND l_discount >= 0.05""")),

    // ---- P4/O5: fuzzy substring suggestions, limit 10 ---------------------
    Q("q06_fuzzy_suggest",
      (s, dir) => t(s, dir, "part")
        .filter(lower(col("p_name")).contains("bolt"))
        .orderBy("p_partkey").limit(10)
        .select("p_partkey", "p_name"),
      Some("""
        SELECT p_partkey, p_name FROM part
        WHERE lower(p_name) LIKE '%bolt%' ORDER BY p_partkey LIMIT 10""")),

    // ---- A5-style histogram (value_counts) --------------------------------
    Q("q07_histogram",
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type"),
      Some("SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1 ORDER BY 1")),

    // ---- A2-style two-key aggregate over a join ---------------------------
    Q("q08_segment_year",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(year(col("o_orderdate")).cast("int").as("order_year"),
            col("c_mktsegment"))
          .agg(count(lit(1)).as("order_cnt"),
            dbl(sum(d12(col("o_totalprice")))).as("total_price"))
          .orderBy("order_year", "c_mktsegment")
      },
      Some("""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, c_mktsegment,
          COUNT(*) AS order_cnt,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- A3: per-group deterministic first + sampled attributes -----------
    Q("q09_group_first",
      (s, dir) => t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(min(col("c_name")).as("first_customer"),
          count(lit(1)).as("customer_cnt"),
          dbl(sum(d12(col("c_acctbal")))).as("sum_acctbal"))
        .orderBy("c_nationkey"),
      Some("""
        SELECT c_nationkey, MIN(c_name) AS first_customer, COUNT(*) AS customer_cnt,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        FROM customer GROUP BY 1 ORDER BY 1""")),

    // ---- A4: month-keyed aggregate with month-name lookup -----------------
    Q("q10_month_name",
      (s, dir) => t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("int").as("order_year"),
          month(col("o_orderdate")).cast("int").as("order_month"))
        .agg(count(lit(1)).as("order_cnt"))
        .withColumn("month_name",
          element_at(graft.clean.CleanFunctions.monthNumToName, col("order_month")))
        .select("order_year", "order_month", "month_name", "order_cnt")
        .orderBy("order_year", "order_month"),
      Some("""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
          CAST(month(o_orderdate) AS INTEGER) AS order_month,
          monthname(o_orderdate) AS month_name,
          COUNT(*) AS order_cnt
        FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2""")),

    // ---- A5: global summary scalars ---------------------------------------
    Q("q11_total_summary",
      (s, dir) => t(s, dir, "orders").agg(
        count(lit(1)).as("total_orders"),
        countDistinct(col("o_custkey")).as("distinct_customers"),
        dbl(sum(d12(col("o_totalprice")))).as("total_value"),
        min(year(col("o_orderdate"))).cast("int").as("min_year"),
        max(year(col("o_orderdate"))).cast("int").as("max_year"))
        .withColumn("year_range",
          concat_ws("-", col("min_year"), col("max_year"))),
      Some("""
        SELECT COUNT(*) AS total_orders,
          COUNT(DISTINCT o_custkey) AS distinct_customers,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
          CAST(MIN(year(o_orderdate)) AS INTEGER) AS min_year,
          CAST(MAX(year(o_orderdate)) AS INTEGER) AS max_year,
          CAST(MIN(year(o_orderdate)) AS INTEGER) || '-' || CAST(MAX(year(o_orderdate)) AS INTEGER) AS year_range
        FROM orders""")),

    // ---- A9: distinct value discovery -------------------------------------
    Q("q12_distinct_values",
      (s, dir) => t(s, dir, "orders").select("o_orderpriority").distinct()
        .orderBy("o_orderpriority"),
      Some("SELECT DISTINCT o_orderpriority FROM orders ORDER BY 1")),

    // ---- A10: location-hierarchy rollup (region -> sorted nation list) ----
    Q("q13_hierarchy",
      (s, dir) => {
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name")
          .agg(array_join(sort_array(collect_set(col("n_name"))), ",").as("nations"),
            countDistinct(col("n_name")).as("nation_cnt"))
          .orderBy("r_name")
      },
      Some("""
        SELECT r_name,
          array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
          COUNT(DISTINCT n_name) AS nation_cnt
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1 ORDER BY 1""")),

    // ---- A12: stats incl. exact median + area-weighted mean ---------------
    // Exact median WITHOUT a full per-group sort: build a (group, value)
    // histogram (map-side partial agg -> tiny shuffle), cumulative-count the
    // few distinct values with a window, and pick the middle pair by
    // position range. A row_number window over the raw rows sorts the whole
    // group on one task (3 groups = 3 tasks at any scale); the histogram
    // approach shuffles only |distinct values| rows per group. The
    // middle-pair is summed exactly as decimal, then one division by 2
    // (exact in binary). Stddev from exact decimal sums of x and x².
    Q("q14_stats_median",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        // ONE fact-table scan: group by (flag, quantity) with decimal
        // partial sums; every statistic then derives from the tiny
        // histogram (decimal addition is associative, so re-aggregated
        // partials equal the oracle's raw-row sums exactly).
        val hist = l.groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("c"),
            sum(d12(col("l_extendedprice")) * d4(col("l_discount"))).as("wsum_p"),
            sum(d4(col("l_discount"))).as("wtot_p"))
        val stats = hist.groupBy("l_returnflag")
          .agg(
            sum(col("c")).as("cnt"),
            min("l_quantity").as("min_qty"),
            max("l_quantity").as("max_qty"),
            dbl(sum(d12(col("l_quantity")) * col("c"))).as("sum_qty"),
            dbl(sum(d12(col("l_quantity")) * d12(col("l_quantity")) * col("c"))).as("sum_qty2"),
            dbl(sum(col("wsum_p"))).as("wsum"),
            dbl(sum(col("wtot_p"))).as("wtot"))
        val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
        val cum = hist
          .withColumn("cum_end", sum("c").over(w))
          .withColumn("cum_start", col("cum_end") - col("c") + 1)
        val mids = cum.join(stats.select(col("l_returnflag"), col("cnt")), "l_returnflag")
          .withColumn("k1", expr("(cnt + 1) div 2"))
          .withColumn("k2", expr("(cnt + 2) div 2"))
          .withColumn("hits",
            when(col("cum_start") <= col("k1") && col("k1") <= col("cum_end"), 1).otherwise(0) +
              when(col("cum_start") <= col("k2") && col("k2") <= col("cum_end"), 1).otherwise(0))
          .filter(col("hits") > 0)
          .groupBy("l_returnflag")
          .agg(dbl(sum(d12(col("l_quantity")) * col("hits"))).as("mid2"))
        stats.join(mids, "l_returnflag")
          .withColumn("avg_qty", col("sum_qty") / col("cnt"))
          .withColumn("std_qty",
            sqrt((col("sum_qty2") - col("sum_qty") * col("sum_qty") / col("cnt")) / col("cnt")))
          .withColumn("median_qty", col("mid2") / 2)
          .withColumn("weighted_price", col("wsum") / col("wtot"))
          .select("l_returnflag", "cnt", "min_qty", "max_qty", "avg_qty",
            "std_qty", "median_qty", "weighted_price")
          .orderBy("l_returnflag")
      },
      Some("""
        WITH ranked AS (
          SELECT l_returnflag, l_quantity, l_extendedprice, l_discount,
            ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
            COUNT(*) OVER (PARTITION BY l_returnflag) AS n
          FROM lineitem),
        agg AS (
          SELECT l_returnflag,
            COUNT(*) AS cnt,
            MIN(l_quantity) AS min_qty,
            MAX(l_quantity) AS max_qty,
            CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
            CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty2,
            CAST(SUM(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
              THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS mid_sum,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS wsum,
            CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS wtot
          FROM ranked GROUP BY 1)
        SELECT l_returnflag, cnt, min_qty, max_qty,
          sum_qty / cnt AS avg_qty,
          sqrt((sum_qty2 - sum_qty * sum_qty / cnt) / cnt) AS std_qty,
          CASE WHEN cnt % 2 = 1 THEN mid_sum ELSE mid_sum / 2 END AS median_qty,
          wsum / wtot AS weighted_price
        FROM agg ORDER BY 1""")),

    // ---- J: multi-table star join (TPC-H Q5 shape, broadcast dims) --------
    Q("q15_revenue_by_nation",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .filter(col("r_name") === "ASIA" &&
            col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
          .groupBy("n_name")
          .agg(dbl(sum(d12(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - d4(col("l_discount"))))).as("revenue"),
            count(lit(1)).as("lineitem_cnt"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""
        SELECT n_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
          COUNT(*) AS lineitem_cnt
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1 ORDER BY revenue DESC, n_name""")),

    // ---- J1: full-outer merge of two aggregates with coalesce defaults ----
    Q("q16_full_outer_merge",
      (s, dir) => {
        val e = t(s, dir, "events")
        def monthly(typ: String, prefix: String): DataFrame =
          e.filter(col("event_type") === typ)
            .groupBy(month(col("ts")).cast("int").as("event_month"))
            .agg(count(lit(1)).as(s"${prefix}_cnt"),
              (dbl(sum(d12(col("value")))) / count(lit(1))).as(s"${prefix}_avg"))
        monthly("purchase", "purchase")
          .join(monthly("click", "click"), Seq("event_month"), "full_outer")
          .select(col("event_month"),
            coalesce(col("purchase_cnt"), lit(0L)).as("purchase_cnt"),
            coalesce(col("purchase_avg"), lit(0.0)).as("purchase_avg"),
            coalesce(col("click_cnt"), lit(0L)).as("click_cnt"),
            coalesce(col("click_avg"), lit(0.0)).as("click_avg"))
          .orderBy("event_month")
      },
      Some("""
        WITH p AS (
          SELECT CAST(month(ts) AS INTEGER) AS event_month, COUNT(*) AS cnt,
            CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avgv
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        c AS (
          SELECT CAST(month(ts) AS INTEGER) AS event_month, COUNT(*) AS cnt,
            CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avgv
          FROM events WHERE event_type = 'click' GROUP BY 1)
        SELECT COALESCE(p.event_month, c.event_month) AS event_month,
          COALESCE(p.cnt, 0) AS purchase_cnt, COALESCE(p.avgv, 0.0) AS purchase_avg,
          COALESCE(c.cnt, 0) AS click_cnt, COALESCE(c.avgv, 0.0) AS click_avg
        FROM p FULL OUTER JOIN c ON p.event_month = c.event_month
        ORDER BY 1""")),

    // ---- J2: null-fill ladder (monthly -> per-type avg -> global -> 20.0) --
    Q("q17_fill_ladder",
      (s, dir) => {
        val e = t(s, dir, "events")
        val sparse = e.filter(col("value") >= 195.0)
        val monthly = sparse.groupBy(col("event_type"), month(col("ts")).cast("int").as("event_month"))
          .agg((dbl(sum(d12(col("value")))) / count(lit(1))).as("monthly_avg"))
        val yearly = sparse.groupBy("event_type")
          .agg((dbl(sum(d12(col("value")))) / count(lit(1))).as("yearly_avg"))
        val globalAvg = sparse.agg((dbl(sum(d12(col("value")))) / count(lit(1))).as("global_avg"))
        val grid = e.select("event_type").distinct()
          .crossJoin(s.range(1, 13).select(col("id").cast("int").as("event_month")))
        grid.join(monthly, Seq("event_type", "event_month"), "left")
          .join(yearly, Seq("event_type"), "left")
          .crossJoin(globalAvg)
          .select(col("event_type"), col("event_month"),
            coalesce(col("monthly_avg"), col("yearly_avg"), col("global_avg"), lit(20.0)).as("filled_avg"))
          .orderBy("event_type", "event_month")
      },
      Some("""
        WITH sparse AS (SELECT * FROM events WHERE value >= 195.0),
        monthly AS (
          SELECT event_type, CAST(month(ts) AS INTEGER) AS event_month,
            CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS monthly_avg
          FROM sparse GROUP BY 1, 2),
        yearly AS (
          SELECT event_type,
            CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS yearly_avg
          FROM sparse GROUP BY 1),
        g AS (
          SELECT CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS global_avg
          FROM sparse),
        grid AS (
          SELECT DISTINCT e.event_type, m.event_month
          FROM events e CROSS JOIN (SELECT CAST(unnest(generate_series(1, 12)) AS INTEGER) AS event_month) m)
        SELECT grid.event_type, grid.event_month,
          COALESCE(monthly.monthly_avg, yearly.yearly_avg, g.global_avg, 20.0) AS filled_avg
        FROM grid
          LEFT JOIN monthly ON grid.event_type = monthly.event_type AND grid.event_month = monthly.event_month
          LEFT JOIN yearly ON grid.event_type = yearly.event_type
          CROSS JOIN g
        ORDER BY 1, 2""")),

    // ---- J6 anti-join: customers with no urgent 1998 order ----------------
    Q("q18_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1998)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
            AND year(o_orderdate) = 1998)
        ORDER BY 1""")),

    // ---- semi-join: customers with at least one urgent order --------------
    Q("q19_semi_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY 1 ORDER BY 1""")),

    // ---- S10/J6: upsert accounting (inserted vs updated) ------------------
    // Incoming batch = 1999+ customers' orders; existing = pre-1999.
    // The reference's ON CONFLICT tallies come out of ONE outer-join
    // aggregation — a single declarative plan, so the input lineage runs
    // exactly once (the previous two-count() formulation scanned orders
    // twice; at scale that doubles the dominant cost for bookkeeping).
    Q("q20_upsert_counts",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val existing = o.filter(year(col("o_orderdate")) < 1999)
          .select("o_custkey").distinct().withColumn("ex", lit(1))
        val incoming = o.filter(year(col("o_orderdate")) >= 1999)
          .select("o_custkey").distinct()
        incoming.join(existing, Seq("o_custkey"), "left_outer")
          .agg(
            coalesce(sum(when(col("ex").isNull, 1L)), lit(0L)).as("inserted_count"),
            coalesce(sum(when(col("ex").isNotNull, 1L)), lit(0L)).as("updated_count"))
      },
      Some("""
        WITH existing AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) < 1999),
        incoming AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) >= 1999)
        SELECT
          (SELECT COUNT(*) FROM incoming WHERE o_custkey NOT IN (SELECT o_custkey FROM existing)) AS inserted_count,
          (SELECT COUNT(*) FROM incoming WHERE o_custkey IN (SELECT o_custkey FROM existing)) AS updated_count""")),

    // ---- window: deterministic first-row-per-group (iloc[0] parity) -------
    Q("q21_window_top1",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("o_custkey", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn = 1 ORDER BY o_custkey""")),

    // ---- O4: top-k with deterministic tie-break (TakeOrderedAndProject) ---
    Q("q22_topk",
      (s, dir) => t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // ---- set ops: union + distinct ----------------------------------------
    Q("q23_union_dedup",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val a = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        val b = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        a.union(b).distinct().agg(count(lit(1)).as("distinct_custkeys"))
      },
      Some("""
        SELECT COUNT(*) AS distinct_custkeys FROM (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""")),

    // ---- §1.3 wide->long unpivot (stack) ----------------------------------
    Q("q24_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice, 'discount', l_discount) AS (measure, value)"))
        .groupBy("l_returnflag", "measure")
        .agg(dbl(sum(d12(col("value")))).as("total"), count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "measure"),
      Some("""
        WITH long AS (
          SELECT l_returnflag, 'quantity' AS measure, l_quantity AS value FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
          UNION ALL
          SELECT l_returnflag, 'discount', l_discount FROM lineitem)
        SELECT l_returnflag, measure,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total, COUNT(*) AS cnt
        FROM long GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- F15/F16: API incidence + WHO risk over join ----------------------
    Q("q25_api_risk",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        val n = t(s, dir, "nation")
        val cases = o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy("c_nationkey").agg(count(lit(1)).as("cases"))
        val pop = c.groupBy("c_nationkey").agg(count(lit(1)).as("population"))
        val api = graft.clean.CleanFunctions.apiRate(col("cases"), col("population"))
        pop.join(cases, Seq("c_nationkey"), "left")
          .na.fill(0L, Seq("cases"))
          .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
          .select(col("n_name"), col("cases"), col("population"),
            api.as("api"),
            graft.clean.CleanFunctions.riskCategory(api).as("risk_category"),
            graft.clean.CleanFunctions.highBurden(api).as("high_burden"))
          .orderBy("n_name")
      },
      Some("""
        WITH cases AS (
          SELECT c_nationkey, COUNT(*) AS cases
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        pop AS (SELECT c_nationkey, COUNT(*) AS population FROM customer GROUP BY 1),
        j AS (
          SELECT n_name, COALESCE(cases.cases, 0) AS cases, pop.population,
            CASE WHEN pop.population > 0
              THEN CAST(COALESCE(cases.cases, 0) AS DOUBLE) / pop.population * 1000
              ELSE 0.0 END AS api
          FROM pop LEFT JOIN cases ON pop.c_nationkey = cases.c_nationkey
          JOIN nation ON pop.c_nationkey = n_nationkey)
        SELECT n_name, cases, population, api,
          CASE WHEN api = 0 THEN 'No Transmission'
               WHEN api < 1 THEN 'Very Low Risk'
               WHEN api < 5 THEN 'Low Risk'
               WHEN api < 50 THEN 'Moderate Risk'
               WHEN api < 100 THEN 'High Risk'
               ELSE 'Very High Risk' END AS risk_category,
          api >= 50 AS high_burden
        FROM j ORDER BY n_name""")),

    // ---- F17: threshold classifier bins -----------------------------------
    Q("q26_slope_class",
      (s, dir) => t(s, dir, "lineitem")
        .select(graft.clean.CleanFunctions.slopeClass(col("l_quantity")).as("qty_class"))
        .groupBy("qty_class").agg(count(lit(1)).as("cnt"))
        .orderBy("qty_class"),
      Some("""
        SELECT CASE WHEN l_quantity < 5 THEN 'Flat'
                    WHEN l_quantity < 15 THEN 'Moderate'
                    WHEN l_quantity < 30 THEN 'Steep'
                    ELSE 'Very Steep' END AS qty_class,
          COUNT(*) AS cnt
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // ---- F4-style range bucketing -----------------------------------------
    Q("q27_balance_bins",
      (s, dir) => t(s, dir, "customer")
        .select(when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 1000, "low")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_bin"))
        .groupBy("bal_bin").agg(count(lit(1)).as("cnt"))
        .orderBy("bal_bin"),
      Some("""
        SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                    WHEN c_acctbal < 1000 THEN 'low'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS bal_bin,
          COUNT(*) AS cnt
        FROM customer GROUP BY 1 ORDER BY 1""")),

    // ---- F6: ordered substring-keyword classifier -------------------------
    Q("q28_keyword_classify",
      (s, dir) => t(s, dir, "events")
        .select(graft.clean.CleanFunctions.keywordClassifier(col("event_type"),
          Seq("CLICK", "VIEW"), Seq("ERROR", "SIGNUP"),
          "Engaged", "Problem", "Other", "Unknown").as("label"))
        .groupBy("label").agg(count(lit(1)).as("cnt"))
        .orderBy("label"),
      Some("""
        SELECT CASE
            WHEN event_type IS NULL OR trim(upper(event_type)) = '' THEN 'Unknown'
            WHEN contains(trim(upper(event_type)), 'CLICK') OR contains(trim(upper(event_type)), 'VIEW') THEN 'Engaged'
            WHEN contains(trim(upper(event_type)), 'ERROR') OR contains(trim(upper(event_type)), 'SIGNUP') THEN 'Problem'
            ELSE 'Other' END AS label,
          COUNT(*) AS cnt
        FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- A6-style time-bucketed aggregate ---------------------------------
    Q("q29_daily_avg",
      (s, dir) => t(s, dir, "events")
        .filter(col("value") >= 0)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"),
          (dbl(sum(d12(col("value")))) / count(lit(1))).as("avg_value"))
        .orderBy("event_type", "day"),
      Some("""
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value
        FROM events WHERE value >= 0
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- grouping sets (free Spark surface noted in §2.4) ------------------
    Q("q30_rollup",
      (s, dir) => t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          dbl(sum(d12(col("o_totalprice")))).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("cnt"), col("total"))
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
          COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
          COUNT(*) AS cnt,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY 1, 2"""))
  )
}
