package graft.ops

import graft.QueryDef
import Out.{sql => S}

/** DuckDB oracle SQL for graft.ops.RelationalQueries. */
object RelationalRegistry {

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_join_inner",
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin)(RelationalQueries.joinInner),

    QueryDef("q_join_left",
      s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
         |  ${S.dsum("o_totalprice")} AS sum_price
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY 1, 2 ORDER BY c_custkey""".stripMargin)(
      RelationalQueries.joinLeft),

    QueryDef("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)(RelationalQueries.joinSemi),

    QueryDef("q_join_anti",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin)(RelationalQueries.joinAnti),

    QueryDef("q_join_broadcast",
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
         |  ${S.dsum("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2 ORDER BY r_name, n_name""".stripMargin)(
      RelationalQueries.joinBroadcast),

    QueryDef("q_sort_limit_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)(
      RelationalQueries.sortLimitTopK),

    QueryDef("q_window_rank",
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    RANK() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk FROM r
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)(
      RelationalQueries.windowRank),

    QueryDef("q_window_lag_frame",
      s"""SELECT o_custkey, o_orderkey, ${S.epochSec("o_orderdate")} AS order_ts,
         |  o_totalprice,
         |  LAG(o_totalprice, 1) OVER w AS prev_price,
         |  LEAD(o_totalprice, 1) OVER w AS next_price,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (w ROWS BETWEEN
         |    UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (w ROWS BETWEEN
         |    2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         |ORDER BY o_custkey, o_orderkey""".stripMargin)(
      RelationalQueries.windowLagFrame),

    // GROUPING() separates subtotal markers from genuine NULL keys (a bare
    // COALESCE would collide them — ambiguous report + broken total order)
    QueryDef("q_rollup",
      s"""SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
         |            ELSE COALESCE(l_returnflag, '<NULL>') END AS g_flag,
         |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
         |       ELSE COALESCE(l_linestatus, '<NULL>') END AS g_status,
         |  COUNT(*) AS n, ${S.dsum("l_quantity")} AS sum_qty,
         |  ${S.dsum("l_extendedprice")} AS sum_price
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY g_flag, g_status""".stripMargin)(RelationalQueries.rollupAgg),

    QueryDef("q_cube",
      s"""SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
         |            ELSE COALESCE(l_returnflag, '<NULL>') END AS g_flag,
         |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
         |       ELSE COALESCE(l_linestatus, '<NULL>') END AS g_status,
         |  COUNT(*) AS n, ${S.dsum("l_quantity")} AS sum_qty,
         |  ${S.dsum("l_extendedprice")} AS sum_price
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY g_flag, g_status""".stripMargin)(RelationalQueries.cubeAgg),

    QueryDef("q_grouping_sets",
      s"""SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
         |            ELSE COALESCE(l_returnflag, '<NULL>') END AS g_flag,
         |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
         |       ELSE COALESCE(l_linestatus, '<NULL>') END AS g_status,
         |  COUNT(1) AS n, ${S.dsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY g_flag, g_status""".stripMargin)(
      RelationalQueries.groupingSets),

    QueryDef("q_union",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 7000
        |ORDER BY c_custkey""".stripMargin)(RelationalQueries.setUnion),

    QueryDef("q_intersect",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 7000
        |ORDER BY c_custkey""".stripMargin)(RelationalQueries.setIntersect),

    QueryDef("q_except",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 7000
        |ORDER BY c_custkey""".stripMargin)(RelationalQueries.setExcept),

    QueryDef("q_scalar_string",
      """SELECT p_partkey,
        |  UPPER(p_name) AS u_name,
        |  LOWER(p_brand) AS l_brand,
        |  SUBSTRING(p_type, 1, 5) AS type5,
        |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        |  p_brand || '#' || p_type AS brand_type,
        |  REPLACE(p_name, ' ', '_') AS snake_name,
        |  LPAD(p_brand, 12, '*') AS pad_brand,
        |  REVERSE(p_name) AS rev_name,
        |  CAST(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS BIGINT) AS is_brass
        |FROM part ORDER BY p_partkey""".stripMargin)(
      RelationalQueries.scalarString),

    QueryDef("q_scalar_date",
      s"""SELECT o_orderkey,
         |  CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
         |  CAST(DAYOFMONTH(o_orderdate) AS BIGINT) AS o_day,
         |  CAST(QUARTER(o_orderdate) AS BIGINT) AS o_quarter,
         |  ${S.epochSec("DATE_TRUNC('month', o_orderdate)")} AS month_start,
         |  ${S.epochSec("o_orderdate + INTERVAL 30 DAY")} AS due_ts,
         |  CAST(DATE_DIFF('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
         |    AS days_since_epoch_start
         |FROM orders ORDER BY o_orderkey""".stripMargin)(
      RelationalQueries.scalarDate),

    QueryDef("q_scalar_math",
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  ROUND(l_extendedprice, 1) AS price_r1,
        |  ABS(l_discount - 0.05) AS disc_dev,
        |  CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
        |  CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
        |  SQRT(l_extendedprice) AS price_sqrt,
        |  (1.0 + l_tax) * (1.0 + l_tax) AS tax_sq,
        |  l_orderkey % 7 AS key_mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)(
      RelationalQueries.scalarMath),

    QueryDef("q_tpch1_pricing",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${S.dsum("l_quantity")} AS sum_qty,
         |  ${S.dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(1.0 - l_discount AS DECIMAL(4,2))
         |    * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
         |  ${S.davg("l_quantity")} AS avg_qty,
         |  ${S.davg("l_extendedprice")} AS avg_price,
         |  ${S.davg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)(
      RelationalQueries.tpch1Pricing),

    // The sketch values are engine-specific, so both approx keys emit the
    // EXACT values (oracle-computable) plus a within_tol CLAIM the oracle
    // asserts TRUE — a drifting sketch fails the hash gate (round-6 advice).
    QueryDef("q_approx_distinct",
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  count(*) AS n, TRUE AS within_tol
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)(
      RelationalQueries.approxDistinct),
    QueryDef("q_approx_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  count(*) AS n, TRUE AS within_tol
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)(
      RelationalQueries.approxPercentiles),

    QueryDef("q_string_agg",
      """SELECT n_name, count(*) AS n_suppliers,
        |  array_to_string(list_sort(list(s_name)), ',') AS suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)(RelationalQueries.stringAgg),

    QueryDef("q_ntile_percent",
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)(RelationalQueries.ntilePercent),

    QueryDef("q_unpivot",
      """WITH long AS (
        |  SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, 'l_discount', l_discount FROM lineitem)
        |SELECT measure, count(*) AS n, min(value) AS lo, max(value) AS hi
        |FROM long GROUP BY measure ORDER BY measure""".stripMargin)(
      RelationalQueries.unpivotMeasures),

    QueryDef("q_except_all",
      """SELECT o_custkey, o_orderpriority, count(*) AS n FROM (
        |  SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
        |  EXCEPT ALL
        |  SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 300000)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)(
      RelationalQueries.setExceptAll),

    QueryDef("q_join_full",
      """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
        |  coalesce(o.n_big, 0) AS n_big,
        |  CASE WHEN c.c_custkey IS NULL THEN 'order_only'
        |       WHEN o.o_custkey IS NULL THEN 'customer_only'
        |       ELSE 'both' END AS side
        |FROM (SELECT c_custkey, c_name FROM customer
        |      WHERE c_mktsegment = 'BUILDING') c
        |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
        |                 WHERE o_totalprice > 400000 GROUP BY 1) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin)(RelationalQueries.joinFull),

    QueryDef("q_window_range_frame",
      s"""SELECT o_custkey, o_orderkey, ${S.epochSec("o_orderdate")} AS order_ts,
         |  o_totalprice,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER w AS DOUBLE)
         |    AS trailing30d_revenue,
         |  COUNT(*) OVER w AS trailing30d_orders
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey
         |             ORDER BY ${S.epochSec("o_orderdate")}
         |             RANGE BETWEEN ${RelationalQueries.RangeFrameSec} PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, o_orderkey""".stripMargin)(
      RelationalQueries.windowRangeFrame),

    // the oracle is the PLAIN join — salting must be invisible in the result
    QueryDef("q_skew_join_salted",
      s"""SELECT o_orderstatus, count(*) AS n,
         |  ${graft.ops.Out.sql.dsum("l_extendedprice")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin)(
      RelationalQueries.skewJoinSalted),

    QueryDef("q_tpch3_topk",
      s"""SELECT l_orderkey, ${S.epochSec("o_orderdate")} AS order_ts,
         |  o_orderpriority,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = '${RelationalQueries.Tpch3Segment}'
         |  AND o_orderdate < TIMESTAMP '${RelationalQueries.Tpch3Cutoff}'
         |  AND l_shipdate > TIMESTAMP '${RelationalQueries.Tpch3Cutoff}'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT ${RelationalQueries.Tpch3K}""".stripMargin)(
      (s, d) => RelationalQueries.tpch3TopK(s, d)),

    QueryDef("q_agg_filter",
      s"""SELECT l_returnflag,
         |  count(*) AS n_all,
         |  count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4)))
         |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_disc,
         |  count(*) FILTER (WHERE l_quantity >= 25.0) AS n_bulk,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4)))
         |    FILTER (WHERE l_quantity >= 25.0) AS DOUBLE) AS price_bulk
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)(
      RelationalQueries.aggFilter),

    QueryDef("q_tpch5_volume",
      s"""SELECT n_name,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = '${RelationalQueries.Tpch5Region}'
         |  AND o_orderdate >= TIMESTAMP '${RelationalQueries.Tpch5YearStart}'
         |  AND o_orderdate < TIMESTAMP '${RelationalQueries.Tpch5YearEnd}'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin)(
      (s, d) => RelationalQueries.tpch5Volume(s, d)),

    QueryDef("q_tpch18_bigorders",
      s"""WITH big AS (
         |  SELECT l_orderkey,
         |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS total_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING SUM(CAST(l_quantity AS DECIMAL(38,4))) > ${RelationalQueries.Tpch18MinQty})
         |SELECT c_name, c_custkey, o_orderkey,
         |  ${S.epochSec("o_orderdate")} AS order_ts, o_totalprice, total_qty
         |FROM big
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT ${RelationalQueries.Tpch18K}""".stripMargin)(
      (s, d) => RelationalQueries.tpch18BigOrders(s, d)),

    QueryDef("q_tpch4_priority",
      s"""SELECT o_orderpriority, count(*) AS order_count FROM orders
         |WHERE o_orderdate >= TIMESTAMP '${RelationalQueries.Tpch4Start}'
         |  AND o_orderdate < TIMESTAMP '${RelationalQueries.Tpch4End}'
         |  AND EXISTS (SELECT 1 FROM lineitem
         |    WHERE l_orderkey = o_orderkey
         |      AND l_shipdate > o_orderdate
         |        + INTERVAL ${RelationalQueries.Tpch4LateDays} DAY)
         |GROUP BY 1 ORDER BY 1""".stripMargin)(
      RelationalQueries.tpch4Priority),

    QueryDef("q_tpch10_returns",
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '${RelationalQueries.Tpch4Start}'
         |  AND o_orderdate < TIMESTAMP '${RelationalQueries.Tpch4End}'
         |  AND l_returnflag = 'R'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c_custkey LIMIT ${RelationalQueries.Tpch10K}""".stripMargin)(
      (s, d) => RelationalQueries.tpch10Returns(s, d)),

    // the oracle is the PLAIN semi join — the bloom prefilter must be
    // invisible in the result (no false negatives; positives removed by the
    // exact join)
    QueryDef("q_bloom_semijoin",
      s"""SELECT o_orderstatus, count(*) AS n,
         |  ${S.dsum("o_totalprice")} AS revenue
         |FROM orders
         |WHERE o_custkey IN (SELECT c_custkey FROM customer
         |                    WHERE c_mktsegment = '${RelationalQueries.BloomSegment}')
         |GROUP BY 1 ORDER BY 1""".stripMargin)(
      (s, d) => RelationalQueries.bloomSemiJoin(s, d)),

    QueryDef("q_scd2_islands",
      s"""WITH o AS (
         |  SELECT o_custkey, o_orderstatus,
         |    ${S.epochSec("o_orderdate")} AS sec, o_orderkey,
         |    CASE WHEN LAG(o_orderstatus) OVER w = o_orderstatus THEN 0 ELSE 1
         |      END AS chg
         |  FROM orders
         |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
         |i AS (
         |  SELECT o_custkey, o_orderstatus, sec,
         |    CAST(SUM(chg) OVER (PARTITION BY o_custkey ORDER BY sec, o_orderkey
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
         |  FROM o),
         |g AS (
         |  SELECT o_custkey, island, o_orderstatus,
         |    MIN(sec) AS valid_from, COUNT(*) AS n_orders
         |  FROM i GROUP BY 1, 2, 3)
         |SELECT o_custkey, island, o_orderstatus, valid_from,
         |  LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY island)
         |    AS valid_to,
         |  n_orders
         |FROM g ORDER BY o_custkey, island""".stripMargin)(
      RelationalQueries.scd2Islands),

    QueryDef("q_ratio_to_report",
      """WITH per_nation AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS revdec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT r_name, n_name, CAST(revdec AS DOUBLE) AS revenue,
        |  round(CAST(revdec / SUM(revdec) OVER (PARTITION BY r_name)
        |    AS DOUBLE), 6) AS region_share
        |FROM per_nation ORDER BY r_name, n_name""".stripMargin)(
      RelationalQueries.ratioToReport),

    QueryDef("q_snapshot_diff",
      s"""WITH o AS (SELECT o_custkey AS cust, count(*) AS old_n,
         |        ${graft.ops.Out.sql.dsum("o_totalprice")} AS old_total
         |      FROM orders
         |      WHERE o_custkey IS NOT NULL
         |        AND o_orderdate < TIMESTAMP '${RelationalQueries.SnapOldCutoff}'
         |      GROUP BY 1),
         |n AS (SELECT o_custkey AS cust, count(*) AS new_n,
         |        ${graft.ops.Out.sql.dsum("o_totalprice")} AS new_total
         |      FROM orders
         |      WHERE o_custkey IS NOT NULL
         |        AND o_orderdate < TIMESTAMP '${RelationalQueries.SnapNewCutoff}'
         |      GROUP BY 1),
         |d AS (SELECT COALESCE(o.cust, n.cust) AS cust,
         |        old_n, new_n, old_total, new_total,
         |        CASE WHEN old_n IS NULL THEN 'added'
         |             WHEN new_n IS NULL THEN 'removed'
         |             WHEN old_n <> new_n OR old_total <> new_total
         |               THEN 'changed'
         |             ELSE 'same' END AS status
         |      FROM o FULL JOIN n ON o.cust = n.cust)
         |SELECT cust, status, old_n, new_n, old_total, new_total
         |FROM d WHERE status <> 'same' ORDER BY cust""".stripMargin)(
      RelationalQueries.snapshotDiff),

    // The Spark side's mega-basket tripwire never fires on sane data, so
    // the oracle is the plain guarded-free spelling; (n DESC, p1, p2) is a
    // total order, making the LIMIT deterministic in both engines.
    QueryDef("q_copurchase",
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL)
        |SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS n
        |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 ORDER BY n DESC, p1, p2 LIMIT 20""".stripMargin)(
      RelationalQueries.coPurchase),

    // HHI: all-integer Σn² / N² with one final double division — no
    // order-dependent float summation on either engine.
    QueryDef("q_supplier_hhi",
      """WITH s AS (
        |  SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT sp.s_nationkey AS nationkey, s.n
        |  FROM s JOIN supplier sp ON s.l_suppkey = sp.s_suppkey)
        |SELECT CAST(nationkey AS BIGINT) AS nationkey,
        |  count(*) AS n_suppliers,
        |  CAST(SUM(n) AS BIGINT) AS n_lines,
        |  round(CAST(SUM(n * n) AS DOUBLE)
        |    / (CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE)), 6) AS hhi,
        |  round(CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
        |    AS top_share
        |FROM j GROUP BY 1 ORDER BY nationkey""".stripMargin)(
      RelationalQueries.supplierConcentration),

    QueryDef("q_order_size_dist",
      """WITH o AS (
        |  SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY 1)
        |SELECT n_items, count(*) AS n_orders
        |FROM o GROUP BY 1 ORDER BY n_items""".stripMargin)(
      RelationalQueries.orderSizeDist),

    // Ship-latency SLA: exact integer day gaps; quantile_cont ≡ percentile.
    QueryDef("q_ship_latency",
      s"""WITH j AS (
         |  SELECT o.o_orderpriority,
         |    (${S.epochSec("l.l_shipdate")} // 86400)
         |      - (${S.epochSec("o.o_orderdate")} // 86400) AS lat_days
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
         |SELECT o_orderpriority, count(*) AS n_lines,
         |  round(quantile_cont(lat_days, 0.5), 4) AS lat_p50,
         |  round(quantile_cont(lat_days, 0.9), 4) AS lat_p90,
         |  max(lat_days) AS lat_max
         |FROM j GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)(
      RelationalQueries.shipLatency),

    // 2-D skyline via the two-pass prefix max: exact integer cents (TRUNC,
    // matching Spark's double→long cast), strict dominance only, sentinel
    // floors never escape the GREATEST. Bucket width interpolates from the
    // Scala constant.
    QueryDef("q_skyline", {
      val w = RelationalQueries.SkylineBucketCents
      s"""WITH o AS (
         |  SELECT o_orderkey, o_totalprice,
         |    ${S.epochSec("o_orderdate")} AS d,
         |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |ob AS (SELECT *, cents // $w AS bucket FROM o),
         |bm AS (SELECT bucket, max(d) AS bmax FROM ob GROUP BY 1),
         |bp AS (SELECT bucket,
         |         max(bmax) OVER (ORDER BY bucket
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bprev
         |       FROM bm),
         |s AS (SELECT ob.o_orderkey, ob.o_totalprice, ob.d, bp.bprev,
         |        max(ob.d) OVER (PARTITION BY ob.bucket ORDER BY ob.cents
         |          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cmax
         |      FROM ob JOIN bp USING (bucket))
         |SELECT o_orderkey, o_totalprice, d AS d_sec
         |FROM s
         |WHERE GREATEST(COALESCE(cmax, -9223372036854775807),
         |               COALESCE(bprev, -9223372036854775807)) <= d
         |ORDER BY o_orderkey""".stripMargin
    })(RelationalQueries.skylineOrders)
  )
}
