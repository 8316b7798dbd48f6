package graft.ops

import graft.QueryDef

/** Oracle registrations for [[TpchQueries]] — the TPC-H completion block.
  * Constants interpolate from the query object (single source of truth);
  * every money aggregate follows the decimal-exact [[Out]] contract. */
object TpchRegistry {
  import TpchQueries._

  def all: Seq[QueryDef] = Seq(

    // The witnessed-cost relation (min unit price per pair) replaces
    // partsupp; the per-part MIN equality join is the correlated-subquery
    // rewrite both engines must agree on bit-for-bit (IEEE division +
    // order-independent MIN).
    QueryDef("q_tpch2_mincost",
      s"""WITH sup AS (
         |  SELECT s_suppkey, s_name, s_acctbal, n_name
         |  FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = '$Q2Region'),
         |p AS (SELECT p_partkey, p_name FROM part
         |      WHERE p_size BETWEEN $Q2SizeLo AND $Q2SizeHi
         |        AND p_type = '$Q2Type'),
         |per_pair AS (
         |  SELECT l_partkey, l_suppkey,
         |    min(l_extendedprice / l_quantity) AS unit_cost
         |  FROM lineitem
         |  JOIN p ON l_partkey = p_partkey
         |  WHERE l_suppkey IN (SELECT s_suppkey FROM sup)
         |  GROUP BY 1, 2),
         |per_part AS (SELECT l_partkey, min(unit_cost) AS min_cost
         |             FROM per_pair GROUP BY 1)
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
         |FROM per_pair
         |JOIN per_part USING (l_partkey)
         |JOIN sup ON l_suppkey = s_suppkey
         |JOIN p ON l_partkey = p_partkey
         |WHERE unit_cost = min_cost
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT $Q2K""".stripMargin)((s, d) => minCostSupplier(s, d)),

    QueryDef("q_tpch6_forecast",
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '$Q6Start'
         |  AND l_shipdate < TIMESTAMP '$Q6End'
         |  AND l_discount BETWEEN $Q6DiscLo AND $Q6DiscHi
         |  AND l_quantity < $Q6MaxQty""".stripMargin)(forecastRevenue),

    QueryDef("q_tpch8_mktshare",
      s"""WITH market AS (
         |  SELECT year(o_orderdate) AS o_year, n_name AS supp_nation,
         |    $RevSql AS rev
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE p_type = '$Q8Type'
         |    AND o_orderdate >= TIMESTAMP '$Q8Start'
         |    AND o_orderdate < TIMESTAMP '$Q8End'
         |    AND o_custkey IN (
         |      SELECT c_custkey FROM customer
         |      JOIN nation ON c_nationkey = n_nationkey
         |      JOIN region ON n_regionkey = r_regionkey
         |      WHERE r_name = '$Q8Region'))
         |SELECT o_year,
         |  round(CAST(SUM(CASE WHEN supp_nation = '$Q8Nation' THEN rev
         |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |    / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share,
         |  CAST(SUM(rev) AS DOUBLE) AS total_rev
         |FROM market GROUP BY 1 ORDER BY o_year""".stripMargin)(marketShare),

    // Profit stays decimal end-to-end: 0.6 enters as DECIMAL(2,1), never
    // a double literal, so every per-line product is exact.
    QueryDef("q_tpch9_profit",
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  CAST(SUM($RevSql
         |      - CAST(p_retailprice AS DECIMAL(12,2))
         |        * CAST(l_quantity AS DECIMAL(4,0))
         |        * CAST(${Q9CostNum / Q9CostDen.toDouble} AS DECIMAL(2,1)))
         |    AS DOUBLE) AS sum_profit,
         |  count(*) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%$Q9NamePattern%'
         |GROUP BY 1, 2
         |ORDER BY nation, o_year DESC""".stripMargin)(productProfit),

    QueryDef("q_tpch11_stock",
      s"""WITH per_part AS (
         |  SELECT l_partkey,
         |    SUM(CAST(l_quantity AS DECIMAL(4,0))
         |      * CAST(p_retailprice AS DECIMAL(12,2))) AS part_value
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  WHERE l_suppkey IN (
         |    SELECT s_suppkey FROM supplier
         |    JOIN nation ON s_nationkey = n_nationkey
         |    WHERE n_name = '$Q11Nation')
         |  GROUP BY 1)
         |SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
         |FROM per_part
         |WHERE CAST(part_value AS DOUBLE) >
         |  (SELECT CAST(SUM(part_value) AS DOUBLE) * $Q11Fraction
         |   FROM per_part)
         |ORDER BY part_value DESC, l_partkey""".stripMargin)(importantStock),

    QueryDef("q_tpch12_latelines",
      s"""SELECT l_returnflag,
         |  CAST(SUM(CASE WHEN o_orderpriority IN
         |    (${Q12HighPriorities.map("'" + _ + "'").mkString(", ")})
         |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(SUM(CASE WHEN o_orderpriority IN
         |    (${Q12HighPriorities.map("'" + _ + "'").mkString(", ")})
         |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate >= TIMESTAMP '$Q12Start'
         |  AND l_shipdate < TIMESTAMP '$Q12End'
         |  AND l_shipdate > o_orderdate + INTERVAL $Q12LateDays DAY
         |GROUP BY 1 ORDER BY l_returnflag""".stripMargin)(lateByPriority),

    // The disjunctive nation pair collapses to "both sides in {A,B} and
    // different" — spelled identically here so the oracle exercises the
    // same predicate algebra the Spark plan uses.
    QueryDef("q_tpch7_tradeflow",
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  CAST(SUM($RevSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name IN ('$Q7NationA', '$Q7NationB')
         |  AND n2.n_name IN ('$Q7NationA', '$Q7NationB')
         |  AND n1.n_name <> n2.n_name
         |  AND l_shipdate >= TIMESTAMP '$Q7Start'
         |  AND l_shipdate < TIMESTAMP '$Q7End'
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)(
      tradeflow),

    // The exclusion predicate must live ON the join (a WHERE would drop
    // the zero-order customers and erase the c_count = 0 bucket).
    QueryDef("q_tpch13_custdist",
      s"""WITH per_cust AS (
         |  SELECT c_custkey, count(o_orderkey) AS c_count
         |  FROM customer LEFT JOIN orders
         |    ON c_custkey = o_custkey
         |   AND o_orderpriority <> '$Q13ExcludedPriority'
         |  GROUP BY 1)
         |SELECT c_count, count(*) AS custdist
         |FROM per_cust GROUP BY 1
         |ORDER BY custdist DESC, c_count DESC""".stripMargin)(custdist),

    QueryDef("q_tpch14_promo",
      s"""SELECT
         |  round(100.0 * CAST(SUM(CASE WHEN p_type = '$Q14PromoType'
         |      THEN $RevSql ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         |    / CAST(SUM($RevSql) AS DOUBLE), 6) AS promo_pct,
         |  CAST(SUM($RevSql) AS DOUBLE) AS total_revenue,
         |  count(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '$Q14Start'
         |  AND l_shipdate < TIMESTAMP '$Q14End'""".stripMargin)(promoShare),

    // The max-revenue equality stays in DECIMAL through the compare (a
    // double round-trip could split or invent a tie); only the output
    // column is double.
    QueryDef("q_tpch15_topsupplier",
      s"""WITH rev AS (
         |  SELECT l_suppkey, SUM($RevSql) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '$Q15Start'
         |    AND l_shipdate < TIMESTAMP '$Q15End'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
         |FROM rev JOIN supplier ON s_suppkey = l_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin)(topSupplier),

    QueryDef("q_tpch16_suppliercnt",
      s"""WITH pairs AS (
         |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
         |  WHERE l_suppkey NOT IN
         |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
         |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
         |  count(DISTINCT l_suppkey) AS supplier_cnt
         |FROM pairs JOIN part ON p_partkey = l_partkey
         |WHERE p_brand <> '$Q16ExcludedBrand'
         |  AND p_type <> '$Q16ExcludedType'
         |  AND p_size IN (${Q16Sizes.mkString(", ")})
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)(
      supplierCnt),

    // Per-part average quantity divides an exact double sum (small
    // integers) by a count — bit-identical threshold in both engines.
    QueryDef("q_tpch17_smallqty",
      s"""WITH l AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE p_brand = '$Q17Brand' AND p_size <= $Q17MaxSize),
         |t AS (SELECT l_partkey,
         |        0.2 * sum(l_quantity) / count(*) AS qty_cut
         |      FROM l GROUP BY 1)
         |SELECT
         |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         |    / 7.0, 6) AS avg_yearly,
         |  count(*) AS n_lines
         |FROM l JOIN t USING (l_partkey)
         |WHERE l_quantity < qty_cut""".stripMargin)(smallQty),

    QueryDef("q_tpch19_disjunct", {
      val clauses = Q19Clauses.map { case (b, sz, lo, hi) =>
        s"(p_brand = '$b' AND p_size BETWEEN 1 AND $sz " +
          s"AND l_quantity BETWEEN $lo AND $hi)"
      }.mkString("\n   OR ")
      s"""SELECT CAST(SUM($RevSql) AS DOUBLE) AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE $clauses""".stripMargin
    })(disjunctRevenue),

    QueryDef("q_tpch20_excess",
      s"""WITH per_supp AS (
         |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE p_type = '$Q20Type' AND year(l_shipdate) = $Q20Year
         |  GROUP BY 1, 2),
         |per_part AS (SELECT l_partkey, sum(supp_qty) AS part_qty
         |             FROM per_supp GROUP BY 1),
         |qual AS (SELECT DISTINCT l_suppkey
         |         FROM per_supp JOIN per_part USING (l_partkey)
         |         WHERE supp_qty > $Q20Share * part_qty)
         |SELECT s_suppkey, s_name, n_name
         |FROM supplier
         |JOIN qual ON s_suppkey = l_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |ORDER BY s_suppkey""".stripMargin)(
      (s, d) => excessSuppliers(s, d)),

    // EXISTS / NOT-EXISTS spelled as the same per-(order, supplier) fold +
    // per-order rollup the Spark plan uses: ns > 1 ⇔ another supplier
    // exists, n_late = 1 ⇔ no OTHER late supplier exists.
    QueryDef("q_tpch21_waiting",
      s"""WITH ol AS (
         |  SELECT l_orderkey, l_suppkey,
         |    max(CASE WHEN l_shipdate > o_orderdate
         |          + INTERVAL $Q21LateDays DAY THEN 1 ELSE 0 END) AS late
         |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         |  WHERE o_orderstatus = 'F'
         |  GROUP BY 1, 2),
         |po AS (SELECT l_orderkey, count(*) AS ns, sum(late) AS n_late
         |       FROM ol GROUP BY 1)
         |SELECT s_name, count(*) AS numwait
         |FROM ol
         |JOIN po USING (l_orderkey)
         |JOIN supplier ON s_suppkey = l_suppkey
         |WHERE late = 1 AND ns > 1 AND n_late = 1
         |GROUP BY 1
         |ORDER BY numwait DESC, s_name LIMIT $Q21K""".stripMargin)(
      (s, d) => waitingBlockers(s, d)),

    QueryDef("q_tpch22_idle",
      s"""WITH a AS (
         |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
         |           / COUNT(*) AS avg_bal
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT n_name, count(*) AS numcust,
         |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
         |    AS totacctbal
         |FROM customer
         |CROSS JOIN a
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE c_acctbal > avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '$Q22Cutoff')
         |GROUP BY 1 ORDER BY n_name""".stripMargin)(idleCustomers)
  )
}
