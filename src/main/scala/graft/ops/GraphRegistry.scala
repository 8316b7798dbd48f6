package graft.ops

import graft.QueryDef

/** Oracle SQL (DuckDB dialect) for [[GraphQueries]]. The iteration chain is
  * GENERATED from [[GraphQueries.PrIters]] and the fixed-point constants, so
  * the oracle cannot drift from the Spark loop. DuckDB's `//` on positive
  * BIGINTs is the same truncating division as Spark's `div`; DuckDB sums
  * BIGINT into HUGEINT, so each iteration casts back (exact — the fixed
  * point fits BIGINT by construction, see PrScale scaladoc). */
object GraphRegistry {

  import GraphQueries.{PrDampDen, PrDampNum, PrIters, PrScale, PrTeleport}

  private def prIter(i: Int): String =
    s"""r$i AS (
       |  SELECT a.dst AS node,
       |    CAST($PrTeleport + ($PrDampNum * SUM(r.pr // a.deg)) // $PrDampDen AS BIGINT) AS pr
       |  FROM adj a JOIN r${i - 1} r ON a.src = r.node GROUP BY a.dst)""".stripMargin

  private val pagerankSql =
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
       |adj AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
       |r0 AS (SELECT src AS node, CAST($PrScale AS BIGINT) AS pr FROM deg),
       |${(1 to PrIters).map(prIter).mkString(",\n")}
       |SELECT node,
       |  CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind, pr
       |FROM r$PrIters ORDER BY node""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_pagerank", pagerankSql)(GraphQueries.pagerank(_, _)))
}
