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

  private def pprSeed(e: String): String =
    s"CASE WHEN $e % 2 = 0 AND $e < ${GraphQueries.PprSeedMax} THEN"

  private def pprIter(i: Int): String =
    s"""r$i AS (
       |  SELECT a.dst AS node,
       |    CAST((${pprSeed("a.dst")} $PrTeleport ELSE 0 END)
       |      + ($PrDampNum * SUM(r.pr // a.deg)) // $PrDampDen AS BIGINT) AS pr
       |  FROM adj a JOIN r${i - 1} r ON a.src = r.node GROUP BY a.dst)""".stripMargin

  private val pprSql =
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
       |adj AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
       |r0 AS (SELECT src AS node,
       |  CAST(${pprSeed("src")} $PrScale ELSE 0 END AS BIGINT) AS pr FROM deg),
       |${(1 to PrIters).map(pprIter).mkString(",\n")}
       |SELECT node,
       |  CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
       |  CAST(${pprSeed("node")} 1 ELSE 0 END AS BIGINT) AS is_seed, pr
       |FROM r$PrIters ORDER BY node""".stripMargin

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

  /** Shared CTE chain: thresholded co-order graph + degrees + degree-ordered
    * orientation (mirrors GraphQueries.coOrderEdges / degrees / oriented).
    * s1 < s2 by construction, so `<=` on degrees reproduces the (deg, id)
    * tie-break. */
  private val graphCtes =
    s"""lo AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
       |e AS (SELECT a.s AS s1, b.s AS s2 FROM lo a JOIN lo b ON a.o = b.o AND a.s < b.s
       |      GROUP BY 1, 2 HAVING count(*) >= ${GraphQueries.TriMinShared}),
       |deg AS (SELECT src, count(*) AS deg FROM
       |        (SELECT s1 AS src FROM e UNION ALL SELECT s2 FROM e) GROUP BY 1)""".stripMargin

  private val triangleSql =
    s"""WITH $graphCtes,
       |d AS (SELECT CASE WHEN d1.deg <= d2.deg THEN e.s1 ELSE e.s2 END AS u,
       |             CASE WHEN d1.deg <= d2.deg THEN e.s2 ELSE e.s1 END AS v
       |      FROM e JOIN deg d1 ON d1.src = e.s1 JOIN deg d2 ON d2.src = e.s2)
       |SELECT count(*) AS n_triangles
       |FROM d e1 JOIN d e2 ON e1.v = e2.u
       |WHERE EXISTS (SELECT 1 FROM d e3 WHERE e3.u = e1.u AND e3.v = e2.v)""".stripMargin

  private val degreeDistSql =
    s"""WITH $graphCtes
       |SELECT deg, count(*) AS n_nodes FROM deg GROUP BY 1 ORDER BY 1""".stripMargin

  // Six integer Pearson moments over the directed edge list; one shared
  // double formula with 0-clamped variances.
  private val assortativitySql =
    s"""WITH $graphCtes,
       |de AS (SELECT s1 AS u, s2 AS v FROM e
       |       UNION ALL SELECT s2, s1 FROM e),
       |j AS (SELECT d1.deg AS dx, d2.deg AS dy
       |      FROM de JOIN deg d1 ON d1.src = de.u
       |      JOIN deg d2 ON d2.src = de.v),
       |m AS (SELECT count(*) AS n,
       |        CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
       |        CAST(SUM(dx * dx) AS BIGINT) AS sxx,
       |        CAST(SUM(dy * dy) AS BIGINT) AS syy,
       |        CAST(SUM(dx * dy) AS BIGINT) AS sxy
       |      FROM j)
       |SELECT n AS n_directed_edges,
       |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       |    / (sqrt(GREATEST(CAST(n AS DOUBLE) * sxx
       |         - CAST(sx AS DOUBLE) * sx, 0.0))
       |     * sqrt(GREATEST(CAST(n AS DOUBLE) * syy
       |         - CAST(sy AS DOUBLE) * sy, 0.0))), 6) AS assortativity
       |FROM m""".stripMargin

  /** Symmetrized trade-graph CTE (the PageRank graph, reused by the k-core
    * peel). */
  private val tradeCtes =
    """pairs AS (
      |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |se AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs)""".stripMargin

  /** One peel round: keep only edges whose BOTH endpoints still have degree
    * ≥ k in the previous round's edge set. Monotone, so rounds past the true
    * peel depth are no-ops — see [[GraphQueries.KCoreRounds]] for the
    * keep-in-sync-by-construction contract with the Spark loop's maxRounds.
    * MATERIALIZED is load-bearing: each round references its predecessor
    * three times (degree count + two IN probes), and DuckDB's default CTE
    * inlining would re-expand the whole chain 3^rounds times — the unhinted
    * spelling measured minutes at sf0.1 vs ~1 s materialized. */
  private def peelRound(i: Int): String =
    s"""k$i AS MATERIALIZED (SELECT src FROM p${i - 1} GROUP BY src
       |       HAVING count(*) >= ${GraphQueries.KCoreK}),
       |p$i AS MATERIALIZED (
       |  SELECT src, dst FROM p${i - 1}
       |  WHERE src IN (SELECT src FROM k$i) AND dst IN (SELECT src FROM k$i))""".stripMargin

  private val kcoreSql =
    s"""WITH $tradeCtes,
       |p0 AS MATERIALIZED (SELECT src, dst FROM se),
       |${(1 to GraphQueries.KCoreRounds).map(peelRound).mkString(",\n")}
       |SELECT src AS node, count(*) AS core_deg
       |FROM p${GraphQueries.KCoreRounds} GROUP BY 1 ORDER BY 1""".stripMargin

  /** One synchronized LPA round: count neighbor labels, then take the most
    * frequent with ties to the smallest label — the window-max + MIN spelling
    * of the Spark side's `max_by(label, struct(n, -label))`. */
  private def lpaRound(i: Int): String =
    s"""c$i AS (SELECT e.src, l.label, count(*) AS n
       |       FROM sn e JOIN l${i - 1} l ON l.node = e.dst GROUP BY 1, 2),
       |l$i AS MATERIALIZED (SELECT src AS node, min(label) AS label FROM (
       |         SELECT src, label, n, max(n) OVER (PARTITION BY src) AS mx
       |         FROM c$i)
       |       WHERE n = mx GROUP BY src)""".stripMargin

  private val labelPropSql =
    s"""WITH np AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  WHERE c_nationkey = s_nationkey),
       |sn AS MATERIALIZED (SELECT src, dst FROM np UNION ALL SELECT dst, src FROM np),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sn),
       |${(1 to GraphQueries.LpaRounds).map(lpaRound).mkString(",\n")}
       |SELECT node, label FROM l${GraphQueries.LpaRounds} ORDER BY node""".stripMargin

  private val lpaModularitySql =
    s"""WITH np AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  WHERE c_nationkey = s_nationkey),
       |sn AS MATERIALIZED (SELECT src, dst FROM np UNION ALL SELECT dst, src FROM np),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sn),
       |${(1 to GraphQueries.LpaRounds).map(lpaRound).mkString(",\n")},
       |ew AS (
       |  SELECT ls.label AS l1, ld.label AS l2
       |  FROM sn e
       |  JOIN l${GraphQueries.LpaRounds} ls ON ls.node = e.src
       |  JOIN l${GraphQueries.LpaRounds} ld ON ld.node = e.dst),
       |d AS (SELECT count(*) AS dd FROM ew),
       |per AS (
       |  SELECT l1 AS label, count(*) AS degc,
       |    CAST(SUM(CASE WHEN l1 = l2 THEN 1 ELSE 0 END) AS BIGINT) AS withinc
       |  FROM ew GROUP BY 1)
       |SELECT count(*) AS n_communities,
       |  CAST(MAX(dd) // 2 AS BIGINT) AS n_edges,
       |  round(CAST(SUM(CAST(
       |    (withinc / CAST(dd AS DOUBLE))
       |      - (degc / CAST(dd AS DOUBLE)) * (degc / CAST(dd AS DOUBLE))
       |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS modularity
       |FROM per CROSS JOIN d""".stripMargin

  /** Link prediction: wedge enumeration through the center node, RA score
    * as exact fixed-point integer sum (`//` is DuckDB's truncating division,
    * matching Spark's `div` on positive BIGINTs; the HUGEINT sum casts back
    * exactly — RaScale · maxdeg wedges fits far inside BIGINT). */
  private val linkPredictSql =
    s"""WITH $graphCtes,
       |sym AS MATERIALIZED (
       |  SELECT s1 AS src, s2 AS dst FROM e UNION ALL SELECT s2, s1 FROM e),
       |w AS (SELECT a.src AS c, a.dst AS u, b.dst AS v
       |      FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst),
       |sc AS (SELECT u, v, COUNT(*) AS cn,
       |         CAST(SUM(${GraphQueries.RaScale} // d.deg) AS BIGINT) AS ra_fp
       |       FROM w JOIN deg d ON d.src = w.c GROUP BY 1, 2)
       |SELECT u, v, cn, ra_fp FROM sc
       |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.s1 = sc.u AND e.s2 = sc.v)
       |ORDER BY ra_fp DESC, u, v LIMIT ${GraphQueries.LinkPredTopK}""".stripMargin

  /** One BFS relaxation round: keep every known distance, add every
    * neighbor at +1, take the MIN per node. MATERIALIZED for the same
    * 3^rounds-inlining reason as the k-core peel. */
  private def bfsRound(i: Int): String =
    s"""d$i AS MATERIALIZED (
       |  SELECT node, MIN(dist) AS dist FROM (
       |    SELECT node, dist FROM d${i - 1}
       |    UNION ALL
       |    SELECT e.dst AS node, p.dist + 1 AS dist
       |    FROM se e JOIN d${i - 1} p ON e.src = p.node)
       |  GROUP BY node)""".stripMargin

  private val bfsSql =
    s"""WITH $tradeCtes,
       |d0 AS MATERIALIZED (
       |  SELECT DISTINCT s_suppkey * 2 + 1 AS node, CAST(0 AS BIGINT) AS dist
       |  FROM supplier
       |  WHERE s_nationkey = ${GraphQueries.BfsSeedNation}
       |    AND s_suppkey * 2 + 1 IN (SELECT src FROM se)),
       |${(1 to GraphQueries.BfsRounds).map(bfsRound).mkString(",\n")}
       |SELECT node,
       |  CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind, dist
       |FROM d${GraphQueries.BfsRounds} ORDER BY node""".stripMargin

  /** One HITS round: raw sum then ∕∕-max normalization, each half-step.
    * DuckDB sums BIGINT into HUGEINT — the multiply and division run in
    * HUGEINT (exact) and cast back, mirroring the Spark envelope note on
    * [[GraphQueries.HitsScale]]. */
  private def hitsIter(i: Int): String = {
    val s = GraphQueries.HitsScale
    s"""a${i}r AS (SELECT supp, sum(h) AS a
       |  FROM pairs JOIN h${i - 1} USING (cust) GROUP BY 1),
       |a$i AS (SELECT supp,
       |  CAST(a * $s // (SELECT max(a) FROM a${i}r) AS BIGINT) AS a
       |  FROM a${i}r),
       |h${i}r AS (SELECT cust, sum(a) AS h
       |  FROM pairs JOIN a$i USING (supp) GROUP BY 1),
       |h$i AS (SELECT cust,
       |  CAST(h * $s // (SELECT max(h) FROM h${i}r) AS BIGINT) AS h
       |  FROM h${i}r)""".stripMargin
  }

  private val hitsSql = {
    val n = GraphQueries.HitsIters
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |h0 AS (SELECT DISTINCT cust,
       |  CAST(${GraphQueries.HitsScale} AS BIGINT) AS h FROM pairs),
       |${(1 to n).map(hitsIter).mkString(",\n")}
       |SELECT 'cust' AS kind, cust AS node, h AS score FROM h$n
       |UNION ALL
       |SELECT 'supp' AS kind, supp AS node, a AS score FROM a$n
       |ORDER BY kind, node""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_pagerank", pagerankSql)(GraphQueries.pagerank(_, _)),
    QueryDef("q_ppr", pprSql)((s, d) => GraphQueries.pprTrade(s, d)),
    QueryDef("q_hits", hitsSql)(GraphQueries.hitsTrade(_, _)),
    QueryDef("q_triangle_count", triangleSql)(GraphQueries.triangleCount(_, _)),
    QueryDef("q_degree_dist", degreeDistSql)(GraphQueries.degreeDist(_, _)),
    QueryDef("q_assortativity", assortativitySql)(
      (s, d) => GraphQueries.assortativity(s, d)),
    QueryDef("q_kcore", kcoreSql)(GraphQueries.kCoreTrade(_, _)),
    QueryDef("q_label_prop", labelPropSql)(GraphQueries.labelPropagationTrade(_, _)),
    QueryDef("q_lpa_modularity", lpaModularitySql)(
      (s, d) => GraphQueries.lpaModularity(s, d)),
    QueryDef("q_link_predict", linkPredictSql)(GraphQueries.linkPredict(_, _)),
    QueryDef("q_bfs_frontier", bfsSql)(GraphQueries.bfsFrontier(_, _)))
}
