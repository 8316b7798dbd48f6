package graft.ops

import graft.QueryDef

/** DuckDB oracles for [[ClusterQueries]] — same seed centroids, same
  * left-fold cosine ([[VectorRegistry.cos]]), same DECIMAL(38,12)-exact
  * componentwise means, same lowest-centroid-id tie-break (row_number
  * `ORDER BY cos DESC, cluster` ≡ Spark's `max_by` over (cos, -cluster)). */
object ClusterRegistry {

  import VectorRegistry.{cos, embCte}

  /** Seed-centroid assignment CTE chain shared by the queries: every vector
    * argmax-cosine-assigned to centroids = vectors 0..k-1. The two
    * pinned-k queries render with [[ClusterQueries.KmeansK]]; q_semdedup
    * renders with [[ClusterQueries.oracleK]] so a blown-up-scale oracle
    * sweep (SPARK_GRAFT_ORACLE_CORPUS) seeds the same auto-k the engine
    * resolves under the pinned corpus-size conf. */
  private def assignCtes(k: Int = ClusterQueries.KmeansK) =
    s"""cents0 AS (SELECT vec_id AS cluster, e AS ce FROM emb
       |           WHERE vec_id < $k),
       |x0 AS (SELECT emb.vec_id, emb.e, cents0.cluster, ${cos("e", "ce")} AS cs,
       |         row_number() OVER (PARTITION BY emb.vec_id
       |                            ORDER BY ${cos("e", "ce")} DESC, cents0.cluster) AS rn
       |       FROM emb CROSS JOIN cents0),
       |a0 AS (SELECT vec_id, e, cluster FROM x0 WHERE rn = 1)""".stripMargin

  def all: Seq[QueryDef] = Seq(
    // Parallel unnests zip in DuckDB, so (pos, component) pairs come from one
    // pass; generate_series(1, len(e)) is inclusive = len(e) positions.
    QueryDef("q_kmeans_refine",
      s"""WITH $embCte,
         |${assignCtes()},
         |mexp AS (SELECT cluster, unnest(generate_series(1, len(e))) - 1 AS pos,
         |                unnest(e) AS v
         |         FROM a0),
         |m AS (SELECT cluster, pos,
         |        CAST(sum(CAST(v AS DECIMAL(38,12))) AS DOUBLE) / count(*) AS c
         |      FROM mexp GROUP BY 1, 2),
         |cents1 AS (SELECT cluster AS cluster1, list(c ORDER BY pos) AS ce
         |           FROM m GROUP BY 1),
         |x1 AS (SELECT a0.vec_id, a0.cluster AS cluster0, cents1.cluster1,
         |         ${cos("e", "ce")} AS cs,
         |         row_number() OVER (PARTITION BY a0.vec_id
         |                            ORDER BY ${cos("e", "ce")} DESC, cents1.cluster1) AS rn
         |       FROM a0 CROSS JOIN cents1)
         |SELECT vec_id, cluster0, cluster1, round(cs, 6) AS cos_c1
         |FROM x1 WHERE rn = 1 ORDER BY vec_id""".stripMargin)(
      (s, d) => ClusterQueries.kmeansRefine(s, d, k = ClusterQueries.KmeansK)),

    QueryDef("q_semdedup",
      s"""WITH $embCte,
         |${assignCtes(ClusterQueries.oracleK())},
         |p AS (SELECT b.vec_id AS v
         |      FROM a0 a JOIN a0 b
         |        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |      WHERE round(${cos("a.e", "b.e")}, 6)
         |            >= CAST(${ClusterQueries.SemDedupTau} AS DOUBLE)),
         |d AS (SELECT DISTINCT v FROM p)
         |SELECT a0.vec_id, a0.cluster,
         |  CAST(CASE WHEN d.v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM a0 LEFT JOIN d ON a0.vec_id = d.v
         |ORDER BY a0.vec_id""".stripMargin)(
      // k left at auto (-1): at plain oracle scale it resolves to KmeansK
      // (n ≤ 20 k) and the SQL seeds KmeansK centroids; under
      // SPARK_GRAFT_ORACLE_CORPUS both sides derive the SAME auto-k from
      // the pinned count (oracleK above ↔ resolveK under the conf Verify
      // pins) — the cap guard stays armed either way
      (s, d) => ClusterQueries.semDedup(s, d,
        tau = ClusterQueries.SemDedupTau)),

    // m(m-1) is even, so the double division by 2 is exact and the BIGINT
    // cast truncates identically in both engines.
    QueryDef("q_cluster_stats",
      s"""WITH $embCte,
         |${assignCtes()},
         |g AS (SELECT cluster, count(*) AS n_vecs FROM a0 GROUP BY 1)
         |SELECT cluster, n_vecs,
         |  CAST(n_vecs * (n_vecs - 1) / 2 AS BIGINT) AS n_pairs,
         |  ${ClusterQueries.SemDedupClusterCap} - n_vecs AS cap_headroom
         |FROM g ORDER BY cluster""".stripMargin)(
      (s, d) => ClusterQueries.clusterStats(s, d, k = ClusterQueries.KmeansK))
  )
}
