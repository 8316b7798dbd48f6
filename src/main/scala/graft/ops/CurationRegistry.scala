package graft.ops

import graft.QueryDef

/** DuckDB oracles for the curation pipelines — the same stages as
  * [[CurationQueries]], CTE by CTE, reusing the exact oracle spellings of
  * the standalone quality/dedup/minhash/lang-id queries. `q_curation_cc`
  * anchors the iterative large-star/small-star CC to a recursive-CTE
  * reachability fixpoint: both sides compute "minimum doc_id reachable over
  * the candidate-pair graph", by entirely different algorithms. */
object CurationRegistry {

  private val words = "string_split(text, ' ')"
  private val stop = TextQueries.stopwordsSqlList
  private val shingleSet =
    s"list_distinct(list_transform(generate_series(1, len($words) - 2), i -> array_to_string(($words)[i:i+2], ' ')))"

  /** Stages 1+2 (quality gate, exact dedup) + the banded MinHash signature
    * tables — shared by both curation oracles. */
  private val prefixCtes =
    s"""scored AS (
       |  SELECT doc_id, text,
       |    CAST(len($words) AS BIGINT) AS n_tokens,
       |    round(CAST(len(list_distinct($words)) AS DOUBLE) / len($words), 4) AS uniq_ratio,
       |    round(least(CAST(len($words) AS DOUBLE) / 100.0, 1.0), 4) AS len_score,
       |    round(CAST(len(list_filter($words, t -> t IN ($stop))) AS DOUBLE)
       |          / len($words), 4) AS stop_ratio
       |  FROM documents),
       |scored2 AS (SELECT *, round(len_score * 0.4 + uniq_ratio * 0.6, 4) AS quality
       |            FROM scored),
       |qualified AS (SELECT * FROM scored2 WHERE quality >= ${CurationQueries.QualityMin}),
       |keep AS (SELECT min(doc_id) AS doc_id FROM qualified GROUP BY md5(text)),
       |uniq AS (SELECT q.* FROM qualified q JOIN keep USING (doc_id)),
       |d AS (SELECT doc_id, $shingleSet AS sh FROM uniq),
       |hx AS (SELECT doc_id,
       |         list_transform(sh, x -> sha256('0:' || x) || sha256('1:' || x)) AS hx
       |       FROM d WHERE len(sh) > 0),
       |s AS (SELECT doc_id,
       |        list_transform(generate_series(0, 15),
       |          p -> list_min(list_transform(hx, h -> h[p*8+1 : p*8+8]))) AS sig
       |      FROM hx),
       |bnd AS (SELECT doc_id, sig, b.b AS band_idx,
       |          array_to_string(sig[b.b*4+1 : b.b*4+4], '|') AS band_key
       |        FROM s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b),
       |okb AS (SELECT band_idx, band_key FROM bnd
       |        GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND ${DedupQueries.SimhashBucketCap}),
       |bndc AS (SELECT bnd.* FROM bnd JOIN okb USING (band_idx, band_key))""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_curation_report",
      s"""WITH $prefixCtes,
         |drops AS (SELECT DISTINCT b.doc_id
         |          FROM bndc a JOIN bndc b
         |            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |           AND a.doc_id < b.doc_id
         |          WHERE len(list_filter(generate_series(1, 16),
         |                  i -> a.sig[i] = b.sig[i])) / 16.0 >= ${CurationQueries.SigAgreeMin}),
         |nd AS (SELECT u.* FROM uniq u LEFT JOIN drops ON u.doc_id = drops.doc_id
         |       WHERE drops.doc_id IS NULL),
         |stages AS (
         |  SELECT CAST(0 AS BIGINT) AS stage, 'input' AS stage_name,
         |    (SELECT count(*) FROM scored2) AS n_out
         |  UNION ALL SELECT 1, 'quality_gate', (SELECT count(*) FROM qualified)
         |  UNION ALL SELECT 2, 'exact_dedup', (SELECT count(*) FROM uniq)
         |  UNION ALL SELECT 3, 'near_dup_prune', (SELECT count(*) FROM nd)
         |  UNION ALL SELECT 4, 'language_gate',
         |    (SELECT count(*) FROM nd WHERE stop_ratio >= ${CurationQueries.StopRatioMin}))
         |SELECT stage, stage_name,
         |  coalesce(lag(n_out) OVER (ORDER BY stage), n_out) AS n_in, n_out,
         |  coalesce(lag(n_out) OVER (ORDER BY stage), n_out) - n_out AS n_dropped
         |FROM stages ORDER BY stage""".stripMargin)(
      CurationQueries.curationReport),

    QueryDef("q_curation_pipeline",
      s"""WITH $prefixCtes,
         |drops AS (SELECT DISTINCT b.doc_id
         |          FROM bndc a JOIN bndc b
         |            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |           AND a.doc_id < b.doc_id
         |          WHERE len(list_filter(generate_series(1, 16),
         |                  i -> a.sig[i] = b.sig[i])) / 16.0 >= ${CurationQueries.SigAgreeMin})
         |SELECT u.doc_id, u.n_tokens, u.quality
         |FROM uniq u LEFT JOIN drops ON u.doc_id = drops.doc_id
         |WHERE drops.doc_id IS NULL AND u.stop_ratio >= ${CurationQueries.StopRatioMin}
         |ORDER BY u.doc_id""".stripMargin)(CurationQueries.curate),
    QueryDef("q_curation_cc",
      s"""WITH RECURSIVE $prefixCtes,
         |edges AS (SELECT DISTINCT a.doc_id AS ea, b.doc_id AS eb
         |          FROM bndc a JOIN bndc b
         |            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |           AND a.doc_id < b.doc_id
         |          WHERE len(list_filter(generate_series(1, 16),
         |                  i -> a.sig[i] = b.sig[i])) / 16.0 >= ${CurationQueries.SigAgreeMin}),
         |bi AS (SELECT ea, eb FROM edges UNION SELECT eb, ea FROM edges),
         |reach AS (SELECT doc_id AS id, doc_id AS r FROM uniq
         |          UNION
         |          SELECT reach.id, bi.eb FROM reach JOIN bi ON bi.ea = reach.r),
         |comp AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
         |sz AS (SELECT comp, count(*) AS csize FROM comp GROUP BY comp)
         |SELECT c.doc_id, c.comp, sz.csize
         |FROM comp c JOIN sz USING (comp)
         |ORDER BY c.doc_id""".stripMargin)(CurationQueries.curateCC),

    // Multimodal CC: text LSH edges UNION embedding LSH edges (vec_id ≡
    // doc_id), both restricted to quality-gated unique docs, then the same
    // recursive-CTE reachability fixpoint as q_curation_cc — entirely
    // independent of the Spark large/small-star rounds.
    QueryDef("q_curation_multimodal",
      s"""WITH RECURSIVE $prefixCtes,
         |${VectorRegistry.embCte},
         |${VectorRegistry.sigBandCtes},
         |vpairs AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
         |           FROM bands a JOIN bands b
         |             ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |            AND a.vec_id < b.vec_id),
         |vedges AS (SELECT va AS ea, vb AS eb FROM vpairs
         |           JOIN emb ea2 ON ea2.vec_id = va
         |           JOIN emb eb2 ON eb2.vec_id = vb
         |           WHERE round(${VectorRegistry.cos("ea2.e", "eb2.e")}, 6) >= ${CurationQueries.MultimodalCosMin}
         |             AND va IN (SELECT doc_id FROM uniq)
         |             AND vb IN (SELECT doc_id FROM uniq)),
         |tedges AS (SELECT DISTINCT a.doc_id AS ea, b.doc_id AS eb
         |           FROM bndc a JOIN bndc b
         |             ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |            AND a.doc_id < b.doc_id
         |           WHERE len(list_filter(generate_series(1, 16),
         |                   i -> a.sig[i] = b.sig[i])) / 16.0 >= ${CurationQueries.SigAgreeMin}),
         |edges AS (SELECT ea, eb FROM tedges UNION SELECT ea, eb FROM vedges),
         |bi AS (SELECT ea, eb FROM edges UNION SELECT eb, ea FROM edges),
         |reach AS (SELECT doc_id AS id, doc_id AS r FROM uniq
         |          UNION
         |          SELECT reach.id, bi.eb FROM reach JOIN bi ON bi.ea = reach.r),
         |comp AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
         |sz AS (SELECT comp, count(*) AS csize FROM comp GROUP BY comp)
         |SELECT c.doc_id, c.comp, sz.csize
         |FROM comp c JOIN sz USING (comp)
         |ORDER BY c.doc_id""".stripMargin)(CurationQueries.curateMultimodal),

    // Dup-family size histogram over the same component fixpoint.
    QueryDef("q_dup_cluster_sizes",
      s"""WITH RECURSIVE $prefixCtes,
         |edges AS (SELECT DISTINCT a.doc_id AS ea, b.doc_id AS eb
         |          FROM bndc a JOIN bndc b
         |            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |           AND a.doc_id < b.doc_id
         |          WHERE len(list_filter(generate_series(1, 16),
         |                  i -> a.sig[i] = b.sig[i])) / 16.0 >= ${CurationQueries.SigAgreeMin}),
         |bi AS (SELECT ea, eb FROM edges UNION SELECT eb, ea FROM edges),
         |reach AS (SELECT doc_id AS id, doc_id AS r FROM uniq
         |          UNION
         |          SELECT reach.id, bi.eb FROM reach JOIN bi ON bi.ea = reach.r),
         |comp AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
         |sz AS (SELECT comp, count(*) AS csize FROM comp GROUP BY comp)
         |SELECT csize, count(*) AS n_clusters, csize * count(*) AS n_docs
         |FROM sz GROUP BY 1 ORDER BY csize""".stripMargin)(
      CurationQueries.dupClusterSizeDist),

    // Quality×dup calibration: same scored2 quality tree over ALL docs (no
    // gate), ntile on the (quality, doc_id) total order, md5 dup census.
    QueryDef("q_quality_dup_calibration",
      s"""WITH scored AS (
         |  SELECT doc_id, text,
         |    CAST(len($words) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_distinct($words)) AS DOUBLE) / len($words), 4) AS uniq_ratio,
         |    round(least(CAST(len($words) AS DOUBLE) / 100.0, 1.0), 4) AS len_score
         |  FROM documents),
         |s2 AS (SELECT doc_id, text, n_tokens,
         |         round(len_score * 0.4 + uniq_ratio * 0.6, 4) AS quality
         |       FROM scored),
         |dup AS (SELECT md5(text) AS m FROM documents
         |        GROUP BY 1 HAVING count(*) >= 2),
         |b AS (SELECT doc_id, n_tokens, quality, md5(text) AS m,
         |        CAST(NTILE(${CurationQueries.CalibrationBands})
         |          OVER (ORDER BY quality, doc_id) AS BIGINT) AS decile
         |      FROM s2)
         |SELECT b.decile, count(*) AS n_docs,
         |  CAST(SUM(CASE WHEN dup.m IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_dup,
         |  round(CAST(SUM(CASE WHEN dup.m IS NULL THEN 0 ELSE 1 END)
         |    AS DOUBLE) / count(*), 6) AS dup_rate,
         |  round(${Out.sql.davg("n_tokens")}, 6) AS avg_tokens,
         |  round(min(quality), 4) AS q_lo,
         |  round(max(quality), 4) AS q_hi
         |FROM b LEFT JOIN dup ON b.m = dup.m
         |GROUP BY 1 ORDER BY decile""".stripMargin)(
      CurationQueries.qualityDupCalibration),

    // Canonical-by-merit selection: the q_curation_cc component fixpoint,
    // then one row per component = its highest-quality member (doc_id
    // tiebreak). quality is the shared 4dp-rounded score, so the ranking is
    // a total order both engines agree on.
    QueryDef("q_canonical_docs",
      s"""WITH RECURSIVE $prefixCtes,
         |edges AS (SELECT DISTINCT a.doc_id AS ea, b.doc_id AS eb
         |          FROM bndc a JOIN bndc b
         |            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |           AND a.doc_id < b.doc_id
         |          WHERE len(list_filter(generate_series(1, 16),
         |                  i -> a.sig[i] = b.sig[i])) / 16.0 >= ${CurationQueries.SigAgreeMin}),
         |bi AS (SELECT ea, eb FROM edges UNION SELECT eb, ea FROM edges),
         |reach AS (SELECT doc_id AS id, doc_id AS r FROM uniq
         |          UNION
         |          SELECT reach.id, bi.eb FROM reach JOIN bi ON bi.ea = reach.r),
         |comp AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
         |lab AS (SELECT u.doc_id, u.quality, c.comp
         |        FROM uniq u JOIN comp c USING (doc_id)),
         |sz AS (SELECT comp, count(*) AS csize FROM lab GROUP BY comp),
         |rk AS (SELECT lab.*,
         |         row_number() OVER (PARTITION BY comp
         |           ORDER BY quality DESC, doc_id) AS rn
         |       FROM lab)
         |SELECT rk.comp, sz.csize, rk.doc_id AS canonical_id,
         |  rk.quality AS canonical_quality, sz.csize - 1 AS n_dropped
         |FROM rk JOIN sz USING (comp) WHERE rn = 1
         |ORDER BY comp""".stripMargin)(CurationQueries.canonicalDocs)
  )
}
