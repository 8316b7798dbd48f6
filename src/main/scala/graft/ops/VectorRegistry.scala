package graft.ops

import graft.QueryDef

/** DuckDB oracle SQL mirroring [[VectorQueries]] expression-for-expression.
  *
  * Precision contract: every dot product is a left-fold double sum —
  * `list_sum(list_transform(...))` here, `aggregate(zip_with(...))` in Spark —
  * which the two engines evaluate bit-identically (verified), so sign bits,
  * argmax assignments and rounded similarities agree exactly. */
object VectorRegistry {

  /** Sequential-fold dot product over DOUBLE[] columns. */
  private def dot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> ($a)[i] * ($b)[i]))"

  private[ops] def cos(a: String, b: String): String =
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"

  /** Embeddings cast to DOUBLE[] (same elementwise float→double widening as
    * Spark's `cast(embedding as array<double>)`). */
  private[ops] val embCte =
    "emb AS (SELECT vec_id, CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS e FROM embeddings)"

  /** Oracle-side LSH geometry: the fixed 8 × 8 defaults, or
    * geometryFor(SPARK_GRAFT_ORACLE_CORPUS) when the blown-up-scale
    * oracle sweep pins a corpus count (round-12; graft.Verify pins the
    * engine's CorpusSizeConf to the same value). */
  private val (ogBands, ogBits) = VectorQueries.EmbeddingLsh.oracleGeometry

  /** ±1 hyperplane components by MD5 parity of "p:d" (TextQueries.hash48);
    * bands × bits planes (VectorQueries.EmbeddingLsh). */
  private val planesCte =
    s"""planes AS (SELECT p, list_transform(range(0, 64), d ->
       |  CAST(1 - 2 * ((('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 12))::BIGINT) % 2) AS DOUBLE)) AS signs
       |FROM (SELECT unnest(range(0, ${ogBands * ogBits})) AS p))""".stripMargin

  /** Per-(vec, band) sign-bit packing — band values aggregated directly
    * (mirrors VectorQueries.rawBands; no 64-bit signature word, no
    * arithmetic-shift sign trap). */
  private val bands0Cte =
    s"""proj AS (SELECT vec_id, p, ${dot("e", "signs")} AS proj
       |         FROM emb CROSS JOIN planes),
       |bands0 AS (SELECT vec_id, p // $ogBits AS band_idx,
       |             CAST(sum(CASE WHEN proj >= 0
       |                           THEN (1::BIGINT << CAST(p % $ogBits AS INT))
       |                           ELSE 0::BIGINT END) AS BIGINT) AS band_val
       |           FROM proj GROUP BY 1, 2)""".stripMargin

  /** Banding + degenerate-bucket cap, shared by the two LSH queries (and
    * reused verbatim by CurationRegistry's multimodal oracle). */
  private[ops] val sigBandCtes =
    s"""$planesCte,
       |$bands0Cte,
       |okband AS (SELECT band_idx, band_val FROM bands0
       |           GROUP BY 1, 2 HAVING count(*) <= ${DedupQueries.SimhashBucketCap}),
       |bands AS (SELECT bands0.* FROM bands0 JOIN okband USING (band_idx, band_val))""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_similar_vectors",
      s"""WITH $embCte,
         |p AS (SELECT e AS pe FROM emb WHERE vec_id = 0)
         |SELECT vec_id, label, round(${cos("e", "pe")}, 6) AS cos_sim
         |FROM emb, p WHERE vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin)(
      (s, d) => VectorQueries.similarVectors(s, d, probeId = 0L, k = 20)),

    QueryDef("q_ann_batch",
      s"""WITH $embCte,
         |probes AS (SELECT vec_id AS probe_id, e AS pe FROM emb WHERE vec_id < ${VectorQueries.AnnBatchProbes}),
         |scored AS (SELECT probe_id, emb.vec_id,
         |    round(${cos("e", "pe")}, 6) AS cos_sim
         |  FROM emb CROSS JOIN probes WHERE emb.vec_id <> probe_id),
         |ranked AS (SELECT probe_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cos_sim DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT probe_id, vec_id, cos_sim, rn FROM ranked
         |WHERE rn <= ${VectorQueries.AnnBatchK} ORDER BY probe_id, rn""".stripMargin)(
      (s, d) => VectorQueries.annBatch(s, d,
        nProbes = VectorQueries.AnnBatchProbes, k = VectorQueries.AnnBatchK)),

    QueryDef("q_hard_negatives",
      s"""WITH $embCte,
         |probes AS (SELECT vec_id AS probe_id, label AS probe_label, e AS pe
         |           FROM emb WHERE vec_id < ${VectorQueries.AnnBatchProbes}),
         |scored AS (SELECT probe_id, emb.vec_id, emb.label,
         |    round(${cos("e", "pe")}, 6) AS cos_sim
         |  FROM emb CROSS JOIN probes
         |  WHERE emb.vec_id <> probe_id AND emb.label <> probe_label),
         |ranked AS (SELECT probe_id, vec_id, label, cos_sim,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cos_sim DESC, vec_id) AS rn
         |  FROM scored)
         |SELECT probe_id, vec_id, label, cos_sim, rn FROM ranked
         |WHERE rn <= ${VectorQueries.HardNegK} ORDER BY probe_id, rn""".stripMargin)(
      (s, d) => VectorQueries.hardNegatives(s, d)),

    QueryDef("q_ann_lsh",
      s"""WITH $embCte,
         |$sigBandCtes,
         |cand AS (SELECT DISTINCT a.vec_id
         |         FROM bands a JOIN bands pb
         |           ON a.band_idx = pb.band_idx AND a.band_val = pb.band_val
         |         WHERE pb.vec_id = 0 AND a.vec_id <> 0),
         |p AS (SELECT e AS pe FROM emb WHERE vec_id = 0)
         |SELECT emb.vec_id, emb.label, round(${cos("e", "pe")}, 6) AS cos_sim
         |FROM cand JOIN emb USING (vec_id), p
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)(
      (s, d) => VectorQueries.annLsh(s, d, probeId = 0L, k = 10)),

    // Both arms rank by (rounded cos, vec_id) — a total order — so the
    // top-k sets intersect identically in both engines; COUNT/COALESCE
    // results CAST to BIGINT (type-sensitive hash compare).
    QueryDef("q_ann_recall",
      s"""WITH $embCte,
         |$sigBandCtes,
         |cand AS (SELECT DISTINCT pb.vec_id AS probe_id, a.vec_id
         |         FROM bands a JOIN bands pb
         |           ON a.band_idx = pb.band_idx AND a.band_val = pb.band_val
         |         WHERE pb.vec_id < ${VectorQueries.AnnBatchProbes}
         |           AND a.vec_id <> pb.vec_id),
         |probes AS (SELECT vec_id AS probe_id, e AS pe FROM emb
         |           WHERE vec_id < ${VectorQueries.AnnBatchProbes}),
         |lsh AS (SELECT probe_id, vec_id FROM (
         |    SELECT c.probe_id, c.vec_id,
         |      row_number() OVER (PARTITION BY c.probe_id
         |        ORDER BY round(${cos("e", "pe")}, 6) DESC, c.vec_id) AS rn
         |    FROM cand c JOIN emb USING (vec_id)
         |    JOIN probes p ON p.probe_id = c.probe_id)
         |  WHERE rn <= ${VectorQueries.RecallK}),
         |exact AS (SELECT probe_id, vec_id FROM (
         |    SELECT p.probe_id, emb.vec_id,
         |      row_number() OVER (PARTITION BY p.probe_id
         |        ORDER BY round(${cos("e", "pe")}, 6) DESC, emb.vec_id) AS rn
         |    FROM emb CROSS JOIN probes p WHERE emb.vec_id <> p.probe_id)
         |  WHERE rn <= ${VectorQueries.RecallK}),
         |nc AS (SELECT probe_id, COUNT(*) AS n_cand FROM cand GROUP BY 1)
         |SELECT e.probe_id,
         |  CAST(COALESCE(MIN(nc.n_cand), 0) AS BIGINT) AS n_cand,
         |  CAST(COUNT(l.vec_id) AS BIGINT) AS hits,
         |  ROUND(CAST(COUNT(l.vec_id) AS DOUBLE) / ${VectorQueries.RecallK}, 6)
         |    AS recall
         |FROM exact e
         |LEFT JOIN lsh l ON l.probe_id = e.probe_id AND l.vec_id = e.vec_id
         |LEFT JOIN nc ON nc.probe_id = e.probe_id
         |GROUP BY e.probe_id ORDER BY e.probe_id""".stripMargin)(
      (s, d) => VectorQueries.annRecall(s, d)),

    QueryDef("q_dedup_embedding",
      s"""WITH $embCte,
         |$sigBandCtes,
         |pairs AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |          FROM bands a JOIN bands b
         |            ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |           AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, round(${cos("ea.e", "eb.e")}, 6) AS cos_sim
         |FROM pairs
         |JOIN emb ea ON ea.vec_id = vec_a
         |JOIN emb eb ON eb.vec_id = vec_b
         |WHERE round(${cos("ea.e", "eb.e")}, 6) >= ${VectorQueries.EmbeddingMinCos}
         |ORDER BY vec_a, vec_b""".stripMargin)(
      VectorQueries.dedupEmbedding),

    QueryDef("q_lsh_bucket_stats",
      s"""WITH $embCte,
         |$planesCte,
         |$bands0Cte,
         |census AS (SELECT band_idx, band_val, count(*) AS bn
         |           FROM bands0 GROUP BY 1, 2)
         |SELECT band_idx, count(*) AS n_buckets, max(bn) AS max_bucket,
         |  CAST(sum(CASE WHEN bn > ${DedupQueries.SimhashBucketCap} THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
         |  CAST(sum(CASE WHEN bn > ${DedupQueries.SimhashBucketCap} THEN bn ELSE 0 END) AS BIGINT) AS vecs_in_skipped
         |FROM census GROUP BY band_idx ORDER BY band_idx""".stripMargin)(
      VectorQueries.lshBucketStats),

    QueryDef("q_ivf_search",
      s"""WITH $embCte,
         |cents AS (SELECT vec_id AS cent_id, e AS ce FROM emb WHERE vec_id < 10),
         |assigned AS (
         |  SELECT vec_id, label, e, cent_id FROM (
         |    SELECT emb.vec_id, emb.label, emb.e AS e, c.cent_id,
         |      row_number() OVER (PARTITION BY emb.vec_id
         |                         ORDER BY ${dot("emb.e", "c.ce")} DESC, c.cent_id) AS rn
         |    FROM emb CROSS JOIN cents c) WHERE rn = 1),
         |p AS (SELECT e AS pe FROM emb WHERE vec_id = 42),
         |probelists AS (SELECT cent_id FROM cents, p
         |               ORDER BY ${dot("ce", "pe")} DESC, cent_id LIMIT 3)
         |SELECT a.vec_id, a.cent_id, round(${cos("a.e", "pe")}, 6) AS cos_sim
         |FROM assigned a JOIN probelists USING (cent_id), p
         |WHERE a.vec_id <> 42
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)(
      (s, d) => VectorQueries.ivfSearch(s, d, probeId = 42L, k = 10, nprobe = 3)),

    QueryDef("q_vector_centroids",
      s"""WITH $embCte
         |SELECT label, d.d AS dim, count(*) AS n,
         |  round(CAST(sum(CAST(e[CAST(d.d AS INT) + 1] AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS mean_c
         |FROM emb CROSS JOIN (SELECT unnest(range(0, ${VectorQueries.CentroidDims})) AS d) d
         |GROUP BY label, d.d ORDER BY label, dim""".stripMargin)(
      VectorQueries.vectorCentroids),

    QueryDef("q_pq_encode", {
      import VectorQueries.PqCodec.{SubSpaces, SubDim, CodebookSize}
      // chunk s of a vector = 1-based list slice [s*SubDim+1 .. (s+1)*SubDim];
      // L2² via the same three-dot identity as the Spark side
      def d2(a: String, b: String) =
        s"(${dot(a, a)} - 2.0 * ${dot(a, b)} + ${dot(b, b)})"
      val codeCols = (0 until SubSpaces)
        .map(s => s"MAX(CASE WHEN s = $s THEN code END) AS code_$s")
        .mkString(", ")
      val errSum = (0 until SubSpaces)
        .map(s => s"MAX(CASE WHEN s = $s THEN d2 END)").mkString(" + ")
      s"""WITH $embCte,
         |sub AS (SELECT unnest(range(0, $SubSpaces)) AS s),
         |chunks AS (SELECT vec_id, s,
         |    e[CAST(s * $SubDim + 1 AS INT):CAST((s + 1) * $SubDim AS INT)] AS chunk
         |  FROM emb CROSS JOIN sub),
         |codebook AS (SELECT s AS cs, vec_id AS code,
         |    e[CAST(s * $SubDim + 1 AS INT):CAST((s + 1) * $SubDim AS INT)] AS cw
         |  FROM emb CROSS JOIN sub WHERE vec_id < $CodebookSize),
         |scored AS (SELECT vec_id, s, code, ${d2("chunk", "cw")} AS d2,
         |    row_number() OVER (PARTITION BY vec_id, s
         |                       ORDER BY ${d2("chunk", "cw")}, code) AS rn
         |  FROM chunks JOIN codebook ON s = cs),
         |best AS (SELECT vec_id, s, code, d2 FROM scored WHERE rn = 1)
         |SELECT vec_id, $codeCols, round($errSum, 6) AS q_err
         |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin
    })(VectorQueries.pqEncode),

    // Encode/decode written with IDENTICAL association on both sides —
    // ((v−mn)·255)/(mx−mn) and mn + (q·(mx−mn))/255 — so reconstruction
    // is bit-identical; squared errors ride the decimal-sum contract.
    QueryDef("q_quantize_int8", {
      val lv = VectorQueries.QuantLevels
      s"""WITH $embCte,
         |x AS (SELECT vec_id, label, d.d AS pos,
         |        e[CAST(d.d AS INT) + 1] AS v
         |      FROM emb CROSS JOIN
         |        (SELECT unnest(range(0, 64)) AS d) d),
         |s AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM x GROUP BY 1),
         |r AS (SELECT label, vec_id, v, mn, mx,
         |        CASE WHEN mx > mn
         |          THEN round((v - mn) * ${lv}.0 / (mx - mn), 0)
         |          ELSE 0.0 END AS q
         |      FROM x JOIN s USING (pos)),
         |d AS (SELECT label, vec_id,
         |        v - (mn + q * (mx - mn) / ${lv}.0) AS err
         |      FROM r)
         |SELECT label, count(DISTINCT vec_id) AS n_vecs,
         |  round(CAST(sum(CAST(err * err AS DECIMAL(38,12))) AS DOUBLE)
         |    / count(*), 9) AS mse,
         |  round(max(abs(err)), 6) AS max_abs_err
         |FROM d GROUP BY label ORDER BY label""".stripMargin
    })(VectorQueries.quantizeInt8),

    // Radius search: filter on the ROUNDED cosine (same contract as the
    // Spark side), result bounded by the radius, not a rank.
    QueryDef("q_range_search",
      s"""WITH $embCte,
         |probes AS (SELECT vec_id AS probe_id, e AS pe FROM emb
         |           WHERE vec_id < ${VectorQueries.AnnBatchProbes})
         |SELECT probe_id, emb.vec_id,
         |  round(${cos("e", "pe")}, 6) AS cos_sim
         |FROM emb CROSS JOIN probes
         |WHERE emb.vec_id <> probe_id
         |  AND round(${cos("e", "pe")}, 6) >= ${VectorQueries.RangeSearchCos}
         |ORDER BY probe_id, vec_id""".stripMargin)(
      (s, d) => VectorQueries.rangeSearch(s, d)),

    // Norm audit: sqrt of the sequential-fold dot, 6dp; avg through
    // DECIMAL(18,6) (rounded doubles land on the same decimal).
    QueryDef("q_emb_norm_audit",
      s"""WITH $embCte,
         |n AS (SELECT label, round(sqrt(${dot("e", "e")}), 6) AS nrm
         |      FROM emb)
         |SELECT label, count(*) AS n_vecs,
         |  min(nrm) AS norm_min,
         |  round(CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE)
         |    / count(*), 6) AS norm_avg,
         |  max(nrm) AS norm_max
         |FROM n GROUP BY 1 ORDER BY label""".stripMargin)(
      (s, d) => VectorQueries.embNormAudit(s, d)),

    // IVF recall: the q_ivf_search assignment/probe-list machinery over the
    // q_ann_recall probe set; both arms rank (rounded cos DESC, vec_id).
    QueryDef("q_ivf_recall", {
      val np = VectorQueries.AnnBatchProbes
      val k = VectorQueries.RecallK
      s"""WITH $embCte,
         |cents AS (SELECT vec_id AS cent_id, e AS ce FROM emb
         |          WHERE vec_id < ${VectorQueries.IvfCentroids}),
         |assigned AS (
         |  SELECT vec_id, e, cent_id FROM (
         |    SELECT emb.vec_id, emb.e AS e, c.cent_id,
         |      row_number() OVER (PARTITION BY emb.vec_id
         |                         ORDER BY ${dot("emb.e", "c.ce")} DESC, c.cent_id) AS rn
         |    FROM emb CROSS JOIN cents c) WHERE rn = 1),
         |probes AS (SELECT vec_id AS probe_id, e AS pe FROM emb
         |           WHERE vec_id < $np),
         |lists AS (SELECT probe_id, cent_id FROM (
         |    SELECT p.probe_id, c.cent_id,
         |      row_number() OVER (PARTITION BY p.probe_id
         |        ORDER BY ${dot("c.ce", "p.pe")} DESC, c.cent_id) AS rn
         |    FROM cents c CROSS JOIN probes p)
         |  WHERE rn <= ${VectorQueries.IvfNprobe}),
         |scanned AS (
         |  SELECT l.probe_id, a.vec_id,
         |    round(${cos("a.e", "p.pe")}, 6) AS cos_sim
         |  FROM assigned a JOIN lists l ON a.cent_id = l.cent_id
         |  JOIN probes p ON p.probe_id = l.probe_id
         |  WHERE a.vec_id <> l.probe_id),
         |ivf AS (SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id,
         |      row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cos_sim DESC, vec_id) AS rn
         |    FROM scanned) WHERE rn <= $k),
         |exact AS (SELECT probe_id, vec_id FROM (
         |    SELECT p.probe_id, emb.vec_id,
         |      row_number() OVER (PARTITION BY p.probe_id
         |        ORDER BY round(${cos("e", "pe")}, 6) DESC, emb.vec_id) AS rn
         |    FROM emb CROSS JOIN probes p WHERE emb.vec_id <> p.probe_id)
         |  WHERE rn <= $k),
         |nc AS (SELECT probe_id, COUNT(*) AS n_cand FROM scanned GROUP BY 1)
         |SELECT x.probe_id,
         |  CAST(COALESCE(MIN(nc.n_cand), 0) AS BIGINT) AS n_cand,
         |  CAST(COUNT(i.vec_id) AS BIGINT) AS hits,
         |  ROUND(CAST(COUNT(i.vec_id) AS DOUBLE) / $k, 6) AS recall
         |FROM exact x
         |LEFT JOIN ivf i ON i.probe_id = x.probe_id AND i.vec_id = x.vec_id
         |LEFT JOIN nc ON nc.probe_id = x.probe_id
         |GROUP BY x.probe_id ORDER BY x.probe_id""".stripMargin
    })((s, d) => VectorQueries.ivfRecall(s, d)),

    // OOD screening: 6dp-rounded centroid means, identical squared-term
    // double tree, decimal-exact term sums → bit-identical distances; 1-based
    // dims here vs 0-based pos in Spark — internal join keys only, never
    // emitted.
    QueryDef("q_ood_embeddings",
      s"""WITH $embCte,
         |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
         |ex AS (SELECT vec_id, label, i, e[i] AS x FROM emb CROSS JOIN dims),
         |cent AS (SELECT label, i,
         |           round(CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE)
         |             / count(*), 6) AS mean_c
         |         FROM ex GROUP BY 1, 2),
         |d AS (SELECT ex.vec_id, ex.label,
         |        round(sqrt(CAST(SUM(CAST((x - mean_c) * (x - mean_c)
         |          AS DECIMAL(38,12))) AS DOUBLE)), 6) AS dist
         |      FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
         |      GROUP BY 1, 2),
         |r AS (SELECT label, vec_id, dist,
         |        CAST(row_number() OVER (PARTITION BY label
         |          ORDER BY dist DESC, vec_id) AS BIGINT) AS rn
         |      FROM d)
         |SELECT label, rn, vec_id, dist FROM r
         |WHERE rn <= ${VectorQueries.OodK}
         |ORDER BY label, rn""".stripMargin)(
      (s, d) => VectorQueries.oodEmbeddings(s, d)),

    // Mutual-kNN graph: LSH candidate pairs → per-node top-k (rounded-cos
    // DESC, dst tiebreak — a total order) → mutuality self-join. Same CTE
    // stack as q_dedup_embedding; k interpolates from MutualK.
    QueryDef("q_mutual_knn",
      s"""WITH $embCte,
         |$sigBandCtes,
         |pairs AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |          FROM bands a JOIN bands b
         |            ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |           AND a.vec_id < b.vec_id),
         |scored AS (SELECT vec_a, vec_b,
         |    round(${cos("ea.e", "eb.e")}, 6) AS cos_sim
         |  FROM pairs
         |  JOIN emb ea ON ea.vec_id = vec_a
         |  JOIN emb eb ON eb.vec_id = vec_b),
         |directed AS (
         |  SELECT vec_a AS src, vec_b AS dst, cos_sim FROM scored
         |  UNION ALL
         |  SELECT vec_b AS src, vec_a AS dst, cos_sim FROM scored),
         |knn AS (SELECT src, dst, cos_sim, rn FROM (
         |    SELECT src, dst, cos_sim,
         |      CAST(row_number() OVER (PARTITION BY src
         |        ORDER BY cos_sim DESC, dst) AS BIGINT) AS rn
         |    FROM directed)
         |  WHERE rn <= ${VectorQueries.MutualK})
         |SELECT f.src AS vec_a, f.dst AS vec_b, f.cos_sim,
         |  f.rn AS rank_a, r.rn AS rank_b
         |FROM knn f JOIN knn r ON f.src = r.dst AND f.dst = r.src
         |WHERE f.src < f.dst
         |ORDER BY vec_a, vec_b""".stripMargin)(
      (s, d) => VectorQueries.mutualKnn(s, d)),

    // Corpus-scale work stays inside the two arm CTEs (each the exact SQL
    // of its standalone key); fusion is rank-only over ≤20-row frames.
    QueryDef("q_rrf_fusion", {
      val words = "string_split(text, ' ')"
      val k1 = TextQueries.Bm25K1
      val b = TextQueries.Bm25B
      val kk = VectorQueries.RrfK
      val depth = VectorQueries.RrfArmDepth
      s"""WITH docs AS (
         |  SELECT doc_id, CAST(len($words) AS BIGINT) AS dl, text FROM documents),
         |stats AS (
         |  SELECT count(*) AS n_docs,
         |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM docs),
         |tok AS (SELECT doc_id, dl, unnest($words) AS term FROM docs),
         |tf AS (
         |  SELECT doc_id, dl, term, count(*) AS tf FROM tok
         |  WHERE term IN (${TextQueries.bm25TermsSqlList})
         |  GROUP BY doc_id, dl, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id, tf.term,
         |    ln(CAST(1.0 AS DOUBLE)
         |       + (n_docs - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
         |    * (tf * (CAST($k1 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
         |    / (tf + CAST($k1 AS DOUBLE)
         |            * (CAST(${1.0 - b} AS DOUBLE)
         |               + CAST($b AS DOUBLE) * dl / avgdl)) AS s
         |  FROM tf JOIN df USING (term) CROSS JOIN stats),
         |bm AS (
         |  SELECT doc_id, round(list_sum(list(s ORDER BY term)), 6) AS bm25
         |  FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT $depth),
         |ta AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
         |    AS BIGINT) AS rank_text FROM bm),
         |$embCte,
         |p AS (SELECT e AS pe FROM emb WHERE vec_id = 0),
         |cs AS (
         |  SELECT vec_id, round(${cos("e", "pe")}, 6) AS cos_sim
         |  FROM emb, p WHERE vec_id <> 0
         |  ORDER BY cos_sim DESC, vec_id LIMIT $depth),
         |va AS (
         |  SELECT vec_id AS doc_id, CAST(row_number() OVER
         |    (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank_vec FROM cs)
         |SELECT COALESCE(ta.doc_id, va.doc_id) AS doc_id, rank_text, rank_vec,
         |  round(COALESCE(CAST(1.0 AS DOUBLE) / ($kk.0 + rank_text), 0.0)
         |      + COALESCE(CAST(1.0 AS DOUBLE) / ($kk.0 + rank_vec), 0.0), 6)
         |    AS rrf
         |FROM ta FULL OUTER JOIN va ON ta.doc_id = va.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT $depth""".stripMargin
    })((s, d) => VectorQueries.rrfFusion(s, d)),

    // IVF lists restrict, PQ codes rank: the q_ivf_search CTEs feed the
    // q_pq_search ADC CTEs; probe 42 (IVF convention), codes as stored.
    QueryDef("q_ivf_pq", {
      import VectorQueries.PqCodec.{SubSpaces, SubDim, CodebookSize}
      def d2(a: String, b: String) =
        s"(${dot(a, a)} - 2.0 * ${dot(a, b)} + ${dot(b, b)})"
      s"""WITH $embCte,
         |cents AS (SELECT vec_id AS cent_id, e AS ce FROM emb
         |          WHERE vec_id < ${VectorQueries.IvfCentroids}),
         |assigned AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT emb.vec_id, c.cent_id,
         |      row_number() OVER (PARTITION BY emb.vec_id
         |                         ORDER BY ${dot("emb.e", "c.ce")} DESC, c.cent_id) AS rn
         |    FROM emb CROSS JOIN cents c) WHERE rn = 1),
         |p AS (SELECT e AS pe FROM emb WHERE vec_id = 42),
         |probelists AS (SELECT cent_id FROM cents, p
         |               ORDER BY ${dot("ce", "pe")} DESC, cent_id
         |               LIMIT ${VectorQueries.IvfNprobe}),
         |sub AS (SELECT unnest(range(0, $SubSpaces)) AS s),
         |chunks AS (SELECT vec_id, s,
         |    e[CAST(s * $SubDim + 1 AS INT):CAST((s + 1) * $SubDim AS INT)] AS chunk
         |  FROM emb CROSS JOIN sub),
         |codebook AS (SELECT s AS cs, vec_id AS code,
         |    e[CAST(s * $SubDim + 1 AS INT):CAST((s + 1) * $SubDim AS INT)] AS cw
         |  FROM emb CROSS JOIN sub WHERE vec_id < $CodebookSize),
         |scored AS (SELECT vec_id, s, code, ${d2("chunk", "cw")} AS d2,
         |    row_number() OVER (PARTITION BY vec_id, s
         |                       ORDER BY ${d2("chunk", "cw")}, code) AS rn
         |  FROM chunks JOIN codebook ON s = cs),
         |best AS (SELECT vec_id, s, code FROM scored WHERE rn = 1),
         |pch AS (SELECT s AS ps, chunk AS pchunk FROM chunks WHERE vec_id = 42),
         |ptab AS (SELECT cs AS s, code, ${d2("pchunk", "cw")} AS pd2
         |  FROM codebook JOIN pch ON cs = ps),
         |lists AS (SELECT assigned.vec_id, assigned.cent_id
         |  FROM assigned JOIN probelists USING (cent_id)),
         |adc AS (SELECT b.vec_id, l.cent_id,
         |    CAST(SUM(CAST(pd2 AS DECIMAL(38,12))) AS DOUBLE) AS adc_raw
         |  FROM best b JOIN lists l ON b.vec_id = l.vec_id
         |  JOIN ptab USING (s, code) GROUP BY 1, 2),
         |ex AS (SELECT vec_id, ${d2("e", "pe")} AS exact_raw
         |  FROM emb CROSS JOIN p)
         |SELECT adc.vec_id, adc.cent_id, round(adc_raw, 6) AS adc_d2,
         |  round(exact_raw, 6) AS exact_d2
         |FROM adc JOIN ex USING (vec_id)
         |WHERE vec_id <> 42
         |ORDER BY round(adc_raw, 6), vec_id
         |LIMIT ${VectorQueries.PqSearchK}""".stripMargin
    })((s, d) => VectorQueries.ivfPqSearch(s, d)),

    // ADC: probe × codebook distance table (32 metadata rows) joined onto
    // the stored codes; per-vector sum of SubSpaces decimal terms.
    QueryDef("q_pq_search", {
      import VectorQueries.PqCodec.{SubSpaces, SubDim, CodebookSize}
      def d2(a: String, b: String) =
        s"(${dot(a, a)} - 2.0 * ${dot(a, b)} + ${dot(b, b)})"
      s"""WITH $embCte,
         |sub AS (SELECT unnest(range(0, $SubSpaces)) AS s),
         |chunks AS (SELECT vec_id, s,
         |    e[CAST(s * $SubDim + 1 AS INT):CAST((s + 1) * $SubDim AS INT)] AS chunk
         |  FROM emb CROSS JOIN sub),
         |codebook AS (SELECT s AS cs, vec_id AS code,
         |    e[CAST(s * $SubDim + 1 AS INT):CAST((s + 1) * $SubDim AS INT)] AS cw
         |  FROM emb CROSS JOIN sub WHERE vec_id < $CodebookSize),
         |scored AS (SELECT vec_id, s, code, ${d2("chunk", "cw")} AS d2,
         |    row_number() OVER (PARTITION BY vec_id, s
         |                       ORDER BY ${d2("chunk", "cw")}, code) AS rn
         |  FROM chunks JOIN codebook ON s = cs),
         |best AS (SELECT vec_id, s, code FROM scored WHERE rn = 1),
         |pch AS (SELECT s AS ps, chunk AS pchunk FROM chunks WHERE vec_id = 0),
         |ptab AS (SELECT cs AS s, code, ${d2("pchunk", "cw")} AS pd2
         |  FROM codebook JOIN pch ON cs = ps),
         |adc AS (SELECT b.vec_id,
         |    CAST(SUM(CAST(pd2 AS DECIMAL(38,12))) AS DOUBLE) AS adc_raw
         |  FROM best b JOIN ptab USING (s, code) GROUP BY 1),
         |p AS (SELECT e AS pe FROM emb WHERE vec_id = 0),
         |ex AS (SELECT vec_id, ${d2("e", "pe")} AS exact_raw
         |  FROM emb CROSS JOIN p)
         |SELECT adc.vec_id, round(adc_raw, 6) AS adc_d2,
         |  round(exact_raw, 6) AS exact_d2
         |FROM adc JOIN ex USING (vec_id)
         |WHERE vec_id <> 0
         |ORDER BY round(adc_raw, 6), vec_id
         |LIMIT ${VectorQueries.PqSearchK}""".stripMargin
    })((s, d) => VectorQueries.pqSearch(s, d)),

    // Quantized-integer power sums (floor(x·1e6) — identical IEEE ops both
    // engines) make the covariance one shared double expression tree;
    // list indices are 1-based in DuckDB, 0-based in Spark's qv[i].
    QueryDef("q_embedding_cov", {
      val d = VectorQueries.CovDims
      val qc = VectorQueries.CovQuant
      s"""WITH q AS (
         |  SELECT list_transform(range(1, ${d + 1}),
         |    k -> CAST(FLOOR(CAST(list_extract(embedding, k) AS DOUBLE) * $qc)
         |      AS BIGINT)) AS qv
         |  FROM embeddings),
         |p AS (
         |  SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
         |    list_extract(qv, CAST(i + 1 AS INTEGER)) AS a,
         |    list_extract(qv, CAST(j + 1 AS INTEGER)) AS b
         |  FROM q, range(0, $d) t(i), range(0, $d) u(j)
         |  WHERE j >= i)
         |SELECT i, j, count(*) AS n,
         |  round((CAST(SUM(a * b) AS DOUBLE) / count(*)
         |      - (CAST(SUM(a) AS DOUBLE) / count(*))
         |        * (CAST(SUM(b) AS DOUBLE) / count(*)))
         |    / ($qc.0 * $qc.0), 8) AS cov
         |FROM p GROUP BY 1, 2 ORDER BY i, j""".stripMargin
    })((s, d) => VectorQueries.embeddingCov(s, d))
  )
}
