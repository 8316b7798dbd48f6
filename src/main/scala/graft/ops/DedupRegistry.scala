package graft.ops

import graft.QueryDef

/** DuckDB oracle SQL mirroring [[DedupQueries]] expression-for-expression
  * (same MD5-derived hashes, same shingle construction, same rounding). */
object DedupRegistry {

  private val words = "string_split(text, ' ')"

  /** Distinct 3-word shingles — DuckDB spelling of DedupQueries.shingleSet
    * (slice is inclusive-inclusive in DuckDB, hence i:i+2 for 3 tokens). */
  private val shingleSet =
    s"list_distinct(list_transform(generate_series(1, len($words) - 2), i -> array_to_string(($words)[i:i+2], ' ')))"

  private val hash48 = "('0x' || substr(md5(t), 1, 12))::BIGINT"

  /** Banded-MinHash candidate CTEs (DuckDB spelling of
    * DedupQueries.minhashCandidates): 16 minhash lanes = non-overlapping
    * 32-bit windows of two sha256 digests per shingle; `d` carries the
    * shingle sets, `cand` the capped banded pairs with both signatures.
    * Shared by q_minhash_lsh and q_dedup_verified. */
  private val minhashCandCtes =
    s"""d AS (SELECT doc_id, $shingleSet AS sh FROM documents),
       |hx AS (SELECT doc_id,
       |         list_transform(sh, x -> sha256('0:' || x) || sha256('1:' || x)) AS hx
       |       FROM d WHERE len(sh) > 0),
       |s AS (SELECT doc_id,
       |        list_transform(generate_series(0, 15),
       |          p -> list_min(list_transform(hx,
       |                 h -> h[p*8+1 : p*8+8]))) AS sig
       |      FROM hx),
       |bnd AS (SELECT doc_id, sig, b.b AS band_idx,
       |          array_to_string(sig[b.b*4+1 : b.b*4+4], '|') AS band_key
       |        FROM s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b),
       |okb AS (SELECT band_idx, band_key FROM bnd
       |        GROUP BY 1, 2 HAVING count(*) <= ${DedupQueries.SimhashBucketCap}),
       |bndc AS (SELECT bnd.* FROM bnd JOIN okb USING (band_idx, band_key)),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         any_value(a.sig) AS sig_a, any_value(b.sig) AS sig_b
       |  FROM bndc a JOIN bndc b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_doc_exact",
      """SELECT md5(text) AS content_md5, min(doc_id) AS keeper_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper_id""".stripMargin)(
      DedupQueries.dedupDocExact),

    QueryDef("q_dedup_ngram_jaccard",
      s"""WITH d AS (SELECT doc_id, $shingleSet AS sh FROM documents),
         |p0 AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS s FROM d),
         |rare AS (SELECT s FROM p0 GROUP BY s HAVING count(*) <= ${DedupQueries.JaccardDfCap}),
         |p AS (SELECT p0.* FROM p0 JOIN rare USING (s)),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.nsh AS na,
         |         b.nsh AS nb, count(*) AS n_common
         |  FROM p a JOIN p b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_a, doc_b, n_common,
         |  round(CAST(n_common AS DOUBLE) / (na + nb - n_common), 4) AS jaccard
         |FROM pairs
         |WHERE round(CAST(n_common AS DOUBLE) / (na + nb - n_common), 4) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin)(DedupQueries.dedupNgramJaccard),

    QueryDef("q_minhash_lsh",
      s"""WITH $minhashCandCtes
         |SELECT doc_a, doc_b,
         |  round(len(list_filter(generate_series(1, 16), i -> sig_a[i] = sig_b[i])) / 16.0, 4)
         |    AS est_jaccard
         |FROM cand ORDER BY doc_a, doc_b""".stripMargin)(DedupQueries.minhashLsh),

    // The generator's candidates re-checked EXACTLY: true shingle-set
    // Jaccard via intersection + inclusion–exclusion, thresholded at 0.8.
    QueryDef("q_dedup_verified",
      s"""WITH $minhashCandCtes,
         |j AS (SELECT c.doc_a, c.doc_b,
         |        len(list_intersect(da.sh, db.sh)) AS inter,
         |        len(da.sh) + len(db.sh) AS sz
         |      FROM cand c
         |      JOIN d da ON da.doc_id = c.doc_a
         |      JOIN d db ON db.doc_id = c.doc_b)
         |SELECT doc_a, doc_b,
         |  round(CAST(inter AS DOUBLE) / (sz - inter), 4) AS jaccard
         |FROM j
         |WHERE round(CAST(inter AS DOUBLE) / (sz - inter), 4) >= ${DedupQueries.VerifiedMinJaccard}
         |ORDER BY doc_a, doc_b""".stripMargin)(
      (s, d) => DedupQueries.dedupVerified(s, d)),

    QueryDef("q_simhash",
      s"""WITH h AS (SELECT doc_id,
         |  CAST(len(list_distinct($words)) AS BIGINT) AS n_tokens,
         |  list_transform(list_distinct($words), t -> $hash48) AS hs
         |FROM documents)
         |SELECT doc_id, n_tokens,
         |  CAST(list_sum(list_transform(generate_series(0, 47), b ->
         |    CASE WHEN CAST(list_sum(list_transform(hs, h ->
         |           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0
         |         THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM h ORDER BY doc_id""".stripMargin)(DedupQueries.simhash),

    QueryDef("q_simhash_pairs",
      s"""WITH h AS (SELECT doc_id,
         |  list_transform(list_distinct($words), t -> $hash48) AS hs
         |FROM documents),
         |sh AS (SELECT doc_id,
         |  CAST(list_sum(list_transform(generate_series(0, 47), b ->
         |    CASE WHEN CAST(list_sum(list_transform(hs, h ->
         |           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0
         |         THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM h),
         |ch0 AS (SELECT doc_id, simhash, c.c AS chunk_idx,
         |         (simhash >> (c.c * 12)) % 4096 AS chunk
         |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c) c),
         |ok AS (SELECT chunk_idx, chunk FROM ch0
         |       GROUP BY 1, 2 HAVING count(*) <= ${DedupQueries.SimhashBucketCap}),
         |ch AS (SELECT ch0.* FROM ch0 JOIN ok USING (chunk_idx, chunk)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |         FROM ch a JOIN ch b
         |           ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
         |          AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM cand
         |WHERE hamming <= 6 ORDER BY doc_a, doc_b""".stripMargin)(
      DedupQueries.simhashPairs),

    QueryDef("q_fuzzy_names",
      s"""WITH names AS (
        |  SELECT p_name, count(*) AS n_parts,
        |    split_part(p_name, ' ', 2) AS block
        |  FROM part GROUP BY 1)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
        |  a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
        |FROM names a JOIN names b
        |  ON a.block = b.block AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= ${DedupQueries.FuzzyMaxDist}
        |ORDER BY name_a, name_b""".stripMargin)(
      (s, d) => DedupQueries.fuzzyNameMatch(s, d)),

    // Asymmetric delta-vs-corpus banding: the shared bndc signature index
    // probed from the delta side only, verified exactly, best corpus match
    // per flagged incoming doc (highest Jaccard, ties to smallest id).
    QueryDef("q_dedup_incremental",
      s"""WITH $minhashCandCtes,
         |nc AS (SELECT n.doc_id AS doc_new, o.doc_id AS doc_old
         |       FROM bndc n JOIN bndc o
         |         ON n.band_idx = o.band_idx AND n.band_key = o.band_key
         |       WHERE n.doc_id % ${DedupQueries.DeltaMod} = 0
         |         AND o.doc_id % ${DedupQueries.DeltaMod} <> 0
         |       GROUP BY 1, 2),
         |jv AS (SELECT c.doc_new, c.doc_old,
         |         len(list_intersect(dn.sh, dd.sh)) AS inter,
         |         len(dn.sh) + len(dd.sh) AS sz
         |       FROM nc c
         |       JOIN d dn ON dn.doc_id = c.doc_new
         |       JOIN d dd ON dd.doc_id = c.doc_old),
         |vr AS (SELECT doc_new, doc_old,
         |         round(CAST(inter AS DOUBLE) / (sz - inter), 4) AS jaccard
         |       FROM jv
         |       WHERE round(CAST(inter AS DOUBLE) / (sz - inter), 4)
         |             >= ${DedupQueries.VerifiedMinJaccard}),
         |rk AS (SELECT doc_new, doc_old, jaccard,
         |         row_number() OVER (PARTITION BY doc_new
         |                            ORDER BY jaccard DESC, doc_old) AS rn
         |       FROM vr)
         |SELECT doc_new, doc_old AS dup_of, jaccard FROM rk
         |WHERE rn = 1 ORDER BY doc_new""".stripMargin)(
      (s, d) => DedupQueries.dedupIncremental(s, d)),

    // Non-overlapping W-word passage census (hashed-passage approximation of
    // substring dedup): same slicing, same 48-bit MD5 prefix hash, same
    // cross-doc (distinct docs >= 2) duplication predicate as the Spark side.
    QueryDef("q_passage_dedup",
      s"""WITH ws AS (SELECT doc_id, $words AS ws FROM documents),
         |p AS (SELECT doc_id,
         |        unnest(list_transform(
         |          generate_series(1, len(ws) // ${DedupQueries.PassageW}),
         |          i -> array_to_string(
         |            ws[(i-1)*${DedupQueries.PassageW}+1 : (i-1)*${DedupQueries.PassageW}+${DedupQueries.PassageW}],
         |            ' '))) AS t
         |      FROM ws),
         |ph AS (SELECT doc_id, $hash48 AS h FROM p),
         |xd AS (SELECT h FROM ph GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
         |SELECT ph.doc_id,
         |  count(*) AS n_passages,
         |  CAST(sum(CASE WHEN xd.h IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_dup_passages,
         |  round(sum(CASE WHEN xd.h IS NULL THEN 0 ELSE 1 END)::DOUBLE
         |        / count(*), 6) AS dup_frac
         |FROM ph LEFT JOIN xd ON ph.h = xd.h
         |GROUP BY 1 ORDER BY 1""".stripMargin)(
      (s, d) => DedupQueries.passageDedup(s, d)),

    // Novelty: first owner = min doc_id per shingle; docs shorter than one
    // shingle have no row (empty sets explode to nothing) — both engines.
    QueryDef("q_ngram_novelty",
      s"""WITH d AS (SELECT doc_id, $shingleSet AS sh FROM documents),
         |p AS (SELECT doc_id, unnest(sh) AS s FROM d),
         |f AS (SELECT s, min(doc_id) AS fd FROM p GROUP BY 1)
         |SELECT p.doc_id, count(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN p.doc_id = f.fd THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  round(CAST(SUM(CASE WHEN p.doc_id = f.fd THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) AS novelty
         |FROM p JOIN f USING (s)
         |GROUP BY 1 ORDER BY p.doc_id""".stripMargin)(
      (s, d) => DedupQueries.ngramNovelty(s, d)),

    // Per-source near-dup incidence over the same banded candidate CTEs.
    QueryDef("q_near_dup_by_source",
      s"""WITH $minhashCandCtes,
         |inv AS (SELECT doc_a AS doc_id FROM cand
         |        UNION SELECT doc_b AS doc_id FROM cand)
         |SELECT d.source, count(*) AS n_docs,
         |  CAST(SUM(CASE WHEN inv.doc_id IS NULL THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_near_dup,
         |  round(CAST(SUM(CASE WHEN inv.doc_id IS NULL THEN 0 ELSE 1 END)
         |    AS DOUBLE) / count(*), 6) AS nd_rate
         |FROM documents d LEFT JOIN inv ON d.doc_id = inv.doc_id
         |GROUP BY 1 ORDER BY d.source""".stripMargin)(
      (s, d) => DedupQueries.nearDupRateBySource(s, d)),

    // Recall curve of the banded-MinHash generator against the exhaustive
    // Jaccard frontier, per similarity band. Reuses minhashCandCtes' `d`
    // (the shingle sets) for the exhaustive side, so both arms see the
    // identical corpus.
    QueryDef("q_text_lsh_recall",
      s"""WITH $minhashCandCtes,
         |p0 AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS s FROM d),
         |rare AS (SELECT s FROM p0 GROUP BY s
         |         HAVING count(*) <= ${DedupQueries.JaccardDfCap}),
         |p AS (SELECT p0.* FROM p0 JOIN rare USING (s)),
         |tp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.nsh AS na,
         |         b.nsh AS nb, count(*) AS n_common
         |  FROM p a JOIN p b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4),
         |truth AS (
         |  SELECT doc_a, doc_b,
         |    round(CAST(n_common AS DOUBLE) / (na + nb - n_common), 4) AS j
         |  FROM tp
         |  WHERE round(CAST(n_common AS DOUBLE) / (na + nb - n_common), 4) >= 0.5)
         |SELECT CAST(FLOOR(j * 10) AS BIGINT) AS band, count(*) AS n_true,
         |  CAST(SUM(CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_hit,
         |  round(SUM(CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END)::DOUBLE
         |    / count(*), 4) AS recall
         |FROM truth t LEFT JOIN cand c
         |  ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
         |GROUP BY 1 ORDER BY band""".stripMargin)(
      (s, d) => DedupQueries.textLshRecall(s, d)),

    // Exhaustive containment: sizes from the FULL shingle sets (nsh before
    // the rarity filter), overlaps from the df-capped postings — the same
    // convention as q_dedup_ngram_jaccard, one-sided denominator. The
    // min-shingle filter applies BEFORE df so both engines count document
    // frequency over the same corpus.
    QueryDef("q_containment_dedup", {
      val cm = DedupQueries.ContainmentMin
      s"""WITH d AS (SELECT doc_id, $shingleSet AS sh FROM documents),
         |p0 AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS s FROM d
         |       WHERE len(sh) >= ${DedupQueries.ContainmentMinShingles}),
         |rare AS (SELECT s FROM p0 GROUP BY s
         |         HAVING count(*) <= ${DedupQueries.JaccardDfCap}),
         |p AS (SELECT p0.* FROM p0 JOIN rare USING (s)),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.nsh AS na,
         |         b.nsh AS nb, count(*) AS n_common
         |  FROM p a JOIN p b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT doc_a, doc_b, na, nb, n_common,
         |  round(CAST(n_common AS DOUBLE) / na, 4) AS containment
         |FROM pairs
         |WHERE round(CAST(n_common AS DOUBLE) / na, 4) >= $cm
         |ORDER BY doc_a, doc_b""".stripMargin
    })(DedupQueries.containmentDedup),

    // Narrow prefix-hash projection + one partial-agg shuffle; list_slice
    // clamps past-the-end like Spark's slice, so short docs key on their
    // whole text in both engines.
    QueryDef("q_dedup_prefix",
      s"""WITH p AS (
         |  SELECT doc_id, source,
         |    ('0x' || substr(md5(array_to_string(
         |      list_slice(string_split(text, ' '), 1, ${DedupQueries.PrefixTokens}),
         |      ' ')), 1, 12))::BIGINT AS prefix_hash
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT prefix_hash, count(*) AS n_docs,
         |  count(DISTINCT source) AS n_sources,
         |  min(doc_id) AS min_doc_id
         |FROM p GROUP BY 1 HAVING count(*) >= 2
         |ORDER BY prefix_hash""".stripMargin)(DedupQueries.dedupPrefix),

    // Same candidate CTEs as q_minhash_lsh / q_dedup_verified; both scores
    // on every candidate, error = |est − exact| on the rounded values.
    QueryDef("q_minhash_est_error",
      s"""WITH $minhashCandCtes,
         |j AS (SELECT c.doc_a, c.doc_b,
         |        round(len(list_filter(generate_series(1, 16),
         |          i -> c.sig_a[i] = c.sig_b[i])) / 16.0, 4) AS est_jaccard,
         |        len(list_intersect(da.sh, db.sh)) AS inter,
         |        len(da.sh) + len(db.sh) AS sz
         |      FROM cand c
         |      JOIN d da ON da.doc_id = c.doc_a
         |      JOIN d db ON db.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, est_jaccard,
         |  round(CAST(inter AS DOUBLE) / (sz - inter), 4) AS exact_jaccard,
         |  round(ABS(est_jaccard
         |    - round(CAST(inter AS DOUBLE) / (sz - inter), 4)), 4) AS abs_err
         |FROM j ORDER BY doc_a, doc_b""".stripMargin)(
      (s, d) => DedupQueries.minhashEstError(s, d)),

    // Verified edge list (q_dedup_verified's CTEs) → wedge self-join on
    // the center → closure via left join back to the edges. One row out.
    QueryDef("q_dedup_transitivity",
      s"""WITH $minhashCandCtes,
         |jv AS (SELECT c.doc_a, c.doc_b,
         |        len(list_intersect(da.sh, db.sh)) AS inter,
         |        len(da.sh) + len(db.sh) AS sz
         |      FROM cand c
         |      JOIN d da ON da.doc_id = c.doc_a
         |      JOIN d db ON db.doc_id = c.doc_b),
         |ed AS (SELECT doc_a, doc_b FROM jv
         |       WHERE round(CAST(inter AS DOUBLE) / (sz - inter), 4)
         |         >= ${DedupQueries.VerifiedMinJaccard}),
         |und AS (SELECT doc_a AS a, doc_b AS b FROM ed
         |        UNION ALL SELECT doc_b, doc_a FROM ed),
         |w AS (SELECT x.a AS a, y.b AS c
         |      FROM und x JOIN und y ON x.b = y.a WHERE x.a < y.b),
         |cl AS (SELECT count(*) AS n_wedges,
         |        CAST(SUM(CASE WHEN e2.doc_a IS NOT NULL THEN 1 ELSE 0 END)
         |          AS BIGINT) AS n_closed
         |      FROM w LEFT JOIN ed e2 ON e2.doc_a = w.a AND e2.doc_b = w.c),
         |eg AS (SELECT count(*) AS n_edges FROM ed)
         |SELECT n_edges, n_wedges, n_closed,
         |  CASE WHEN n_wedges > 0
         |    THEN round(CAST(n_closed AS DOUBLE) / n_wedges, 6) END
         |    AS closure_rate
         |FROM cl CROSS JOIN eg""".stripMargin)(
      (s, d) => DedupQueries.dedupTransitivity(s, d)),

    // Truth = the verified-pair CTEs; candidates = the simhash pair CTEs
    // (renamed sh*/sc* to coexist); semi-join + three 1-row counts.
    QueryDef("q_simhash_recall",
      s"""WITH $minhashCandCtes,
         |jv AS (SELECT c.doc_a, c.doc_b,
         |        len(list_intersect(da.sh, db.sh)) AS inter,
         |        len(da.sh) + len(db.sh) AS sz
         |      FROM cand c
         |      JOIN d da ON da.doc_id = c.doc_a
         |      JOIN d db ON db.doc_id = c.doc_b),
         |ed AS (SELECT doc_a, doc_b FROM jv
         |       WHERE round(CAST(inter AS DOUBLE) / (sz - inter), 4)
         |         >= ${DedupQueries.VerifiedMinJaccard}),
         |shh AS (SELECT doc_id,
         |  list_transform(list_distinct($words), t -> $hash48) AS hs
         |FROM documents),
         |shs AS (SELECT doc_id,
         |  CAST(list_sum(list_transform(generate_series(0, 47), b ->
         |    CASE WHEN CAST(list_sum(list_transform(hs, h ->
         |           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0
         |         THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM shh),
         |sc0 AS (SELECT doc_id, simhash, c.c AS chunk_idx,
         |         (simhash >> (c.c * 12)) % 4096 AS chunk
         |       FROM shs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c) c),
         |sok AS (SELECT chunk_idx, chunk FROM sc0
         |       GROUP BY 1, 2 HAVING count(*) <= ${DedupQueries.SimhashBucketCap}),
         |sch AS (SELECT sc0.* FROM sc0 JOIN sok USING (chunk_idx, chunk)),
         |scand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM sch a JOIN sch b
         |           ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
         |          AND a.doc_id < b.doc_id
         |         WHERE CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) <= 6),
         |nt AS (SELECT count(*) AS n_truth FROM ed),
         |nc AS (SELECT count(*) AS n_cand FROM scand),
         |nh AS (SELECT count(*) AS n_hit FROM ed
         |       WHERE EXISTS (SELECT 1 FROM scand
         |                     WHERE scand.doc_a = ed.doc_a
         |                       AND scand.doc_b = ed.doc_b))
         |SELECT n_truth, n_cand, n_hit,
         |  CASE WHEN n_truth > 0
         |    THEN round(CAST(n_hit AS DOUBLE) / n_truth, 6) END AS recall,
         |  CASE WHEN n_cand > 0
         |    THEN round(CAST(n_hit AS DOUBLE) / n_cand, 6) END AS precision
         |FROM nt CROSS JOIN nc CROSS JOIN nh""".stripMargin)(
      (s, d) => DedupQueries.simhashRecall(s, d)),

    // One signature CTE feeds three banding arms; each arm = capped-bucket
    // pair gen + semi-join score against the verified truth.
    QueryDef("q_lsh_band_sweep", {
      def arm(name: String, nb: Int, lpb: Int) =
        s"""bnd_$name AS (SELECT doc_id, b.b AS band_idx,
           |    array_to_string(sig[b.b*$lpb+1 : b.b*$lpb+$lpb], '|') AS band_key
           |  FROM s CROSS JOIN (SELECT unnest(generate_series(0, ${nb - 1})) AS b) b),
           |okb_$name AS (SELECT band_idx, band_key FROM bnd_$name
           |  GROUP BY 1, 2 HAVING count(*) <= ${DedupQueries.SimhashBucketCap}),
           |cnd_$name AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM (SELECT bnd_$name.* FROM bnd_$name
           |        JOIN okb_$name USING (band_idx, band_key)) a
           |  JOIN (SELECT bnd_$name.* FROM bnd_$name
           |        JOIN okb_$name USING (band_idx, band_key)) b
           |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           |   AND a.doc_id < b.doc_id),
           |row_$name AS (
           |  SELECT '$name' AS config,
           |    (SELECT count(*) FROM cnd_$name) AS n_cand,
           |    (SELECT count(*) FROM ed
           |     WHERE EXISTS (SELECT 1 FROM cnd_$name c
           |                   WHERE c.doc_a = ed.doc_a AND c.doc_b = ed.doc_b))
           |      AS n_hit,
           |    (SELECT count(*) FROM ed) AS n_truth)""".stripMargin
      val armSelect = (n: String) =>
        s"""SELECT config, n_cand, n_hit, n_truth,
           |  CASE WHEN n_truth > 0
           |    THEN round(CAST(n_hit AS DOUBLE) / n_truth, 6) END AS recall,
           |  CASE WHEN n_cand > 0
           |    THEN round(CAST(n_hit AS DOUBLE) / n_cand, 6) END AS precision
           |FROM row_$n""".stripMargin
      s"""WITH $minhashCandCtes,
         |jv AS (SELECT c.doc_a, c.doc_b,
         |        len(list_intersect(da.sh, db.sh)) AS inter,
         |        len(da.sh) + len(db.sh) AS sz
         |      FROM cand c
         |      JOIN d da ON da.doc_id = c.doc_a
         |      JOIN d db ON db.doc_id = c.doc_b),
         |ed AS (SELECT doc_a, doc_b FROM jv
         |       WHERE round(CAST(inter AS DOUBLE) / (sz - inter), 4)
         |         >= ${DedupQueries.VerifiedMinJaccard}),
         |${DedupQueries.BandConfigs.map { case (n, nb, lpb) => arm(n, nb, lpb) }
            .mkString(",\n")}
         |${DedupQueries.BandConfigs.map(c => armSelect(c._1))
            .mkString("\nUNION ALL\n")}
         |ORDER BY config""".stripMargin
    })((s, d) => DedupQueries.lshBandSweep(s, d))
  )
}
