package graft.ops

import graft.QueryDef

/** DuckDB oracles for [[PipelineQueries]] — same MD5-derived hashes, same
  * shingle construction, same CASE rate table, same window frames. */
object PipelineRegistry {

  private val words = "string_split(text, ' ')"

  /** Distinct n-word shingles, DuckDB spelling of TextQueries.shingled
    * (slice is inclusive-inclusive: i : i+n-1). */
  private def shingleSet(n: Int) =
    s"list_distinct(list_transform(generate_series(1, len($words) - ${n - 1}), i -> array_to_string(($words)[i:i+${n - 1}], ' ')))"

  private def hash48(e: String) = s"('0x' || substr(md5($e), 1, 12))::BIGINT"

  private val mixRateSql =
    PipelineQueries.MixPermille
      .map { case (l, p) => s"WHEN lang = '$l' THEN $p" }
      .mkString("CASE ", " ", s" ELSE ${PipelineQueries.MixDefaultPermille} END")

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_decontaminate",
      s"""WITH sh AS (SELECT doc_id, source, ${shingleSet(PipelineQueries.DecontamN)} AS sh
         |            FROM documents),
         |ev AS (SELECT DISTINCT ${hash48("s")} AS h
         |       FROM (SELECT unnest(sh) AS s FROM sh
         |             WHERE source = '${PipelineQueries.EvalSource}')),
         |tr AS (SELECT doc_id, ${hash48("s")} AS h
         |       FROM (SELECT doc_id, unnest(sh) AS s FROM sh
         |             WHERE source <> '${PipelineQueries.EvalSource}'))
         |SELECT doc_id, count(*) AS n_contaminated
         |FROM tr JOIN ev USING (h)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin)(PipelineQueries.decontaminate),

    // Positional (non-distinct) shingles on both sides — 1-based word
    // offsets agree exactly; the pair rollup mirrors the Spark partial agg.
    QueryDef("q_contamination_report", {
      val n = PipelineQueries.DecontamN
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws
         |           FROM documents),
         |pos AS (
         |  SELECT doc_id, source,
         |    unnest(generate_series(1, len(ws) - ${n - 1})) AS wpos, ws
         |  FROM t WHERE len(ws) >= $n),
         |ph AS (
         |  SELECT doc_id, source, wpos,
         |    ${hash48(s"array_to_string(ws[wpos:wpos+${n - 1}], ' ')")} AS h
         |  FROM pos),
         |ev AS (SELECT DISTINCT doc_id AS eval_id, h FROM ph
         |       WHERE source = '${PipelineQueries.EvalSource}'),
         |tr AS (SELECT doc_id, wpos, h FROM ph
         |       WHERE source <> '${PipelineQueries.EvalSource}')
         |SELECT tr.doc_id, ev.eval_id, count(*) AS n_hits,
         |  CAST(count(DISTINCT tr.h) AS BIGINT) AS n_shingles,
         |  min(wpos) AS first_pos, max(wpos) AS last_pos
         |FROM tr JOIN ev USING (h)
         |GROUP BY 1, 2 ORDER BY doc_id, eval_id""".stripMargin
    })(PipelineQueries.contaminationReport),

    QueryDef("q_decontaminate_keep",
      s"""WITH sh AS (SELECT doc_id, source, ${shingleSet(PipelineQueries.DecontamN)} AS sh
         |            FROM documents),
         |ev AS (SELECT DISTINCT ${hash48("s")} AS h
         |       FROM (SELECT unnest(sh) AS s FROM sh
         |             WHERE source = '${PipelineQueries.EvalSource}')),
         |tr AS (SELECT doc_id, ${hash48("s")} AS h
         |       FROM (SELECT doc_id, unnest(sh) AS s FROM sh
         |             WHERE source <> '${PipelineQueries.EvalSource}')),
         |cnt AS (SELECT doc_id, count(*) AS n_contaminated
         |        FROM tr JOIN ev USING (h) GROUP BY 1)
         |SELECT d.doc_id, d.lang, d.source,
         |  coalesce(cnt.n_contaminated, 0) AS n_contaminated,
         |  CAST(coalesce(cnt.n_contaminated, 0) = 0 AS BIGINT) AS keep
         |FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
         |WHERE d.source <> '${PipelineQueries.EvalSource}'
         |ORDER BY d.doc_id""".stripMargin)(PipelineQueries.decontaminateKeepList),

    QueryDef("q_domain_mix",
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${hash48("doc_id::VARCHAR")} % 1000 < ($mixRateSql)
         |ORDER BY doc_id""".stripMargin)(PipelineQueries.domainMix),

    // sqrt is IEEE-exact in both engines; the normalizer is a DECIMAL(38,12)
    // sum of sqrt casts (order-independent), divided in double — the same
    // decimal-sum discipline as Out.dsum. CROSS JOIN the 1-row normalizer.
    QueryDef("q_mix_rebalance",
      s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
         |z AS (SELECT CAST(sum(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(38,12)))
         |             AS DOUBLE) AS z FROM c)
         |SELECT lang, n_docs,
         |  round(sqrt(CAST(n_docs AS DOUBLE)) / z, 6) AS weight,
         |  round(least(CAST(1.0 AS DOUBLE),
         |              sqrt(CAST(n_docs AS DOUBLE)) / z * ${PipelineQueries.MixBudget}
         |                / n_docs), 6) AS sample_rate
         |FROM c CROSS JOIN z ORDER BY lang""".stripMargin)(
      PipelineQueries.mixRebalance),

    QueryDef("q_token_packing",
      s"""WITH d AS (SELECT lang, doc_id,
         |             CAST(len($words) AS BIGINT) AS toks
         |           FROM documents),
         |c AS (SELECT lang, doc_id, toks,
         |        coalesce(sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |      FROM d)
         |SELECT lang, CAST(floor(cum_before / ${PipelineQueries.PackBudget}) AS BIGINT) AS seq,
         |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens
         |FROM c GROUP BY 1, 2 ORDER BY lang, seq""".stripMargin)(
      PipelineQueries.tokenPacking),

    QueryDef("q_repetition_stats",
      s"""WITH tc AS (SELECT doc_id, t, count(*) AS c
         |            FROM (SELECT doc_id, unnest($words) AS t FROM documents)
         |            GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |               count(*) AS n_distinct, max(c) AS top_count
         |        FROM tc GROUP BY 1)
         |SELECT doc_id, n_tokens, n_distinct, top_count,
         |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_frac,
         |  round(CAST(top_count AS DOUBLE) / n_tokens, 6) AS top_frac
         |FROM agg ORDER BY doc_id""".stripMargin)(PipelineQueries.repetitionStats),

    QueryDef("q_dup_span_census",
      s"""WITH sh AS (SELECT doc_id, ${shingleSet(PipelineQueries.DupSpanN)} AS sh
         |            FROM documents),
         |sp AS (SELECT doc_id, ${hash48("s")} AS h
         |       FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
         |dup AS (SELECT h FROM (SELECT h, count(*) AS df FROM sp GROUP BY 1)
         |        WHERE df > 1),
         |ns AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY 1),
         |nd AS (SELECT doc_id, count(*) AS n_dup FROM sp JOIN dup USING (h)
         |       GROUP BY 1)
         |SELECT ns.doc_id, ns.n_spans,
         |  COALESCE(nd.n_dup, 0) AS n_dup_spans,
         |  round(CAST(COALESCE(nd.n_dup, 0) AS DOUBLE) / ns.n_spans, 6) AS dup_frac
         |FROM ns LEFT JOIN nd USING (doc_id) ORDER BY doc_id""".stripMargin)(
      PipelineQueries.dupSpanCensus(_, _)),

    QueryDef("q_leakage_split",
      s"""WITH e AS (
         |  SELECT user_id, value,
         |    ${hash48("user_id::VARCHAR")} % 100 AS b
         |  FROM events WHERE user_id IS NOT NULL)
         |SELECT CASE WHEN b < ${PipelineQueries.SplitTrainPct} THEN 'train'
         |            WHEN b < ${PipelineQueries.SplitValidPct} THEN 'valid'
         |            ELSE 'test' END AS split,
         |  count(*) AS n_rows,
         |  count(DISTINCT user_id) AS n_users,
         |  round(${graft.ops.Out.sql.davg("value")}, 6) AS avg_value
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin)(
      PipelineQueries.leakageSplit),

    QueryDef("q_source_overlap",
      s"""WITH sh AS (SELECT DISTINCT source, ${hash48("s")} AS h
         |  FROM (SELECT source, unnest(${shingleSet(PipelineQueries.OverlapN)}) AS s
         |        FROM documents)),
         |sz AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
         |pair AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
         |         FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
         |         GROUP BY 1, 2)
         |SELECT src_a, src_b, shared,
         |  round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6) AS jaccard
         |FROM pair
         |JOIN sz sa ON sa.source = pair.src_a
         |JOIN sz sb ON sb.source = pair.src_b
         |ORDER BY src_a, src_b""".stripMargin)(
      PipelineQueries.sourceOverlap),

    // Identical term expression tree as the Spark side: shares formed as
    // (count + 0.5) / (total + 5.0) in double, term = (p - q) * ln(p / q),
    // each term cast DECIMAL(38,12) before the sum (order independence).
    QueryDef("q_drift_psi",
      s"""WITH c AS (SELECT source,
         |    LEAST(n_chars // ${PipelineQueries.PsiBinWidth},
         |          ${PipelineQueries.PsiBins - 1}) AS bin, count(*) AS c
         |  FROM documents GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
         |corp AS (SELECT bin, CAST(sum(c) AS BIGINT) AS cc FROM c GROUP BY 1),
         |ntot AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM c),
         |grid AS (SELECT t.source, t.n, g.bin
         |         FROM tot t CROSS JOIN
         |           (SELECT unnest(generate_series(0, ${PipelineQueries.PsiBins - 1})) AS bin) g),
         |j AS (SELECT grid.source, grid.n,
         |        COALESCE(c.c, 0) AS c, COALESCE(corp.cc, 0) AS cc, ntot.nt
         |      FROM grid LEFT JOIN c ON c.source = grid.source AND c.bin = grid.bin
         |      LEFT JOIN corp ON corp.bin = grid.bin
         |      CROSS JOIN ntot)
         |SELECT source, n AS n_docs,
         |  round(CAST(sum(CAST(
         |    (((c + 0.5) / (n + 5.0)) - ((cc + 0.5) / (nt + 5.0))) *
         |    ln(((c + 0.5) / (n + 5.0)) / ((cc + 0.5) / (nt + 5.0)))
         |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS psi
         |FROM j GROUP BY source, n ORDER BY source""".stripMargin)(
      PipelineQueries.driftPsi),

    // Same rate CTE as q_mix_rebalance; the per-doc keep decision is the
    // 48-bit md5 hash under rate·2^48 — both sides exact doubles, so the
    // comparison is engine-portable.
    QueryDef("q_importance_sample",
      s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
         |z AS (SELECT CAST(sum(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(38,12)))
         |             AS DOUBLE) AS z FROM c),
         |r AS (SELECT lang,
         |        round(least(CAST(1.0 AS DOUBLE),
         |          sqrt(CAST(n_docs AS DOUBLE)) / z * ${PipelineQueries.MixBudget}
         |            / n_docs), 6) AS sample_rate
         |      FROM c CROSS JOIN z),
         |k AS (SELECT d.lang, r.sample_rate,
         |        CASE WHEN CAST(('0x' || substr(md5(d.lang || ':' ||
         |                 d.doc_id::VARCHAR), 1, 12))::BIGINT AS DOUBLE)
         |               < r.sample_rate * ${PipelineQueries.SampleHashSpace}
         |             THEN 1 ELSE 0 END AS keep
         |      FROM documents d JOIN r ON d.lang = r.lang)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(keep) AS BIGINT) AS n_kept,
         |  round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS realized_rate,
         |  max(sample_rate) AS target_rate
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin)(
      PipelineQueries.importanceSample),

    // Both engines order by the UNROUNDED priority (one exact-integer
    // double division — bit-identical), then doc_id; only the output
    // column is rounded.
    QueryDef("q_weighted_sample",
      s"""SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w,
         |  round((CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
         |      AS DOUBLE) + 0.5) / ${PipelineQueries.SampleHashSpace}
         |    / n_chars * 1000.0, 9) AS priority_ppk
         |FROM documents
         |ORDER BY (CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT
         |      AS DOUBLE) + 0.5) / ${PipelineQueries.SampleHashSpace}
         |    / n_chars, doc_id
         |LIMIT ${PipelineQueries.WeightedSampleK}""".stripMargin)(
      (s, d) => PipelineQueries.weightedSample(s, d)),

    // Multi-epoch expansion: integer epochs by // 1000, fractional epoch by
    // the same MD5 permille draw (doc_id || ':ep'), eval source excluded.
    QueryDef("q_epoch_plan", {
      val rate = PipelineQueries.EpochPermille
        .map { case (s, p) => s"WHEN source = '$s' THEN $p" }
        .mkString("CASE ", " ", s" ELSE ${PipelineQueries.EpochDefaultPermille} END")
      s"""WITH r AS (SELECT doc_id, source,
         |    len($words) AS n_tokens, ($rate) AS rate
         |  FROM documents WHERE source <> '${PipelineQueries.EvalSource}')
         |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(rate // 1000
         |    + CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':ep'), 1, 12))::BIGINT
         |             % 1000 < rate % 1000 THEN 1 ELSE 0 END AS BIGINT) AS repeats,
         |  CAST((rate // 1000
         |    + CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':ep'), 1, 12))::BIGINT
         |             % 1000 < rate % 1000 THEN 1 ELSE 0 END) * n_tokens AS BIGINT)
         |    AS planned_tokens
         |FROM r ORDER BY doc_id""".stripMargin
    })(PipelineQueries.epochPlan),

    // Per-source token-distribution JS divergence vs the corpus: the
    // source × vocab grid, 0·ln0 = 0 on the source side, per-term
    // DECIMAL(38,12) truncation before the sum (order-independent).
    QueryDef("q_js_divergence",
      s"""WITH tok AS (SELECT source, unnest($words) AS t FROM documents),
         |byst AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
         |stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM byst GROUP BY 1),
         |vocab AS (SELECT t, CAST(sum(c) AS BIGINT) AS cc FROM byst GROUP BY 1),
         |ntot AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM byst),
         |grid AS (SELECT s.source, s.n,
         |    COALESCE(b.c, 0)::DOUBLE / s.n AS p,
         |    v.cc::DOUBLE / ntot.nt AS q
         |  FROM stot s CROSS JOIN vocab v CROSS JOIN ntot
         |  LEFT JOIN byst b ON b.source = s.source AND b.t = v.t)
         |SELECT source, n AS n_tokens,
         |  round(CAST(sum(CAST(0.5 * (
         |    CASE WHEN p > 0 THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END
         |    + q * ln(2.0 * q / (p + q))) AS DECIMAL(38,12))) AS DOUBLE), 6)
         |    AS js_nats
         |FROM grid GROUP BY source, n ORDER BY source""".stripMargin)(
      PipelineQueries.jsDivergence),

    // Right-to-be-forgotten purge audit: requests = 1% hash bucket of the
    // id space; counts + the re-checked zero-survivor claim.
    QueryDef("q_forget_user",
      s"""WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT DISTINCT user_id FROM e
         |      WHERE ${hash48("user_id::VARCHAR")} % 100 = ${PipelineQueries.ForgetBucket}),
         |p AS (SELECT user_id FROM e
         |      WHERE user_id NOT IN (SELECT user_id FROM r))
         |SELECT (SELECT count(*) FROM r) AS n_requests,
         |  (SELECT count(*) FROM e) AS rows_before,
         |  (SELECT count(*) FROM e) - (SELECT count(*) FROM p) AS rows_deleted,
         |  (SELECT count(*) FROM p) AS rows_after,
         |  (SELECT count(*) FROM p JOIN r USING (user_id)) = 0
         |    AS purge_complete""".stripMargin)(
      PipelineQueries.forgetUser),

    QueryDef("q_k_anonymity",
      s"""SELECT lang, source,
         |  CAST(n_chars // ${PipelineQueries.KAnonLenBucket} AS BIGINT) AS len_bucket,
         |  count(*) AS n
         |FROM documents GROUP BY 1, 2, 3
         |HAVING count(*) < ${PipelineQueries.KAnonK}
         |ORDER BY lang, source, len_bucket""".stripMargin)(
      PipelineQueries.kAnonymity),

    // Quality spelling = CurationRegistry's scored CTEs (round-4dp stages,
    // the one quality formula both engines share); the budget trim is an
    // inclusive running-sum window in (quality DESC, doc_id) order.
    QueryDef("q_token_budget",
      s"""WITH s1 AS (
         |  SELECT doc_id, source,
         |    CAST(len($words) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_distinct($words)) AS DOUBLE) / len($words), 4) AS uniq_ratio,
         |    round(least(CAST(len($words) AS DOUBLE) / 100.0, 1.0), 4) AS len_score
         |  FROM documents),
         |s2 AS (SELECT *, round(len_score * 0.4 + uniq_ratio * 0.6, 4) AS quality
         |       FROM s1),
         |w AS (SELECT source, doc_id, n_tokens,
         |        sum(n_tokens) OVER (PARTITION BY source
         |          ORDER BY quality DESC, doc_id
         |          ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM s2)
         |SELECT source, count(*) AS n_docs,
         |  count(*) FILTER (WHERE cum <= ${PipelineQueries.TokenBudgetPerSource})
         |    AS n_kept,
         |  count(*) - count(*) FILTER (WHERE cum <= ${PipelineQueries.TokenBudgetPerSource})
         |    AS n_dropped,
         |  CAST(COALESCE(sum(n_tokens)
         |    FILTER (WHERE cum <= ${PipelineQueries.TokenBudgetPerSource}), 0) AS BIGINT)
         |    AS tokens_kept,
         |  round(CAST(COALESCE(sum(n_tokens)
         |    FILTER (WHERE cum <= ${PipelineQueries.TokenBudgetPerSource}), 0) AS DOUBLE)
         |    / ${PipelineQueries.TokenBudgetPerSource}, 4) AS budget_used
         |FROM w GROUP BY source ORDER BY source""".stripMargin)(
      (s, d) => PipelineQueries.tokenBudget(s, d)),

    // Split + lang ride one partial-agg shuffle; shares join back onto the
    // metadata grid.
    QueryDef("q_split_balance",
      s"""WITH d AS (
         |  SELECT lang,
         |    ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
         |      % 100 AS b
         |  FROM documents),
         |s AS (
         |  SELECT lang,
         |    CASE WHEN b < ${PipelineQueries.SplitTrainPct} THEN 'train'
         |         WHEN b < ${PipelineQueries.SplitValidPct} THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM d),
         |grid AS (SELECT split, lang, count(*) AS n_docs FROM s GROUP BY 1, 2),
         |st AS (SELECT split, CAST(SUM(n_docs) AS BIGINT) AS n_split
         |       FROM grid GROUP BY 1),
         |co AS (SELECT lang,
         |         CAST(SUM(n_docs) AS DOUBLE)
         |           / (SELECT SUM(n_docs) FROM grid) AS corpus_share
         |       FROM grid GROUP BY 1)
         |SELECT split, lang, n_docs,
         |  round(CAST(n_docs AS DOUBLE) / n_split, 6) AS split_share,
         |  round(corpus_share, 6) AS corpus_share,
         |  round(CAST(n_docs AS DOUBLE) / n_split - corpus_share, 6)
         |    AS share_delta
         |FROM grid JOIN st USING (split) JOIN co USING (lang)
         |ORDER BY split, lang""".stripMargin)(PipelineQueries.splitBalance),

    // One conditional partial-agg pass to the bin grid; the density ratio
    // runs on <= bins rows. Same parenthesization both engines.
    QueryDef("q_covariate_shift", {
      val sm = PipelineQueries.ShiftSmooth
      val bins = PipelineQueries.PsiBins
      val vmax = PipelineQueries.ShiftVMax
      s"""WITH e AS (
         |  SELECT ${graft.ops.Out.sql.epochSec("ts")} AS sec, value
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         |m AS (SELECT (MIN(sec) + MAX(sec)) // 2 AS mid FROM e),
         |b AS (
         |  SELECT LEAST(CAST(GREATEST(FLOOR(value / $vmax * $bins), 0.0)
         |      AS BIGINT), ${bins - 1}) AS bin,
         |    CASE WHEN sec < mid THEN 'early' ELSE 'late' END AS half
         |  FROM e CROSS JOIN m),
         |g AS (
         |  SELECT bin,
         |    CAST(SUM(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c_early,
         |    CAST(SUM(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c_late
         |  FROM b GROUP BY 1),
         |t AS (SELECT CAST(SUM(c_early) AS BIGINT) AS n_early,
         |        CAST(SUM(c_late) AS BIGINT) AS n_late FROM g)
         |SELECT bin, c_early, c_late,
         |  round(LEAST(
         |    ((c_late + $sm) / (n_late + $sm * $bins))
         |      / ((c_early + $sm) / (n_early + $sm * $bins)),
         |    ${PipelineQueries.ShiftMaxWeight}), 6) AS weight
         |FROM g CROSS JOIN t ORDER BY bin""".stripMargin
    })((s, d) => PipelineQueries.covariateShift(s, d)),

    // Features strictly before the midpoint, label strictly after — one
    // conditional-agg pass; integer day arithmetic, decimal value average.
    QueryDef("q_feature_matrix",
      s"""WITH e AS (
         |  SELECT user_id, ${graft.ops.Out.sql.epochSec("ts")} AS sec,
         |    event_type, value
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |m AS (SELECT (MIN(sec) + MAX(sec)) // 2 AS mid FROM e),
         |u AS (
         |  SELECT user_id, MAX(mid) AS mid,
         |    CAST(SUM(CASE WHEN sec < mid THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_events_pre,
         |    CAST(SUM(CASE WHEN sec < mid AND event_type = 'purchase'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_purch_pre,
         |    round(CAST(SUM(CAST(CASE WHEN sec < mid THEN value END
         |        AS DECIMAL(38,4))) AS DOUBLE)
         |      / COUNT(CASE WHEN sec < mid THEN value END), 6) AS avg_value_pre,
         |    count(DISTINCT CASE WHEN sec < mid THEN sec // 86400 END)
         |      AS days_active_pre,
         |    MAX(CASE WHEN sec < mid THEN sec // 86400 END) AS last_day_pre,
         |    CAST(MAX(CASE WHEN sec >= mid AND event_type = 'purchase'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS label
         |  FROM e CROSS JOIN m GROUP BY user_id)
         |SELECT user_id, n_events_pre, n_purch_pre, avg_value_pre,
         |  days_active_pre, mid // 86400 - last_day_pre AS recency_days, label
         |FROM u WHERE n_events_pre > 0
         |ORDER BY user_id""".stripMargin)(PipelineQueries.featureMatrix)
  )
}
