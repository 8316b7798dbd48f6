package graft.ops

import graft.QueryDef

/** DuckDB oracle SQL mirroring [[StatsQueries]].
  *
  * Numeric determinism: every double sum goes through DECIMAL(18,2) on both
  * sides (exact — the testdata's doubles are clean 2-dp values), and every
  * derived moment (corr, stddev, weighted avg) is one explicit double formula
  * evaluated from those exact sums with the identical expression tree, so the
  * engines agree bitwise. The two SQL-front-end queries use the *same text*
  * as both the Spark query and the oracle. */
object StatsRegistry {

  /** Exact decimal power sums per return flag, cast to double — the shared
    * CTE for the moment queries. */
  private val momentsCte =
    """s AS (SELECT l_returnflag,
      |  CAST(count(*) AS DOUBLE) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp
      |FROM lineitem GROUP BY l_returnflag)""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_percentiles",
      """SELECT l_returnflag, count(*) AS n,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)(StatsQueries.percentiles),

    QueryDef("q_histogram",
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
        |  count(*) AS n, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)(StatsQueries.histogram),

    QueryDef("q_corr_stats",
      s"""WITH $momentsCte
         |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
         |  CASE WHEN n > 1 AND (n * sqq - sq * sq) > 0 AND (n * spp - sp * sp) > 0
         |    THEN round((n * sqp - sq * sp) /
         |         (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 6)
         |  END AS corr_qp,
         |  CASE WHEN n > 1
         |    THEN round(sqrt(GREATEST(n * sqq - sq * sq, 0.0) / (n * (n - 1))), 6)
         |  END AS stddev_q
         |FROM s ORDER BY l_returnflag""".stripMargin)(StatsQueries.corrStats),

    QueryDef("q_pivot",
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS "F",
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS "O"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)(StatsQueries.pivot),

    QueryDef("q_weighted_avg",
      """SELECT l_returnflag, count(*) AS n,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |        / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS wavg_discount
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)(StatsQueries.weightedAvg),

    QueryDef("q_sample_hash",
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 12))::BIGINT % 20 = 0
        |ORDER BY o_orderkey""".stripMargin)(StatsQueries.sampleHash),

    QueryDef("q_range_join_binned",
      """SELECT a.user_id AS user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
        |GROUP BY 1 ORDER BY 1""".stripMargin)(StatsQueries.rangeJoinBinned),

    QueryDef("q_array_ops",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first5,
        |  CAST(list_contains(string_split(text, ' '), 'the') AS BIGINT) AS has_the,
        |  string_split(text, ' ')[-1] AS last_token
        |FROM documents ORDER BY doc_id""".stripMargin)(StatsQueries.arrayOps),

    QueryDef("q_scalar_subquery", StatsQueries.scalarSubquerySql)(StatsQueries.scalarSubquery),

    QueryDef("q_exists_in", StatsQueries.existsInSql)(StatsQueries.existsIn),

    // arg-extreme tie-break parity: max_by over (value, -event_id) ≡
    // ORDER BY value DESC, event_id; min_by over (value, event_id) ≡
    // ORDER BY value ASC, event_id — both pick the LOWEST event_id on ties.
    QueryDef("q_argmax",
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id) AS rmax,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value ASC, event_id) AS rmin
        |  FROM events)
        |SELECT a.event_type,
        |  a.value AS max_value, a.event_id AS max_event_id, a.t AS max_ts,
        |  b.value AS min_value, b.event_id AS min_event_id, b.t AS min_ts
        |FROM (SELECT * FROM r WHERE rmax = 1) a
        |JOIN (SELECT * FROM r WHERE rmin = 1) b USING (event_type)
        |ORDER BY a.event_type""".stripMargin)(StatsQueries.argExtremes),

    QueryDef("q_profile_events",
      s"""SELECT count(*) AS n,
         |  count(DISTINCT user_id) AS n_users,
         |  count(DISTINCT event_type) AS n_types,
         |  CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props,'$$.k') AS BIGINT)
         |                IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
         |  min(value) AS min_value,
         |  max(value) AS max_value,
         |  ${graft.ops.Out.sql.davg("value")} AS avg_value,
         |  min(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS min_ts,
         |  max(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS max_ts
         |FROM events""".stripMargin)(StatsQueries.profileEvents),

    QueryDef("q_stratified_sample",
      """WITH r AS (
        |  SELECT event_type, event_id, value,
        |    md5('smp:' || event_id::VARCHAR) AS skey,
        |    CAST(row_number() OVER (
        |      PARTITION BY event_type
        |      ORDER BY md5('smp:' || event_id::VARCHAR), event_id) AS BIGINT) AS rn
        |  FROM events)
        |SELECT event_type, rn, event_id, value FROM r
        |WHERE rn <= 50 ORDER BY event_type, rn""".stripMargin)(
      (s, d) => StatsQueries.stratifiedSample(s, d, n = 50)),

    QueryDef("q_lateral_topk",
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin)(
      StatsQueries.lateralTopk),

    QueryDef("q_mad_outliers",
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)),
        |stats AS (
        |  SELECT event_type, count(*) AS n, any_value(med) AS med,
        |    quantile_cont(adev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, any_value(s.n) AS n,
        |  round(any_value(s.med), 4) AS med, round(any_value(s.mad), 4) AS mad,
        |  count(*) FILTER (WHERE abs(d.value - s.med) > 3.0 * 1.4826 * s.mad)
        |    AS n_outliers
        |FROM dev d JOIN stats s USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin)(
      StatsQueries.madOutliers),

    QueryDef("q_dq_checks",
      """SELECT * FROM (
        |  SELECT 'orders_pk_dup' AS check_name,
        |    CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
        |      AS BIGINT) AS n_bad
        |  UNION ALL SELECT 'lineitem_fk_orphan',
        |    CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |      AS BIGINT)
        |  UNION ALL SELECT 'customer_negative_acctbal',
        |    CAST((SELECT count(*) FROM customer WHERE c_acctbal < 0) AS BIGINT)
        |  UNION ALL SELECT 'documents_nchars_drift',
        |    CAST((SELECT count(*) FROM documents WHERE n_chars != length(text))
        |      AS BIGINT)
        |  UNION ALL SELECT 'events_value_out_of_range',
        |    CAST((SELECT count(*) FROM events WHERE value < 0 OR value IS NULL)
        |      AS BIGINT)
        |) ORDER BY check_name""".stripMargin)(StatsQueries.dqChecks),

    QueryDef("q_zorder_layout", {
      // Morton interleave spelled as plain arithmetic (DuckDB has no
      // bit-interleave builtin): bit b of cx lands at 2b, of cy at 2b+1.
      val xTerms = (0 until 16).map(b => s"(((cx >> $b) & 1) << ${2 * b})")
      val yTerms = (0 until 16).map(b => s"(((cy >> $b) & 1) << ${2 * b + 1})")
      s"""WITH cells AS (
         |  SELECT LEAST(GREATEST(
         |      CAST(FLOOR(l_extendedprice * 65535.0 / 110000.0) AS BIGINT),
         |      0), 65535) AS cx,
         |    LEAST(GREATEST(((CAST(FLOOR(EPOCH(l_shipdate)) AS BIGINT) // 86400)
         |      - 9131) * 26, 0), 65535) AS cy
         |  FROM lineitem),
         |z AS (SELECT cx, cy,
         |  ${(xTerms ++ yTerms).mkString(" + ")} AS zval FROM cells)
         |SELECT (zval >> 20) AS bucket, count(*) AS n,
         |  min(cx) AS x_lo, max(cx) AS x_hi,
         |  min(cy) AS y_lo, max(cy) AS y_hi
         |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
    })((s, d) => StatsQueries.zorderLayout(s, d)),

    // SUM over the per-key counts widens to HUGEINT in DuckDB — CAST back
    // to BIGINT (type-sensitive hash compare); max-count ties resolve to
    // MIN(key) on both sides.
    QueryDef("q_key_skew_audit",
      """WITH keyed AS (
        |  SELECT 'l_partkey' AS key_col, l_partkey AS key FROM lineitem
        |    WHERE l_partkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'l_suppkey', l_suppkey FROM lineitem WHERE l_suppkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'o_custkey', o_custkey FROM orders WHERE o_custkey IS NOT NULL),
        |counts AS (SELECT key_col, key, COUNT(*) AS n FROM keyed GROUP BY 1, 2),
        |stats AS (
        |  SELECT key_col, COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS total,
        |    MAX(n) AS max_n
        |  FROM counts GROUP BY 1),
        |top AS (
        |  SELECT c.key_col, MIN(c.key) AS top_key
        |  FROM counts c JOIN stats s ON c.key_col = s.key_col AND c.n = s.max_n
        |  GROUP BY 1)
        |SELECT s.key_col, n_keys, total, max_n, top_key,
        |  ROUND(CAST(max_n AS DOUBLE) /
        |    (CAST(total AS DOUBLE) / CAST(n_keys AS DOUBLE)), 6) AS skew_ratio
        |FROM stats s JOIN top t ON s.key_col = t.key_col
        |ORDER BY s.key_col""".stripMargin)(
      (s, d) => StatsQueries.keySkewAudit(s, d)),

    // Moment sums decimal-exact, division in double at the end, expression
    // trees parenthesized identically to the Spark side (slope recomputed
    // unrounded inside intercept). Degenerate groups answer NULL on both
    // engines (n ≤ 1 or zero x-variance; R² additionally needs y-variance).
    QueryDef("q_trend_ols",
      s"""WITH src AS (SELECT event_type,
         |  CAST(CAST(FLOOR(EPOCH(ts)) AS BIGINT) - ${StatsQueries.OlsEpochBase}
         |       AS DECIMAL(19,4)) AS x,
         |  CAST(value AS DECIMAL(19,4)) AS y
         |FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         |m AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |  CAST(sum(x * x) AS DOUBLE) AS sxx,
         |  CAST(sum(y * y) AS DOUBLE) AS syy,
         |  CAST(sum(x * y) AS DOUBLE) AS sxy
         |FROM src GROUP BY 1)
         |SELECT event_type, CAST(n AS BIGINT) AS n,
         |  CASE WHEN n > 1 AND (n * sxx - sx * sx) > 0
         |    THEN round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         |  END AS slope,
         |  CASE WHEN n > 1 AND (n * sxx - sx * sx) > 0
         |    THEN round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
         |               / n, 6)
         |  END AS intercept,
         |  CASE WHEN n > 1 AND (n * sxx - sx * sx) > 0
         |       AND (n * syy - sy * sy) > 0
         |    THEN round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
         |         ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         |  END AS r2
         |FROM m ORDER BY event_type""".stripMargin)(
      (s, d) => StatsQueries.trendOls(s, d)),

    // First digit extracted in INTEGER space (cents → string head) — no
    // log10-of-double near a power of 10; expectations are Scala-computed
    // literals shared by both engines. CAST around the CASE: a bare
    // decimal literal would type the column DECIMAL in DuckDB vs Spark's
    // DOUBLE.
    QueryDef("q_benford", {
      val cases = StatsQueries.BenfordExpected
        .map { case (d, e) => s"WHEN $d THEN $e" }.mkString(" ")
      s"""WITH g AS (
         |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0)
         |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |    count(*) AS n
         |  FROM orders WHERE o_totalprice > 0 GROUP BY 1)
         |SELECT digit, n,
         |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6)
         |    AS obs_pct,
         |  CAST(CASE digit $cases END AS DOUBLE) AS exp_pct
         |FROM g ORDER BY digit""".stripMargin
    })(StatsQueries.benfordDigits),

    // −Σ p·ln p through the driftPsi decimal-sum contract; one ln 2
    // division at the end. sum(c) OVER () is HUGEINT in DuckDB — cast
    // before every compared use.
    QueryDef("q_entropy", {
      def one(label: String, table: String, c: String) =
        s"""SELECT '$label' AS col_name,
           |  CAST(max(n) AS BIGINT) AS n_rows, count(*) AS n_distinct,
           |  round(CAST(-sum(CAST((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           |      AS DECIMAL(38,12))) AS DOUBLE) / ln(2.0), 6)
           |    AS entropy_bits
           |FROM (SELECT c, sum(c) OVER () AS n FROM
           |  (SELECT count(*) AS c FROM $table
           |   WHERE $c IS NOT NULL GROUP BY $c))""".stripMargin
      StatsQueries.EntropyColumns
        .map { case (label, table, c) => one(label, table, c) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    })(StatsQueries.columnEntropy),

    // Clamp bounds compared UNROUNDED (quantile-interpolation parity: a
    // tie is only possible when the quantile IS a data point, where the
    // clamp is the identity); means ride the exact-decimal davg contract.
    QueryDef("q_winsorize",
      s"""WITH ev AS (SELECT event_type, value FROM events
         |  WHERE value IS NOT NULL),
         |b AS (SELECT event_type,
         |        quantile_cont(value, ${StatsQueries.WinsorLo}) AS p05,
         |        quantile_cont(value, ${StatsQueries.WinsorHi}) AS p95
         |      FROM ev GROUP BY 1)
         |SELECT event_type, count(*) AS n,
         |  round(max(p05), 4) AS p05, round(max(p95), 4) AS p95,
         |  round(${Out.sql.davg("value")}, 6) AS raw_mean,
         |  round(${Out.sql.davg("LEAST(GREATEST(value, p05), p95)")}, 6)
         |    AS wins_mean,
         |  CAST(sum(CASE WHEN value < p05 OR value > p95
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
         |FROM ev JOIN b USING (event_type)
         |GROUP BY 1 ORDER BY event_type""".stripMargin)(
      StatsQueries.winsorizedStats),

    // The gap is evaluated over the sources × value-domain grid (the
    // supremum can land between a source's own jumps); every ECDF term is
    // an exact-integer double ratio, so the max-equality join is sound.
    QueryDef("q_ks_drift",
      """WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS v
        |           FROM documents),
        |sv AS (SELECT source, v, count(*) AS n FROM d GROUP BY 1, 2),
        |src AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_src
        |        FROM sv GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d),
        |pv AS (SELECT v, sum(sum(n)) OVER (ORDER BY v
        |         ROWS UNBOUNDED PRECEDING) AS cum_tot
        |       FROM sv GROUP BY v),
        |grid AS (
        |  SELECT s.source, p.v, s.n_src, p.cum_tot,
        |    sum(COALESCE(sv.n, 0)) OVER (PARTITION BY s.source ORDER BY p.v
        |      ROWS UNBOUNDED PRECEDING) AS cum_src
        |  FROM src s CROSS JOIN pv p
        |  LEFT JOIN sv ON sv.source = s.source AND sv.v = p.v),
        |g AS (SELECT source, v, n_src, n_total,
        |        abs(CAST(cum_src AS DOUBLE) / n_src -
        |            CAST(cum_tot - cum_src AS DOUBLE) / (n_total - n_src))
        |          AS gap
        |      FROM grid CROSS JOIN tot),
        |stats AS (SELECT source, max(gap) AS ks_raw,
        |            CAST(max(n_src) AS BIGINT) AS n_src,
        |            CAST(max(n_total - n_src) AS BIGINT) AS n_rest
        |          FROM g GROUP BY 1),
        |at AS (SELECT g.source, min(v) AS d_at
        |       FROM g JOIN stats USING (source)
        |       WHERE gap = ks_raw GROUP BY 1)
        |SELECT source, n_src, n_rest, round(ks_raw, 6) AS ks_d, d_at
        |FROM stats JOIN at USING (source)
        |ORDER BY source""".stripMargin)(StatsQueries.ksDrift),

    // Bin assignment compares UNROUNDED interpolated quartiles (the
    // q_winsorize quantile-parity argument); only displayed edges round.
    QueryDef("q_histogram_equidepth",
      """WITH ev AS (SELECT event_type, value FROM events
        |  WHERE value IS NOT NULL),
        |e AS (SELECT event_type,
        |        quantile_cont(value, 0.25) AS q1,
        |        quantile_cont(value, 0.50) AS q2,
        |        quantile_cont(value, 0.75) AS q3
        |      FROM ev GROUP BY 1)
        |SELECT event_type,
        |  CAST(CASE WHEN value <= q1 THEN 0 WHEN value <= q2 THEN 1
        |       WHEN value <= q3 THEN 2 ELSE 3 END AS BIGINT) AS bin,
        |  count(*) AS n,
        |  round(min(value), 4) AS lo, round(max(value), 4) AS hi
        |FROM ev JOIN e USING (event_type)
        |GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin)(
      StatsQueries.histogramEquidepth),

    // lang × source chi-square over the full marginal cross-grid (zero
    // cells contribute E); per-term DECIMAL(38,12) truncation, one row.
    QueryDef("q_chisq_independence",
      """WITH cells AS (SELECT lang, source, count(*) AS o
        |               FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rl FROM cells GROUP BY 1),
        |c AS (SELECT source, CAST(sum(o) AS BIGINT) AS cs FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |g AS (SELECT t.n,
        |        COALESCE(cells.o, 0)::DOUBLE AS o,
        |        r.rl::DOUBLE * c.cs::DOUBLE / t.n::DOUBLE AS e
        |      FROM r CROSS JOIN c CROSS JOIN t
        |      LEFT JOIN cells ON cells.lang = r.lang AND cells.source = c.source)
        |SELECT n AS n_docs, count(*) AS n_cells,
        |  round(CAST(sum(CAST((o - e) * (o - e) / e AS DECIMAL(38,12)))
        |    AS DOUBLE), 6) AS chi2
        |FROM g GROUP BY n ORDER BY n_docs""".stripMargin)(
      StatsQueries.chisqIndependence),

    // Mode per group: arg_max over the (count, -value) ordering — smallest
    // value wins frequency ties in both engines.
    QueryDef("q_mode_per_group",
      """WITH census AS (
        |  SELECT event_type, round(value, 0) AS v, count(*) AS n
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, v, n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY n DESC, v)
        |      AS rn,
        |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_total
        |  FROM census)
        |SELECT event_type, v AS mode_value, n AS mode_n, n_total,
        |  round(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS share
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin)(
      StatsQueries.modePerGroup),

    // Weighted percentiles: all-decimal crossing predicates (2·cumw ≥ tot,
    // 10·cumw ≥ 9·tot) — no floating threshold; sweep order pinned by the
    // unique (price, orderkey, linenumber).
    QueryDef("q_weighted_percentiles",
      """WITH r AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS p,
        |    l_orderkey, l_linenumber,
        |    CAST(l_quantity AS DECIMAL(38,4)) AS w
        |  FROM lineitem),
        |t AS (SELECT flag, SUM(w) AS tot, count(*) AS n FROM r GROUP BY 1),
        |c AS (
        |  SELECT flag, p,
        |    SUM(w) OVER (PARTITION BY flag
        |      ORDER BY p, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
        |  FROM r)
        |SELECT c.flag, MIN(t.n) AS n,
        |  round(CAST(MIN(t.tot) AS DOUBLE), 4) AS w_total,
        |  MIN(CASE WHEN cumw * 2 >= tot THEN p END) AS wp50,
        |  MIN(CASE WHEN cumw * 10 >= tot * 9 THEN p END) AS wp90
        |FROM c JOIN t USING (flag)
        |GROUP BY c.flag ORDER BY c.flag""".stripMargin)(
      StatsQueries.weightedPercentiles),

    // Deterministic multiplier bootstrap: hash-derived w ∈ {0,1,2} per
    // (resample, row), decimal-exact weighted sums, one double division per
    // resample mean, percentile ≡ quantile_cont over the B means.
    QueryDef("q_bootstrap_ci", {
      val b = StatsQueries.BootstrapB
      s"""WITH e AS (
         |  SELECT event_type, event_id, CAST(value AS DECIMAL(38,4)) AS v
         |  FROM events
         |  WHERE event_type IS NOT NULL AND value IS NOT NULL
         |    AND event_id IS NOT NULL),
         |x AS (
         |  SELECT event_type, event_id, v,
         |    unnest(generate_series(0, ${b - 1})) AS b
         |  FROM e),
         |wx AS (
         |  SELECT event_type, b, v,
         |    ('0x' || substr(md5(b::VARCHAR || ':' || event_id::VARCHAR), 1, 12))::BIGINT % 3 AS w
         |  FROM x),
         |mb AS (
         |  SELECT event_type, b,
         |    CAST(SUM(CAST(w AS DECIMAL(38,4)) * v) AS DOUBLE)
         |      / CAST(SUM(w) AS DOUBLE) AS mb
         |  FROM wx GROUP BY 1, 2 HAVING SUM(w) > 0),
         |ci AS (
         |  SELECT event_type, count(*) AS n_resamples,
         |    round(quantile_cont(mb, 0.025), 6) AS ci_lo,
         |    round(quantile_cont(mb, 0.975), 6) AS ci_hi
         |  FROM mb GROUP BY 1),
         |pt AS (
         |  SELECT event_type, count(*) AS n,
         |    round(${Out.sql.davg("value")}, 6) AS mean
         |  FROM events
         |  WHERE event_type IS NOT NULL AND value IS NOT NULL
         |    AND event_id IS NOT NULL
         |  GROUP BY 1)
         |SELECT event_type, n, mean, n_resamples, ci_lo, ci_hi
         |FROM ci JOIN pt USING (event_type)
         |ORDER BY event_type""".stripMargin
    })(StatsQueries.bootstrapCi),

    // Zone-map skip audit: integer-day + stored-double min/max zones per
    // ship-week, three-way fate under the conjunctive predicate. Constants
    // interpolate from StatsQueries so the two engines can't drift.
    QueryDef("q_dataskip_audit", {
      val dLo = StatsQueries.SkipDayLo; val dHi = StatsQueries.SkipDayHi
      val pLo = StatsQueries.SkipPriceLo; val pHi = StatsQueries.SkipPriceHi
      s"""WITH rows_ AS (
         |  SELECT (${Out.sql.epochSec("l_shipdate")} // 86400) AS day,
         |    l_extendedprice AS price
         |  FROM lineitem),
         |z AS (
         |  SELECT day // 7 AS wk, count(*) AS n_rows,
         |    min(day) AS day_lo, max(day) AS day_hi,
         |    min(price) AS price_lo, max(price) AS price_hi,
         |    CAST(sum(CASE WHEN day >= $dLo AND day < $dHi
         |      AND price >= $pLo AND price < $pHi THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_match
         |  FROM rows_ GROUP BY 1)
         |SELECT wk, n_rows, day_lo, day_hi, price_lo, price_hi,
         |  CASE WHEN day_hi < $dLo OR day_lo >= $dHi
         |         OR price_hi < $pLo OR price_lo >= $pHi THEN 'pruned'
         |       WHEN day_lo >= $dLo AND day_hi < $dHi
         |         AND price_lo >= $pLo AND price_hi < $pHi THEN 'full'
         |       ELSE 'partial' END AS cls,
         |  n_match
         |FROM z ORDER BY wk""".stripMargin
    })(StatsQueries.dataskipAudit),

    // Midpoint from a 1-row span aggregate; both halves profiled in one
    // conditional-agg pass. Integer-div parity: Spark's (min+max)/2 cast
    // long truncates; BIGINT // 2 floors — positive epochs agree.
    QueryDef("q_profile_drift",
      s"""WITH e AS (
         |  SELECT ${Out.sql.epochSec("ts")} AS sec, value, event_type, user_id
         |  FROM events WHERE ts IS NOT NULL),
         |m AS (SELECT (MIN(sec) + MAX(sec)) // 2 AS mid FROM e)
         |SELECT CASE WHEN sec < mid THEN 'h1_early' ELSE 'h2_late' END AS half,
         |  count(*) AS n_rows,
         |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null_value,
         |  round(${Out.sql.davg("value")}, 6) AS avg_value,
         |  count(DISTINCT event_type) AS n_types,
         |  count(DISTINCT user_id) AS n_users
         |FROM e CROSS JOIN m GROUP BY 1 ORDER BY half""".stripMargin)(
      StatsQueries.profileDrift),

    // Sample membership = the q_sample_hash predicate as a conditional-agg
    // flag; shares off the same grid + a 1-row totals broadcast.
    QueryDef("q_sample_bias",
      """WITH g AS (
        |  SELECT o_orderstatus, count(*) AS n_full,
        |    CAST(SUM(CASE WHEN ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
        |      1, 12))::BIGINT % 20 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sample
        |  FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_full) AS BIGINT) AS t_full,
        |        CAST(SUM(n_sample) AS BIGINT) AS t_sample FROM g)
        |SELECT o_orderstatus, n_full, n_sample,
        |  round(CAST(n_full AS DOUBLE) / t_full, 6) AS full_share,
        |  round(CAST(n_sample AS DOUBLE) / t_sample, 6) AS sample_share,
        |  round(CAST(n_sample AS DOUBLE) / t_sample
        |    - CAST(n_full AS DOUBLE) / t_full, 6) AS share_delta
        |FROM g CROSS JOIN t ORDER BY o_orderstatus""".stripMargin)(
      StatsQueries.sampleBias)
  )
}
