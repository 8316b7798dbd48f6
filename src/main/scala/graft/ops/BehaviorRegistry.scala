package graft.ops

import graft.QueryDef

/** Oracle SQL (DuckDB dialect) for [[BehaviorQueries]]. Time constants
  * interpolate the Scala values so the bucket arithmetic cannot drift;
  * running-sum/NTILE intermediates are CAST to BIGINT wherever DuckDB
  * would widen to HUGEINT (the driver's hash compare is type-sensitive). */
object BehaviorRegistry {

  private val Wk = BehaviorQueries.WeekSec
  private val Day = BehaviorQueries.DaySec
  private val Dur = BehaviorQueries.ConcurrencyDurSec
  private val Bands = BehaviorQueries.RfmBands

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_retention_cohorts",
      s"""WITH ev AS (
         |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // $Wk AS wk
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |first AS (SELECT user_id, MIN(wk) AS cwk FROM ev GROUP BY 1)
         |SELECT CAST(f.cwk * $Wk AS BIGINT) AS cohort_week,
         |  CAST(e.wk - f.cwk AS BIGINT) AS week_offset,
         |  COUNT(DISTINCT e.user_id) AS active_users
         |FROM ev e JOIN first f USING (user_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)(
      BehaviorQueries.retentionCohorts),

    QueryDef("q_markov_transitions",
      """WITH pairs AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |cells AS (
        |  SELECT from_type, to_type, COUNT(*) AS n FROM pairs
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  ROUND(CAST(n AS DOUBLE) /
        |    CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM cells ORDER BY from_type, to_type""".stripMargin)(
      BehaviorQueries.markovTransitions),

    QueryDef("q_concurrency_peak",
      s"""WITH iv AS (
         |  SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS s,
         |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) + $Dur AS e,
         |    (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // $Day) * $Day + $Day AS b
         |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
         |segs AS (
         |  SELECT event_type, s AS t0, LEAST(e, b) AS t1 FROM iv
         |  UNION ALL
         |  SELECT event_type, b, e FROM iv WHERE e > b),
         |pts AS (
         |  SELECT event_type, t0 AS t, 1 AS d FROM segs
         |  UNION ALL
         |  SELECT event_type, t1, -1 FROM segs),
         |net AS (
         |  SELECT event_type, t // $Day AS day, t, CAST(SUM(d) AS BIGINT) AS net
         |  FROM pts GROUP BY 1, 2, 3),
         |run AS (
         |  SELECT event_type, day, t,
         |    CAST(SUM(net) OVER (PARTITION BY event_type, day ORDER BY t
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open
         |  FROM net),
         |pk AS (
         |  SELECT event_type, day, t, open,
         |    MAX(open) OVER (PARTITION BY event_type, day) AS peak
         |  FROM run)
         |SELECT event_type, CAST(day * $Day AS BIGINT) AS day,
         |  CAST(MAX(peak) AS BIGINT) AS peak, MIN(t) AS peak_t
         |FROM pk WHERE open = peak
         |GROUP BY event_type, pk.day ORDER BY event_type, day""".stripMargin)(
      BehaviorQueries.concurrencyPeak),

    QueryDef("q_rfm_segments",
      s"""WITH o AS (
         |  SELECT o_custkey AS c, CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS d,
         |    CAST(o_totalprice AS DECIMAL(38,4)) AS v
         |  FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |ref AS (SELECT MAX(d) AS ref FROM o),
         |cust AS (
         |  SELECT c, (ref.ref - MAX(d)) // $Day AS rec_days,
         |    COUNT(*) AS freq, SUM(v) AS mon
         |  FROM o, ref GROUP BY c, ref.ref),
         |banded AS (
         |  SELECT c, rec_days, freq, mon,
         |    CAST(NTILE($Bands) OVER (ORDER BY rec_days, c) AS BIGINT) AS r_q,
         |    CAST(NTILE($Bands) OVER (ORDER BY freq, c) AS BIGINT) AS f_q,
         |    CAST(NTILE($Bands) OVER (ORDER BY mon, c) AS BIGINT) AS m_q
         |  FROM cust)
         |SELECT CONCAT_WS('-', r_q, f_q, m_q) AS segment,
         |  COUNT(*) AS n_customers,
         |  ROUND(CAST(SUM(rec_days) AS DOUBLE) / COUNT(*), 6) AS avg_rec_days,
         |  ROUND(CAST(SUM(freq) AS DOUBLE) / COUNT(*), 6) AS avg_freq,
         |  ROUND(CAST(SUM(mon) AS DOUBLE) / COUNT(*), 4) AS avg_monetary
         |FROM banded GROUP BY 1 ORDER BY 1""".stripMargin)(
      BehaviorQueries.rfmSegments),

    // The lookback predicate lives ON the left join (a WHERE would drop
    // purchases whose user clicked only outside the window instead of
    // counting them organic — Q13's join-predicate-placement rule).
    QueryDef("q_attribution",
      s"""WITH ev AS (SELECT event_id, user_id, event_type,
         |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |    AND event_id IS NOT NULL),
         |p AS (SELECT event_id AS pid, user_id, t AS tp FROM ev
         |      WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, t AS tc FROM ev WHERE event_type = 'click'),
         |a AS (SELECT pid, tp, max(tc) AS last_click
         |      FROM p LEFT JOIN c ON p.user_id = c.user_id
         |        AND c.tc <= p.tp
         |        AND c.tc > p.tp - ${BehaviorQueries.AttribWindowSec}
         |      GROUP BY 1, 2)
         |SELECT tp - (tp % 86400) AS day_sec,
         |  count(*) AS n_purchases,
         |  CAST(sum(CASE WHEN last_click IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_attributed,
         |  CAST(sum(CASE WHEN last_click IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_organic,
         |  round(${Out.sql.davg("CASE WHEN last_click IS NOT NULL THEN tp - last_click END")}, 6)
         |    AS avg_lag_sec
         |FROM a GROUP BY 1 ORDER BY day_sec""".stripMargin)(
      BehaviorQueries.attributionLastTouch),

    // Gini from the exact rank formula — all-integer moments, one final
    // double ratio; top-decile membership = top_rn*10 <= n (integer).
    QueryDef("q_engagement_gini",
      s"""WITH u AS (
         |  SELECT event_type, user_id, count(*) AS x FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT event_type, x,
         |    CAST(row_number() OVER (PARTITION BY event_type
         |      ORDER BY x, user_id) AS BIGINT) AS i,
         |    CAST(row_number() OVER (PARTITION BY event_type
         |      ORDER BY x DESC, user_id) AS BIGINT) AS top_rn,
         |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_tot
         |  FROM u)
         |SELECT event_type, count(*) AS n_users,
         |  CAST(SUM(x) AS BIGINT) AS n_events,
         |  round((2.0 * CAST(SUM(i * x) AS DOUBLE)
         |      - CAST(count(*) + 1 AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
         |    / (CAST(count(*) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)), 6)
         |    AS gini,
         |  round(CAST(SUM(CASE WHEN top_rn * 10 <= n_tot THEN x ELSE 0 END)
         |    AS DOUBLE) / CAST(SUM(x) AS DOUBLE), 6) AS top_decile_share
         |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin)(
      BehaviorQueries.engagementGini),

    // LTV triangle: decimal sums through the cumulative window; cohort
    // assignment from ALL events, value from purchases only.
    QueryDef("q_cohort_ltv", {
      val wk = BehaviorQueries.WeekSec
      s"""WITH ev AS (
         |  SELECT user_id, event_type, value,
         |    (${Out.sql.epochSec("ts")} // $wk) AS wk
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |f AS (SELECT user_id, min(wk) AS cwk FROM ev GROUP BY 1),
         |cells AS (
         |  SELECT f.cwk, ev.wk - f.cwk AS week_offset,
         |    count(*) AS n_purchases,
         |    SUM(CAST(value AS DECIMAL(38,4))) AS revdec
         |  FROM ev JOIN f USING (user_id)
         |  WHERE event_type = 'purchase' AND value IS NOT NULL
         |  GROUP BY 1, 2)
         |SELECT cwk * $wk AS cohort_week, week_offset, n_purchases,
         |  round(CAST(revdec AS DOUBLE), 4) AS wk_value,
         |  round(CAST(SUM(revdec) OVER (PARTITION BY cwk ORDER BY week_offset
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
         |    AS cum_value
         |FROM cells ORDER BY cohort_week, week_offset""".stripMargin
    })(BehaviorQueries.cohortLtv),

    // Churn risk: quartiles on the (n_events, user_id) total order; the
    // frontier is a 1-row broadcast "now".
    QueryDef("q_churn_risk", {
      val h = BehaviorQueries.ChurnHorizonSec
      s"""WITH u AS (
         |  SELECT user_id, count(*) AS n_events,
         |    max(${Out.sql.epochSec("ts")}) AS last_sec
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |  GROUP BY 1),
         |g AS (SELECT max(last_sec) AS gmax FROM u),
         |q AS (
         |  SELECT u.*, g.gmax,
         |    CAST(NTILE(4) OVER (ORDER BY n_events, user_id) AS BIGINT)
         |      AS activity_q,
         |    CASE WHEN g.gmax - last_sec > $h THEN 1 ELSE 0 END AS churned
         |  FROM u CROSS JOIN g)
         |SELECT activity_q, count(*) AS n_users,
         |  CAST(SUM(churned) AS BIGINT) AS n_churned,
         |  round(CAST(SUM(churned) AS DOUBLE) / count(*), 6) AS churn_rate,
         |  round(${Out.sql.davg("n_events")}, 6) AS avg_events
         |FROM q GROUP BY 1 ORDER BY activity_q""".stripMargin
    })(BehaviorQueries.churnRisk),

    // Lifespan: integer span arithmetic; inclusive day count needs no
    // zero guard.
    QueryDef("q_user_lifespan", {
      val d = BehaviorQueries.DaySec
      s"""WITH e AS (
         |  SELECT user_id, ${Out.sql.epochSec("ts")} AS sec FROM events
         |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |a AS (
         |  SELECT user_id, min(sec) AS first_sec, max(sec) AS last_sec,
         |    count(*) AS n_events
         |  FROM e GROUP BY 1)
         |SELECT user_id, first_sec, last_sec,
         |  (last_sec - first_sec) // $d + 1 AS days_inclusive,
         |  n_events,
         |  round(CAST(n_events AS DOUBLE)
         |    / ((last_sec - first_sec) // $d + 1), 6) AS events_per_day
         |FROM a ORDER BY user_id""".stripMargin
    })(BehaviorQueries.userLifespan),

    // Daily DAU + trailing mean over PRESENT days (rows frame, the
    // dashboard convention); the window runs over the metadata-scale daily
    // grain.
    QueryDef("q_rolling_dau", {
      val d = BehaviorQueries.DaySec
      val wdays = BehaviorQueries.DauWindowDays
      s"""WITH du AS (
         |  SELECT DISTINCT (${Out.sql.epochSec("ts")} // $d) AS day, user_id
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |daily AS (SELECT day, count(*) AS dau FROM du GROUP BY 1)
         |SELECT day * $d AS day, dau,
         |  count(*) OVER tw AS n_days,
         |  round(CAST(SUM(dau) OVER tw AS DOUBLE) / count(*) OVER tw, 6)
         |    AS dau_7d_avg
         |FROM daily
         |WINDOW tw AS (ORDER BY day
         |  ROWS BETWEEN ${wdays - 1} PRECEDING AND CURRENT ROW)
         |ORDER BY day""".stripMargin
    })(BehaviorQueries.rollingDau),

    // Interval-union coverage: the same day-boundary split + netted sweep as
    // the Spark side, all in BIGINT seconds — the lone double is the final
    // busy-fraction division.
    QueryDef("q_interval_coverage",
      s"""WITH ev AS (
         |  SELECT user_id, ${Out.sql.epochSec("ts")} AS s,
         |    ${Out.sql.epochSec("ts")} + ${BehaviorQueries.ConcurrencyDurSec} AS e,
         |    (${Out.sql.epochSec("ts")} // ${BehaviorQueries.DaySec})
         |      * ${BehaviorQueries.DaySec} + ${BehaviorQueries.DaySec} AS b
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |segs AS (
         |  SELECT user_id, s AS t0, LEAST(e, b) AS t1 FROM ev
         |  UNION ALL
         |  SELECT user_id, b, e FROM ev WHERE e > b),
         |pts AS (
         |  SELECT user_id, t0 // ${BehaviorQueries.DaySec} AS day,
         |    t0 AS t, CAST(1 AS BIGINT) AS d FROM segs
         |  UNION ALL
         |  SELECT user_id, t0 // ${BehaviorQueries.DaySec} AS day,
         |    t1 AS t, CAST(-1 AS BIGINT) AS d FROM segs),
         |net AS (
         |  SELECT user_id, day, t, SUM(d) AS net FROM pts GROUP BY 1, 2, 3),
         |sw AS (
         |  SELECT user_id, day,
         |    SUM(net) OVER (PARTITION BY user_id, day ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open,
         |    LEAD(t) OVER (PARTITION BY user_id, day ORDER BY t) - t AS gap
         |  FROM net),
         |cov AS (
         |  SELECT user_id, day, CAST(SUM(gap) AS BIGINT) AS covered_sec
         |  FROM sw
         |  WHERE open > 0 AND gap IS NOT NULL GROUP BY 1, 2),
         |st AS (
         |  SELECT user_id, s // ${BehaviorQueries.DaySec} AS day,
         |    COUNT(*) AS n_starts
         |  FROM ev GROUP BY 1, 2)
         |SELECT user_id, day * ${BehaviorQueries.DaySec} AS day,
         |  COALESCE(n_starts, 0) AS n_starts,
         |  covered_sec,
         |  ROUND(CAST(covered_sec AS DOUBLE) / ${BehaviorQueries.DaySec}, 6)
         |    AS busy_frac
         |FROM cov LEFT JOIN st USING (user_id, day)
         |ORDER BY user_id, day""".stripMargin)(
      BehaviorQueries.intervalCoverage),

    // One distinct shuffle total (first-seen min per user), never a per-day
    // expanding COUNT(DISTINCT); the running sum rides the day-grain rollup.
    QueryDef("q_running_distinct",
      s"""WITH fs AS (
         |  SELECT user_id,
         |    MIN(${Out.sql.epochSec("ts")} // ${BehaviorQueries.DaySec})
         |      AS first_day
         |  FROM events
         |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |  GROUP BY 1),
         |d AS (
         |  SELECT first_day AS day, count(*) AS new_users FROM fs GROUP BY 1)
         |SELECT day * ${BehaviorQueries.DaySec} AS day, new_users,
         |  CAST(SUM(new_users) OVER (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_users
         |FROM d ORDER BY day""".stripMargin)(
      BehaviorQueries.runningDistinct),

    // MD5-parity arms; conversion folded at the user grain in one pass;
    // z is one shared double tree over exact integer counts. Single row:
    // no ORDER BY needed.
    QueryDef("q_ab_lift",
      s"""WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= ${BehaviorQueries.AbConvThreshold} THEN 1 ELSE 0 END AS conv,
        |    ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
        |      % 2 AS arm
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |arms AS (
        |  SELECT arm, count(*) AS n_users, CAST(SUM(conv) AS BIGINT) AS n_conv,
        |    round(CAST(SUM(conv) AS DOUBLE) / count(*), 6) AS rate
        |  FROM u GROUP BY arm),
        |ab AS (
        |  SELECT a.n_users AS n_a, a.n_conv AS conv_a, a.rate AS rate_a,
        |         b.n_users AS n_b, b.n_conv AS conv_b, b.rate AS rate_b,
        |    CAST(a.n_conv + b.n_conv AS DOUBLE) / (a.n_users + b.n_users) AS p_pool
        |  FROM (SELECT * FROM arms WHERE arm = 0) a
        |  CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b)
        |SELECT n_a, conv_a, rate_a, n_b, conv_b, rate_b,
        |  CASE WHEN sqrt(p_pool * (1.0 - p_pool)
        |           * (CAST(1.0 AS DOUBLE) / n_a + CAST(1.0 AS DOUBLE) / n_b)) > 0.0
        |    THEN round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
        |      / sqrt(p_pool * (1.0 - p_pool)
        |             * (CAST(1.0 AS DOUBLE) / n_a + CAST(1.0 AS DOUBLE) / n_b)), 6)
        |  END AS z
        |FROM ab""".stripMargin)((s, d) => BehaviorQueries.abLift(s, d)),

    // Both firsts as conditional MINs in ONE user-grain pass.
    QueryDef("q_time_to_convert",
      s"""WITH e AS (
         |  SELECT user_id, event_type, ${Out.sql.epochSec("ts")} AS sec
         |  FROM events
         |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |    AND event_type IN ('view', 'purchase')),
         |u AS (
         |  SELECT user_id,
         |    MIN(CASE WHEN event_type = 'view' THEN sec END) AS first_view,
         |    MIN(CASE WHEN event_type = 'purchase' THEN sec END) AS first_purchase
         |  FROM e GROUP BY user_id)
         |SELECT user_id, first_view, first_purchase,
         |  first_purchase - first_view AS convert_sec
         |FROM u
         |WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
         |  AND first_purchase >= first_view
         |ORDER BY user_id""".stripMargin)(BehaviorQueries.timeToConvert),

    // Ordered list slice per user ((sec, event_id) unique sort key); path
    // census then top-k.
    QueryDef("q_session_paths",
      s"""WITH e AS (
         |  SELECT user_id, ${Out.sql.epochSec("ts")} AS sec, event_id, event_type
         |  FROM events
         |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |    AND event_id IS NOT NULL),
         |u AS (
         |  SELECT user_id,
         |    array_to_string(
         |      (list(event_type ORDER BY sec, event_id))
         |        [1:${BehaviorQueries.PathLen}], '>') AS path
         |  FROM e GROUP BY user_id)
         |SELECT path, count(*) AS n_users FROM u GROUP BY 1
         |ORDER BY n_users DESC, path
         |LIMIT ${BehaviorQueries.PathTopK}""".stripMargin)(
      (s, d) => BehaviorQueries.sessionPaths(s, d)),

    // Distinct (user, day) once; horizon flags are conditional MAXes;
    // single-row rollout. No ORDER BY needed on one row.
    QueryDef("q_retention_flags", {
      val hs = BehaviorQueries.RetentionHorizons
      s"""WITH act AS (
         |  SELECT DISTINCT user_id,
         |    ${Out.sql.epochSec("ts")} // ${BehaviorQueries.DaySec} AS day
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |f AS (SELECT user_id, MIN(day) AS f FROM act GROUP BY 1),
         |u AS (
         |  SELECT act.user_id,
         |${hs.map(h => s"    MAX(CASE WHEN day = f + $h THEN 1 ELSE 0 END) AS d$h")
              .mkString(",\n")}
         |  FROM act JOIN f USING (user_id) GROUP BY 1)
         |SELECT count(*) AS n_users,
         |${hs.map(h =>
            s"  CAST(SUM(d$h) AS BIGINT) AS d${h}_users,\n" +
            s"  round(CAST(SUM(d$h) AS DOUBLE) / count(*), 6) AS d${h}_rate")
            .mkString(",\n")}
         |FROM u""".stripMargin
    })((s, d) => BehaviorQueries.retentionFlags(s, d)))
}
