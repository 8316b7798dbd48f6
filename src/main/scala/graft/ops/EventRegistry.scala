package graft.ops

import graft.QueryDef

/** Oracle SQL (DuckDB dialect, ANSI subset) for graft.ops.EventQueries.
  * Tables are referenced by bare name — the driver views them over the same
  * parquet files. Every query ends with ORDER BY on a unique key and emits
  * only BIGINT / DOUBLE / VARCHAR columns (see graft.ops.Out). */
object EventRegistry {

  private val K = "TRY_CAST(json_extract_string(props,'$.k') AS BIGINT)"

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_filter_valid",
      s"""WITH e AS (SELECT event_id, user_id, value, $K AS k FROM events)
         |SELECT event_id, user_id, value, k FROM e
         |WHERE NOT (COALESCE(value,0)=0 AND COALESCE(k,0)=0)
         |  AND (COALESCE(value,0) < 50 OR COALESCE(k,0) < 50)
         |ORDER BY event_id""".stripMargin)(EventQueries.filterValid),

    QueryDef("q_parse_json_props",
      s"SELECT event_id, $K AS k FROM events ORDER BY event_id")(
      EventQueries.parseJsonProps),

    QueryDef("q_flatten_project",
      s"""SELECT event_id AS message_id, user_id AS sensor_id,
         |  ${Out.sql.epochSec("ts")} AS ts_sec,
         |  value AS temperature, $K AS humidity
         |FROM events ORDER BY message_id""".stripMargin)(
      EventQueries.flattenProject),

    QueryDef("q_tumbling_max",
      s"""SELECT user_id, ${Out.sql.epochSec("date_trunc('minute', ts)")} AS w_start,
         |  MAX(value) AS max_value
         |FROM events GROUP BY 1, 2 ORDER BY user_id, w_start""".stripMargin)(
      EventQueries.tumblingMax),

    QueryDef("q_tumbling_min_avg",
      s"""SELECT user_id, ${Out.sql.epochSec("date_trunc('minute', ts)")} AS w_start,
         |  MIN(value) AS min_value,
         |  ${Out.sql.davg("value")} AS avg_value,
         |  COUNT(*) AS n
         |FROM events GROUP BY 1, 2 ORDER BY user_id, w_start""".stripMargin)(
      EventQueries.tumblingMinAvg),

    QueryDef("q_grouped_agg",
      s"""SELECT event_type, COUNT(*) AS n, MAX(value) AS max_value,
         |  MIN(value) AS min_value, ${Out.sql.dsum("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)(
      EventQueries.groupedAgg),

    QueryDef("q_sliding_count",
      s"""WITH w AS (
         |  SELECT event_type, value,
         |    unnest([CAST(FLOOR(EPOCH(ts)/300)*300 AS BIGINT),
         |            CAST(FLOOR(EPOCH(ts)/300)*300 - 300 AS BIGINT)]) AS w_start
         |  FROM events)
         |SELECT event_type, w_start, COUNT(*) AS n, MAX(value) AS max_value
         |FROM w GROUP BY 1, 2 ORDER BY event_type, w_start""".stripMargin)(
      EventQueries.slidingCount),

    QueryDef("q_session_window",
      s"""WITH o AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
         |              < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
         |  FROM events),
         |s AS (
         |  SELECT user_id, ts, value,
         |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM o)
         |SELECT user_id, ${Out.sql.epochSec("MIN(ts)")} AS session_start,
         |  COUNT(*) AS n, ${Out.sql.dsum("value")} AS sum_value
         |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)(
      EventQueries.sessionWindow),

    QueryDef("q_dedup_exact",
      s"""WITH r AS (
         |  SELECT event_id, user_id, event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
         |      ORDER BY event_id) AS rn
         |  FROM events)
         |SELECT event_id, user_id, event_type, value FROM r
         |WHERE rn = 1 ORDER BY event_id""".stripMargin)(
      EventQueries.dedupExact),

    QueryDef("q_asof_join",
      s"""WITH u AS (
         |  SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'purchase'
         |  UNION ALL
         |  SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'click'),
         |m AS (
         |  SELECT user_id, ts, event_id, side,
         |    LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
         |            ROWS UNBOUNDED PRECEDING) AS click_id,
         |    LAST_VALUE(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
         |            ROWS UNBOUNDED PRECEDING) AS click_ts
         |  FROM u)
         |SELECT event_id AS purchase_id, user_id,
         |  ${Out.sql.epochSec("ts")} AS purchase_ts,
         |  click_id, ${Out.sql.epochSec("click_ts")} AS click_ts
         |FROM m WHERE side = 1 ORDER BY purchase_id""".stripMargin)(
      EventQueries.asofJoin),

    // The asof window with a staleness bound applied post-window; gap in
    // integer epoch seconds on both sides.
    QueryDef("q_asof_tolerance",
      s"""WITH u AS (
         |  SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'purchase'
         |  UNION ALL
         |  SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'click'),
         |m AS (
         |  SELECT user_id, ts, event_id, side,
         |    LAST_VALUE(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
         |            ROWS UNBOUNDED PRECEDING) AS click_id,
         |    LAST_VALUE(CASE WHEN side = 0 THEN ${Out.sql.epochSec("ts")} END
         |      IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
         |            ROWS UNBOUNDED PRECEDING) AS click_sec
         |  FROM u),
         |g AS (
         |  SELECT event_id AS purchase_id, user_id,
         |    ${Out.sql.epochSec("ts")} AS purchase_ts, click_id,
         |    ${Out.sql.epochSec("ts")} - click_sec AS gap_sec
         |  FROM m WHERE side = 1)
         |SELECT purchase_id, user_id, purchase_ts,
         |  CASE WHEN gap_sec <= ${EventQueries.AsofToleranceSec}
         |       THEN click_id END AS click_id,
         |  CASE WHEN gap_sec <= ${EventQueries.AsofToleranceSec}
         |       THEN gap_sec END AS gap_sec,
         |  CAST(CASE WHEN gap_sec <= ${EventQueries.AsofToleranceSec}
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_fresh
         |FROM g ORDER BY purchase_id""".stripMargin)(
      (s, d) => EventQueries.asofTolerance(s, d)),

    QueryDef("q_funnel",
      s"""WITH e AS (
         |  SELECT user_id, event_type, ${Out.sql.epochSec("ts")} AS t FROM events),
         |v AS (SELECT user_id, min(t) AS t_view FROM e
         |      WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, min(t) AS t_click
         |      FROM e JOIN v USING (user_id)
         |      WHERE event_type = 'click' AND t > t_view GROUP BY 1),
         |p AS (SELECT e.user_id, min(t) AS t_purchase
         |      FROM e JOIN c USING (user_id)
         |      WHERE event_type = 'purchase' AND t > t_click GROUP BY 1)
         |SELECT v.user_id, t_view, t_click, t_purchase
         |FROM v LEFT JOIN c ON v.user_id = c.user_id
         |       LEFT JOIN p ON v.user_id = p.user_id
         |ORDER BY v.user_id""".stripMargin)(
      (s, d) => EventQueries.funnel(s, d, Seq("view", "click", "purchase")))
    ,
    // Same staged CTEs as q_funnel plus the first-stage deadline; level
    // counts the non-null stage times.
    QueryDef("q_window_funnel",
      s"""WITH e AS (
         |  SELECT user_id, event_type, ${Out.sql.epochSec("ts")} AS t FROM events),
         |v AS (SELECT user_id, min(t) AS t_view,
         |        min(t) + ${EventQueries.FunnelWindowSec} AS deadline
         |      FROM e WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, min(t) AS t_click
         |      FROM e JOIN v USING (user_id)
         |      WHERE event_type = 'click' AND t > t_view AND t <= deadline
         |      GROUP BY 1),
         |p AS (SELECT e.user_id, min(t) AS t_purchase
         |      FROM e JOIN v USING (user_id) JOIN c USING (user_id)
         |      WHERE event_type = 'purchase' AND t > t_click AND t <= deadline
         |      GROUP BY 1)
         |SELECT v.user_id, t_view, t_click, t_purchase,
         |  CAST(CASE WHEN t_view IS NULL THEN 0 ELSE 1 END
         |    + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
         |    + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS BIGINT) AS level
         |FROM v LEFT JOIN c ON v.user_id = c.user_id
         |       LEFT JOIN p ON v.user_id = p.user_id
         |ORDER BY v.user_id""".stripMargin)(
      (s, d) => EventQueries.windowFunnel(s, d)),
    // Drop-off report over the same v/c/p staged CTEs as q_funnel; the
    // 3-row stage table then carries the lag/top ratios.
    QueryDef("q_funnel_conversion",
      s"""WITH e AS (
         |  SELECT user_id, event_type, ${Out.sql.epochSec("ts")} AS t FROM events),
         |v AS (SELECT user_id, min(t) AS t_view FROM e
         |      WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, min(t) AS t_click
         |      FROM e JOIN v USING (user_id)
         |      WHERE event_type = 'click' AND t > t_view GROUP BY 1),
         |p AS (SELECT e.user_id, min(t) AS t_purchase
         |      FROM e JOIN c USING (user_id)
         |      WHERE event_type = 'purchase' AND t > t_click GROUP BY 1),
         |st AS (
         |  -- count(t_<stage>), not count(*): only users with a CONCRETE
         |  -- stage timestamp count, mirroring the Spark side's count(col) —
         |  -- a user whose every 'view' has NULL ts yields a NULL min(t) row
         |  -- that must not inflate the funnel (round-6 advice).
         |  SELECT 0 AS stage, 'view' AS stage_type,
         |    (SELECT count(t_view) FROM v) AS n_reached
         |  UNION ALL SELECT 1, 'click', (SELECT count(t_click) FROM c)
         |  UNION ALL SELECT 2, 'purchase', (SELECT count(t_purchase) FROM p))
         |SELECT CAST(stage AS BIGINT) AS stage, stage_type,
         |  CAST(n_reached AS BIGINT) AS n_reached,
         |  CASE WHEN lag(n_reached) OVER w > 0 THEN
         |    round(CAST(n_reached AS DOUBLE) / lag(n_reached) OVER w, 6)
         |  END AS conv_prev,
         |  CASE WHEN first_value(n_reached) OVER w > 0 THEN
         |    round(CAST(n_reached AS DOUBLE)
         |          / first_value(n_reached) OVER w, 6)
         |  END AS conv_top
         |FROM st WINDOW w AS (ORDER BY stage)
         |ORDER BY stage""".stripMargin)(
      (s, d) => EventQueries.funnelConversion(s, d)),

    // Nearest-in-time match: exhaustive tolerance join + the same
    // (|Δt|, click_id) total-order winner — the binned generator is a
    // superset of qualifying pairs, so the results coincide exactly.
    QueryDef("q_asof_nearest", {
      val tol = EventQueries.AsofNearestTolSec
      s"""WITH e AS (
         |  SELECT user_id, event_type, event_id,
         |    ${Out.sql.epochSec("ts")} AS sec
         |  FROM events
         |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |    AND event_id IS NOT NULL),
         |p AS (SELECT user_id, event_id AS purchase_id, sec AS tp FROM e
         |      WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, event_id AS click_id, sec AS tc FROM e
         |      WHERE event_type = 'click'),
         |best AS (
         |  SELECT purchase_id, click_id, tc FROM (
         |    SELECT p.purchase_id, c.click_id, c.tc,
         |      row_number() OVER (PARTITION BY p.purchase_id
         |        ORDER BY abs(c.tc - p.tp), c.click_id) AS rn
         |    FROM p JOIN c ON p.user_id = c.user_id
         |      AND abs(c.tc - p.tp) <= $tol)
         |  WHERE rn = 1)
         |SELECT p.purchase_id, p.user_id, p.tp,
         |  b.click_id, b.tc, b.tc - p.tp AS lag_sec
         |FROM p LEFT JOIN best b USING (purchase_id)
         |ORDER BY purchase_id""".stripMargin
    })((s, d) => EventQueries.asofNearest(s, d)),

    // Freshness report against the corpus frontier (deterministic "now").
    QueryDef("q_freshness_sla", {
      val sla = EventQueries.FreshnessSlaSec
      s"""WITH e AS (
         |  SELECT event_type, ${Out.sql.epochSec("ts")} AS sec
         |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
         |g AS (SELECT max(sec) AS gmax FROM e),
         |t AS (SELECT event_type, max(sec) AS last_sec, count(*) AS n_total
         |      FROM e GROUP BY 1),
         |r AS (SELECT event_type, count(*) AS n_last_day
         |      FROM e, g WHERE sec > gmax - $sla GROUP BY 1)
         |SELECT t.event_type, t.last_sec,
         |  g.gmax - t.last_sec AS lag_sec,
         |  t.n_total, COALESCE(r.n_last_day, 0) AS n_last_day,
         |  CAST(CASE WHEN g.gmax - t.last_sec > $sla THEN 1 ELSE 0 END
         |    AS BIGINT) AS stale
         |FROM t CROSS JOIN g LEFT JOIN r USING (event_type)
         |ORDER BY t.event_type""".stripMargin
    })(EventQueries.freshnessSla)
  )
}
