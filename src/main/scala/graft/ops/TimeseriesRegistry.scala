package graft.ops

import graft.QueryDef

/** Oracle SQL (DuckDB dialect) for [[TimeseriesQueries]]. The moment
  * formulas are written as the SAME double expression tree the Spark side
  * evaluates (from exact decimal power sums), per the [[StatsQueries]]
  * determinism rules; thresholds/steps interpolate the Scala constants. */
object TimeseriesRegistry {

  private val Z = TimeseriesQueries.ZThreshold
  private val Step = TimeseriesQueries.GridStepSec

  /** Weighted-lag terms generated from [[TimeseriesQueries.EwmaWeights]] —
    * the kernel cannot drift from the Spark loop. */
  private val ewmaTerms = TimeseriesQueries.EwmaWeights.zipWithIndex.map {
    case (wt, 0) => s"$wt * v"
    case (wt, i) => s"$wt * lag(v, $i) OVER w"
  }.mkString(" + ")
  private val ewmaDiv = TimeseriesQueries.EwmaWeights.sum.toDouble

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_anomaly_zscore",
      s"""WITH st AS (
         |  SELECT user_id, COUNT(*)::DOUBLE AS n,
         |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
         |    CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS ss
         |  FROM events GROUP BY 1),
         |m AS (
         |  SELECT user_id, s / n AS mean,
         |    SQRT(GREATEST(n * ss - s * s, 0.0) / (n * (n - 1.0))) AS std
         |  FROM st WHERE n >= 2)
         |SELECT e.event_id, e.user_id, e.value,
         |  ROUND((e.value - m.mean) / m.std, 6) AS z
         |FROM events e JOIN m USING (user_id)
         |WHERE ABS(e.value - m.mean) > $Z * m.std
         |ORDER BY event_id""".stripMargin)(TimeseriesQueries.anomalyZscore(_, _)),

    QueryDef("q_gap_fill",
      s"""WITH b AS (
         |  SELECT user_id,
         |    (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // $Step) * $Step AS hour,
         |    COUNT(*) AS n_obs,
         |    ${Out.sql.davg("value")} AS bar_avg
         |  FROM events GROUP BY 1, 2),
         |sp AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM b GROUP BY 1),
         |g AS (SELECT user_id, unnest(generate_series(h0, h1, $Step)) AS hour FROM sp)
         |SELECT g.user_id, g.hour,
         |  COALESCE(b.n_obs, 0) AS n_obs,
         |  LAST_VALUE(b.bar_avg IGNORE NULLS)
         |    OVER (PARTITION BY g.user_id ORDER BY g.hour) AS filled_avg,
         |  CAST(CASE WHEN b.n_obs IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
         |FROM g LEFT JOIN b USING (user_id, hour)
         |ORDER BY user_id, hour""".stripMargin)(TimeseriesQueries.gapFill(_, _)),

    QueryDef("q_ewma_trailing",
      s"""WITH src AS (
         |  SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,4)) AS v
         |  FROM events),
         |l AS (
         |  SELECT event_id, user_id, ts, v, $ewmaTerms AS wsum
         |  FROM src WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT event_id, user_id,
         |  CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec,
         |  CAST(v AS DOUBLE) AS value,
         |  ROUND(CAST(wsum AS DOUBLE) / $ewmaDiv, 6) AS ewma
         |FROM l WHERE wsum IS NOT NULL
         |ORDER BY user_id, ts_sec, event_id""".stripMargin)(
      TimeseriesQueries.ewmaTrailing(_, _)),

    QueryDef("q_seasonal_profile",
      s"""SELECT event_type,
         |  CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour_utc,
         |  count(*) AS n,
         |  round(${graft.ops.Out.sql.davg("value")}, 6) AS avg_value
         |FROM events GROUP BY 1, 2
         |ORDER BY event_type, hour_utc""".stripMargin)(
      TimeseriesQueries.seasonalProfile),

    // Rolling frame = ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING —
    // the 1-PRECEDING end is the leakage guard under test; the decimal-sum
    // spelling keeps the 5-double mean order-independent (Out discipline).
    QueryDef("q_ml_features",
      s"""WITH e AS (
         |  SELECT user_id, event_id,
         |    ${graft.ops.Out.sql.epochSec("ts")} AS sec, value
         |  FROM events
         |  WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND ts IS NOT NULL)
         |SELECT user_id, event_id, sec, value,
         |  lag(value) OVER w AS lag1,
         |  round(value - lag(value) OVER w, 6) AS delta,
         |  CASE WHEN count(value) OVER fr > 0 THEN
         |    round(CAST(SUM(CAST(value AS DECIMAL(38,4))) OVER fr AS DOUBLE)
         |          / count(value) OVER fr, 6)
         |  END AS roll_avg5,
         |  max(value) OVER fr AS roll_max5
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id),
         |  fr AS (PARTITION BY user_id ORDER BY sec, event_id
         |         ROWS BETWEEN ${TimeseriesQueries.FeatureLookback} PRECEDING
         |                  AND 1 PRECEDING)
         |ORDER BY user_id, sec, event_id""".stripMargin)(
      TimeseriesQueries.mlFeatures),

    // open/close = arg_min/arg_max over the encoded (sec, event_id) BIGINT
    // sequence key — unique (Spark side tripwires ids ≥ cap), so candle
    // endpoints are deterministic under timestamp ties in both engines.
    QueryDef("q_ohlc_resample",
      s"""WITH e AS (
         |  SELECT user_id, value,
         |    ${graft.ops.Out.sql.epochSec("ts")} AS sec,
         |    ${graft.ops.Out.sql.epochSec("ts")} * ${TimeseriesQueries.OhlcIdCap}
         |      + event_id AS ord
         |  FROM events
         |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL)
         |SELECT user_id,
         |  (sec // ${TimeseriesQueries.OhlcBarSec}) * ${TimeseriesQueries.OhlcBarSec} AS day,
         |  COUNT(*) AS n,
         |  ARG_MIN(value, ord) AS open,
         |  MAX(value) AS high,
         |  MIN(value) AS low,
         |  ARG_MAX(value, ord) AS close,
         |  ROUND(${graft.ops.Out.sql.davg("value")}, 6) AS bar_avg
         |FROM e GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin)(
      TimeseriesQueries.ohlcResample),

    // CUSUM_d = cumS_d − cumN_d·(S/N) from exact decimal sums — the same
    // double expression tree as the Spark side, never a per-day float
    // deviation accumulation.
    QueryDef("q_cusum_changepoint",
      s"""WITH d AS (
         |  SELECT event_type,
         |    (${graft.ops.Out.sql.epochSec("ts")} // ${TimeseriesQueries.CpDaySec})
         |      * ${TimeseriesQueries.CpDaySec} AS day_ts,
         |    count(*) AS n, SUM(CAST(value AS DECIMAL(18,4))) AS s
         |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |  GROUP BY 1, 2),
         |c AS (
         |  SELECT event_type, day_ts, n,
         |    ROUND(CAST(SUM(s) OVER wc AS DOUBLE)
         |      - CAST(SUM(n) OVER wc AS DOUBLE)
         |        * (CAST(SUM(s) OVER wt AS DOUBLE)
         |           / CAST(SUM(n) OVER wt AS DOUBLE)), 6) AS cusum
         |  FROM d
         |  WINDOW wc AS (PARTITION BY event_type ORDER BY day_ts
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wt AS (PARTITION BY event_type))
         |SELECT event_type, day_ts, n, cusum,
         |  CAST(abs(cusum) = max(abs(cusum)) OVER (PARTITION BY event_type)
         |    AS BIGINT) AS is_cp
         |FROM c ORDER BY event_type, day_ts""".stripMargin)(
      TimeseriesQueries.cusumChangepoint),

    // Daily means rounded to 6dp then cast DECIMAL(18,6) (exact — a
    // 6dp-rounded double is within 1 ulp of its decimal value), so all five
    // Pearson moments are exact sums; r is one shared double formula with
    // 0-clamped variance numerators.
    QueryDef("q_autocorr_daily",
      s"""WITH m AS (
         |  SELECT event_type,
         |    (${graft.ops.Out.sql.epochSec("ts")} // ${TimeseriesQueries.CpDaySec})
         |      * ${TimeseriesQueries.CpDaySec} AS day_ts,
         |    CAST(ROUND(${graft.ops.Out.sql.davg("value")}, 6)
         |      AS DECIMAL(18,6)) AS x
         |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |  GROUP BY 1, 2),
         |l AS (
         |  SELECT event_type, day_ts, x,
         |    ${(1 to TimeseriesQueries.AcfMaxLag)
               .map(k => s"lag(x, $k) OVER w AS x$k").mkString(", ")}
         |  FROM m WINDOW w AS (PARTITION BY event_type ORDER BY day_ts)),
         |p AS (
         |  ${(1 to TimeseriesQueries.AcfMaxLag)
              .map(k => s"SELECT event_type, $k AS lag_d, x, x$k AS y " +
                s"FROM l WHERE x$k IS NOT NULL")
              .mkString("\n         |  UNION ALL\n         |  ")}),
         |a AS (
         |  SELECT event_type, lag_d, count(*) AS n,
         |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
         |    SUM(y*y) AS syy, SUM(x*y) AS sxy
         |  FROM p GROUP BY 1, 2),
         |v AS (
         |  SELECT event_type, lag_d, n,
         |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
         |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
         |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy
         |  FROM a)
         |SELECT event_type, CAST(lag_d AS BIGINT) AS lag_d, n AS n_pairs,
         |  ROUND(cxy / (SQRT(GREATEST(vx, 0.0)) * SQRT(GREATEST(vy, 0.0))), 6)
         |    AS acf
         |FROM v WHERE vx > 0 AND vy > 0
         |ORDER BY event_type, lag_d""".stripMargin)(
      (s, d) => TimeseriesQueries.autocorrDaily(s, d)),
    // Daily means rounded+carried as DECIMAL(18,6) ⇒ exact pair
    // differences; slope = one double division; median via the
    // percentile ≡ quantile_cont parity.
    QueryDef("q_theilsen",
      s"""WITH daily AS (
         |  SELECT event_type,
         |    ${graft.ops.Out.sql.epochSec("ts")} // ${TimeseriesQueries.CpDaySec}
         |      AS day,
         |    CAST(round(${graft.ops.Out.sql.davg("value")}, 6)
         |      AS DECIMAL(18,6)) AS y
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL
         |  GROUP BY 1, 2),
         |s AS (SELECT a.event_type,
         |        CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
         |          AS slope
         |      FROM daily a JOIN daily b
         |        ON a.event_type = b.event_type AND a.day < b.day),
         |nd AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1)
         |SELECT event_type, n_days, count(*) AS n_pairs,
         |  round(quantile_cont(slope, 0.5), 9) AS theilsen_slope
         |FROM s JOIN nd USING (event_type)
         |GROUP BY event_type, n_days
         |ORDER BY event_type""".stripMargin)(
      TimeseriesQueries.theilSen),

    // Robust weekly series: quantile_cont ≡ percentile; lag over the
    // weekly grain; delta of two 4dp-rounded doubles re-rounded.
    QueryDef("q_weekly_quantile_trend", {
      val wk = TimeseriesQueries.WowWeekSec
      s"""WITH w AS (
         |  SELECT event_type,
         |    (${graft.ops.Out.sql.epochSec("ts")} // $wk) * $wk AS wk,
         |    count(*) AS n,
         |    round(quantile_cont(value, 0.5), 4) AS p50,
         |    round(quantile_cont(value, 0.9), 4) AS p90
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL
         |  GROUP BY 1, 2)
         |SELECT event_type, wk, n, p50, p90,
         |  round(p50 - lag(p50) OVER (PARTITION BY event_type ORDER BY wk), 4)
         |    AS p50_delta
         |FROM w ORDER BY event_type, wk""".stripMargin
    })(TimeseriesQueries.weeklyQuantileTrend),

    // STL-lite: metadata-grain windows per type; 6dp daily means, decimal
    // frame sums, integer weekday — identical expression trees both sides.
    QueryDef("q_seasonal_decompose", {
      val d = TimeseriesQueries.CpDaySec
      s"""WITH daily AS (
         |  SELECT event_type,
         |    (${graft.ops.Out.sql.epochSec("ts")} // $d) AS day,
         |    round(${graft.ops.Out.sql.davg("value")}, 6) AS x
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL
         |  GROUP BY 1, 2),
         |t AS (
         |  SELECT event_type, day, x,
         |    round(CAST(SUM(CAST(x AS DECIMAL(18,6))) OVER ma AS DOUBLE)
         |      / count(*) OVER ma, 6) AS trend,
         |    (day + 4) % 7 AS weekday
         |  FROM daily
         |  WINDOW ma AS (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         |s AS (
         |  SELECT event_type, weekday,
         |    round(CAST(SUM(CAST(x - trend AS DECIMAL(38,12))) AS DOUBLE)
         |      / count(*), 6) AS seasonal
         |  FROM t GROUP BY 1, 2)
         |SELECT t.event_type, t.day * $d AS day, t.weekday, t.x, t.trend,
         |  s.seasonal,
         |  round((t.x - t.trend) - s.seasonal, 6) AS residual
         |FROM t JOIN s USING (event_type, weekday)
         |ORDER BY t.event_type, day""".stripMargin
    })(TimeseriesQueries.seasonalDecompose),

    // Weekly decimal sums; pct changes are single double divisions with
    // NULL (not error) on zero/absent previous — both spellings identical.
    QueryDef("q_wow_change", {
      val wk = TimeseriesQueries.WowWeekSec
      s"""WITH w AS (
         |  SELECT event_type,
         |    (${graft.ops.Out.sql.epochSec("ts")} // $wk) * $wk AS wk,
         |    count(*) AS n,
         |    ${graft.ops.Out.sql.dsum("value")} AS sum_value
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL
         |  GROUP BY 1, 2),
         |l AS (
         |  SELECT event_type, wk, n, sum_value,
         |    lag(n) OVER tw AS prev_n,
         |    lag(sum_value) OVER tw AS prev_sum
         |  FROM w WINDOW tw AS (PARTITION BY event_type ORDER BY wk))
         |SELECT event_type, wk, n, round(sum_value, 4) AS sum_value,
         |  CASE WHEN prev_n > 0 THEN
         |    round(CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE), 6)
         |  END AS n_wow,
         |  CASE WHEN prev_sum <> 0.0 THEN
         |    round((sum_value - prev_sum) / prev_sum, 6)
         |  END AS sum_wow
         |FROM l ORDER BY event_type, wk""".stripMargin
    })(TimeseriesQueries.wowChange),

    // Holding durations from the (sec, event_id)-pinned lead; decimal-exact
    // value×duration sums; one double division per user.
    QueryDef("q_time_weighted_avg",
      s"""WITH e AS (
         |  SELECT user_id, ${graft.ops.Out.sql.epochSec("ts")} AS sec,
         |    event_id, CAST(value AS DECIMAL(18,4)) AS v
         |  FROM events
         |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |    AND event_id IS NOT NULL AND value IS NOT NULL),
         |d AS (
         |  SELECT user_id, v,
         |    lead(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
         |      - sec AS dur
         |  FROM e)
         |SELECT user_id, count(*) AS n_intervals,
         |  CAST(SUM(dur) AS BIGINT) AS span_sec,
         |  round(CAST(SUM(v * dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 6)
         |    AS twap
         |FROM d WHERE dur IS NOT NULL
         |GROUP BY 1 HAVING SUM(dur) > 0
         |ORDER BY user_id""".stripMargin)(
      TimeseriesQueries.timeWeightedAvg),

    // Gap ordering under timestamp ties is pinned by event_id in both
    // engines; quantile_cont ≡ percentile on integer gaps.
    QueryDef("q_interarrival_stats",
      s"""WITH e AS (
         |  SELECT user_id, ${graft.ops.Out.sql.epochSec("ts")} AS sec, event_id
         |  FROM events
         |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |    AND event_id IS NOT NULL),
         |g AS (
         |  SELECT user_id,
         |    sec - lag(sec) OVER (PARTITION BY user_id
         |      ORDER BY sec, event_id) AS gap
         |  FROM e)
         |SELECT user_id, count(*) AS n_gaps,
         |  round(quantile_cont(gap, 0.5), 4) AS gap_p50,
         |  round(quantile_cont(gap, 0.9), 4) AS gap_p90,
         |  max(gap) AS gap_max
         |FROM g WHERE gap IS NOT NULL
         |GROUP BY 1 ORDER BY user_id""".stripMargin)(
      TimeseriesQueries.interarrivalStats),

    // Micro-batch watermark replay: per-batch max event-time, running max
    // over the batch series, lateness = watermark − ts clamped at 0. The
    // hash jitter is the shared deterministic transport-delay model.
    QueryDef("q_late_arrival",
      s"""WITH e AS (
         |  SELECT event_id, ${Out.sql.epochSec("ts")} AS sec
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_id IS NOT NULL),
         |a AS (
         |  SELECT event_id, sec,
         |    (sec + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT
         |      % ${TimeseriesQueries.LateMaxDelay})
         |      // ${TimeseriesQueries.LateBatchSec} AS batch
         |  FROM e),
         |w AS (
         |  SELECT batch,
         |    MAX(MAX(sec)) OVER (ORDER BY batch
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
         |  FROM a GROUP BY batch),
         |l AS (
         |  SELECT GREATEST(COALESCE(w.wm, 0) - a.sec, 0) AS late_sec
         |  FROM a JOIN w USING (batch))
         |SELECT CASE WHEN late_sec = 0 THEN 'b0_ontime'
         |            WHEN late_sec <= 30 THEN 'b1_le30s'
         |            WHEN late_sec <= 60 THEN 'b2_le60s'
         |            WHEN late_sec <= 120 THEN 'b3_le2m'
         |            ELSE 'b4_gt2m' END AS band,
         |  count(*) AS n_events, max(late_sec) AS max_late_sec
         |FROM l GROUP BY 1 ORDER BY band""".stripMargin)(
      TimeseriesQueries.lateArrival),

    // Integer day counts ⇒ exact BIGINT power sums; the mean/σ formula is
    // the same double tree both engines evaluate. Incomplete trailing
    // frames excluded by the window COUNT, not row position.
    QueryDef("q_burst_detect",
      s"""WITH daily AS (
         |  SELECT event_type,
         |    ${Out.sql.epochSec("date_trunc('day', ts)")} AS day_sec,
         |    count(*) AS n
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |  GROUP BY 1, 2),
         |t AS (
         |  SELECT event_type, day_sec, n,
         |    COUNT(n) OVER w AS w_cnt,
         |    SUM(n) OVER w AS s, SUM(n * n) OVER w AS ss
         |  FROM daily
         |  WINDOW w AS (PARTITION BY event_type ORDER BY day_sec
         |    ROWS BETWEEN ${TimeseriesQueries.BurstWindow} PRECEDING AND 1 PRECEDING)),
         |m AS (
         |  SELECT event_type, day_sec, n,
         |    CAST(s AS DOUBLE) / ${TimeseriesQueries.BurstWindow}.0 AS mean,
         |    SQRT(GREATEST(${TimeseriesQueries.BurstWindow}.0 * CAST(ss AS DOUBLE)
         |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE), 0.0)
         |      / (${TimeseriesQueries.BurstWindow}.0 * ${TimeseriesQueries.BurstWindow - 1}.0)) AS std
         |  FROM t WHERE w_cnt = ${TimeseriesQueries.BurstWindow})
         |SELECT event_type, day_sec, n,
         |  round(mean, 6) AS trail_mean, round(std, 6) AS trail_std
         |FROM m
         |WHERE CAST(n AS DOUBLE) > mean + ${TimeseriesQueries.BurstSigma} * std
         |ORDER BY event_type, day_sec""".stripMargin)(
      TimeseriesQueries.burstDetect),

    // The anomaly-zscore moment tree keyed by (type, UTC hour); cells with
    // n < 2 excluded in both engines.
    QueryDef("q_seasonal_anomaly",
      s"""WITH e AS (
         |  SELECT event_id, event_type,
         |    CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour_utc, value
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |    AND value IS NOT NULL),
         |st AS (
         |  SELECT event_type, hour_utc, COUNT(*)::DOUBLE AS n,
         |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
         |    CAST(SUM(CAST(value AS DECIMAL(18,4))
         |      * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS ss
         |  FROM e GROUP BY 1, 2),
         |m AS (
         |  SELECT event_type, hour_utc, s / n AS mean,
         |    SQRT(GREATEST(n * ss - s * s, 0.0) / (n * (n - 1.0))) AS std
         |  FROM st WHERE n >= 2)
         |SELECT e.event_id, e.event_type, e.hour_utc, e.value,
         |  ROUND((e.value - m.mean) / m.std, 6) AS z
         |FROM e JOIN m USING (event_type, hour_utc)
         |WHERE ABS(e.value - m.mean) > ${TimeseriesQueries.SeasonalZ} * m.std
         |ORDER BY event_id""".stripMargin)(
      (s, d) => TimeseriesQueries.seasonalAnomaly(s, d)))
}
