package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Time-series analytics over the event stream — per-entity anomaly
  * detection and grid resampling with gap fill. These extend the reference's
  * windowed MIN/MAX/AVG surface (SURVEY.md §2.2 K4–K6) with the two
  * monitoring queries every sensor fleet runs next: "which readings are
  * abnormal for THIS sensor?" and "give me a regular bar series even where
  * the sensor was silent".
  *
  * Determinism follows [[Out]] and the [[StatsQueries]] moment rules: power
  * sums in exact DECIMAL, derived moments as one explicit double formula
  * (identical expression tree in the oracle), raw measures passed through
  * untouched.
  */
object TimeseriesQueries {

  /** Anomaly threshold in sample standard deviations. Shared with the
    * oracle SQL (interpolated, not duplicated). */
  val ZThreshold = 2.0

  /** Per-user z-score anomaly detection: flag events whose value deviates
    * more than [[ZThreshold]]·σ from that user's own mean (two-sided).
    * Output: the flagged events with their z-score (rounded, 6dp).
    *
    * Shape at scale: classic two-pass — (1) per-user count/Σv/Σv² as a
    * partial-aggregated shuffle on `user_id` (the stats table is one row per
    * user, ~10⁻⁵ of the event volume), then (2) join the stats back to the
    * event stream on the same key. AQE broadcasts the stats side when it is
    * small; when the user population itself is huge the equi-join shuffles
    * both sides on `user_id` — no plan rewrite needed. The alternative
    * single-pass spelling (a window over `user_id`) materializes each user's
    * whole history in one task — fine for many small users, pathological for
    * one hot key, so the agg+join form is the default here.
    *
    * Determinism: Σv/Σv² are DECIMAL(18,4) sums (exact, order-independent;
    * the testdata values are 2dp) cast to double once; mean/σ are then the
    * SAME double expression tree the oracle evaluates, so the > threshold
    * comparison lands identically in both engines. Users with n < 2 (sample
    * σ undefined) are excluded by construction. */
  def anomalyZscore(spark: SparkSession, dir: String,
      threshold: Double = ZThreshold): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("value"))
    val v = col("value").cast("decimal(18,4)")
    val stats = ev
      .select(col("user_id"), v.as("v"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("v")).cast("double").as("s"),
        sum(col("v") * col("v")).cast("double").as("ss"))
      .where(col("n") >= 2)
      .select(
        col("user_id"),
        (col("s") / col("n")).as("mean"),
        // greatest(…, 0): a constant-valued user's variance numerator is
        // mathematically 0 but can land a few ulps NEGATIVE after the
        // decimal→double casts — sqrt of that is NaN (Spark) or an error
        // (DuckDB); clamp on BOTH sides so degenerate users get std = 0
        sqrt(greatest(col("n") * col("ss") - col("s") * col("s"), lit(0.0)) /
          (col("n") * (col("n") - lit(1.0)))).as("std"))
    ev.join(stats, Seq("user_id"))
      .where(abs(col("value") - col("mean")) > lit(threshold) * col("std"))
      .select(
        col("event_id"), col("user_id"), col("value"),
        round((col("value") - col("mean")) / col("std"), 6).as("z"))
      .orderBy(col("event_id"))
  }

  /** Resample grid step, seconds (hourly bars). Shared with the oracle. */
  val GridStepSec = 3600L

  /** Per-user hourly resample with forward fill: one row per (user, hour)
    * over each user's [first, last] active hour — observed hours carry their
    * event count and exact-decimal average; silent hours appear as gaps
    * (`n_obs = 0`, `is_gap = 1`) carrying the last observed bar value
    * forward. This is the regularization step in front of any downstream
    * model that assumes an evenly spaced series.
    *
    * Shape at scale: (1) bar aggregation is one partial-agg shuffle on
    * (user, hour); (2) the grid is generated FROM THE BAR AGGREGATE
    * (`sequence(min_hour, max_hour)` per user, then explode) — never from a
    * driver-side loop, and its row count is bounded by users × span-hours,
    * independent of event volume; (3) the left join back to bars is an
    * equi-join on the same (user, hour) key; (4) the forward fill is a
    * running `last(ignoreNulls)` window per user ordered by hour — bounded
    * by span-hours per task, NOT by event count, so a hot sensor with 10⁹
    * readings still fills at most its span of grid rows in one task. */
  def gapFill(spark: SparkSession, dir: String,
      stepSec: Long = GridStepSec): DataFrame = {
    val step = stepSec
    val bars = Tables(spark, dir).events
      .select(col("user_id"), Out.epochSec(col("ts")).as("sec"), col("value"))
      .select(col("user_id"), expr(s"sec div $step * $step").as("hour"), col("value"))
      .groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("n_obs"), Out.davg(col("value")).as("bar_avg"))
    val grid = bars
      .groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), lit(step))).as("hour"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    grid.join(bars, Seq("user_id", "hour"), "left")
      .select(
        col("user_id"), col("hour"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("bar_avg"), ignoreNulls = true).over(fill).as("filled_avg"),
        when(col("n_obs").isNull, lit(1L)).otherwise(lit(0L)).as("is_gap"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Integer EWMA weights, newest → oldest (8,4,2,1 ≈ α = ½ truncated at
    * 4 taps). Shared with the oracle via interpolation. Integer weights +
    * DECIMAL values keep the weighted sum EXACT — a true infinite-history
    * EWMA is a sequential recurrence (non-associative in floating point,
    * not reproducible across partitionings); truncating the kernel turns it
    * into a fixed linear combination of 4 lags, which is both
    * order-independent and windowable. */
  val EwmaWeights: Seq[Int] = Seq(8, 4, 2, 1)

  /** Trailing exponentially-weighted moving average per user: each event's
    * value smoothed over its own and the 3 previous readings (skipping each
    * user's first 3 events, where the kernel has no full history).
    *
    * Shape at scale: one window per `user_id` ordered by (ts, event_id) —
    * per-key sequential is inherent to any lagged feature, and parallelism
    * is the USER population (fleet-sized), not the event count; each task
    * streams its users' rows once, holding only 4 lag slots. The weighted
    * sum is exact decimal; the single division and rounding happen once at
    * output ([[Out]] rules). */
  def ewmaTrailing(spark: SparkSession, dir: String,
      weights: Seq[Int] = EwmaWeights): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0), "positive weights")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lags = weights.indices.map(i =>
      if (i == 0) col("v") else lag(col("v"), i).over(w))
    val wsum = weights.zip(lags).map { case (wt, lv) => lv * lit(wt) }.reduce(_ + _)
    Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").cast("decimal(18,4)").as("v"))
      .withColumn("wsum", wsum) // NULL until the kernel has all its lags
      .filter(col("wsum").isNotNull)
      .select(col("event_id"), col("user_id"),
        Out.epochSec(col("ts")).as("ts_sec"),
        col("v").cast("double").as("value"),
        round(col("wsum").cast("double") / weights.sum.toDouble, 6).as("ewma"))
      .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
  }

  /** Seasonal profile: per (event type, UTC hour-of-day), event count and
    * exact-decimal mean value — the diurnal fingerprint every monitoring /
    * anomaly stack baselines against (the z-score flags in [[anomalyZscore]]
    * assume a stationary mean; this is the query that checks that
    * assumption).
    *
    * Shape at scale: one narrow projection (hour extraction is codegen'd)
    * into one partial-agg shuffle on (type, hour) — ≤ types × 24 output
    * rows regardless of corpus size. */
  def seasonalProfile(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(col("event_type"), hour(col("ts")).cast("long").as("hour_utc"),
        col("value"))
      .groupBy(col("event_type"), col("hour_utc"))
      .agg(count(lit(1)).as("n"), round(Out.davg(col("value")), 6).as("avg_value"))
      .orderBy(col("event_type"), col("hour_utc"))

  /** Rolling-feature lookback (events), shared with the oracle SQL. */
  val FeatureLookback = 5

  /** Leakage-safe rolling ML features per entity — the feature-engineering
    * pass a training pipeline runs over an event log before fitting a model
    * on "predict the next reading": previous value (lag 1), delta vs it, and
    * rolling mean/max over the [[FeatureLookback]] PRECEDING events. The
    * frame ends at 1 PRECEDING, never the current row: including the row
    * being predicted is the classic target-leakage bug, and encoding the
    * exclusion in the frame makes it structural rather than reviewed-for.
    *
    * Shape at scale: one shuffle on the entity key; each user's history
    * streams through a bounded [[FeatureLookback]]-row frame (constant
    * memory — no full-partition materialization like an UNBOUNDED frame).
    * Determinism: rolling mean is an exact decimal sum over the frame
    * divided by the frame's non-null count (a 5-double sum's ORDER is
    * engine-internal; the decimal cast makes it exact); rows with no
    * preceding events yield NULL features (count-guarded — ANSI divide).
    * Total order (user, sec, event id) keeps the frames and row order
    * bit-stable across engines. */
  def mlFeatures(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val fr = w.rowsBetween(-FeatureLookback, -1)
    Tables(spark, dir).events
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id"), col("event_id"),
        Out.epochSec(col("ts")).as("sec"), col("value"))
      .withColumn("lag1", lag(col("value"), 1).over(w))
      .withColumn("delta", round(col("value") - col("lag1"), 6))
      .withColumn("cnt5", count(col("value")).over(fr))
      .withColumn("roll_avg5", when(col("cnt5") > 0,
        round(sum(col("value").cast(Out.SumDecimal)).over(fr).cast("double") /
          col("cnt5"), 6)))
      .withColumn("roll_max5", max(col("value")).over(fr))
      .drop("cnt5")
      .orderBy(col("user_id"), col("sec"), col("event_id"))
  }

  /** Bar width for OHLC downsampling, seconds (daily bars). Shared with
    * the oracle SQL. */
  val OhlcBarSec = 86400L

  /** Sequence-order encoding multiplier for open/close argmin: the order
    * key is `sec * 1e8 + event_id`, unique as long as ids stay below 1e8.
    * A corpus with wider ids must widen this (the tripwire below fails
    * loudly rather than silently mis-ordering ties). */
  val OhlcIdCap = 100000000L

  /** OHLC downsampling — per (user, day) candle bars: open/close are the
    * first/last reading in sequence order, high/low the extremes, plus the
    * event count and exact-decimal average. The canonical time-series
    * compaction (tick data → bars) and the batch analogue of the K4–K6
    * tumbling windows.
    *
    * Shape at scale: ONE partial-aggregated shuffle on (user, day) —
    * open/close use `min_by`/`max_by` over an encoded (sec, event_id)
    * BIGINT sequence key, which partial-aggregates map-side like any
    * min/max (each task keeps one candidate per group), so no window, no
    * sort, no per-group history. That is the property that lets a 100 TB
    * tick corpus compact in a single pass.
    *
    * Determinism: the sequence key is unique (tripwired via [[OhlcIdCap]]),
    * so first/last are well-defined under timestamp ties in both engines;
    * the average follows the [[Out]] decimal rule. */
  def ohlcResample(spark: SparkSession, dir: String): DataFrame = {
    val ord = col("sec") * OhlcIdCap + col("event_id")
    Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        Out.epochSec(col("ts")).as("sec"))
      .withColumn("event_id",
        when(col("event_id") >= OhlcIdCap || col("event_id") < 0, raise_error(
          concat(lit(s"ohlcResample: event_id outside [0, $OhlcIdCap) — " +
            "widen OhlcIdCap: "), col("event_id"))))
          .otherwise(col("event_id")))
      .groupBy(col("user_id"),
        ((col("sec") / OhlcBarSec).cast("long") * OhlcBarSec).as("day"))
      .agg(count(lit(1)).as("n"),
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        round(Out.davg(col("value")), 6).as("bar_avg"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Day bucket for the change-detection queries, seconds. */
  val CpDaySec = 86400L

  /** CUSUM change-point detection per event type: the cumulative sum of
    * daily deviations from the type's overall mean rate, with the maximum-
    * |CUSUM| day flagged — the classic Page-style "did this metric's level
    * shift, and when" monitor (a mean shift makes the CUSUM ramp; its peak
    * marks the most likely change point).
    *
    * Exactness: the deviation is NEVER materialized per day (daily_mean −
    * global_mean would stack fp error); instead CUSUM_d = cumS_d − cumN_d ·
    * (S/N) where cumS/S are exact decimal value sums and cumN/N exact
    * counts — one double expression evaluated identically by both engines
    * at each day.
    *
    * Shape at scale: one partial-agg shuffle to the (type, day) grain —
    * everything after runs on the DAY-count-sized series (windows
    * partitioned per type, never over raw events), so the window state is
    * calendar-bounded regardless of event volume. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val wT = Window.partitionBy(col("event_type"))
    val wC = wT.orderBy(col("day_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), Out.epochSec(col("ts")).as("sec"),
        col("value"))
      .groupBy(col("event_type"),
        ((col("sec") / CpDaySec).cast("long") * CpDaySec).as("day_ts"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).as("s"))
      .withColumn("cusum", round(
        sum(col("s")).over(wC).cast("double") -
          sum(col("n")).over(wC).cast("double") *
            (sum(col("s")).over(wT).cast("double") /
              sum(col("n")).over(wT).cast("double")), 6))
      .withColumn("mx", max(abs(col("cusum"))).over(wT))
      .select(col("event_type"), col("day_ts"), col("n"), col("cusum"),
        (abs(col("cusum")) === col("mx")).cast("long").as("is_cp"))
      .orderBy(col("event_type"), col("day_ts"))
  }

  /** Longest lag computed by [[autocorrDaily]]. */
  val AcfMaxLag = 3

  /** Lag-1..[[AcfMaxLag]] autocorrelation of each type's daily-mean series:
    * the Pearson correlation between the series and its k-day-lagged self —
    * the "is this metric trending/periodic or white noise" diagnostic that
    * decides whether a forecast model is worth fitting.
    *
    * Determinism: daily means are rounded to 6dp and cast to
    * DECIMAL(18,6) — a 6dp-rounded double is within 1 ulp of its decimal
    * value, so the cast is exact and identical in both engines — and all
    * five Pearson moments are then exact decimal sums; the final r is one
    * double formula with the variance numerators clamped at 0 (the
    * [[anomalyZscore]] ulp lesson). Zero-variance series are excluded by
    * the > 0 guards, mirrored in the oracle.
    *
    * Shape at scale: the (type, day) aggregate does the data-sized work;
    * the lag windows and moment aggregation run on the calendar-bounded
    * series. All [[AcfMaxLag]] lags share ONE window sort (three `lag`
    * calls over the same spec), then explode into (lag, x, y) pairs. */
  def autocorrDaily(spark: SparkSession, dir: String,
      maxLag: Int = AcfMaxLag): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_ts"))
    val daily = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), Out.epochSec(col("ts")).as("sec"),
        col("value"))
      .groupBy(col("event_type"),
        ((col("sec") / CpDaySec).cast("long") * CpDaySec).as("day_ts"))
      .agg(round(Out.davg(col("value")), 6).cast("decimal(18,6)").as("x"))
    val lagged = (1 to maxLag).foldLeft(daily) { (df, k) =>
      df.withColumn(s"x$k", lag(col("x"), k).over(w))
    }
    val pairs = lagged.select(col("event_type"), col("x"),
        explode(array((1 to maxLag).map(k =>
          struct(lit(k.toLong).as("k"), col(s"x$k").as("y"))): _*)).as("p"))
      .select(col("event_type"), col("p.k").as("lag_d"), col("x"), col("p.y"))
      .where(col("y").isNotNull)
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val agg = pairs.groupBy(col("event_type"), col("lag_d"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    agg
      .withColumn("vx", d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
      .withColumn("vy", d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))
      .where(col("vx") > 0 && col("vy") > 0)
      .select(col("event_type"), col("lag_d"), col("n").as("n_pairs"),
        round((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(greatest(col("vx"), lit(0.0))) *
            sqrt(greatest(col("vy"), lit(0.0)))), 6).as("acf"))
      .orderBy(col("event_type"), col("lag_d"))
  }

  /** Theil–Sen robust trend per event type: the MEDIAN of all pairwise
    * slopes between daily means — the 29.3%-breakdown-point alternative to
    * [[graft.ops.StatsQueries.trendOls]] (one wild day barely moves it,
    * where OLS chases it). The estimator is O(days²) BY DEFINITION, which
    * is exactly why it runs on the daily AGGREGATE: the corpus collapses
    * to ≤ |types|·horizon rows first (one partial-agg shuffle), and the
    * pair join explodes metadata, never events. A year-scale horizon is
    * ~66 k pairs per type; a longer lookback caps the window before
    * pairing (the documented knob), not the pair join.
    *
    * Determinism: daily means ride [[Out.davg]] rounded to 6 dp and
    * carried as DECIMAL(18,6) (exact pair differences); each slope is one
    * double division of exact inputs; the median is the same
    * interpolation `percentile` ≡ `quantile_cont` parity the quantile
    * queries pin. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .select(col("event_type"),
        (Out.epochSec(col("ts")) / CpDaySec).cast("long").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(round(Out.davg(col("value")), 6).cast("decimal(18,6)").as("y"))
    val a = daily.select(col("event_type"), col("day").as("d1"), col("y").as("y1"))
    val b = daily.select(col("event_type"), col("day").as("d2"), col("y").as("y2"))
    val slopes = a.join(b, Seq("event_type"))
      .where(col("d1") < col("d2"))
      .select(col("event_type"),
        ((col("y2") - col("y1")).cast("double") /
          (col("d2") - col("d1")).cast("double")).as("slope"))
    val nd = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    slopes.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 9).as("theilsen_slope"))
      .join(broadcast(nd), Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("theilsen_slope"))
      .orderBy(col("event_type"))
  }

  /** Weekly quantile trend per event type: exact p50/p90 of `value` for
    * each week with the week-over-week p50 delta — the ROBUST monitoring
    * series ([[wowChange]] tracks the mean, which one outlier burst can
    * drag; the median series only moves when the distribution's middle
    * does). One (type, week) percentile sort-agg + a lag window over the
    * weekly metadata grain. */
  def weeklyQuantileTrend(spark: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .groupBy(col("event_type"),
        ((Out.epochSec(col("ts")) / WowWeekSec).cast("long") * WowWeekSec)
          .as("wk"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"))
      .withColumn("p50_delta",
        round(col("p50") - lag(col("p50"), 1).over(byType), 4))
      .select(col("event_type"), col("wk"), col("n"), col("p50"),
        col("p90"), col("p50_delta"))
      .orderBy(col("event_type"), col("wk"))
  }

  /** Additive seasonal decomposition of the per-type daily mean series —
    * STL-lite: trend = centered 7-day moving average over present days;
    * weekday seasonal = the mean detrended value of each day-of-week;
    * residual = what neither explains. [[seasonalProfile]] reports raw
    * hour-of-day averages; this separates trend from weekly seasonality so
    * anomalies are judged against "what this weekday normally does once
    * drift is removed" — the decomposition monitoring pipelines baseline
    * on.
    *
    * Shape at scale: the daily series is metadata (one row per (type,
    * day)); every window and rollup runs on that grain, partitioned by
    * type. Determinism: daily means are 6dp-rounded decimal-exact values;
    * the trend divides a DECIMAL(18,6) frame sum by the frame count; the
    * seasonal averages go through DECIMAL(38,12); weekday is pure integer
    * arithmetic (epoch day 0 = Thursday ⇒ weekday = (day+4) mod 7,
    * 0 = Monday). */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .groupBy(col("event_type"),
        (Out.epochSec(col("ts")) / CpDaySec).cast("long").as("day"))
      .agg(round(Out.davg(col("value")), 6).as("x"))
    val ma = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val trended = daily
      .withColumn("trend",
        round(sum(col("x").cast("decimal(18,6)")).over(ma).cast("double") /
          count(lit(1)).over(ma), 6))
      .withColumn("detr", col("x") - col("trend"))
      .withColumn("weekday", pmod(col("day") + 4, lit(7)))
    val seasonal = trended.groupBy(col("event_type"), col("weekday"))
      .agg(round(sum(col("detr").cast("decimal(38,12)")).cast("double") /
        count(lit(1)), 6).as("seasonal"))
    trended.join(seasonal, Seq("event_type", "weekday"))
      .select(col("event_type"), (col("day") * CpDaySec).as("day"),
        col("weekday"), col("x"), col("trend"), col("seasonal"),
        round(col("detr") - col("seasonal"), 6).as("residual"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Week length for [[wowChange]], seconds (epoch-anchored 7-day bins). */
  val WowWeekSec = 604800L

  /** Week-over-week change report per event type: weekly volume and exact
    * decimal value sum, each with its percent change vs the type's PREVIOUS
    * week — the default growth dashboard cut. Gaps matter: lag is over the
    * weeks that EXIST, so a silent week shows up as a missing row (and the
    * next present week compares against the last present one — the
    * convention dashboards actually use; `q_gap_fill` is the densifier if
    * calendar-adjacent comparison is wanted).
    *
    * Determinism: weekly sums are exact decimals; each pct change is ONE
    * double division of two decimal-derived doubles, rounded 6dp; weeks
    * with a zero/NULL previous sum emit NULL pct (never a division blowup
    * — the divide-by-zero class from the round-5 hardening). */
  def wowChange(spark: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    val weekly = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .groupBy(col("event_type"),
        ((Out.epochSec(col("ts")) / WowWeekSec).cast("long") * WowWeekSec)
          .as("wk"))
      .agg(count(lit(1)).as("n"), Out.dsum(col("value")).as("sum_value"))
    weekly
      .withColumn("prev_n", lag(col("n"), 1).over(byType))
      .withColumn("prev_sum", lag(col("sum_value"), 1).over(byType))
      .select(col("event_type"), col("wk"), col("n"),
        round(col("sum_value"), 4).as("sum_value"),
        when(col("prev_n") > 0,
          round((col("n") - col("prev_n")).cast("double") /
            col("prev_n").cast("double"), 6)).as("n_wow"),
        when(col("prev_sum") =!= 0.0,
          round((col("sum_value") - col("prev_sum")) / col("prev_sum"), 6))
          .as("sum_wow"))
      .orderBy(col("event_type"), col("wk"))
  }

  /** Time-weighted average (TWAP) of `value` per user: each reading holds
    * until the user's next event, so its weight is that holding duration —
    * the step-function integral ÷ covered span. The right average for
    * irregularly-sampled telemetry (a plain AVG over-weights bursts: 100
    * readings in one minute count 100×, even though they describe the same
    * minute a single reading describes elsewhere). The user's last reading
    * has no successor and bounds no interval, so it carries no weight.
    *
    * Shape at scale: one `user_id` window shuffle (lead), one grouped
    * partial agg — the [[interarrivalStats]] plan with a weighted measure.
    * value is a 2dp-clean double → DECIMAL(18,4) exact; duration is an
    * integer; the product sum is decimal-exact and order-independent, so
    * TWAP hash-matches at any parallelism. */
  def timeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"), Out.epochSec(col("ts")).as("sec"),
        col("event_id"), col("value").cast("decimal(18,4)").as("v"))
      .withColumn("dur", lead(col("sec"), 1).over(byUser) - col("sec"))
      .where(col("dur").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur")).as("span_sec"),
        sum(col("v") * col("dur")).as("vdur"))
      .filter(col("span_sec") > 0)
      .select(col("user_id"), col("n_intervals"), col("span_sec"),
        round(col("vdur").cast("double") / col("span_sec").cast("double"), 6)
          .as("twap"))
      .orderBy(col("user_id"))
  }

  /** Per-user inter-arrival (gap) profile: exact p50/p90/max of the
    * second-granularity gaps between consecutive events — the burstiness
    * fingerprint that separates steady telemetry from bursty interactive
    * traffic, and the data-driven way to pick a session gap threshold
    * (q_session_window hard-codes one; this measures what it should be).
    *
    * Shape at scale: ONE window shuffle on `user_id` (each user's history
    * sorts within its partition), gaps via lag, then a grouped sort-agg for
    * the exact percentiles — partition-local per key, the [[percentiles]]
    * regime. Integer gaps; percentile ≡ quantile_cont parity (interpolated
    * values are .0/.5 exactly representable doubles). */
  def interarrivalStats(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull)
      .select(col("user_id"), Out.epochSec(col("ts")).as("sec"), col("event_id"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(byUser))
      .where(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap, 0.5)"), 4).as("gap_p50"),
        round(expr("percentile(gap, 0.9)"), 4).as("gap_p90"),
        max(col("gap")).as("gap_max"))
      .orderBy(col("user_id"))
  }

  /** Transport-delay bound (s) and micro-batch length (s) for
    * [[lateArrival]]. Shared with the oracle SQL. */
  val LateMaxDelay = 180L
  val LateBatchSec = 300L

  /** Out-of-order arrival census — the data-driven way to size a streaming
    * watermark delay. The corpus is generation-ordered (event_id follows
    * ts exactly), so disorder is induced the way it arises in production:
    * per-event transport delay, here a deterministic 48-bit-hash jitter in
    * [0, [[LateMaxDelay]]). Arrivals are then replayed at micro-batch
    * granularity ([[LateBatchSec]]-second arrival buckets): the watermark
    * an event meets is the max event-time seen in all EARLIER batches, and
    * its lateness is `watermark − ts` (0 when it beats the watermark). The
    * banded census is the curve you read a `withWatermark` delay off.
    *
    * Shape at scale: NO row-level running max (a global arrival-ordered
    * window is a single sequential task — the anti-shape). Instead the
    * exact micro-batch decomposition a streaming engine uses: (1) one
    * partial-agg shuffle to per-batch max event-time (≤ #batches rows),
    * (2) the watermark recurrence as a running max over that metadata
    * series, (3) broadcast the batch→watermark table back onto the stream,
    * (4) partial-agg to the ≤5-row band census. Everything row-scale is
    * embarrassingly parallel. */
  def lateArrival(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_id").isNotNull)
      .select(col("event_id"), Out.epochSec(col("ts")).as("sec"))
      .withColumn("arrival",
        col("sec") + expr(TextQueries.hash48("cast(event_id as string)")) % LateMaxDelay)
      .withColumn("batch", expr(s"arrival div $LateBatchSec"))
    val wmByBatch = Window.orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wm = ev.groupBy(col("batch")).agg(max(col("sec")).as("batch_max"))
      .withColumn("wm", max(col("batch_max")).over(wmByBatch))
      .select(col("batch"), col("wm"))
    ev.join(broadcast(wm), Seq("batch"))
      .withColumn("late_sec", greatest(coalesce(col("wm"), lit(0L)) - col("sec"), lit(0L)))
      .withColumn("band",
        when(col("late_sec") === 0, lit("b0_ontime"))
          .when(col("late_sec") <= 30, lit("b1_le30s"))
          .when(col("late_sec") <= 60, lit("b2_le60s"))
          .when(col("late_sec") <= 120, lit("b3_le2m"))
          .otherwise(lit("b4_gt2m")))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_events"), max(col("late_sec")).as("max_late_sec"))
      .orderBy(col("band"))
  }

  /** Trailing-window length for [[burstDetect]] (days) and its σ multiplier.
    * Shared with the oracle SQL (interpolated, not duplicated). */
  val BurstWindow = 7
  val BurstSigma = 3.0

  /** σ multiplier for [[seasonalAnomaly]], shared with the oracle SQL. */
  val SeasonalZ = 2.5

  /** Seasonally-adjusted anomaly detection: events deviating more than
    * [[SeasonalZ]]·σ from the mean of their OWN (event_type, UTC-hour)
    * cell — the diurnal baseline [[q_seasonal_profile]] fingerprints. A
    * value normal at noon can be anomalous at 3 a.m.; [[anomalyZscore]]'s
    * per-user global mean cannot see that, this residual regime can.
    *
    * Shape at scale: the [[anomalyZscore]] two-pass — partial-agg shuffle
    * to the ≤ types×24-row cell stats (exact decimal power sums), stats
    * broadcast back onto the stream, flag filter in the scan stage. Cells
    * with n < 2 are excluded (sample σ undefined), mirroring the z-score
    * regime. */
  def seasonalAnomaly(spark: SparkSession, dir: String,
      threshold: Double = SeasonalZ): DataFrame = {
    val ev = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        hour(col("ts")).cast("long").as("hour_utc"), col("value"))
    val v = col("value").cast("decimal(18,4)")
    val stats = ev
      .select(col("event_type"), col("hour_utc"), v.as("v"))
      .groupBy(col("event_type"), col("hour_utc"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("v")).cast("double").as("s"),
        sum(col("v") * col("v")).cast("double").as("ss"))
      .where(col("n") >= 2)
      .select(col("event_type"), col("hour_utc"),
        (col("s") / col("n")).as("mean"),
        sqrt(greatest(col("n") * col("ss") - col("s") * col("s"), lit(0.0)) /
          (col("n") * (col("n") - 1.0))).as("std"))
    ev.join(stats, Seq("event_type", "hour_utc"))
      .where(abs(col("value") - col("mean")) > lit(threshold) * col("std"))
      .select(col("event_id"), col("event_type"), col("hour_utc"), col("value"),
        round((col("value") - col("mean")) / col("std"), 6).as("z"))
      .orderBy(col("event_id"))
  }

  /** Burst detection on daily event-type counts: flag days whose count
    * exceeds `trailing mean + 3σ` of the FULL preceding [[BurstWindow]]-day
    * frame (frame ends at 1 PRECEDING — the day under test never feeds its
    * own baseline, the [[mlFeatures]] leakage rule). The trailing-local
    * baseline is what separates this from [[anomalyZscore]]'s global-mean
    * regime: a slow trend never alarms here, a step does.
    *
    * Shape at scale: the event stream collapses to the (type, day) grain in
    * ONE partial-agg shuffle; every window after that runs over the
    * calendar-bounded day series (≤ types × days rows — metadata). Counts
    * are integers, so Σn and Σn² are exact BIGINTs and mean/σ are the same
    * double expression tree in both engines; days with an incomplete
    * trailing frame are excluded by the window-count predicate, not by row
    * position (robust to missing days). */
  def burstDetect(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_sec"))
      .rowsBetween(-BurstWindow, -1)
    val nD = lit(BurstWindow.toDouble)
    val daily = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        Out.epochSec(date_trunc("day", col("ts"))).as("day_sec"))
      .agg(count(lit(1)).as("n"))
    daily
      .withColumn("w_cnt", count(col("n")).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("ss", sum(col("n") * col("n")).over(w))
      .where(col("w_cnt") === BurstWindow)
      .withColumn("mean", col("s").cast("double") / nD)
      .withColumn("std",
        sqrt(greatest(
          (nD * col("ss").cast("double") - col("s").cast("double") * col("s").cast("double")),
          lit(0.0)) / (nD * (nD - 1.0))))
      .where(col("n").cast("double") > col("mean") + lit(BurstSigma) * col("std"))
      .select(col("event_type"), col("day_sec"), col("n"),
        round(col("mean"), 6).as("trail_mean"),
        round(col("std"), 6).as("trail_std"))
      .orderBy(col("event_type"), col("day_sec"))
  }
}
