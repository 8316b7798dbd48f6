package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** User-behavior analytics over the event stream and order history — the
  * product-analytics layer (cohort retention, event-sequence transition
  * models, concurrency sweeps, RFM segmentation) that sits on top of the
  * reference's windowed-aggregate surface (SURVEY.md §2.2 K4–K6). Every
  * query here is a one-or-two-shuffle plan on the grouping keys it names;
  * none materializes per-user history in a single task except where the
  * relation is explicitly metadata-scale (one row per customer).
  *
  * Determinism follows [[Out]]: epoch-second BIGINT time buckets, exact
  * decimal money sums, unique-key ORDER BY, double formulas written as the
  * same expression tree the oracle evaluates.
  */
object BehaviorQueries {

  /** Seconds per cohort bucket (ISO-agnostic 7-day buckets anchored at the
    * epoch). Shared with the oracle SQL. */
  val WeekSec = 604800L

  /** Classic cohort-retention matrix: users are assigned to the 7-day
    * bucket of their first event; each cell counts the distinct users of
    * cohort `cohort_week` still active `week_offset` weeks later.
    *
    * Shape at scale: (1) per-user first-week — a partial-aggregated shuffle
    * on `user_id` producing a one-row-per-user table; (2) equi-join back to
    * the events on the same key (AQE broadcasts the cohort side when small,
    * shuffles on `user_id` otherwise — the join key equals the aggregation
    * key so the exchange is reused); (3) the matrix itself is a
    * cohort×offset grid — thousands of cells regardless of corpus size, so
    * the final `countDistinct` shuffle carries (cell, user) pairs already
    * combined map-side. No window functions, no per-user task-local state. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        (Out.epochSec(col("ts")) / WeekSec).cast("long").as("wk"))
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cwk"))
    ev.join(first, Seq("user_id"))
      .groupBy(col("cwk"), (col("wk") - col("cwk")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("active_users"))
      .select((col("cwk") * WeekSec).as("cohort_week"),
        col("week_offset"), col("active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next event type | current event type), from consecutive pairs in
    * each user's (ts, event_id)-ordered history.
    *
    * Shape at scale: ONE window shuffle on `user_id` (each user's sequence
    * sorts within its partition — per-user history, not the corpus, is the
    * task-local unit), then a partial-aggregated shuffle on the (from, to)
    * pair — k² cells for k event types, metadata-scale. The probability
    * normalization is a window over that k²-row table, not over the events.
    *
    * Determinism: the sequence order key is (ts, event_id) — event_id is
    * unique, so LEAD is well-defined under ties; counts are exact and the
    * probability is one double division rounded at 6dp on both engines. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(seq).as("to_type"))
      .where(col("to_type").isNotNull)
    val cells = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    cells
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("from_type")))
            .cast("double"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Synthetic interval duration for the concurrency sweep, seconds. Each
    * event is treated as a 5-minute activity interval [ts, ts+300). */
  val ConcurrencyDurSec = 300L

  /** Seconds per sweep partition (calendar day). Shared with the oracle. */
  val DaySec = 86400L

  /** Peak concurrency per (event_type, day): the maximum number of
    * simultaneously-open activity intervals, where each event opens a
    * [ts, ts + 300 s) interval, plus the earliest instant the peak is
    * reached.
    *
    * The naive sweep (sort ALL endpoints, running ±1 sum) is a single
    * global window — unusable at scale. Because interval duration is
    * BOUNDED (300 s ≪ 1 day), each interval overlaps at most one day
    * boundary, so it can be split into per-day segments: a crossing
    * interval contributes its tail to the next day's sweep as a segment
    * starting AT the boundary. Every (event_type, day) sweep is then
    * independent — the window partitions by (event_type, day) and each
    * partition holds one day of one type's endpoints, embarrassingly
    * parallel and size-bounded. This boundary-split trick is the standard
    * way to distribute interval sweeps over any bounded-duration workload.
    *
    * Endpoint convention: intervals are half-open, so at equal timestamps
    * closes apply before opens. Netting +1/−1 per distinct instant
    * (groupBy before the running sum) realizes exactly that convention:
    * the close-first intermediate value is always ≤ the netted value, so
    * the netted running maximum equals the close-before-open maximum. */
  def concurrencyPeak(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), Out.epochSec(col("ts")).as("s"))
      .withColumn("e", col("s") + ConcurrencyDurSec)
      .withColumn("b", (col("s") / DaySec).cast("long") * DaySec + DaySec)
    // split each [s,e) at its day boundary b: head segment always exists,
    // tail segment only when the interval crosses into the next day
    val segs = ev.select(col("event_type"),
      explode(filter(array(
        struct(col("s").as("t0"), least(col("e"), col("b")).as("t1")),
        struct(col("b").as("t0"), col("e").as("t1"))),
        s => s("t1") > s("t0"))).as("seg"))
      .select(col("event_type"),
        col("seg.t0").as("t0"), col("seg.t1").as("t1"))
    val deltas = segs
      .select(col("event_type"),
        explode(array(
          struct(col("t0").as("t"), lit(1L).as("d")),
          struct(col("t1").as("t"), lit(-1L).as("d")))).as("p"))
      .select(col("event_type"), col("p.t").as("t"), col("p.d").as("d"),
        (col("p.t") / DaySec).cast("long").as("day"))
      .groupBy(col("event_type"), col("day"), col("t"))
      .agg(sum(col("d")).as("net"))
    val sweep = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = deltas
      .select(col("event_type"), col("day"), col("t"),
        sum(col("net")).over(sweep).as("open"))
      .withColumn("peak", max(col("open")).over(
        Window.partitionBy(col("event_type"), col("day"))))
    run.where(col("open") === col("peak"))
      .groupBy(col("event_type"), (col("day") * DaySec).as("day"))
      .agg(max(col("peak")).as("peak"), min(col("t")).as("peak_t"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Number of RFM quantile bands per dimension. Shared with the oracle. */
  val RfmBands = 5

  /** RFM customer segmentation over the order history: each customer's
    * Recency (days from their last order to the corpus's last order),
    * Frequency (order count) and Monetary (exact-decimal revenue sum) are
    * banded into quintiles; output is one row per occupied `r-f-m` segment
    * with its population and average metrics — the classic CRM cut.
    *
    * Shape at scale: the per-customer relation is ONE ROW PER CUSTOMER —
    * metadata-scale next to the order corpus (10⁷ rows vs 10¹¹). The three
    * global NTILE windows rank that relation, not the orders; this is the
    * same deliberate single-partition trade [[RelationalQueries.ntilePercent]]
    * documents, applied to a table 4 orders of magnitude smaller than the
    * fact table. The corpus max date is a one-row aggregate broadcast into
    * the scan (scalar subquery), not a driver collect.
    *
    * Determinism: NTILE order keys carry `c` (custkey, unique) as the tie
    * break; Monetary stays DECIMAL until the segment average so neither
    * engine's partial-sum order can move a double. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir).orders
      .where(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey").as("c"), Out.epochSec(col("o_orderdate")).as("d"),
        col("o_totalprice").cast(Out.SumDecimal).as("v"))
    val refDate = orders.agg(max(col("d")).as("ref"))
    val cust = orders.groupBy(col("c"))
      .agg(max(col("d")).as("last_d"), count(lit(1)).as("freq"),
        sum(col("v")).as("mon"))
      .crossJoin(broadcast(refDate))
      .select(col("c"),
        ((col("ref") - col("last_d")) / DaySec).cast("long").as("rec_days"),
        col("freq"), col("mon"))
    def band(key: String) = ntile(RfmBands)
      .over(Window.orderBy(col(key), col("c"))).cast("long")
    val banded = cust.select(col("c"), col("rec_days"), col("freq"), col("mon"),
      band("rec_days").as("r_q"), band("freq").as("f_q"), band("mon").as("m_q"))
    banded
      .groupBy(concat_ws("-", col("r_q"), col("f_q"), col("m_q")).as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("rec_days")).cast("double") / count(lit(1)), 6)
          .as("avg_rec_days"),
        round(sum(col("freq")).cast("double") / count(lit(1)), 6).as("avg_freq"),
        round(sum(col("mon")).cast("double") / count(lit(1)), 4).as("avg_monetary"))
      .orderBy(col("segment"))
  }

  /** Attribution lookback window (seconds) for [[attributionLastTouch]]. */
  val AttribWindowSec = 604800L

  /** Last-touch marketing attribution: each purchase is credited to the
    * SAME user's most recent click within [[AttribWindowSec]] (else
    * organic), rolled up per purchase day — the conversion-credit query
    * every growth dashboard runs, and the per-conversion as-of join shape.
    *
    * Shape at scale: both event slices are pushed-filter scans; the only
    * shuffle is the user-key equi-join, and the per-purchase last click is
    * a `max` partial agg on the purchase's unique event id — never a
    * window over the event stream. Per-user click×purchase pair volume is
    * bounded by per-user activity density; a corpus with pathological
    * single-user densities routes through the binned-range spelling
    * ([[StatsQueries.rangeJoinBinned]]'s ±bin trick) — same plan shape,
    * bin key added to the join.
    *
    * Determinism: times are epoch-second BIGINTs; the attributed flag and
    * lag are integer arithmetic; the mean lag rides the decimal [[Out]]
    * contract. */
  def attributionLastTouch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Out.epochSec(col("ts")).as("t"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("t").as("tp"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("t").as("tc"))
    // the window predicate lives ON the join (a WHERE would drop purchases
    // whose user clicked only OUTSIDE the window instead of counting them
    // organic — same placement rule as Q13's zero-bucket)
    val attributed = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") &&
          col("c.tc") <= col("p.tp") &&
          col("c.tc") > col("p.tp") - AttribWindowSec,
        "left")
      .groupBy(col("pid"), col("tp"))
      .agg(max(col("tc")).as("last_click"))
    attributed
      .groupBy((col("tp") - pmod(col("tp"), lit(86400L))).as("day_sec"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("last_click").isNotNull, 1L).otherwise(0L))
          .as("n_attributed"),
        sum(when(col("last_click").isNull, 1L).otherwise(0L)).as("n_organic"),
        round(Out.davg(when(col("last_click").isNotNull,
          col("tp") - col("last_click"))), 6).as("avg_lag_sec"))
      .orderBy(col("day_sec"))
  }

  /** Engagement inequality per event type: the Gini coefficient of
    * per-user event volume (0 = everyone equally active, →1 = one user is
    * the whole stream) with the top-decile volume share — the
    * concentration cut behind "is this feature carried by a tiny power
    * clique?". Uses the exact rank formula G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx)
    * over volumes sorted ascending with user_id tiebreak: every moment is
    * an INTEGER sum (LONG is ample at this corpus; a 100 TB run lifts the
    * rank-weighted sum to DECIMAL(38,0), same plan) and only the final
    * ratio is a double.
    *
    * Shape at scale: one user-grain partial agg, a per-type rank window
    * over the user summary (the documented ntile-family metadata trade),
    * one type-grain rollup. */
  def engagementGini(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables(spark, dir).events
      .where(col("user_id").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
    val rank = Window.partitionBy(col("event_type"))
      .orderBy(col("x"), col("user_id"))
    val decile = Window.partitionBy(col("event_type"))
      .orderBy(col("x").desc, col("user_id"))
    users
      .withColumn("i", row_number().over(rank).cast("long"))
      .withColumn("top_rn", row_number().over(decile).cast("long"))
      .withColumn("n_tot",
        count(lit(1)).over(Window.partitionBy(col("event_type"))).cast("long"))
      .withColumn("top_x",
        when(col("top_rn") * 10 <= col("n_tot"), col("x")).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("n_events"),
        sum(col("i") * col("x")).as("ix"),
        sum(col("top_x")).as("top_decile_events"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        round((lit(2.0) * col("ix").cast("double") -
          (col("n_users") + 1).cast("double") * col("n_events").cast("double")) /
          (col("n_users").cast("double") * col("n_events").cast("double")), 6)
          .as("gini"),
        round(col("top_decile_events").cast("double") / col("n_events"), 6)
          .as("top_decile_share"))
      .orderBy(col("event_type"))
  }

  /** Cohort LTV curve: per signup-cohort week × weeks-since-signup, the
    * purchase volume and value plus the CUMULATIVE value — the lifetime-
    * value triangle ([[retentionCohorts]] counts who comes back; this
    * measures what they're worth as it accrues). Only offsets with
    * purchases emit rows (the cumulative carries across gaps).
    *
    * Shape at scale: per-user first week (one `user_id` partial agg),
    * equi-join back on the same key, one (cohort, offset) partial agg, and
    * a cumulative window over the cohort×offset TRIANGLE — metadata. Value
    * sums stay DECIMAL through the window (order-independent), cast out
    * once. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("value"),
        (Out.epochSec(col("ts")) / WeekSec).cast("long").as("wk"))
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cwk"))
    val cells = ev.filter(col("event_type") === "purchase" &&
        col("value").isNotNull)
      .join(first, Seq("user_id"))
      .groupBy(col("cwk"), (col("wk") - col("cwk")).as("week_offset"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(Out.SumDecimal)).as("revdec"))
    val cum = Window.partitionBy(col("cwk")).orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cumdec", sum(col("revdec")).over(cum))
      .select((col("cwk") * WeekSec).as("cohort_week"), col("week_offset"),
        col("n_purchases"),
        round(col("revdec").cast("double"), 4).as("wk_value"),
        round(col("cumdec").cast("double"), 4).as("cum_value"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Staleness horizon (seconds) after which a user counts as churned. */
  val ChurnHorizonSec = 7L * 86400L

  /** Churn-risk segmentation: users quartiled by lifetime activity volume,
    * each quartile's churn rate — where "churned" = no event within
    * [[ChurnHorizonSec]] of the corpus frontier (the deterministic "now",
    * as in [[graft.ops.EventQueries.freshnessSla]]). The cut every
    * retention review starts from: are we losing the heavy users or the
    * drive-bys?
    *
    * Shape at scale: one user-grain partial agg, a 1-row broadcast
    * frontier, an ntile over the user summary (the documented
    * metadata-window trade of the RFM/ntile family), and a 4-row rollup. */
  def churnRisk(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), Out.epochSec(col("ts")).as("sec"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("sec")).as("last_sec"))
    val frontier = users.agg(max(col("last_sec")).as("gmax"))
    users.crossJoin(broadcast(frontier))
      .withColumn("activity_q",
        ntile(4).over(Window.orderBy(col("n_events"), col("user_id")))
          .cast("long"))
      .withColumn("churned",
        when(col("gmax") - col("last_sec") > ChurnHorizonSec, 1L).otherwise(0L))
      .groupBy(col("activity_q"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("churned")).as("n_churned"),
        round(Out.davg(col("n_events")), 6).as("avg_events"))
      .withColumn("churn_rate",
        round(col("n_churned").cast("double") / col("n_users"), 6))
      .select(col("activity_q"), col("n_users"), col("n_churned"),
        col("churn_rate"), col("avg_events"))
      .orderBy(col("activity_q"))
  }

  /** Per-user lifespan profile: first/last activity, inclusive active-day
    * span, event volume, and the per-day rate — the per-entity summary a
    * retention model or LTV cut starts from. Integer span arithmetic;
    * the rate divides by the INCLUSIVE day count (span//day + 1 ≥ 1), so
    * single-day users are well-defined without a guard. One partial-agg
    * shuffle on `user_id`. */
  def userLifespan(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), Out.epochSec(col("ts")).as("sec"))
      .groupBy(col("user_id"))
      .agg(min(col("sec")).as("first_sec"), max(col("sec")).as("last_sec"),
        count(lit(1)).as("n_events"))
      .withColumn("days_inclusive",
        ((col("last_sec") - col("first_sec")) / DaySec).cast("long") + 1)
      .withColumn("events_per_day",
        round(col("n_events").cast("double") / col("days_inclusive"), 6))
      .select(col("user_id"), col("first_sec"), col("last_sec"),
        col("days_inclusive"), col("n_events"), col("events_per_day"))
      .orderBy(col("user_id"))

  /** Trailing window (days) for [[rollingDau]]'s smoothed series. */
  val DauWindowDays = 7

  /** Daily active users with a 7-day trailing average — the canonical
    * product-health series. Daily DAU is a distinct-count per calendar day;
    * the trailing mean smooths weekday seasonality. Distinct counts do NOT
    * sum across days (the same user appears in many), so the rolling
    * figure is the average OF the daily DAU values — the standard
    * dashboard definition — computed with a window over the daily grain,
    * which is METADATA (one row per day).
    *
    * Shape at scale: one (day, user) dedup shuffle partial-agged map-side,
    * one count per day, then the metadata window. */
  def rollingDau(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select((Out.epochSec(col("ts")) / DaySec).cast("long").as("day"),
        col("user_id"))
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val trail = Window.orderBy(col("day"))
      .rowsBetween(-(DauWindowDays - 1), Window.currentRow)
    daily
      .withColumn("n_days", count(lit(1)).over(trail))
      .withColumn("dau_7d_avg",
        round(sum(col("dau")).over(trail).cast("double") / col("n_days"), 6))
      .select((col("day") * DaySec).as("day"), col("dau"),
        col("n_days"), col("dau_7d_avg"))
      .orderBy(col("day"))
  }

  /** Per-(user, day) interval-union coverage: total seconds covered by the
    * union of the user's [ts, ts+300 s) activity intervals, with the busy
    * fraction of the day. The dual of [[concurrencyPeak]] — that query asks
    * "how many intervals are open at the worst instant", this one asks "how
    * much of the day is covered at all" (the utilization metric billing and
    * capacity models want). Overlapping intervals must count once, so a
    * plain SUM of durations is wrong; the sweep subtracts overlap exactly.
    *
    * Shape at scale: identical to the concurrency sweep — bounded-duration
    * intervals split at day boundaries, so every (user, day) sweep is an
    * independent, size-bounded window partition; one explode + one partial
    * agg + one window shuffle, all keyed (user, day). The per-day event
    * count rides the same keys, so AQE reuses the exchange for its join.
    *
    * Determinism: all-integer endpoint arithmetic; coverage sums integers;
    * only the final busy fraction is a double (one division, 6 dp). */
  def intervalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), Out.epochSec(col("ts")).as("s"))
      .withColumn("e", col("s") + ConcurrencyDurSec)
      .withColumn("b", (col("s") / DaySec).cast("long") * DaySec + DaySec)
    // day-boundary split as in concurrencyPeak; each segment carries ITS day
    // (a head segment may close exactly at the boundary instant, which still
    // belongs to the head day's sweep)
    val segs = ev.select(col("user_id"),
        explode(filter(array(
          struct(col("s").as("t0"), least(col("e"), col("b")).as("t1")),
          struct(col("b").as("t0"), col("e").as("t1"))),
          s => s("t1") > s("t0"))).as("seg"))
      .select(col("user_id"),
        (col("seg.t0") / DaySec).cast("long").as("day"),
        col("seg.t0").as("t0"), col("seg.t1").as("t1"))
    val pts = segs
      .select(col("user_id"), col("day"),
        explode(array(
          struct(col("t0").as("t"), lit(1L).as("d")),
          struct(col("t1").as("t"), lit(-1L).as("d")))).as("p"))
      .groupBy(col("user_id"), col("day"), col("p.t").as("t"))
      .agg(sum(col("p.d")).as("net"))
    val sweep = Window.partitionBy(col("user_id"), col("day")).orderBy(col("t"))
    // covered = Σ gap-to-next-point while at least one interval is open; the
    // final point of each partition always has open = 0 (every segment closes
    // within its day), so the NULL lead never passes the filter
    val covered = pts
      .select(col("user_id"), col("day"),
        sum(col("net")).over(sweep.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("open"),
        (lead(col("t"), 1).over(sweep) - col("t")).as("gap"))
      .where(col("open") > 0 && col("gap").isNotNull)
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("gap")).as("covered_sec"))
    val starts = ev
      .groupBy(col("user_id"), (col("s") / DaySec).cast("long").as("day"))
      .agg(count(lit(1)).as("n_starts"))
    // LEFT join: a day can be covered ONLY by an interval's tail crossing
    // midnight — it has coverage but zero starts, and must still report
    covered.join(starts, Seq("user_id", "day"), "left")
      .select(col("user_id"), (col("day") * DaySec).as("day"),
        coalesce(col("n_starts"), lit(0L)).as("n_starts"), col("covered_sec"),
        round(col("covered_sec").cast("double") / DaySec, 6).as("busy_frac"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Cumulative distinct-user growth curve: per day, how many users were
    * seen for the FIRST time, and the running total of distinct users to
    * date — the audience-growth chart every product dashboard opens with.
    *
    * Shape at scale: the naive spelling (per-day `COUNT(DISTINCT user)` over
    * an expanding prefix) recomputes a growing distinct union per day —
    * quadratic in days, and each day's distinct is a full shuffle. This
    * spelling does ONE distinct-style shuffle total: first-seen day per user
    * (`min(day)` partial agg on `user_id`), a partial-agg rollup of that to
    * per-day new-user counts, then the running sum over the calendar-bounded
    * day series — a metadata window (≤ days rows, one partition is fine
    * because the frame input is the rollup, never the event stream). */
  def runningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        (Out.epochSec(col("ts")) / DaySec).cast("long").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val byDay = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firstSeen
      .groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(byDay))
      .select((col("day") * DaySec).as("day"), col("new_users"), col("cum_users"))
      .orderBy(col("day"))
  }

  /** Conversion threshold for [[abLift]] — purchases-per-user sits around
    * 13 on this corpus shape, so ≥ 14 splits the population meaningfully
    * (a "high-value user" definition; ≥ 1 would be ~100% and degenerate).
    * Shared with the oracle SQL. */
  val AbConvThreshold = 14L

  /** A/B experiment readout: users hash-split into two deterministic arms
    * (MD5 parity — the [[q_leakage_split]] assignment discipline, so a
    * user's whole history lands in one arm), conversion = ≥1 purchase, and
    * the two-proportion pooled z statistic for the lift. The z value is
    * what an experimentation platform thresholds at ±1.96; emitting it
    * (not a verdict) keeps the query deterministic and the decision a
    * library-consumer concern.
    *
    * Shape at scale: one partial-agg shuffle to the user grain (arm
    * assignment is a codegen'd projection riding the aggregate), then a
    * 2-row rollup; the z formula runs on 2 rows of metadata joined as a
    * broadcast self-pair. Counts are exact integers; z is one shared
    * double expression tree. */
  def abLift(spark: SparkSession, dir: String,
      convThreshold: Long = AbConvThreshold): DataFrame = {
    val perUser = Tables(spark, dir).events
      .where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= convThreshold, 1L).otherwise(0L).as("conv"))
      .withColumn("arm",
        expr(s"${TextQueries.hash48("concat('ab:', cast(user_id as string))")} % 2"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      .withColumn("rate",
        round(col("n_conv").cast("double") / col("n_users").cast("double"), 6))
    val a = arms.where(col("arm") === 0)
      .select(col("n_users").as("n_a"), col("n_conv").as("conv_a"), col("rate").as("rate_a"))
    val b = arms.where(col("arm") === 1)
      .select(col("n_users").as("n_b"), col("n_conv").as("conv_b"), col("rate").as("rate_b"))
    a.crossJoin(broadcast(b))
      .withColumn("p_pool",
        (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"))
      .withColumn("se", sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
        (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double"))))
      // degenerate experiment (0% or 100% pooled) has no defined z — NULL,
      // not a crash, on any corpus
      .withColumn("z", when(col("se") > 0.0, round(
        (col("conv_a").cast("double") / col("n_a").cast("double") -
          col("conv_b").cast("double") / col("n_b").cast("double")) / col("se"),
        6)))
      .select(col("n_a"), col("conv_a"), col("rate_a"),
        col("n_b"), col("conv_b"), col("rate_b"), col("z"))
  }

  /** Return horizons (days after first activity) for [[retentionFlags]],
    * shared with the oracle SQL. */
  val RetentionHorizons: Seq[Long] = Seq(1L, 7L, 14L)

  /** Fixed-horizon retention rates (the D1/D7/D14 dashboard staple): of
    * all users, what fraction was active again exactly N days after their
    * first-seen day. [[retentionCohorts]] gives the full cohort × period
    * triangle; this is the one-row readout product reviews quote.
    *
    * Shape at scale: activity collapses to DISTINCT (user, day) in one
    * shuffle; first-seen is a `min` re-agg on the same key (exchange
    * reuse); the horizon flags are conditional MAXes in a per-user agg and
    * the output is a single global rollup row. No per-horizon pass, no
    * join against a calendar. */
  def retentionFlags(spark: SparkSession, dir: String,
      horizons: Seq[Long] = RetentionHorizons): DataFrame = {
    val act = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        (Out.epochSec(col("ts")) / DaySec).cast("long").as("day"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("f"))
    val flagCols = horizons.map(h =>
      max(when(col("day") === col("f") + h, 1L).otherwise(0L)).as(s"d$h"))
    val flags = act.join(first, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(flagCols.head, flagCols.tail: _*)
    val outCols = count(lit(1)).as("n_users") +:
      horizons.flatMap(h => Seq(
        sum(col(s"d$h")).as(s"d${h}_users"),
        round(sum(col(s"d$h")).cast("double") / count(lit(1)), 6)
          .as(s"d${h}_rate")))
    flags.agg(outCols.head, outCols.tail: _*)
  }

  /** Journey-prefix length and output size for [[sessionPaths]]. */
  val PathLen = 3
  val PathTopK = 20

  /** User-journey mining: each user's first [[PathLen]] event types as an
    * ordered path string, with the population count per path — the
    * "how do sessions start" view product analytics opens with, and the
    * empirical prior a next-event model is sanity-checked against.
    *
    * Shape at scale: ONE shuffle to the user grain; each user's history is
    * collected and sorted within its task (the [[EventQueries.funnel]]
    * trade note's buffering caveat applies — per-user volume is bounded in
    * any real event log, and only the first [[PathLen]] entries survive
    * the projection), then a partial-agg shuffle to the path census
    * (≤ types^len rows) and a TakeOrderedAndProject. Deterministic: the
    * sort key (sec, event_id) is unique. */
  def sessionPaths(spark: SparkSession, dir: String,
      len: Int = PathLen, k: Int = PathTopK): DataFrame =
    Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull)
      .select(col("user_id"), Out.epochSec(col("ts")).as("sec"),
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("sec"), col("event_id"), col("event_type")))).as("xs"))
      .select(expr(
        s"array_join(transform(slice(xs, 1, $len), x -> x.event_type), '>')")
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)

  /** Time-to-convert: for every user whose first purchase follows their
    * first view, the lag in seconds — the funnel-latency distribution
    * behind [[q_funnel]]'s stage counts (the counts say HOW MANY convert;
    * this says HOW LONG they take, which is what an attribution lookback
    * window is sized from).
    *
    * Shape at scale: per-stage pushed filters + ONE user-grain partial-agg
    * shuffle computing both firsts as conditional MINs in the same pass
    * (never a join of two per-stage aggregates); the lag is a projection.
    * Integer epoch seconds end to end. */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"), Out.epochSec(col("ts")).as("sec"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("sec"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("sec"))).as("first_purchase"))
      .where(col("first_view").isNotNull && col("first_purchase").isNotNull &&
        col("first_purchase") >= col("first_view"))
      .select(col("user_id"), col("first_view"), col("first_purchase"),
        (col("first_purchase") - col("first_view")).as("convert_sec"))
      .orderBy(col("user_id"))
}
