package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.Tables

/** Batch queries over the `events` table — the stand-in for the reference's
  * sensor stream (mapping per FIXTURES.md: event_id↔messageId, user_id↔sensor
  * id, ts↔timestamp, value↔temperature, props.k↔humidity).
  *
  * Each query mirrors an operator of the reference pipeline
  * (reference/src/main/java/stream/StreamProcessor.java and the KSQL layer in
  * reference/README.md:72-107) as a declarative Spark plan: filters and
  * projections reach the parquet scan via Catalyst pushdown, aggregations get
  * partial (map-side) combine from HashAggregateExec automatically, and the
  * event-time windows are the same `window()` construct Structured Streaming
  * uses — so the streaming half (graft.streaming) shares these plans verbatim.
  */
object EventQueries {

  /** Typed view of events with the JSON `props.k` extracted once.
    *
    * JSON parse mirrors the reference's Gson map
    * (reference/src/main/java/stream/StreamProcessor.java:87-92) via
    * `from_json` — schema-driven, codegen-friendly, no UDF.
    */
  def parsed(t: Tables): DataFrame = {
    val kSchema = StructType(Seq(StructField("k", LongType)))
    t.events.withColumn("k", from_json(col("props"), kSchema).getField("k"))
  }

  /** R4 validity filter (reference StreamProcessor.java:61-78), thresholds
    * adapted to the events domain (value<50 ∨ k<50), preserving both quirks:
    * the both-zero "empty measurement" drop (zero is the null sentinel, see
    * SURVEY.md §1.3 — nulls normalized to 0 first) and the OR (not AND)
    * range predicate. */
  def validityPredicate(value: Column, k: Column): Column = {
    val v = coalesce(value, lit(0.0))
    val h = coalesce(k, lit(0L))
    !(v === 0.0 && h === 0L) && (v < 50.0 || h < 50L)
  }

  def filterValid(spark: SparkSession, dir: String): DataFrame = {
    val e = parsed(Tables(spark, dir))
    e.filter(validityPredicate(col("value"), col("k")))
      .select(col("event_id"), col("user_id"), col("value"), col("k"))
      .orderBy(col("event_id"))
  }

  /** R2: schema-driven JSON parse of the props payload. */
  def parseJsonProps(spark: SparkSession, dir: String): DataFrame =
    parsed(Tables(spark, dir))
      .select(col("event_id"), col("k"))
      .orderBy(col("event_id"))

  /** R6: the Mongo sink's flatten/rename projection
    * (reference/src/main/java/stream/mongodb/MongoDBRawData.java:38-42). */
  def flattenProject(spark: SparkSession, dir: String): DataFrame =
    parsed(Tables(spark, dir)).select(
      col("event_id").as("message_id"),
      col("user_id").as("sensor_id"),
      Out.epochSec(col("ts")).as("ts_sec"),
      col("value").as("temperature"),
      col("k").as("humidity")
    ).orderBy(col("message_id"))

  /** K4+K5: 1-minute tumbling MAX per key (reference/README.md:87-92). */
  def tumblingMax(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(window(col("ts"), "1 minute").as("w"), col("user_id"))
      .agg(max(col("value")).as("max_value"))
      .select(col("user_id"), Out.epochSec(col("w.start")).as("w_start"), col("max_value"))
      .orderBy(col("user_id"), col("w_start"))

  /** K6: same window, MIN + AVG (+count) per key (reference/README.md:72). */
  def tumblingMinAvg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(window(col("ts"), "1 minute").as("w"), col("user_id"))
      .agg(
        min(col("value")).as("min_value"),
        Out.davg(col("value")).as("avg_value"),
        count(lit(1)).as("n")
      )
      .select(col("user_id"), Out.epochSec(col("w.start")).as("w_start"),
        col("min_value"), col("avg_value"), col("n"))
      .orderBy(col("user_id"), col("w_start"))

  /** K5/K6 without the time window: grouped aggregate per event_type. */
  def groupedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        Out.dsum(col("value")).as("sum_value")
      )
      .orderBy(col("event_type"))

  /** Sliding window (size 10 min, slide 5 min): each event lands in exactly
    * two windows. Extension beyond the reference's tumbling-only windows.
    *
    * Spelled as explicit slide arithmetic (`explode` over the two window
    * starts) rather than `window(ts, "10 minutes", "5 minutes")`: the plans
    * are identical in shape (expand → partial agg → one shuffle), but the
    * built-in's expanded start/end expressions are large enough that their
    * whole-stage-codegen compile dominates a cold run (~1.9 s vs ~0.4 s
    * measured at sf0.1 — pure JIT cost, identical steady state). */
  def slidingCount(spark: SparkSession, dir: String): DataFrame = {
    val sec = unix_timestamp(col("ts"))
    val slideStart = (sec.cast("long") / 300L).cast("long") * 300L
    Tables(spark, dir).events
      .select(col("event_type"), col("value"),
        explode(array(slideStart, slideStart - 300L)).as("w_start"))
      .groupBy(col("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("max_value"))
      .select(col("event_type"), col("w_start"), col("n"), col("max_value"))
      .orderBy(col("event_type"), col("w_start"))
  }

  /** Session windows (30-minute gap) per user: the third streaming window
    * kind. Batch plan uses the same `session_window` construct Structured
    * Streaming supports. */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), Out.dsum(col("value")).as("sum_value"))
      .select(col("user_id"), Out.epochSec(col("w.start")).as("session_start"),
        col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Exact deduplication, deterministic variant: first event (min event_id)
    * per (user_id, event_type). `dropDuplicates` keeps an arbitrary row —
    * fine for streams, wrong for an oracle check — so the library's
    * oracle-facing dedup pins the survivor with a window rank, which scales
    * as one shuffle on the dedup key (no global sort). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("event_id"))
    Tables(spark, dir).events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** As-of join (backward): for each purchase, the latest prior CLICK of the
    * same user, within no time bound (the quote-to-trade shape of an as-of
    * join — the match side is a chosen event type, not "any event"). Spark
    * has no built-in as-of join; the scalable formulation is a union +
    * per-key ordered carry-forward (one shuffle on the key, no
    * range-explosion), not a correlated subquery. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir).events
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("side", lit(1))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("side", lit(0))
    // Union, order by (ts, side) within user: side=0 (click) sorts before the
    // purchase at identical ts, so last_value over the preceding frame picks
    // the latest click with click.ts <= purchase.ts.
    val unioned = purchases.unionByName(clicks)
      .withColumn("click_id", when(col("side") === 0, col("event_id")))
      .withColumn("click_ts", when(col("side") === 0, col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        Out.epochSec(col("ts")).as("purchase_ts"),
        col("last_click_id").as("click_id"),
        Out.epochSec(col("last_click_ts")).as("click_ts"))
      .orderBy(col("purchase_id"))
  }

  /** Staged conversion funnel view → click → purchase: per user, the first
    * view, the first click STRICTLY AFTER that view, and the first purchase
    * strictly after that click (nulls where the user never advances) — the
    * classic product-analytics operator, and the event-sequence shape a
    * behavioral-data pipeline labels sessions with.
    *
    * Shape at scale: each stage is a map-side-combinable `min` partial agg
    * keyed by user_id after a pushed-down event_type filter, and every join
    * is keyed by user_id too — one consistent shuffle key end to end, with
    * per-stage cardinality shrinking monotonically (stage N+1 only joins
    * users who reached stage N). No windows over the raw stream, no
    * cross-stage sort. An n-stage funnel is this chain n-1 steps long —
    * `stages` is the library knob (output column per stage, `t_<stage>`);
    * the registry runs the default view → click → purchase.
    *
    * Trade note: this spelling scans the (stage-filtered) event stream once
    * per stage. When n_stages × scan cost dominates — long funnels over raw
    * 100 TB events — the one-shuffle alternative is the same fold as
    * [[graft.streaming.StatefulOps.funnelUpdates]] executed in BATCH mode
    * (groupByKey(user) + sorted in-memory fold; gate-equivalent by spec),
    * at the price of buffering each user's history in one task. */
  def funnel(spark: SparkSession, dir: String,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"), Out.epochSec(col("ts")).as("t"))
    val head = e.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("t")).as(s"t_${stages.head}"))
    stages.tail.foldLeft((head, s"t_${stages.head}")) {
      case ((acc, prevCol), st) =>
        val next = e.filter(col("event_type") === st)
          .join(acc.select(col("user_id"), col(prevCol)), Seq("user_id"))
          .filter(col("t") > col(prevCol))
          .groupBy(col("user_id")).agg(min(col("t")).as(s"t_$st"))
        (acc.join(next, Seq("user_id"), "left"), s"t_$st")
    }._1.orderBy(col("user_id"))
  }

  /** Staleness bound (s) for [[asofTolerance]], shared with the oracle. */
  val AsofToleranceSec = 600L

  /** As-of join with a STALENESS BOUND — the feature-store contract:
    * each purchase gets the latest prior click only if it is at most
    * [[AsofToleranceSec]] old, else NULL (serving a feature staler than
    * the tolerance is worse than serving none: the model trained on fresh
    * joins). Emits the gap and an `is_fresh` flag so the miss rate is
    * monitorable from the same output.
    *
    * Shape at scale: identical to [[asofJoin]] — ONE union + ONE window
    * shuffle on the entity key; the tolerance is a post-window projection,
    * so bounding staleness costs nothing over the unbounded join. */
  def asofTolerance(spark: SparkSession, dir: String,
      toleranceSec: Long = AsofToleranceSec): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir).events
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("side", lit(1))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("side", lit(0))
    val unioned = purchases.unionByName(clicks)
      .withColumn("click_id", when(col("side") === 0, col("event_id")))
      .withColumn("click_sec", when(col("side") === 0, Out.epochSec(col("ts"))))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("last_click_sec", last(col("click_sec"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("gap_sec", Out.epochSec(col("ts")) - col("last_click_sec"))
      .withColumn("fresh", col("gap_sec").isNotNull && col("gap_sec") <= toleranceSec)
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        Out.epochSec(col("ts")).as("purchase_ts"),
        when(col("fresh"), col("last_click_id")).as("click_id"),
        when(col("fresh"), col("gap_sec")).as("gap_sec"),
        when(col("fresh"), 1L).otherwise(0L).as("is_fresh"))
      .orderBy(col("purchase_id"))
  }

  /** Funnel window (s) for [[windowFunnel]], shared with the oracle SQL. */
  val FunnelWindowSec = 3600L

  /** Strict in-window funnel (the ClickHouse `windowFunnel` shape): stages
    * must complete in order AND all within [[FunnelWindowSec]] of the FIRST
    * stage — `level` is how deep the user got before the window closed.
    * [[funnel]] answers "did they ever convert"; this answers "did they
    * convert in one sitting", which is what a conversion-rate SLA or a
    * real-time nudge triggers on.
    *
    * Shape at scale: same staged per-stage-min economics as [[funnel]]
    * (pushed stage filters, every join/agg on the one `user_id` key, so
    * AQE coalesces the chain onto a single exchange family); the deadline
    * `t_head + window` rides the accumulator as a projected column. Stage
    * count is a library arg; work is stages × one filtered pass. */
  def windowFunnel(spark: SparkSession, dir: String,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      windowSec: Long = FunnelWindowSec): DataFrame = {
    require(stages.nonEmpty, "windowFunnel needs at least one stage")
    val e = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"), Out.epochSec(col("ts")).as("t"))
    val head = e.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("t")).as(s"t_${stages.head}"))
      .withColumn("deadline", col(s"t_${stages.head}") + windowSec)
    val full = stages.tail.foldLeft((head, s"t_${stages.head}")) {
      case ((acc, prevCol), st) =>
        val next = e.filter(col("event_type") === st)
          .join(acc.select(col("user_id"), col(prevCol), col("deadline")),
            Seq("user_id"))
          .filter(col("t") > col(prevCol) && col("t") <= col("deadline"))
          .groupBy(col("user_id")).agg(min(col("t")).as(s"t_$st"))
        (acc.join(next, Seq("user_id"), "left"), s"t_$st")
    }._1
    full
      .withColumn("level",
        stages.map(st => when(col(s"t_$st").isNotNull, 1L).otherwise(0L))
          .reduce(_ + _))
      .select(col("user_id") +: stages.map(st => col(s"t_$st")) :+ col("level"): _*)
      .orderBy(col("user_id"))
  }

  /** Funnel drop-off report: per stage, how many users reached it and the
    * conversion rates vs the previous stage and the funnel top — the
    * one-page summary a growth dashboard renders from [[funnel]]'s per-user
    * detail. Counting non-null stage timestamps collapses the per-user
    * table to ONE row of counts (a partial agg); the stage rows and the
    * lag/first ratios are then a 3-row metadata window. */
  def funnelConversion(spark: SparkSession, dir: String,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = funnel(spark, dir, stages)
    val cs = stages.map(st => count(col(s"t_$st")).as(s"n_$st"))
    val counts = f.agg(cs.head, cs.tail: _*)
    val rows = counts.select(explode(array(
      stages.zipWithIndex.map { case (st, i) =>
        struct(lit(i.toLong).as("stage"), lit(st).as("stage_type"),
          col(s"n_$st").as("n_reached"))
      }: _*)).as("s"))
      .select(col("s.stage"), col("s.stage_type"), col("s.n_reached"))
    val w = Window.orderBy(col("stage"))
    rows
      .withColumn("prev", lag(col("n_reached"), 1).over(w))
      .withColumn("top", first(col("n_reached")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("stage"), col("stage_type"), col("n_reached"),
        when(col("prev") > 0,
          round(col("n_reached").cast("double") / col("prev"), 6))
          .as("conv_prev"),
        when(col("top") > 0,
          round(col("n_reached").cast("double") / col("top"), 6))
          .as("conv_top"))
      .orderBy(col("stage"))
  }

  /** Tolerance for [[asofNearest]], seconds (±10 minutes). */
  val AsofNearestTolSec = 600L

  /** Nearest-in-time join: each purchase matched to the user's CLOSEST
    * click within ±[[AsofNearestTolSec]] — either direction, unlike
    * [[asofJoin]]'s backward-only "latest click at or before". This is the
    * sensor-fusion/alignment variant ("pair each reading with the nearest
    * reference sample"), where a later click can be the better match.
    * Purchases with no click in the window survive with NULL match
    * columns — absence is data here, not a join failure.
    *
    * Shape at scale: the [[StatsQueries.rangeJoinBinned]] discipline — both
    * sides bucketed by tolerance-width time bins, the click side replicated
    * to its ±1 neighbor bins, equi-join on (user, bin) so every true
    * candidate shares a bucket and the θ-predicate only filters within
    * buckets. The per-purchase winner is row_number ≤ 1 on the total order
    * (|Δt|, click_id) — WindowGroupLimit prunes map-side. */
  def asofNearest(spark: SparkSession, dir: String,
      tolSec: Long = AsofNearestTolSec): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("event_id"),
        graft.ops.Out.epochSec(col("ts")).as("sec"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("sec").as("tp"))
      .withColumn("bin", floor(col("tp") / tolSec).cast("long"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("sec").as("tc"))
      .select(col("user_id"), col("click_id"), col("tc"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("db"))
      .withColumn("bin", (floor(col("tc") / tolSec) + col("db")).cast("long"))
      .select(col("user_id"), col("bin"), col("click_id"), col("tc"))
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(abs(col("tc") - col("tp")), col("click_id"))
    val best = purchases.join(clicks, Seq("user_id", "bin"))
      .filter(abs(col("tc") - col("tp")) <= tolSec)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("purchase_id"), col("click_id"), col("tc"))
    purchases.select(col("user_id"), col("purchase_id"), col("tp"))
      .join(best, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("tp"),
        col("click_id"), col("tc"), (col("tc") - col("tp")).as("lag_sec"))
      .orderBy(col("purchase_id"))
  }

  /** Staleness threshold for [[freshnessSla]], seconds (one day). */
  val FreshnessSlaSec = 86400L

  /** Per-stream freshness SLA report: each event type's latest event time,
    * its lag behind the corpus frontier (the freshest event anywhere), the
    * trailing-day volume, and a stale flag at [[FreshnessSlaSec]] — the
    * ingestion-health dashboard every pipeline keeps in front of its
    * on-call. "Now" is the corpus frontier, not the wall clock, so the
    * report is deterministic and replayable.
    *
    * Shape at scale: two partial-agg passes (per-type and the 1-row global
    * frontier, broadcast back) plus one filtered re-aggregation for the
    * trailing-day counts — no windows, no data-sized join sides. */
  def freshnessSla(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .where(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), graft.ops.Out.epochSec(col("ts")).as("sec"))
    val frontier = e.agg(max(col("sec")).as("gmax"))
    val perType = e.groupBy(col("event_type"))
      .agg(max(col("sec")).as("last_sec"), count(lit(1)).as("n_total"))
    val recent = e.crossJoin(broadcast(frontier))
      .filter(col("sec") > col("gmax") - FreshnessSlaSec)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_last_day"))
    perType.crossJoin(broadcast(frontier))
      .join(recent, Seq("event_type"), "left")
      .select(col("event_type"), col("last_sec"),
        (col("gmax") - col("last_sec")).as("lag_sec"),
        col("n_total"), coalesce(col("n_last_day"), lit(0L)).as("n_last_day"),
        when(col("gmax") - col("last_sec") > FreshnessSlaSec, 1L).otherwise(0L)
          .as("stale"))
      .orderBy(col("event_type"))
  }
}
