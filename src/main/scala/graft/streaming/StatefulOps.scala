package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state beyond windowed aggregation —
  * `flatMapGroupsWithState`, the Structured Streaming surface the KSQL layer
  * of the reference cannot express (its tables are aggregates only).
  *
  * Operator: **per-sensor record highs.** Emit a row whenever a sensor
  * reports a temperature strictly above every reading it has ever reported —
  * the classic "alert on new extreme" monitor. State per key is ONE long (the
  * running max): bounded, tiny, and exactly what the state store is for —
  * unlike a windowed agg, the comparison spans the sensor's entire history,
  * which no finite window covers.
  *
  * Scale/determinism notes:
  *   - state is per-sensor and O(1); a million sensors cost megabytes;
  *   - arrival order within a micro-batch is not defined, so each batch's
  *     group iterator is sorted by (eventTime, messageId) before folding —
  *     deterministic given deterministic batch boundaries (and in batch mode,
  *     where the whole input is one group iterator, fully deterministic);
  *   - the same fold runs in batch for the batch-stream equivalence test
  *     (single "batch" == whole history; oracle helper lives in test sources).
  */
object StatefulOps {

  final case class Reading(id: String, messageId: String, eventTime: Timestamp,
      temperature: Long)
  final case class RecordHigh(id: String, messageId: String, eventTime: Timestamp,
      temperature: Long, prev_max: Long)

  /** Fold one key's (sorted) readings over the running max, emitting new
    * record highs. Shared verbatim by the streaming and batch paths.
    *
    * Memory bound: the iterator is buffered (`toSeq.sortBy`) because
    * micro-batch group iterators arrive unordered, so the working set is one
    * key's rows in ONE MICRO-BATCH — bounded by trigger size, the normal
    * stateful-streaming envelope. Under BATCH execution the group iterator is
    * a key's entire history, so the buffer grows with history length: run the
    * batch path only on bounded key histories (tests, backfills of capped
    * ranges), or pre-aggregate — persistent STATE is O(1) either way. */
  def foldKey(rows: Iterator[Reading], max0: Option[Long]): (Seq[RecordHigh], Long) = {
    var mx = max0.getOrElse(Long.MinValue)
    val out = Seq.newBuilder[RecordHigh]
    // temperature in the sort key: messageIds can collide across generator
    // threads (FIXTURES.md §1), so (time, id) alone would leave the order of
    // colliding rows — and thus prev_max attribution — nondeterministic.
    rows.toSeq.sortBy(r => (r.eventTime.getTime, r.messageId, r.temperature)).foreach { r =>
      if (r.temperature > mx) {
        out += RecordHigh(r.id, r.messageId, r.eventTime, r.temperature,
          if (mx == Long.MinValue) r.temperature else mx)
        mx = r.temperature
      }
    }
    (out.result(), mx)
  }

  /** Streaming (or batch) record-high detector over parsed sensor events
    * (columns id, messageId, eventTime, temperature — the
    * [[SensorPipeline.parse]] shape). Rows with a NULL event time are
    * DROPPED, not crashed on: `parse` is deliberately tolerant of malformed
    * JSON (the zero-sentinel contract) and leaves eventTime NULL for a
    * missing/unparseable timestamp — the same rows Spark's own event-time
    * operators (windows, watermarks) silently exclude. Without the filter,
    * one bad line would NPE the fold's sort and kill the whole query. */
  def recordHighs(parsed: DataFrame): Dataset[RecordHigh] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.select(col("id"), col("messageId"), col("eventTime"), col("temperature"))
      .filter(col("id").isNotNull && col("eventTime").isNotNull)
      .as[Reading]
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Reading], state: GroupState[Long]) => {
          val (out, mx) = foldKey(rows, state.getOption)
          if (mx != Long.MinValue) state.update(mx)
          out.iterator
        })
  }

  /** Streaming exact dedup on message identity. The reference's generator
    * REUSES messageId values across threads (mqttgen.py:32 — per-thread loop
    * counters with the same sensor ids), so an exactly-once downstream needs
    * this; the watermark bounds the dedup state: ids older than the horizon
    * are dropped from the store, which is what makes exact streaming dedup
    * viable at 100 TB (unbounded dedup state is not).
    *
    * In batch mode the same call degenerates to a plain `dropDuplicates` —
    * one shuffle on the keys — preserving batch-stream parity.
    *
    * `keys` defaults to the composite (messageId, sensor id): message
    * identity alone is enough for duplicate DELIVERIES (retransmits carry
    * identical payloads, so any survivor is the same row) but NOT
    * collision-safe for id REUSE across producers — the reference generator's
    * cross-thread counters can assign one messageId to two DIFFERENT readings
    * (mqttgen.py:32), and a single-column key would silently collapse those
    * distinct readings. The composite default keeps both contracts: duplicate
    * deliveries still dedup (all key fields identical), colliding producers
    * survive. A deployment wanting payload-level identity passes message-id +
    * payload hash. Rows with a NULL event time are dropped (the watermark
    * cannot bound their state). */
  /** Two-threshold (Schmitt-trigger) alarm band for [[hysteresisAlarms]]:
    * raise at ≥ [[AlarmHigh]], clear at ≤ [[AlarmLow]]. The gap between the
    * two is the hysteresis — a single threshold would flap an alert on
    * every noise crossing; the band means a sensor must genuinely recover
    * before it can alert again. Shared with the oracle SQL. */
  val AlarmHigh = 100L
  val AlarmLow = 30L

  final case class AlarmEvent(id: String, messageId: String, eventTime: Timestamp,
      temperature: Long, event: String)

  /** Fold one key's (sorted) readings through the two-threshold latch.
    * State is one Boolean (alarmed); a reading inside the band changes
    * nothing. Same buffering envelope and collision-safe sort key as
    * [[foldKey]]. */
  def alarmFold(rows: Iterator[Reading], alarmed0: Boolean,
      high: Long, low: Long): (Seq[AlarmEvent], Boolean) = {
    var alarmed = alarmed0
    val out = Seq.newBuilder[AlarmEvent]
    rows.toSeq.sortBy(r => (r.eventTime.getTime, r.messageId, r.temperature)).foreach { r =>
      if (!alarmed && r.temperature >= high) {
        alarmed = true
        out += AlarmEvent(r.id, r.messageId, r.eventTime, r.temperature, "ALERT")
      } else if (alarmed && r.temperature <= low) {
        alarmed = false
        out += AlarmEvent(r.id, r.messageId, r.eventTime, r.temperature, "CLEAR")
      }
    }
    (out.result(), alarmed)
  }

  /** Streaming (or batch) hysteresis alarm over parsed sensor events — the
    * alert-with-recovery monitor every IoT deployment runs in front of a
    * paging system: one ALERT when a sensor enters the hot band, one CLEAR
    * when it genuinely recovers, silence while it oscillates in between.
    * Windowed aggregation cannot express this (the latch state spans an
    * unbounded, data-dependent span of readings); per-key state is ONE
    * boolean, so a million sensors cost a megabyte of state store. Same
    * NULL-tolerance contract as [[recordHighs]]. */
  def hysteresisAlarms(parsed: DataFrame,
      high: Long = AlarmHigh, low: Long = AlarmLow): Dataset[AlarmEvent] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.select(col("id"), col("messageId"), col("eventTime"), col("temperature"))
      .filter(col("id").isNotNull && col("eventTime").isNotNull)
      .as[Reading]
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Reading], state: GroupState[Boolean]) => {
          val (out, alarmed) = alarmFold(rows, state.getOption.getOrElse(false), high, low)
          state.update(alarmed)
          out.iterator
        })
  }

  /** Tumbling-window width for [[windowRates]], seconds (shared with the
    * oracle SQL). */
  val RateWindowSec = 600L

  final case class WindowRate(id: String, wStart: Long, n: Long, delta: Long)

  /** Fold one key's readings into tumbling per-window counts, each carrying
    * the delta vs the key's PREVIOUS emitted window (state = that window's
    * count). Counting needs no intra-window order; windows emit in
    * ascending order so the delta chain is deterministic. */
  def rateFold(id: String, rows: Iterator[Reading], prevN0: Option[Long],
      windowSec: Long): (Seq[WindowRate], Option[Long]) = {
    var prevN = prevN0
    val out = Seq.newBuilder[WindowRate]
    rows.toSeq
      .groupBy(r => math.floorDiv(r.eventTime.getTime, 1000L * windowSec) * windowSec)
      .toSeq.sortBy(_._1)
      .foreach { case (w, rs) =>
        val n = rs.size.toLong
        out += WindowRate(id, w, n, n - prevN.getOrElse(0L))
        prevN = Some(n)
      }
    (out.result(), prevN)
  }

  /** Streaming (or batch) per-sensor window-rate monitor: tumbling
    * [[RateWindowSec]] message counts with the count CHANGE vs the sensor's
    * previous window — the "did this feed just go quiet / burst" signal a
    * transport-health dashboard keys on. A windowed agg gives the counts
    * but not the cross-window delta: that difference chain spans window
    * boundaries, which is per-key STATE (one long — the previous count).
    * Same NULL-tolerance contract as [[recordHighs]]; same single-drain
    * caveat (a window split across micro-batches emits per batch with
    * partial counts — the documented best-effort trade of every
    * history-fold in this file). */
  def windowRates(parsed: DataFrame,
      windowSec: Long = RateWindowSec): Dataset[WindowRate] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.select(col("id"), col("messageId"), col("eventTime"), col("temperature"))
      .filter(col("id").isNotNull && col("eventTime").isNotNull)
      .as[Reading]
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: String, rows: Iterator[Reading], state: GroupState[Long]) => {
          val (out, pn) = rateFold(id, rows, state.getOption, windowSec)
          pn.foreach(state.update)
          out.iterator
        })
  }

  def dedupByMessage(parsed: DataFrame, watermark: String = "10 minutes",
      keys: Seq[String] = Seq("messageId", "id")): DataFrame =
    if (parsed.isStreaming)
      parsed.filter(col("eventTime").isNotNull)
        .withWatermark("eventTime", watermark)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else parsed.filter(col("eventTime").isNotNull)
      .dropDuplicates(keys)

  /** Stream-static join: enrich the event stream with a dimension table (the
    * sensor → site mapping a fleet would hold in a catalog). The static side
    * is broadcast per micro-batch — no state, no shuffle of the stream — the
    * 100 TB-safe enrichment shape. Works identically in batch. */
  def enrich(parsed: DataFrame, sites: DataFrame): DataFrame =
    parsed.join(org.apache.spark.sql.functions.broadcast(sites), Seq("id"), "left")

  /** Stream-stream inner join: correlate two independent feeds of the same
    * sensor fleet — each left reading matched with the right-feed readings of
    * the SAME sensor within ±60 s of event time.
    *
    * The two constraints that make this state-bounded (and thus viable on an
    * unbounded stream): watermarks on BOTH sides give Spark an eviction
    * horizon, and the time-range predicate bounds how long a row can still
    * find partners — together the state store holds only ~2 watermark-delays
    * of data per side. Inner-join matches emit eagerly (no watermark wait);
    * the same expression works in batch, which the spec exploits for
    * equivalence. Column prefixes keep the two sides' schemas disjoint.
    *
    * The effective watermark delay is `max(delaySec, rangeSec)`: a delay
    * shorter than the join range would let Spark evict a row's potential
    * partners before the range says they can no longer match, silently
    * dropping matches whenever the feed arrives across multiple micro-batches
    * (a single-batch drained replay masks this — review finding). Callers pay
    * for that correctness in state (~2 range-widths per side), which is the
    * honest price of a ±range interval join.
    *
    * Multi-batch completeness contract (spec: the throttled-drain test):
    * with the derived delay, a LOG-ORDERED feed — event-time-ordered batch
    * arrival, the Kafka-partition/file-log shape — produces the complete
    * join at any batch granularity. Under arrival DISORDER the usual Spark
    * lateness rule applies: rows more than the watermark delay behind the
    * max seen time are dropped, so a transport with bounded disorder sizes
    * `delaySec` to that bound (the delay is then disorder tolerance AND
    * eviction horizon — the max() keeps both covered). */
  /** `joinType` supports "inner" (matches emit eagerly) and "left_outer":
    * the production "detect the missing partner" variant — an unmatched left
    * row emits with NULL right columns once the watermark proves no partner
    * can still arrive (its ±range window has closed). Outer rows therefore
    * emit on watermark ADVANCE, not on arrival — in a drained replay that is
    * the final no-data batch; on a live stream it is one watermark delay
    * behind the data, the inherent latency price of proving absence. */
  def correlateFeeds(left: DataFrame, right: DataFrame,
      delaySec: Int = 120, rangeSec: Int = 60,
      joinType: String = "inner"): DataFrame = {
    val wmSec = math.max(delaySec, rangeSec)
    def side(df: DataFrame, p: String): DataFrame = {
      // NULL event times cannot participate in a time-range join and would
      // pin watermark state — drop them explicitly on both sides
      val nn = df.filter(col("eventTime").isNotNull)
      val wm = if (nn.isStreaming) nn.withWatermark("eventTime", s"$wmSec seconds") else nn
      wm.select(col("id").as(s"${p}_id"), col("messageId").as(s"${p}_mid"),
        col("eventTime").as(s"${p}_time"), col("temperature").as(s"${p}_temp"))
    }
    side(left, "l").join(side(right, "r"),
      expr(s"""l_id = r_id AND
              r_time BETWEEN l_time - INTERVAL $rangeSec SECONDS
                         AND l_time + INTERVAL $rangeSec SECONDS"""),
      joinType)
      // coalesce: on matches l_id = r_id (join key), so this is l_id for
      // inner/left rows; it keeps the id populated on a FULL join's
      // right-unmatched rows, where the l side is all-NULL
      .select(coalesce(col("l_id"), col("r_id")).as("id"),
        col("l_mid"), col("r_mid"),
        col("l_temp"), col("r_temp"),
        (unix_micros(col("r_time")) - unix_micros(col("l_time"))).as("dt_us"))
  }

  final case class FunnelEvent(userId: Long, eventType: String, t: Long,
      eventId: Long)
  final case class FunnelUpdate(userId: Long, stage: Int, stageType: String,
      t: Long)

  /** Streaming funnel tracker — the live counterpart of
    * [[graft.ops.EventQueries.funnel]]: per user, emit a [[FunnelUpdate]] the
    * moment a stage first completes (stage i = first event of type
    * `stages(i)` strictly after stage i-1's time). State per key is the
    * prefix of completed stage times — at most `stages.length` longs, the
    * bounded-state contract that makes this viable on an unbounded stream
    * (a live conversion dashboard reads the update stream; the batch funnel
    * is the backfill of the same answer).
    *
    * Each micro-batch's group iterator is sorted by (t, eventId) before the
    * fold, so within a batch the fold finds the true min-qualifying event
    * per stage. Cross-batch the fold is exact when ingestion preserves
    * per-user event-time order across batch boundaries (ordered replay /
    * log-ordered sources); an out-of-order late event that would have
    * lowered an already-emitted stage time is ignored, not retracted —
    * the standard streaming-funnel trade, called out here rather than
    * hidden. In BATCH execution the whole history is one sorted iterator,
    * so the result equals [[graft.ops.EventQueries.funnel]] exactly
    * (spec-checked both ways). */
  def funnelUpdates(events: DataFrame,
      stages: Seq[String]): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stageArr = stages.toIndexedSeq
    events.select(col("user_id").as("userId"), col("event_type").as("eventType"),
        col("t"), col("event_id").as("eventId"))
      // FunnelEvent's fields are primitive Longs: a NULL in any of them
      // would kill the query at deserialization — drop incomplete rows
      // (exactly the rows the batch funnel's min()/joins ignore)
      .filter(col("userId").isNotNull && col("eventType").isNotNull &&
        col("t").isNotNull && col("eventId").isNotNull)
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[Seq[Long]]) => {
          var times = state.getOption.getOrElse(Seq.empty[Long])
          val out = Seq.newBuilder[FunnelUpdate]
          rows.toSeq.sortBy(r => (r.t, r.eventId)).foreach { r =>
            if (times.length < stageArr.length &&
                r.eventType == stageArr(times.length) &&
                (times.isEmpty || r.t > times.last)) {
              out += FunnelUpdate(uid, times.length, r.eventType, r.t)
              times = times :+ r.t
            }
          }
          if (times.nonEmpty) state.update(times)
          out.result().iterator
        })
  }
}
