package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** The reference's end-to-end pipeline (R1–R5 + K1–K8) rebuilt as Structured
  * Streaming — same semantics, Spark-first shape.
  *
  * Reference chain (reference/src/main/java/stream/StreamProcessor.java:52-81
  * + reference/README.md:59-107): MQTT source → Gson parse → raw Mongo persist
  * (PRE-filter: invalid rows ARE stored) → validity filter → Kafka JSON sink →
  * KSQL 1-minute tumbling MAX/MIN/AVG per sensor id → Mongo via Connect.
  *
  * Spark mapping:
  *   - transport: the reference's MQTT specifics are transport, not query
  *     semantics (SURVEY.md §7.4). The pipeline takes any streaming DataFrame
  *     of JSON `value` strings — file source here (replay/tests), Kafka in
  *     production (`readStream.format("kafka")`), both byte-identical from
  *     [[parse]] onward. A custom DSv2 MicroBatchStream over an MQTT client
  *     would slot in the same seam; out of scope offline.
  *   - the reference's dangling side-effect maps (Flink runs them; Spark is
  *     lazy) become two explicit streaming sinks sharing one source.
  *   - per-record KafkaProducer (StreamProcessor.java:118) is replaced by
  *     Spark's pooled sink — the cautionary tale SURVEY.md §7.6 flags.
  *   - KSQL's table state becomes a watermarked windowed aggregation: Spark's
  *     state store gives exactly-once for the agg, strictly stronger than the
  *     reference's checkpoint-free at-most-once.
  *
  * Every transform is defined once on an untyped DataFrame and works in BOTH
  * batch and streaming (Structured Streaming's unified API) — the batch-stream
  * equivalence test in StreamingPipelineSpec leans on exactly this.
  */
object SensorPipeline {

  /** Wire schema of a sensor event (reference SensorEvent.java:4-9 +
    * README.md:76-83): stringly epoch-seconds timestamp, nested metrics. */
  val sensorSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("messageId", StringType),
    StructField("timestamp", StringType),
    StructField("metrics", StructType(Seq(
      StructField("temperature", LongType),
      StructField("humidity", LongType))))))

  /** R2: JSON → typed columns. Gson's missing-field defaults (SURVEY.md §1.3:
    * zero is the null sentinel — `metrics: {}` parses to temperature=0,
    * humidity=0) are reproduced with `coalesce`, because `from_json` yields
    * NULLs where Gson yields Java default 0s. Event time is the stringly
    * epoch-seconds field cast properly (the KSQL layer actually windowed on
    * Kafka record time; field time is the documented, strictly-more-correct
    * deviation — SURVEY.md §7.6). */
  def parse(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), sensorSchema).as("ev"))
      .select(
        col("ev.id").as("id"),
        col("ev.messageId").as("messageId"),
        col("ev.timestamp").as("timestamp"),
        coalesce(col("ev.metrics.temperature"), lit(0L)).as("temperature"),
        coalesce(col("ev.metrics.humidity"), lit(0L)).as("humidity"))
      // timestamp_seconds: direct epoch→timestamp arithmetic. The previous
      // to_timestamp(from_unixtime(...)) spelling round-tripped through a
      // LOCAL-time string — lossy in DST-ambiguous hours under a non-UTC
      // session timezone, and a per-row format+parse on the hot path.
      .withColumn("eventTime", timestamp_seconds(col("timestamp").cast("long")))

  /** R4 validity predicate, exact reference semantics
    * (StreamProcessor.java:61-78): drop the both-zero "empty measurement",
    * else keep iff temperature<50 OR humidity<100 — OR, not AND: a record
    * with temp=60 ∧ hum=90 PASSES (encoded in the spec's truth table). */
  def isValid(temperature: Column, humidity: Column): Column =
    !(temperature === 0L && humidity === 0L) &&
      (temperature < 50L || humidity < 100L)

  /** R6: the raw sink's flatten/rename (MongoDBRawData.java:38-42). */
  def flatten(df: DataFrame): DataFrame =
    df.select(
      col("messageId").as("_messageId"),
      col("id").as("sensorId"),
      col("timestamp"),
      col("temperature"),
      col("humidity"))

  /** R5: re-serialize for the Kafka topic — (key, value) JSON shape
    * (StreamProcessor.java:110-131). Works against the real Kafka sink or any
    * test sink unchanged. */
  def kafkaShape(df: DataFrame): DataFrame =
    df.select(
      col("id").as("key"),
      to_json(struct(col("id"), col("messageId"), col("timestamp"),
        struct(col("temperature"), col("humidity")).as("metrics"))).as("value"))

  /** R5's PRODUCTION writer — the real `format("kafka")` streaming sink,
    * fully configured but NOT started (starting needs the
    * spark-sql-kafka connector jar plus a broker; neither exists in this
    * sandbox). The seam is the whole point: production code calls
    * `kafkaWriter(filtered, servers, topic).start()` and nothing else
    * changes — the (key, value) wire shape is [[kafkaShape]], the same
    * frame the parquet stand-in sink persists, and FormatsSpec drives
    * `.start()` far enough to prove the format string reaches Spark's
    * data-source resolver (and plan-checks the sink node when a connector
    * is present). Kafka's sink accepts STRING or BINARY key/value — ours
    * are STRING. */
  def kafkaWriter(filtered: DataFrame, bootstrapServers: String, topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    kafkaShape(filtered).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** K4–K6: 1-minute tumbling MAX/MIN/AVG(+count) per sensor id
    * (README.md:72,87-92). `withWatermark` bounds state for append-mode
    * streaming (the late-data policy the reference never declared —
    * SURVEY.md §7.6); the identical plan runs in batch where the watermark is
    * a no-op. avg decomposes into exact sum/count at output time. */
  def windowedAgg(parsed: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val wm = if (parsed.isStreaming) parsed.withWatermark("eventTime", watermark) else parsed
    wm.groupBy(window(col("eventTime"), "1 minute").as("w"), col("id"))
      .agg(
        max(col("temperature")).as("max_temperature"),
        min(col("temperature")).as("min_temperature"),
        (sum(col("temperature")).cast("double") / count(lit(1))).as("avg_temperature"),
        count(lit(1)).as("n"))
      .select(col("id"), col("w.start").as("w_start"),
        col("max_temperature"), col("min_temperature"),
        col("avg_temperature"), col("n"))
  }

  /** Output directories of a [[replay]] run. */
  final case class ReplayOut(raw: String, filtered: String, agg: String)

  /** State-store partition count for the stateful replays (watermarked aggs,
    * session windows, dedup, stream-stream join, flatMapGroupsWithState).
    * Unset → [[DefaultStatePartitions]]. */
  val StatePartitionsConf = "spark.graft.replay.statePartitions"

  /** Stateful-op partitioning is a STATE-SIZING knob, not a compute-
    * parallelism knob: `spark.sql.shuffle.partitions` at first-batch time is
    * baked into the checkpoint as the state-store count, and every store
    * pays file create + delta write + fsync PER MICRO-BATCH even when empty
    * (a stream-stream join keeps 4 stores per partition — measured on this
    * box: the join replay's empty finalization batch alone cost 3.6 s at 32
    * partitions vs 0.8 s at 8, and the whole drain 10 s vs 5 s; numbers in
    * BASELINE.md). Size it to key cardinality × per-batch volume: the replay
    * feeds carry ~1.5 k keys, where 8 partitions keep every core busy long
    * before state-commit overhead dominates. A production deployment at real
    * scale sets the conf explicitly (state partitions are fixed at query
    * birth — repartitioning state needs offline state rewrite, so size for
    * peak). */
  val DefaultStatePartitions = 8

  /** The other side of the crossover, measured at 100× in the round-9
    * probe (BASELINE.md round-9 table): once batches carry ~300 k rows,
    * per-partition state VOLUME dominates commit-count overhead and 32
    * partitions beat 8 by 1.2–2.9× (`q_stream_sessions` 50.8 → 17.6 s at
    * 10 M feed rows), while at ≤1 M rows 8 still wins by 2–4×. */
  val ScaledStatePartitions = 32

  /** Estimated feed rows above which the auto default flips 8 → 32. The
    * measured bracket is [1 M → 8 wins, 10 M → 32 wins]; 2 M splits it
    * conservatively (mis-picking 8 slightly past the crossover costs far
    * less than 32 far below it). */
  val AutoStateRowThreshold = 2000000L

  /** ~bytes per staged sensor-JSON line — only used to turn feed size into
    * an order-of-magnitude row estimate; a 2× error cannot cross the
    * measured bracket. */
  private val ApproxFeedBytesPerRow = 150L

  /** Estimated feed rows above which a BIG-WINDOW-STATE replay (one that
    * declares `bigWindowState` — currently the sliding-window and
    * session-window aggs) flips the state store to RocksDB.
    *
    * Round-17, measured at 100× feed volume (10.5 M events): the default
    * heap-backed store DIED on the sliding replay — the within-drain state
    * peak (every window of the corpus is live until the watermark advances
    * at batch END) filled the 8 g heap into a GC death spiral (670 s of GC
    * in one 717 s stage, ~0 CPU progress) that took the SparkContext down;
    * the session replay survived at 2,597 summed GC-seconds. RocksDB holds
    * that state off-heap: sliding FAILED → 98.8 s, sessions 48.3 → 39.0 s.
    * Every OTHER replay measured FASTER on the heap store at the same
    * scale (joins 1.6–6.4× — four stores' per-batch RocksDB maintenance;
    * tumbling aggs ~1.1–2.7×, their per-(window,sensor) state being far
    * smaller than the sliding family's), so the flip is PER-REPLAY and
    * feed-gated, not global — the round-9 "flip the provider when state
    * outgrows executor memory, not before" doctrine, now with the measured
    * crossover. 5 M splits the [1 M fine → 10.5 M fatal] bracket the same
    * conservative way [[AutoStateRowThreshold]] does. */
  val RocksDbFeedRowThreshold = 5000000L

  /** Heap-death guard for the big-window-state replays: past
    * [[RocksDbFeedRowThreshold]] estimated feed rows, scope the state-store
    * provider to RocksDB (bundled with Spark; off-heap state) for the
    * query started inside `body`. Same set/restore seam as
    * [[withStatePartitions]] — the conf is read once at query START. */
  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  /** Auto-size state partitions from the replay feed's on-disk volume when
    * `spark.graft.replay.statePartitions` is unset: the round-9 100× probe
    * showed the right value is a function of STATE size, and the feed is
    * the best zero-cost proxy the replay has at query birth (state
    * partitions are baked into the checkpoint — they must be chosen before
    * the first batch). An explicit conf always wins; production sets it
    * from expected key cardinality × volume. */
  def autoStatePartitions(feedDir: String): Int =
    if (feedRowEstimate(feedDir) > AutoStateRowThreshold) ScaledStatePartitions
    else DefaultStatePartitions

  /** Order-of-magnitude feed row estimate from on-disk volume (0 when the
    * dir is null/unreadable — every consumer treats that as "small"). */
  private def feedRowEstimate(feedDir: String): Long =
    if (feedDir == null) 0L
    else try {
      var bytes = 0L
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(feedDir))
      try {
        val it = stream.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (java.nio.file.Files.isRegularFile(p)) bytes += java.nio.file.Files.size(p)
        }
      } finally stream.close()
      bytes / ApproxFeedBytesPerRow
    } catch { case _: Throwable => 0L }

  /** Run `body` (which starts and drains a stateful streaming query) with
    * the session's shuffle-partition count temporarily set to the replay
    * state sizing — the explicit conf if set, else auto-sized from
    * `feedDir` ([[autoStatePartitions]]). The previous value is always
    * restored; batch queries in the same session are unaffected because
    * Spark reads the conf at query START only.
    *
    * Concurrency contract (round-17 ADVICE, same class as the removed
    * `Staged.viaParquet` buildConfs window): this is a set/restore window on
    * the SHARED session conf — a stateful streaming query started from
    * ANOTHER thread while `body` runs would silently adopt this replay's
    * partition count (and, past the RocksDB gate, its state-store
    * provider). Safe here because every driver of the replays (Verify,
    * Bench, the test suites, ScaleProbe) starts streaming queries strictly
    * sequentially from one thread; a concurrent harness must clone the
    * session (`spark.newSession()`) per replay instead. */
  def withStatePartitions[T](spark: SparkSession, feedDir: String = null,
      bigWindowState: Boolean = false)(body: => T): T = {
    // One directory walk serves both the partition sizing and the RocksDB
    // gate (round-17 ADVICE: the unset-conf path walked the feed dir twice).
    val feedRows = feedRowEstimate(feedDir)
    val n = spark.conf.getOption(StatePartitionsConf)
      .map(_.trim.toInt)
      .getOrElse(if (feedRows > AutoStateRowThreshold) ScaledStatePartitions
        else DefaultStatePartitions)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // Heap-death guard (round-17, see RocksDbFeedRowThreshold): a declared
    // big-window-state replay past the threshold runs on RocksDB. The
    // detection must compare VALUES, not presence — `conf.getOption` on a
    // conf with a built-in default returns the default, never None (the
    // first spelling checked isEmpty and silently never fired — caught by
    // a 100× re-run still dying on the heap store). A session that already
    // runs a NON-default provider (a RocksDB A/B via SPARK_GRAFT_CONF)
    // is left alone; an A/B that needs to pin the heap store on a big feed
    // sets [[NoRocksDbConf]].
    val flipProvider = bigWindowState &&
      spark.conf.get(ProviderConf).endsWith("HDFSBackedStateStoreProvider") &&
      !spark.conf.getOption(NoRocksDbConf).exists(v => v == "1" || v == "true") &&
      feedRows > RocksDbFeedRowThreshold
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    if (flipProvider) spark.conf.set(ProviderConf, RocksDbProvider)
    try body finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      if (flipProvider) spark.conf.unset(ProviderConf)
    }
  }

  /** A/B escape hatch: disables the [[withStatePartitions]] RocksDB
    * escalation so a measurement can pin the heap store on a big feed. */
  val NoRocksDbConf = "spark.graft.replay.noRocksDb"

  /** Replays JSON-line files through the full pipeline with three sinks:
    *
    *   1. `raw`    — R3/K7: every event, flattened, PRE-filter (invalid rows
    *                 are stored, reference README.md:44), parquet.
    *   2. `filtered` — R5: survivors in Kafka (key, value) shape, parquet
    *                 standing in for the topic.
    *   3. `agg`    — K8: watermarked 1-minute aggregates, append mode (only
    *                 watermark-finalized windows emit), parquet via the same
    *                 `foreachBatch` seam a Mongo/Connect-shaped sink uses.
    *
    * Three parquet `writeStream` sinks, on purpose: the streaming file sink's
    * `_spark_metadata` transaction log makes every sink EXACTLY-once across
    * micro-batch retries. (A round-2 rework briefly merged raw+filtered into
    * one `foreachBatch` with blind `mode("append")` writes to save a source
    * pass — review caught that as a correctness downgrade: a batch retried
    * between the two appends duplicates rows. A production Mongo-shaped sink
    * would keep `foreachBatch` but write idempotently — upsert keyed on
    * `_messageId` — which plain parquet appends cannot express.)
    *
    * `Trigger.AvailableNow` drains the input then stops — micro-batched like
    * production, bounded like a test. */
  /** K8's OTHER half — the continuously-updated table (round-2 VERDICT
    * missing #1/#2). The reference's `MAX_TABLE` is a KSQL *table*: every
    * incoming event UPSERTS its (sensor, window) row, and Kafka Connect
    * streams that changelog into Mongo keyed on the document id
    * (reference/README.md:96-107, MongoDBRawData.java:36-53) — a live
    * dashboard sees windows move while they are still open. Append mode
    * (the [[replay]] agg sink) only emits watermark-finalized windows; this
    * sink runs the same aggregate in `update` mode and applies each
    * micro-batch's changed rows as an idempotent keyed overwrite.
    *
    * The upsert stand-in (no Mongo offline) is bucketed copy-on-write MERGE
    * — exactly what an ACID table format does for a keyed MERGE on parquet:
    * keys hash into [[ChangelogBuckets]] partitions; each micro-batch
    * rewrites ONLY the buckets it touches (existing bucket rows minus the
    * batch's keys, union the batch, dynamic-partition overwrite). Work per
    * batch is O(affected buckets + batch), never O(table) and never a
    * partition directory per key (a partition-per-key layout was measured at
    * 8 min for 10⁵ keys on this box — directory churn, not data). Retrying a
    * batch re-merges rows that are already present and rewrites the same
    * buckets to identical content, so the sink is exactly-once under the
    * same fault model as the `_spark_metadata` file sinks (spec: a replayed
    * batch leaves the table byte-identical). Swapping in the reference's
    * real sink means replacing this ONE function with Mongo
    * `replaceOne(upsert)` on the same key — the contract (idempotent keyed
    * write of update-mode output) is the part that matters; the
    * copy-on-write amplification is the known price of upserts on immutable
    * files, which is why a long-lived production table would sit in an ACID
    * format with compaction rather than bare parquet. */
  // An alias, not a second constant: the merge logic lives in tables.Merge
  // and ITS sizing applies whenever the conf is unset — a diverging value
  // here would be silently ignored (review finding). Round-18: the unset
  // default is no longer a fixed 32 — mergeInto derives the creation count
  // from the first batch's key cardinality via Merge.autoBuckets (the
  // keys/50 k ChangelogProbe rule, automated).
  val ChangelogBuckets: Int = graft.tables.Merge.DefaultBuckets

  /** Production sizing knob for the changelog table: bucket count should
    * track key cardinality (buckets ≈ keys / 50 k keeps a bucket's rewrite
    * cost bounded as keys grow — see the ChangelogProbe measurements in
    * BASELINE.md; an unset conf applies that rule automatically from the
    * first batch via [[graft.tables.Merge.autoBuckets]]). The count used at table
    * CREATION is persisted in a `_graft_buckets` marker next to the data and
    * wins on every later batch — the bucket column is part of the on-disk
    * layout, so a different count on a replay run would hash keys into
    * different buckets and the left-anti merge (which only reads AFFECTED
    * buckets) would let an old copy of a key survive in an old-scheme bucket.
    * An explicit conf that disagrees with an existing table's marker fails
    * loudly (resizing requires a rebuild); pre-marker tables adopt the
    * current setting and get the marker written on their next batch. */
  val ChangelogBucketsConf = "spark.graft.changelog.buckets"

  /** One micro-batch of update-mode output into the keyed table: project to
    * the table schema and delegate to the engine's generic batch MERGE
    * ([[graft.tables.Merge.mergeInto]] — this sink was the original home of
    * that logic; it is now the shared upsert path for any keyed parquet
    * table). An unset conf defers to the table's persisted marker (or the
    * [[graft.tables.Merge.autoBuckets]] first-batch derivation on
    * creation); a set conf that disagrees with an existing layout fails
    * loudly inside mergeInto. */
  def upsertBatch(tablePath: String)(batch: DataFrame, batchId: Long): Unit =
    graft.tables.Merge.mergeInto(
      tablePath,
      batch.select(
        col("id"), col("w_start").cast("long").as("w_sec"),
        col("max_temperature"), col("min_temperature"),
        col("avg_temperature"), col("n")),
      keyCols = Seq("id", "w_sec"),
      requestedBuckets = batch.sparkSession.conf
        .getOption(ChangelogBucketsConf).map(_.trim.toInt))

  /** Replay `inDir` through parse → validity filter → windowed agg in UPDATE
    * mode, upserting each batch's changed windows into the keyed table at
    * `outBase/table` via [[upsertBatch]]. Returns the table path. The final
    * table state equals the batch aggregate over the whole input (update
    * mode re-emits a window every time it changes; the last write per key
    * wins), which is exactly what the DuckDB oracle for
    * `q_changelog_table` checks. */
  def replayChangelog(spark: SparkSession, inDir: String, outBase: String): String =
    withStatePartitions(spark, inDir) {
      val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir).toDF("value")
      val filtered = parse(raw).filter(isValid(col("temperature"), col("humidity")))
      val table = s"$outBase/table"
      val q = windowedAgg(filtered)
        .writeStream
        .outputMode("update")
        .foreachBatch(upsertBatch(table) _)
        .option("checkpointLocation", s"$outBase/_cp_changelog")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      table
    }

  /** Sliding-window geometry for [[slidingAgg]], seconds (10-minute windows
    * every 5 — each event lands in [[SlideWinSec]]/[[SlideStepSec]] = 2
    * overlapping windows). Shared with the oracle SQL by interpolation. */
  val SlideWinSec = 600L
  val SlideStepSec = 300L

  /** Sliding-window aggregate per sensor — the hopping-window variant of
    * [[windowedAgg]]: each event contributes to win/step overlapping
    * windows, the standard smoothing layer of a monitoring dashboard
    * (tumbling answers "this minute"; sliding answers "the last 10 minutes,
    * refreshed every 5").
    *
    * Shape at scale: Spark expands each row into its win/step window
    * assignments BEFORE the shuffle (a generated `explode`, factor 2 here),
    * then partial-aggregates per (window, id) exactly like the tumbling
    * plan — state per key is one window row, closed and evicted when the
    * watermark passes its end. Same append-mode finalization contract as
    * the tumbling sink: a drained run emits exactly the windows whose end
    * cleared max(event time) − delay. */
  def slidingAgg(parsed: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val wm = if (parsed.isStreaming) parsed.withWatermark("eventTime", watermark)
      else parsed
    wm.groupBy(
        window(col("eventTime"), s"$SlideWinSec seconds",
          s"$SlideStepSec seconds").as("w"),
        col("id"))
      .agg(
        max(col("temperature")).as("max_temperature"),
        min(col("temperature")).as("min_temperature"),
        (sum(col("temperature")).cast("double") / count(lit(1)))
          .as("avg_temperature"),
        count(lit(1)).as("n"))
      .select(col("id"), col("w.start").as("w_start"),
        col("max_temperature"), col("min_temperature"),
        col("avg_temperature"), col("n"))
  }

  /** Replay `inDir` through parse → validity filter → sliding-window agg in
    * append mode; returns the sink path. */
  def replaySliding(spark: SparkSession, inDir: String, outBase: String): String =
    withStatePartitions(spark, inDir, bigWindowState = true) {
      val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir).toDF("value")
      val filtered = parse(raw).filter(isValid(col("temperature"), col("humidity")))
      val path = s"$outBase/sliding"
      val q = slidingAgg(filtered).writeStream
        .outputMode("append")
        .format("parquet").option("path", path)
        .option("checkpointLocation", s"$outBase/_cp_sliding")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      path
    }

  /** Session-window aggregate per sensor: sessions close after `gap` of
    * silence (Spark merges overlapping [t, t+gap) windows, so two events
    * exactly `gap` apart start separate sessions — the strict-< the oracle
    * mirrors with its LAG predicate). `session_window` is the one windowed
    * agg whose GROUPS are data-dependent: state merges windows as events
    * arrive, and append mode emits a session once the watermark passes its
    * end — the same deterministic drained-run predicate as the tumbling
    * sink (`s_end ≤ max(sec) − delay`). Runs identically in batch, where
    * the watermark is a no-op and every session finalizes. */
  def sessionAgg(parsed: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val wm = if (parsed.isStreaming) parsed.withWatermark("eventTime", watermark)
      else parsed
    wm.groupBy(session_window(col("eventTime"), gap).as("w"), col("id"))
      .agg(
        max(col("temperature")).as("max_temperature"),
        min(col("temperature")).as("min_temperature"),
        count(lit(1)).as("n"))
      .select(col("id"), col("w.start").as("s_start"), col("w.end").as("s_end"),
        col("max_temperature"), col("min_temperature"), col("n"))
  }

  /** Replay `inDir` through parse → validity filter → session-window agg in
    * append mode; returns the session sink path. */
  def replaySessions(spark: SparkSession, inDir: String, outBase: String): String =
    withStatePartitions(spark, inDir, bigWindowState = true) {
      val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir).toDF("value")
      val filtered = parse(raw).filter(isValid(col("temperature"), col("humidity")))
      val path = s"$outBase/sessions"
      val q = sessionAgg(filtered).writeStream
        .outputMode("append")
        .format("parquet").option("path", path)
        .option("checkpointLocation", s"$outBase/_cp_sessions")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      path
    }

  def replay(spark: SparkSession, inDir: String, outBase: String): ReplayOut =
    replayFrom(spark,
      spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir).toDF("value"),
      outBase, feedDir = inDir)

  /** The R1–R5 chain over ANY raw `value: STRING` stream: the file-source
    * replay above (tests/verify determinism) and the `graft-mqtt` DSv2
    * source (real transport) run the IDENTICAL dataflow — MqttSpec pins
    * byte-equality of all three sinks between the two transports.
    * `feedDir` (when the caller has one) feeds the state-partition
    * auto-sizing; an arbitrary stream (e.g. the MQTT source) omits it and
    * gets the explicit conf or the 8-partition default. */
  def replayFrom(spark: SparkSession, raw: DataFrame, outBase: String,
      feedDir: String = null): ReplayOut =
    withStatePartitions(spark, feedDir) {
      val parsed = parse(raw)
      val out = ReplayOut(s"$outBase/raw", s"$outBase/filtered", s"$outBase/agg")

      def sink(df: DataFrame, path: String, cp: String) = df.writeStream
        .outputMode("append")
        .format("parquet").option("path", path)
        .option("checkpointLocation", s"$outBase/_cp_$cp")
        .trigger(Trigger.AvailableNow()).start()

      // Raw and filtered are stateless pass-through sinks (no shuffle, no
      // state stores) — the state-partition sizing only shapes the agg.
      val qRaw = sink(flatten(parsed), out.raw, "raw")
      val filtered = parsed.filter(isValid(col("temperature"), col("humidity")))
      val qFiltered = sink(kafkaShape(filtered), out.filtered, "filtered")
      // The aggregate consumes the POST-filter stream: the reference's KSQL
      // layer reads the Kafka topic, which carries only validity survivors
      // (chain in the header; review caught the agg briefly reading pre-filter
      // data, which let invalid zero readings poison window minima).
      val qAgg = sink(windowedAgg(filtered), out.agg, "agg")

      qRaw.awaitTermination()
      qFiltered.awaitTermination()
      qAgg.awaitTermination()
      out
    }

  /** Complete-mode replay: the per-sensor all-time aggregate re-emitted IN
    * FULL every micro-batch, truncate-and-reloaded into a small dashboard
    * table — the third Structured Streaming output mode, next to append
    * ([[replay]]'s finalized windows) and update ([[replayChangelog]]'s
    * keyed upsert). Complete mode is only viable when the RESULT is small
    * (state holds the whole aggregate; the sink rewrites it wholesale), which
    * is exactly the leaderboard/dashboard case: the top-k projection keeps
    * the written table k rows no matter the corpus. The overwrite is
    * idempotent per batch (same batch ⇒ same table), so a retried batch
    * converges — and after an `AvailableNow` drain the table IS the batch
    * answer, which is what the oracle checks. */
  def replayTopkComplete(spark: SparkSession, inDir: String, outBase: String,
      k: Int = 10): String =
    withStatePartitions(spark, inDir) {
      val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir).toDF("value")
      val filtered = parse(raw).filter(isValid(col("temperature"), col("humidity")))
      val path = s"$outBase/topk"
      val agg = filtered.groupBy(col("id"))
        .agg(max(col("temperature")).as("max_temperature"),
          count(lit(1)).as("n"))
      val q = agg.writeStream
        .outputMode("complete")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.orderBy(col("max_temperature").desc, col("id"))
            .limit(k)
            .coalesce(1)
            .write.mode("overwrite").parquet(path)
        }
        .option("checkpointLocation", s"$outBase/_cp_topk")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      path
    }

  /** Stream-stream interval-join replay: the staged feed split into two
    * halves by message-id parity (standing in for two independent sensor
    * feeds), correlated with [[StatefulOps.correlateFeeds]] (same-sensor
    * readings within ±1 h — wide enough that the sparse per-user event
    * cadence yields a meaningful match set), drained to parquet. Both join
    * inputs read the SAME file source — Spark plans a streaming self-join,
    * each side with its own watermark and state store; inner matches emit
    * eagerly, so the drained output is the complete join (the DuckDB
    * oracle is the plain interval self-join). */
  def replayCorrelate(spark: SparkSession, inDir: String, outBase: String,
      joinType: String = "inner"): String =
    withStatePartitions(spark, inDir) {
      val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir).toDF("value")
      val parsed = parse(raw)
      val even = parsed.filter(col("messageId").cast("long") % 2 === 0)
      val odd = parsed.filter(col("messageId").cast("long") % 2 === 1)
      val path = s"$outBase/joined"
      val q = StatefulOps.correlateFeeds(even, odd, rangeSec = 3600,
        joinType = joinType).writeStream
        .outputMode("append")
        .format("parquet").option("path", path)
        .option("checkpointLocation", s"$outBase/_cp_join")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      path
    }

  /** Stream-static enrichment replay: the staged feed left-joined per
    * micro-batch against a broadcast dimension table
    * ([[StatefulOps.enrich]] — the catalog-lookup shape: no state, no
    * shuffle of the stream), drained to parquet. The oracle is the plain
    * batch join. */
  def replayEnrich(spark: SparkSession, inDir: String, outBase: String,
      sites: org.apache.spark.sql.DataFrame): String = {
    val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
      .text(inDir).toDF("value")
    val path = s"$outBase/enriched"
    val q = StatefulOps.enrich(parse(raw), sites).writeStream
      .outputMode("append")
      .format("parquet").option("path", path)
      .option("checkpointLocation", s"$outBase/_cp_enrich")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    path
  }

  /** Record-high replay: the staged feed through
    * [[StatefulOps.recordHighs]] (per-sensor `flatMapGroupsWithState`
    * keeping one long of state — the all-time max), drained to parquet.
    * The oracle is the batch spelling of the same fold: a running-max
    * window over (sec, messageId, temperature) order — valid because the
    * drain processes the whole feed with the per-key fold sorting each
    * group by exactly that key. */
  def replayRecordHighs(spark: SparkSession, inDir: String, outBase: String): String =
    withStatePartitions(spark, inDir) {
      val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir).toDF("value")
      val path = s"$outBase/highs"
      val q = StatefulOps.recordHighs(parse(raw)).toDF().writeStream
        .outputMode("append")
        .format("parquet").option("path", path)
        .option("checkpointLocation", s"$outBase/_cp_highs")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      path
    }

  /** Hysteresis-alarm replay: the staged feed through
    * [[StatefulOps.hysteresisAlarms]] (two-threshold latch, one boolean of
    * state per sensor), drained to parquet exactly like the record-high
    * replay — the alert stream a monitoring sink would consume. */
  def replayAlarms(spark: SparkSession, inDir: String, outBase: String): String =
    withStatePartitions(spark, inDir) {
      val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir).toDF("value")
      val path = s"$outBase/alarms"
      val q = StatefulOps.hysteresisAlarms(parse(raw)).toDF().writeStream
        .outputMode("append")
        .format("parquet").option("path", path)
        .option("checkpointLocation", s"$outBase/_cp_alarms")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      path
    }

  /** Window-rate replay: the staged feed through [[StatefulOps.windowRates]]
    * (tumbling counts + cross-window delta, one long of state per sensor),
    * drained to parquet like the other history-fold replays. */
  def replayRates(spark: SparkSession, inDir: String, outBase: String): String =
    withStatePartitions(spark, inDir) {
      val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir).toDF("value")
      val path = s"$outBase/rates"
      val q = StatefulOps.windowRates(parse(raw)).toDF().writeStream
        .outputMode("append")
        .format("parquet").option("path", path)
        .option("checkpointLocation", s"$outBase/_cp_rates")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      path
    }

  /** Watermarked-dedup replay: the staged feed (deliberately containing
    * duplicate deliveries) deduplicated by message id with
    * [[StatefulOps.dedupByMessage]] — `dropDuplicatesWithinWatermark`, the
    * bounded-state exactly-once-per-message guard an at-least-once transport
    * (MQTT QoS 1, Kafka producer retries) needs — drained to parquet. The
    * oracle is the duplicate-free batch projection: every message exactly
    * once, regardless of delivery count. */
  def replayDedup(spark: SparkSession, inDir: String, outBase: String): String =
    withStatePartitions(spark, inDir) {
      val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
        .text(inDir).toDF("value")
      val path = s"$outBase/deduped"
      val q = StatefulOps.dedupByMessage(parse(raw)).writeStream
        .outputMode("append")
        .format("parquet").option("path", path)
        .option("checkpointLocation", s"$outBase/_cp_dedup")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      path
    }
}
