package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{SensorPipeline, StreamRegistry}

/** Batch–stream equivalence + reference-semantics checks for the pipeline
  * (SURVEY.md §5 item 4): the same transforms run as a batch plan and as an
  * AvailableNow streaming replay must agree. */
class StreamingPipelineSpec extends SparkSpec {

  private lazy val base: String = {
    val b = Files.createTempDirectory("graft_stream_spec").toString
    StreamRegistry.eventsAsSensorJson(spark, sf, s"$b/in")
    b
  }

  /** The same input parsed in BATCH mode (unified API: identical transforms). */
  private lazy val batchParsed: DataFrame =
    SensorPipeline.parse(spark.read.text(s"$base/in").toDF("value")).cache()

  private lazy val out = SensorPipeline.replay(spark, s"$base/in", s"$base/out")

  test("raw sink persists every event pre-filter (R3 semantics)") {
    val rawCount = spark.read.parquet(out.raw).count()
    rawCount shouldBe spark.read.text(s"$base/in").count()
    // flattened 5-column shape of the Mongo raw document
    spark.read.parquet(out.raw).columns.toSeq shouldBe
      Seq("_messageId", "sensorId", "timestamp", "temperature", "humidity")
  }

  test("filtered sink equals the batch filter of the same input (R4/R5)") {
    val streamed = spark.read.parquet(out.filtered)
      .select(col("key"), col("value")).collect().toSet
    val batch = SensorPipeline.kafkaShape(
      batchParsed.filter(SensorPipeline.isValid(col("temperature"), col("humidity"))))
      .collect().toSet
    streamed shouldBe batch
  }

  test("streamed windowed agg rows equal the batch agg for finalized windows") {
    val streamed = spark.read.parquet(out.agg)
      .select(col("id"), col("w_start"), col("max_temperature"),
        col("min_temperature"), col("avg_temperature"), col("n"))
      .collect().toSet
    // K8 semantics: the aggregate reads the post-filter stream
    val batchAll = SensorPipeline.windowedAgg(
        batchParsed.filter(SensorPipeline.isValid(col("temperature"), col("humidity"))))
      .select(col("id"), col("w_start"), col("max_temperature"),
        col("min_temperature"), col("avg_temperature"), col("n"))
      .collect().toSet
    // Append mode emits only watermark-finalized windows: every streamed row
    // must match batch exactly, and the gap must be only the tail windows
    // within the watermark delay of max event time.
    streamed.subsetOf(batchAll) shouldBe true
    val maxT = batchParsed.agg(max(col("eventTime"))).collect()(0).getTimestamp(0)
    val unemitted = batchAll -- streamed
    unemitted.foreach { r =>
      val wStart = r.getTimestamp(1)
      // window end (start+1min) past watermark (maxT - 10min) ⇒ legitimately held back
      assert(wStart.getTime + 60000L > maxT.getTime - 600000L,
        s"finalized window missing from streamed output: $r")
    }
  }

  test("empty metrics drop, OR-range keep: the R4 truth table end to end") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      """{"id":"s1","messageId":"m1","timestamp":"1700000000","metrics":{}}""", // empty→drop
      """{"id":"s1","messageId":"m2","timestamp":"1700000000","metrics":{"temperature":60,"humidity":90}}""", // OR passes
      """{"id":"s1","messageId":"m3","timestamp":"1700000000","metrics":{"temperature":50,"humidity":100}}""", // both at limit→drop
      """{"id":"s1","messageId":"m4","timestamp":"1700000000","metrics":{"temperature":10,"humidity":120}}""", // temp ok→keep
      """{"id":"s1","messageId":"m5","timestamp":"1700000000"}""" // missing metrics = empty→drop
    ).toDF("value")
    val kept = SensorPipeline.parse(rows)
      .filter(SensorPipeline.isValid(col("temperature"), col("humidity")))
      .select("messageId").as[String].collect().toSet
    kept shouldBe Set("m2", "m4")
  }

  test("q_stream_pipeline entry returns finalized agg rows") {
    val df = StreamRegistry.streamPipeline(spark, sf)
    df.count() should be > 0L
  }

  test("changelog upsert is idempotent under batch retry and merges across batches (K8)") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_changelog_spec").toString + "/t"
    def mkBatch(rows: Seq[(String, Long, Long, Long, Double, Long)]): DataFrame =
      rows.toDF("id", "w_start", "max_temperature", "min_temperature",
        "avg_temperature", "n")
    val b0 = mkBatch(Seq(("s1", 0L, 10L, 1L, 5.0, 3L), ("s2", 0L, 20L, 2L, 6.0, 4L)))
    SensorPipeline.upsertBatch(table)(b0, 0L)
    val after0 = spark.read.parquet(table).collect().toSet
    // Failure-after-commit replay: re-applying the SAME batch must leave the
    // table in an identical state (the exactly-once contract of the sink).
    SensorPipeline.upsertBatch(table)(b0, 0L)
    spark.read.parquet(table).collect().toSet shouldBe after0
    // Update-mode semantics: a later batch re-emits a changed (id, window) row
    // — last write wins — while untouched keys survive the merge.
    val b1 = mkBatch(Seq(("s1", 0L, 99L, 1L, 7.5, 5L), ("s1", 60L, 30L, 30L, 30.0, 1L)))
    SensorPipeline.upsertBatch(table)(b1, 1L)
    val fin = spark.read.parquet(table)
      .select($"id", $"w_sec", $"max_temperature", $"n").as[(String, Long, Long, Long)]
      .collect().toSet
    fin shouldBe Set(("s1", 0L, 99L, 5L), ("s2", 0L, 20L, 4L), ("s1", 60L, 30L, 1L))
  }

  test("changelog bucket layout is pinned by the table, not the session conf") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_changelog_layout").toString + "/t"
    def batch(rows: (String, Long, Long, Long, Double, Long)*): DataFrame =
      rows.toDF("id", "w_start", "max_temperature", "min_temperature",
        "avg_temperature", "n")
    spark.conf.set(SensorPipeline.ChangelogBucketsConf, "4")
    try {
      SensorPipeline.upsertBatch(table)(batch(("s1", 0L, 10L, 1L, 5.0, 3L)), 0L)
      // a later run with the conf UNSET must keep hashing into the persisted
      // 4-bucket scheme — a drifting count would leave the old copy of s1 in
      // an old-scheme bucket the left-anti merge never reads
      spark.conf.unset(SensorPipeline.ChangelogBucketsConf)
      SensorPipeline.upsertBatch(table)(batch(("s1", 0L, 99L, 1L, 7.5, 5L)), 1L)
      val rows = spark.read.parquet(table)
        .select($"id", $"w_sec", $"max_temperature").as[(String, Long, Long)]
        .collect()
      rows.toSet shouldBe Set(("s1", 0L, 99L))
      spark.read.parquet(table).select($"bucket").distinct().collect()
        .map(_.getInt(0)).foreach(b => assert(b >= 0 && b < 4))
      // an explicit conf that disagrees with the existing layout fails loudly
      spark.conf.set(SensorPipeline.ChangelogBucketsConf, "16")
      val e = intercept[IllegalStateException] {
        SensorPipeline.upsertBatch(table)(batch(("s2", 0L, 1L, 1L, 1.0, 1L)), 2L)
      }
      e.getMessage should include("requires a rebuild")
    } finally spark.conf.unset(SensorPipeline.ChangelogBucketsConf)
  }

  test("changelog table final state equals the batch aggregate (K8 update mode)") {
    val streamed = StreamRegistry.changelogTable(spark, sf)
      .select(col("id"), col("w_start"), col("max_temperature"),
        col("min_temperature"), col("avg_temperature"), col("n"))
      .collect().toSet
    val batch = SensorPipeline.windowedAgg(
        batchParsed.filter(SensorPipeline.isValid(col("temperature"), col("humidity"))))
      .select(col("id"), graft.ops.Out.epochSec(col("w_start")).as("w_start"),
        col("max_temperature"), col("min_temperature"),
        col("avg_temperature"), col("n"))
      .collect().toSet
    streamed shouldBe batch
  }

  test("left-outer interval join: outer rows emit iff the window closes strictly under the min-side watermark") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StatefulOps
    // Hand-built feed, one sensor, delay = range = 60 s:
    //   maxL = 5060 (mid 6), maxR = 5000 (mid 1) -> global watermark
    //   min(5060, 5000) - 60 = 4940.
    //   mid 0 @1000: unmatched, window end 1060 <  4940 -> MUST emit null row
    //   mid 2 @4880: unmatched, window end 4940 == 4940 -> boundary: strict <
    //                means NO emission (pins the oracle's < predicate)
    //   mid 4 @4900: unmatched, window end 4960 >  4940 -> unproven, no emit
    //   mid 6 @5060: matches mid 1 @5000 (+-60) -> inner row
    val b = Files.createTempDirectory("graft_outer_boundary").toString
    def ev(mid: Long, sec: Long) =
      s"""{"id":"1","messageId":"$mid","timestamp":"$sec","metrics":{"temperature":20,"humidity":50}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(b, "feed.txt"),
      Seq(ev(0, 1000), ev(2, 4880), ev(4, 4900), ev(6, 5060), ev(1, 5000))
        .mkString("", "\n", "\n"))
    val raw = spark.readStream.schema("value STRING").text(b).toDF("value")
    val parsed = SensorPipeline.parse(raw)
    val even = parsed.filter(col("messageId").cast("long") % 2 === 0)
    val odd = parsed.filter(col("messageId").cast("long") % 2 === 1)
    val outP = s"$b/joined"
    val q = StatefulOps.correlateFeeds(even, odd, delaySec = 60, rangeSec = 60,
        joinType = "left_outer").writeStream
      .outputMode("append").format("parquet").option("path", outP)
      .option("checkpointLocation", s"$b/_cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.read.parquet(outP)
      .select(col("l_mid"), col("r_mid")).collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    rows shouldBe Set(("6", Some("1")), ("0", None))
  }

  test("throttled multi-batch drain: the interval join still produces the complete match set") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StatefulOps
    // The round-5 review flagged that the join's completeness rested on the
    // unthrottled single-batch drain. correlateFeeds now derives its
    // watermark as max(delay, range), so a LOG-ORDERED multi-batch feed
    // (per-batch event-time-ordered chunks - the Kafka/file-log arrival
    // shape) must produce the complete match set: a chunk-boundary pair's
    // left row is only evicted once the watermark passes its window end,
    // and its right partner is never late under ordered arrival. (An
    // ARBITRARILY disordered split is a different contract: rows later
    // than the watermark delay drop, by Spark's lateness semantics -
    // callers size delaySec to their transport's disorder bound.)
    val b = Files.createTempDirectory("graft_throttled_join").toString
    val ordered = batchParsed.filter(col("eventTime").isNotNull)
      .orderBy(col("eventTime"))
      .select(to_json(struct(col("id"), col("messageId"),
        col("timestamp"), struct(col("temperature"), col("humidity")).as("metrics"))))
      .collect().map(_.getString(0))
    val nChunks = 8
    val per = math.max(1, (ordered.length + nChunks - 1) / nChunks)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$b/in8"))
    ordered.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      val f = java.nio.file.Paths.get(f"$b/in8/chunk-$i%03d.txt")
      java.nio.file.Files.writeString(f, chunk.mkString("", "\n", "\n"))
      // strictly increasing mtimes pin the file source's processing order
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 800000L + i * 10000L))
    }
    val raw = spark.readStream.schema("value STRING")
      .option("maxFilesPerTrigger", 1).text(s"$b/in8").toDF("value")
    val parsed = SensorPipeline.parse(raw)
    def half(df: org.apache.spark.sql.DataFrame, r: Int) =
      df.filter(col("messageId").cast("long") % 2 === r)
    val outP = s"$b/joined"
    val q = StatefulOps.correlateFeeds(half(parsed, 0), half(parsed, 1),
        rangeSec = 3600).writeStream
      .outputMode("append").format("parquet").option("path", outP)
      .option("checkpointLocation", s"$b/_cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.length > 2,
      s"expected a genuinely multi-batch drain, got ${q.recentProgress.length} batches")
    val streamed = spark.read.parquet(outP)
      .select("l_mid", "r_mid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val batch8 = SensorPipeline.parse(spark.read.text(s"$b/in8").toDF("value"))
    val expected = StatefulOps.correlateFeeds(half(batch8, 0),
        half(batch8, 1), rangeSec = 3600)
      .select("l_mid", "r_mid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    streamed shouldBe expected
    assert(expected.nonEmpty, "fixture must produce matches for this test to bite")
  }

  test("big-window-state replays flip the state store to RocksDB past the " +
      "feed threshold, scoped and restored") {
    // Pins the round-17 heap-death guard AND the detection trap that
    // silently disarmed its first spelling: `conf.getOption` on a conf
    // with a built-in default (the state-store providerClass) returns the
    // DEFAULT, never None, so presence-checking can't detect "unset" — the
    // guard must value-compare against the HDFS default class. Caught only
    // because a 100x re-run died again on the heap store; this test makes
    // the regression loud and cheap. The big feed is a SPARSE file (size
    // without disk), since the estimator reads Files.size only.
    val conf = "spark.sql.streaming.stateStore.providerClass"
    val dir = TempDirs.scratch("flipspec_").toFile
    val f = new java.io.RandomAccessFile(new java.io.File(dir, "feed.txt"), "rw")
    try f.setLength(2L * 1024 * 1024 * 1024) // ~14 M estimated rows at 150 B/row
    finally f.close()
    val before = spark.conf.get(conf)
    assert(before.endsWith("HDFSBackedStateStoreProvider"),
      s"precondition: session must be on the default provider, got $before")
    var inside: String = null
    SensorPipeline.withStatePartitions(spark, dir.toString,
        bigWindowState = true) {
      inside = spark.conf.get(conf)
    }
    assert(inside.endsWith("RocksDBStateStoreProvider"),
      s"big-window-state replay past the threshold must run on RocksDB, got $inside")
    assert(spark.conf.get(conf) == before, "provider conf must be restored")
    // a NON-big-window replay on the same feed must stay on the default
    SensorPipeline.withStatePartitions(spark, dir.toString) {
      assert(spark.conf.get(conf) == before,
        "non-flagged replays must keep the heap store regardless of feed size")
    }
    // the A/B escape hatch pins the heap store even for flagged replays
    spark.conf.set(SensorPipeline.NoRocksDbConf, "true")
    try SensorPipeline.withStatePartitions(spark, dir.toString,
        bigWindowState = true) {
      assert(spark.conf.get(conf) == before,
        "noRocksDb conf must disable the escalation")
    } finally spark.conf.unset(SensorPipeline.NoRocksDbConf)
  }
}
