package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{SensorPipeline, StatefulOps}

/** The DSv2 sensor generator (reference mqttgen.py rebuilt as a native
  * source) + the flatMapGroupsWithState record-high operator. */
class SensorGenSpec extends SparkSpec {

  private def gen(messages: Long, threads: Int) =
    spark.read.format("sensor-gen")
      .option("messages", messages).option("threads", threads).load()

  /** Batch oracle for the record-high operator: StatefulOps.foldKey applied
    * per key to the whole history, driver-side (test-only — the collect is
    * exactly what a distributed pipeline must not do). */
  private def recordHighsBatch(
      parsed: org.apache.spark.sql.DataFrame): Seq[StatefulOps.RecordHigh] = {
    import org.apache.spark.sql.Encoders
    parsed.select(col("id"), col("messageId"), col("eventTime"), col("temperature"))
      .as[StatefulOps.Reading](Encoders.product[StatefulOps.Reading])
      .collect().groupBy(_.id).toSeq
      .flatMap { case (_, rs) => StatefulOps.foldKey(rs.iterator, None)._1 }
  }

  test("batch read: row count = messages x threads, deterministic across reads") {
    val df = gen(500, 4)
    df.count() shouldBe 2000
    val a = df.collect().map(_.getString(0)).sorted
    val b = gen(500, 4).collect().map(_.getString(0)).sorted
    a shouldBe b
  }

  test("payload distribution matches mqttgen: 1% empty, ~9% outlier, rest normal") {
    val parsed = SensorPipeline.parse(gen(1000, 2))
    val n = parsed.count()
    val empty = parsed.filter(col("temperature") === 0L && col("humidity") === 0L).count()
    val outlier = parsed.filter(col("temperature") >= 50L && col("humidity") >= 100L).count()
    empty shouldBe n / 100 // every 100th loop
    outlier shouldBe (n / 10 - n / 100) // every 10th except every 100th
    // validity filter keeps exactly the non-empty, non-outlier rows
    parsed.filter(SensorPipeline.isValid(col("temperature"), col("humidity"))).count() shouldBe
      (n - empty - outlier)
  }

  test("micro-batch stream equals batch read and respects rowsPerBatch offsets") {
    val out = spark.readStream.format("sensor-gen")
      .option("messages", 300).option("threads", 2).option("rowsPerBatch", 100)
      .load()
    val q = out.writeStream.format("memory").queryName("sensor_gen_mb")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sensor_gen_mb").collect().map(_.getString(0)).sorted
      val batch = gen(300, 2).collect().map(_.getString(0)).sorted
      streamed shouldBe batch
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3) // 300/100 micro-batches
    } finally q.stop()
  }

  test("checkpoint recovery: a restarted stream resumes offsets exactly-once") {
    val base = java.nio.file.Files.createTempDirectory("sensor_gen_cp").toString
    def start() = spark.readStream.format("sensor-gen")
      .option("messages", 500).option("threads", 2).option("rowsPerBatch", 50)
      .load()
      .writeStream.format("parquet").option("path", s"$base/out")
      .option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.ProcessingTime(0)).start()
    // run 1: stop somewhere mid-stream (after at least one commit)
    val q1 = start()
    try {
      while (q1.recentProgress.length < 3) Thread.sleep(50)
    } finally q1.stop()
    val partial = spark.read.parquet(s"$base/out").count()
    assert(partial < 1000, "first run must stop before draining (else the test is vacuous)")
    // run 2: resume from the checkpoint and drain
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(s"$base/out").collect().map(_.getString(0)).sorted.toSeq
    val batch = gen(500, 2).collect().map(_.getString(0)).sorted.toSeq
    rows shouldBe batch // every record exactly once across the restart
  }

  test("streaming dedup: cross-thread messageId collisions collapse to batch distinct") {
    // mqttgen reuses messageIds across threads (same sensor ids + per-thread
    // loop counters) — the generator reproduces that, so distinct < total.
    val batchParsed = SensorPipeline.parse(gen(300, 3))
    val distinctIds = batchParsed.select("messageId").distinct().count()
    assert(distinctIds < 900, "fixture must actually contain collisions")
    val streamed = SensorPipeline.parse(
      spark.readStream.format("sensor-gen")
        .option("messages", 300).option("threads", 3).option("rowsPerBatch", 300).load())
    val q = StatefulOps.dedupByMessage(streamed)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      // all collisions here are intra-batch (single 300-row batch per thread
      // set): streaming dedup must agree with batch distinct-count
      spark.table("dedup_stream").count() shouldBe distinctIds
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dim without state") {
    val sites = spark.createDataFrame(Seq(("sensor1rcc", "site-A"), ("sensor2rcc", "site-B")))
      .toDF("id", "site")
    val streamed = SensorPipeline.parse(
      spark.readStream.format("sensor-gen")
        .option("messages", 200).option("threads", 1).load())
    val q = StatefulOps.enrich(streamed, sites)
      .writeStream.format("memory").queryName("enriched")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val got = spark.table("enriched")
      got.count() shouldBe 200 // left join keeps every event
      got.filter(col("site").isNull).count() shouldBe 0 // both sensors mapped
      got.filter(col("id") === "sensor1rcc" && col("site") =!= "site-A").count() shouldBe 0
    } finally q.stop()
  }

  test("corrupt/malformed JSON lines degrade to the zero-sentinel drop path") {
    // Gson in the reference is lenient; our from_json yields NULLs for
    // malformed payloads, which coalesce to the (0,0) empty sentinel and are
    // dropped by R4 — corrupt input never crashes and never reaches sinks.
    val lines = Seq(
      """{"id": "s1", "messageId": "m1", "timestamp": 1, "metrics": {"temperature": 20, "humidity": 60}}""",
      """not json at all""",
      """{"id": "s2", "metrics": "wrong-type"}""",
      """{}""")
    val parsed = SensorPipeline.parse(
      spark.createDataFrame(lines.map(Tuple1(_))).toDF("value"))
    parsed.count() shouldBe 4 // nothing crashes, nothing is silently lost
    val kept = parsed.filter(SensorPipeline.isValid(col("temperature"), col("humidity")))
    kept.count() shouldBe 1 // only the well-formed in-range row survives
    kept.select("messageId").collect()(0).getString(0) shouldBe "m1"
  }

  test("stream-stream time-bounded join equals the batch join of the same feeds") {
    def feed(seed: Long, streaming: Boolean) = {
      val r = if (streaming)
        spark.readStream.format("sensor-gen")
          .option("messages", 120).option("threads", 1)
          .option("seed", seed).option("rowsPerBatch", 40).load()
      else
        spark.read.format("sensor-gen")
          .option("messages", 120).option("threads", 1).option("seed", seed).load()
      SensorPipeline.parse(r)
    }
    val q = StatefulOps.correlateFeeds(feed(1, streaming = true), feed(2, streaming = true))
      .writeStream.format("memory").queryName("ss_join")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ss_join").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(5))).sorted.toSeq
      val batch = StatefulOps.correlateFeeds(feed(1, streaming = false), feed(2, streaming = false))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(5))).sorted.toSeq
      assert(batch.nonEmpty, "fixture must produce matches")
      streamed shouldBe batch
    } finally q.stop()
  }

  test("record-high operator: streaming state equals batch fold") {
    val parsed = SensorPipeline.parse(
      spark.readStream.format("sensor-gen")
        .option("messages", 400).option("threads", 2).option("rowsPerBatch", 80).load())
    val q = StatefulOps.recordHighs(parsed)
      .writeStream.format("memory").queryName("record_highs")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("record_highs").as[StatefulOps.RecordHigh](
        org.apache.spark.sql.Encoders.product[StatefulOps.RecordHigh])
        .collect().sortBy(r => (r.id, r.messageId)).toSeq
      val batch = recordHighsBatch(
        SensorPipeline.parse(gen(400, 2))).sortBy(r => (r.id, r.messageId))
      // Stream processes in 80-row micro-batches in event order (generator is
      // ordered), so the cross-batch fold matches the single-pass batch fold.
      streamed shouldBe batch
      // every emitted high strictly exceeds the previous max
      streamed.foreach(r => assert(r.temperature >= r.prev_max))
    } finally q.stop()
  }

  test("window-rate operator: drained streaming fold equals batch counts + lag chain") {
    import org.apache.spark.sql.Encoders
    val wSec = 60L
    val parsed = SensorPipeline.parse(
      spark.readStream.format("sensor-gen")
        .option("messages", 400).option("threads", 2)
        // single drained batch: a window split across micro-batches emits
        // partial counts (the documented history-fold trade) — the
        // equivalence contract is for the drained replay
        .option("rowsPerBatch", 800).load())
    val q = StatefulOps.windowRates(parsed, windowSec = wSec)
      .writeStream.format("memory").queryName("rates")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("rates").as[StatefulOps.WindowRate](
        Encoders.product[StatefulOps.WindowRate])
        .collect().sortBy(r => (r.id, r.wStart)).toSeq
      val batch = SensorPipeline.parse(gen(400, 2))
        .select(col("id"), col("eventTime"))
        .where(col("id").isNotNull && col("eventTime").isNotNull)
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
        .groupBy(_._1).toSeq.flatMap { case (id, rs) =>
          val byW = rs.groupBy(t => Math.floorDiv(t._2, 1000L * wSec) * wSec)
            .toSeq.sortBy(_._1)
          var prev = 0L
          byW.map { case (w, g) =>
            val n = g.size.toLong
            val d = n - prev; prev = n
            StatefulOps.WindowRate(id, w, n, d)
          }
        }.sortBy(r => (r.id, r.wStart))
      assert(batch.nonEmpty, "fixture must produce windows")
      streamed shouldBe batch
      // per key the counts reconstruct from the delta chain
      streamed.groupBy(_.id).values.foreach { ws =>
        val sorted = ws.sortBy(_.wStart)
        sorted.head.delta shouldBe sorted.head.n
        sorted.sliding(2).foreach {
          case Seq(a, b) => b.delta shouldBe b.n - a.n
          case _ =>
        }
      }
    } finally q.stop()
  }

  test("hysteresis alarm: streaming latch equals batch fold; strict alternation") {
    import org.apache.spark.sql.Encoders
    val parsed = SensorPipeline.parse(
      spark.readStream.format("sensor-gen")
        .option("messages", 400).option("threads", 2).option("rowsPerBatch", 80).load())
    // Non-default thresholds inside the generator's temperature range so
    // both transitions fire and the default constants aren't load-bearing.
    val (hi, lo) = (40L, 15L)
    val q = StatefulOps.hysteresisAlarms(parsed, hi, lo)
      .writeStream.format("memory").queryName("alarms")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("alarms").as[StatefulOps.AlarmEvent](
        Encoders.product[StatefulOps.AlarmEvent])
        .collect().sortBy(r => (r.id, r.messageId)).toSeq
      val batch = SensorPipeline.parse(gen(400, 2))
        .select(col("id"), col("messageId"), col("eventTime"), col("temperature"))
        .as[StatefulOps.Reading](Encoders.product[StatefulOps.Reading])
        .collect().groupBy(_.id).toSeq
        .flatMap { case (_, rs) => StatefulOps.alarmFold(rs.iterator, alarmed0 = false, hi, lo)._1 }
        .sortBy(r => (r.id, r.messageId))
      assert(batch.exists(_.event == "ALERT") && batch.exists(_.event == "CLEAR"),
        "fixture must exercise both transitions")
      streamed shouldBe batch
      // per key: starts with ALERT, then strictly alternates (the latch)
      streamed.groupBy(_.id).values.foreach { es =>
        val seq = es.sortBy(e => (e.eventTime.getTime, e.messageId, e.temperature)).map(_.event)
        seq.head shouldBe "ALERT"
        seq.sliding(2).foreach {
          case Seq(a, b) => a should not be b
          case _ =>
        }
      }
    } finally q.stop()
  }
}
