package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic sensor-event generator as a DataSource V2 — the reference's
  * load generator (reference/iot-sensor/mqttgen.py:16-56) rebuilt as a native
  * Spark source instead of an external MQTT publisher.
  *
  * The reference produces JSON over MQTT from N Python threads, each with its
  * own loop counter; the payload distribution (mqttgen.py:38-45, codified in
  * FIXTURES.md §1) is: every 100th message `metrics: {}`, every remaining
  * 10th an out-of-range outlier, else in-range. This source emits the same
  * wire format — one `value: STRING` JSON line per row, exactly what
  * [[graft.streaming.SensorPipeline.parse]] consumes — with:
  *
  *   - **threads → partitions**: generator thread i becomes input partition i
  *     (same per-thread loop counters, same `messageId` collision behavior
  *     across threads the reference has);
  *   - **determinism**: values come from a seeded splitmix64 of
  *     (seed, thread, loop) instead of `random.randint`, so every run, every
  *     partition count, and both read modes produce identical data;
  *   - **both read shapes**: `BATCH_READ` (the whole run as one DataFrame —
  *     fixtures, batch-stream equivalence tests) and `MICRO_BATCH_READ`
  *     (offsets advance `rowsPerBatch` per trigger — replay at micro-batch
  *     granularity with full checkpoint/recovery semantics).
  *
  * Usage: `spark.readStream.format("sensor-gen").option("messages", 1000)
  * .option("threads", 4).load()` (or `spark.read` for batch).
  *
  * Scale note: generation is embarrassingly parallel and offset ranges are
  * split per partition — on a cluster this produces data at scan speed with
  * zero driver involvement beyond offset bookkeeping, unlike the reference's
  * single-broker fan-in.
  */
class SensorGen extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sensor-gen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SensorGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SensorGenTable(SensorGenConfig(new CaseInsensitiveStringMap(properties)))
}

object SensorGen {
  /** Wire schema: the raw payload string, as a transport source would emit. */
  val schema: StructType = StructType(Seq(StructField("value", StringType)))

  /** splitmix64 — tiny, seedable, stable across JVMs. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform draw in [lo, hi] (inclusive, like Python's randint). */
  private def draw(seed: Long, thread: Int, loop: Long, salt: Long, lo: Int, hi: Int): Int =
    lo + (math.floorMod(mix(seed ^ (thread.toLong << 40) ^ (loop << 8) ^ salt),
      (hi - lo + 1).toLong)).toInt

  /** JSON payload for (thread, loop) — the mqttgen.py:27-47 record:
    * 1-based loop counter, `messageId = id + loop`, epoch-seconds timestamp,
    * distribution empty (%100) / outlier (%10) / normal. */
  def payload(seed: Long, startEpoch: Long, intervalMs: Long, thread: Int, loop: Long): String = {
    // 2 sensors SHARED by all threads (config_env.json is per-container, all
    // generator threads read it) — so messageId = id + loop collides across
    // threads exactly as the reference's does (FIXTURES.md §1).
    val sensor = draw(seed, thread, loop, 1L, 1, 2)
    val id = s"sensor${sensor}rcc"
    val ts = startEpoch + loop * intervalMs / 1000
    val metrics =
      if (loop % 100 == 0) "{}"
      else if (loop % 10 == 0)
        s"""{"temperature": ${draw(seed, thread, loop, 2L, 50, 80)}, "humidity": ${draw(seed, thread, loop, 3L, 100, 130)}}"""
      else
        s"""{"temperature": ${draw(seed, thread, loop, 2L, 10, 50)}, "humidity": ${draw(seed, thread, loop, 3L, 50, 80)}}"""
    s"""{"id": "$id", "messageId": "$id${loop}", "timestamp": $ts, "metrics": $metrics}"""
  }
}

/** Options: messages (per thread), threads, rowsPerBatch (per thread per
  * micro-batch), seed, startEpoch (s), intervalMs. */
final case class SensorGenConfig(messages: Long, threads: Int, rowsPerBatch: Long,
    seed: Long, startEpoch: Long, intervalMs: Long)

object SensorGenConfig {
  def apply(o: CaseInsensitiveStringMap): SensorGenConfig = SensorGenConfig(
    messages = o.getLong("messages", 1000L),
    threads = o.getInt("threads", 1),
    rowsPerBatch = o.getLong("rowsPerBatch", 250L),
    seed = o.getLong("seed", 42L),
    startEpoch = o.getLong("startEpoch", 1700000000L),
    intervalMs = o.getLong("intervalMs", 1000L))
}

class SensorGenTable(conf: SensorGenConfig) extends Table with SupportsRead {
  override def name(): String = s"sensor-gen(${conf.threads}x${conf.messages})"
  override def schema(): StructType = SensorGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SensorGen.schema
        override def toBatch: Batch = new SensorGenBatch(conf)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SensorGenStream(conf)
      }
    }
}

/** Loop-counter range [from, until) of one generator thread. */
final case class SensorGenPartition(thread: Int, from: Long, until: Long,
    conf: SensorGenConfig) extends InputPartition

object SensorGenReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SensorGenPartition]
    new PartitionReader[InternalRow] {
      private var loop = p.from
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (loop >= p.until) return false
        loop += 1 // 1-based loop counter, like mqttgen's message_counter
        current = InternalRow(UTF8String.fromString(
          SensorGen.payload(p.conf.seed, p.conf.startEpoch, p.conf.intervalMs, p.thread, loop)))
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

class SensorGenBatch(conf: SensorGenConfig) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    (0 until conf.threads).map(t =>
      SensorGenPartition(t, 0L, conf.messages, conf): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = SensorGenReaderFactory
}

/** Offset = loop counter already emitted per thread (all threads advance in
  * lockstep, so one long suffices and serializes trivially). */
final case class SensorGenOffset(emitted: Long) extends Offset {
  override def json(): String = emitted.toString
}

/** Offset pacing via SupportsAdmissionControl — the stateless restart-safe
  * protocol: Spark hands `latestOffset(start, limit)` the CURRENT start
  * offset, so pacing needs no mutable source state. (A stateful
  * `latestOffset()` counter is a checkpoint-recovery bug: after a restart
  * whose last batch committed, Spark plans the next batch WITHOUT first
  * calling `deserializeOffset`, and a fresh counter would regress the end
  * offset below the start and replay data — caught by the exactly-once
  * recovery test.) */
class SensorGenStream(conf: SensorGenConfig) extends MicroBatchStream
    with SupportsAdmissionControl {
  override def initialOffset(): Offset = SensorGenOffset(0L)
  override def deserializeOffset(json: String): Offset = SensorGenOffset(json.toLong)
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(conf.rowsPerBatch * conf.threads)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // Advance up to the read limit per trigger until the configured run is
    // drained — the bounded-replay analog of the reference's finite loop.
    val s = start.asInstanceOf[SensorGenOffset].emitted
    // Spark hands a CompositeReadLimit when several admission options combine
    // (e.g. maxRows + minRows): honor the contained row cap rather than
    // falling through to all-available and overshooting the trigger size.
    def rowCap(l: ReadLimit): Option[Long] = l match {
      case r: ReadMaxRows => Some(r.maxRows())
      case c: CompositeReadLimit =>
        c.getReadLimits.flatMap(rowCap(_)).headOption
      case _ => None
    }
    val step = rowCap(limit) match {
      case Some(rows) => math.max(1L, rows / conf.threads)
      case None => conf.messages // all-available
    }
    SensorGenOffset(math.min(conf.messages, s + step))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: Spark calls latestOffset(start, limit)")
  override def reportLatestOffset(): Offset = SensorGenOffset(conf.messages)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SensorGenOffset].emitted
    val e = end.asInstanceOf[SensorGenOffset].emitted
    (0 until conf.threads).map(t => SensorGenPartition(t, s, e, conf): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = SensorGenReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
