package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

import graft.net.MqttClient

/** MQTT ingest as a DataSource V2 micro-batch stream — the reference's R1
  * edge (reference/src/main/java/stream/sources/HiveMQSource.java:62-106)
  * on a REAL transport: the in-repo MQTT 3.1.1 client
  * ([[graft.net.MqttClient]]) subscribes at QoS 1 and a driver-side
  * receiver buffers inbound messages; micro-batches read index ranges of
  * that buffer, so offsets are replayable within the receiver's lifetime
  * and the admission-control pacing matches [[SensorGen]]'s.
  *
  * Architecture honesty, for the 100 TB story: MQTT has no consumer-side
  * replay — a buffering edge is REQUIRED somewhere, and this source puts
  * it on the driver (bounded by `maxBuffered`), which is the classic
  * receiver-source trade. Production deployments front MQTT with a
  * replayable log (the reference itself bridges MQTT → Kafka), at which
  * point the Kafka reader carries exactly-once; broker-side redelivery of
  * un-acked QoS 1 messages on a persistent session (`cleanSession=false`,
  * which this client requests) is the transport-level safety net.
  *
  * Usage: `spark.readStream.format("graft-mqtt").option("host", h)
  * .option("port", p).option("topic", "sensors/#").load()`. The receiver
  * is process-global, keyed (host, port, topic, clientId): create it ahead
  * of the query via [[MqttReceiver.apply]] to subscribe BEFORE publishers
  * start (the subscribe-then-publish ordering every MQTT consumer needs —
  * a query start would otherwise race the first messages). */
class MqttSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mqtt"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MqttSourceProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MqttTable(new CaseInsensitiveStringMap(properties))
}

object MqttSourceProvider {
  /** Wire schema: topic + raw payload string (SensorPipeline.parse reads
    * `value`, same as the generator source). */
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType), StructField("value", StringType)))
}

/** Driver-side buffering subscriber. One per (host, port, topic, clientId)
  * per process — the registry decouples subscription lifetime from query
  * lifetime, so offsets stay valid across query restarts in-process. */
final class MqttReceiver(host: String, port: Int, topic: String,
    clientId: String, maxBuffered: Int) {
  /** buf(i) holds the message at ABSOLUTE offset base + i; committed
    * prefixes are trimmed away, so `maxBuffered` bounds the in-memory
    * BACKLOG (uncommitted messages), not the lifetime message count —
    * a caught-up live tail ingests forever in constant memory. */
  private val buf = new ArrayBuffer[(String, String)]()
  private var base = 0L
  @volatile private var closed = false
  private def connectClient(): MqttClient = {
    val c = new MqttClient(host, port, clientId, cleanSession = false)
    c.connect()
    c.subscribe(topic, qos = 1)
    c
  }
  // connect in the constructor so a dead broker fails the CALLER loudly;
  // later drops are the pump's reconnect loop's problem
  @volatile private var client = connectClient()

  private val pump = new Thread(() => {
    while (!closed) {
      try {
        // backpressure, not drop: at the backlog cap we simply stop
        // reading the socket — TCP flow control stalls the broker's
        // writes, and no PUBACK is ever sent for a message we did not
        // buffer, so nothing is silently lost (round-8 self-review:
        // dropping AFTER the client acked was unrecoverable)
        if (buf.synchronized(buf.size) >= maxBuffered) Thread.sleep(100)
        else client.receive(timeoutMs = 200).foreach { m =>
          buf.synchronized { buf += ((m.topic, m.payloadString)) }
        }
      } catch {
        case _: Throwable if !closed =>
          // connection died (receive throws on EOF precisely so this path
          // is distinguishable from an idle poll — round-8 self-review):
          // back off and resubscribe; with cleanSession=false a compliant
          // broker redelivers un-acked QoS 1 messages on resume
          try client.close() catch { case _: Throwable => () }
          Thread.sleep(200)
          try { if (!closed) client = connectClient() }
          catch { case _: Throwable => Thread.sleep(500) }
        case _: Throwable => ()
      }
    }
  }, s"mqtt-receiver-$host:$port/$topic")
  pump.setDaemon(true)
  pump.start()

  /** High-water mark: total messages ever buffered (an absolute offset). */
  def size: Long = buf.synchronized { base + buf.size }
  def slice(from: Long, until: Long): Array[(String, String)] =
    buf.synchronized {
      require(from >= base,
        s"offset $from below trimmed base $base (committed data is gone)")
      buf.slice((from - base).toInt, (until - base).toInt).toArray
    }
  /** Release committed prefix — called from the stream's commit(). */
  def trimTo(offset: Long): Unit = buf.synchronized {
    val n = math.max(0, math.min(offset - base, buf.size.toLong)).toInt
    if (n > 0) { buf.remove(0, n); base += n }
  }
  def close(): Unit = { closed = true; client.close() }
}

object MqttReceiver {
  private val receivers =
    scala.collection.concurrent.TrieMap[String, MqttReceiver]()

  def key(host: String, port: Int, topic: String, clientId: String): String =
    s"$host:$port/$topic@$clientId"

  /** Topic-derived default: MQTT 3.1.1 [MQTT-3.1.4-2] makes a broker
    * disconnect the EXISTING session when a duplicate ClientId connects,
    * so a fixed default across topics would have two default-id receivers
    * kicking each other in a reconnect loop (round-8 self-review). */
  def defaultClientId(topic: String): String =
    s"graft-ingest-${Integer.toHexString(topic.hashCode)}"

  /** Get-or-start the receiver for this endpoint (subscribes immediately).
    * `maxBuffered` applies only when this call CREATES the receiver; an
    * existing receiver keeps its original bound (the registry key is the
    * endpoint, not the options). */
  def apply(host: String, port: Int, topic: String,
      clientId: String = null, maxBuffered: Int = 1000000): MqttReceiver = {
    val cid = Option(clientId).getOrElse(defaultClientId(topic))
    receivers.getOrElseUpdate(key(host, port, topic, cid),
      new MqttReceiver(host, port, topic, cid, maxBuffered))
  }

  /** Stop and forget one receiver (used by bounded exercises; a live-tail
    * deployment keeps its receiver for the process lifetime). */
  def stop(host: String, port: Int, topic: String, clientId: String): Unit =
    receivers.remove(key(host, port, topic, clientId)).foreach(_.close())

  def closeAll(): Unit = {
    receivers.values.foreach(_.close()); receivers.clear()
  }
}

class MqttTable(o: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val host = o.get("host")
  private val port = o.getInt("port", 1883)
  private val topic = o.getOrDefault("topic", "#")
  private val clientId =
    o.getOrDefault("clientId", MqttReceiver.defaultClientId(topic))
  private val rowsPerBatch = o.getLong("rowsPerBatch", 10000L)
  override def name(): String = s"graft-mqtt($host:$port/$topic)"
  override def schema(): StructType = MqttSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = MqttSourceProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new MqttStream(host, port, topic, clientId, rowsPerBatch)
      }
    }
}

/** Offset = number of buffered messages already emitted. */
final case class MqttOffset(emitted: Long) extends Offset {
  override def json(): String = emitted.toString
}

/** The micro-batch slice ships its rows in the partition (transport-edge
  * rows are driver-resident by construction; parallelism comes from the
  * downstream shuffle, as with any single-endpoint receiver). */
final case class MqttSlice(rows: Array[(String, String)]) extends InputPartition

class MqttStream(host: String, port: Int, topic: String, clientId: String,
    rowsPerBatch: Long) extends MicroBatchStream with SupportsAdmissionControl {
  private def receiver = MqttReceiver(host, port, topic, clientId)

  override def initialOffset(): Offset = MqttOffset(0L)
  override def deserializeOffset(json: String): Offset = MqttOffset(json.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[MqttOffset].emitted
    // a checkpointed offset ahead of this process's buffer means the query
    // was restarted in a NEW process against a fresh (empty) receiver —
    // the documented in-process-only replay limit. Fail loudly: silently
    // proceeding would alias the first `s` fresh messages as already
    // emitted and drop them (round-8 self-review). The recovery path is a
    // new checkpoint (or a durable log in front, which is what production
    // puts here).
    require(receiver.size >= s,
      s"MQTT offset $s is ahead of the receiver buffer (${receiver.size}): " +
        "checkpoint predates this process's receiver; start from a fresh " +
        "checkpoint or front the broker with a replayable log")
    def rowCap(l: ReadLimit): Option[Long] = l match {
      case r: ReadMaxRows => Some(r.maxRows())
      case c: CompositeReadLimit => c.getReadLimits.flatMap(rowCap(_)).headOption
      case _ => None
    }
    val cap = rowCap(limit).getOrElse(Long.MaxValue)
    MqttOffset(math.min(receiver.size, s + cap))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: Spark calls latestOffset(start, limit)")
  override def reportLatestOffset(): Offset = MqttOffset(receiver.size)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[MqttOffset].emitted
    val e = end.asInstanceOf[MqttOffset].emitted
    Array(MqttSlice(receiver.slice(s, e)))
  }
  override def createReaderFactory(): PartitionReaderFactory = MqttReaderFactory
  // Spark guarantees it will only request offsets > end after this call —
  // release the committed prefix so the backlog bound is a true backlog
  // bound (round-8 self-review)
  override def commit(end: Offset): Unit =
    receiver.trimTo(end.asInstanceOf[MqttOffset].emitted)
  override def stop(): Unit = ()
}

object MqttReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[MqttSlice].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(rows(i)._1), UTF8String.fromString(rows(i)._2))
      override def close(): Unit = ()
    }
  }
}
