package graft.net

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.mutable

/** Embeddable loopback MQTT 3.1.1 broker — enough of the server side
  * (CONNECT/CONNACK, SUBSCRIBE/SUBACK with +/# wildcard filters, PUBLISH
  * routing at QoS ≤ 1, PING, DISCONNECT) to drive the MQTT ingest path
  * end-to-end in an offline environment with no broker binary. This is a
  * test/dev harness standing in for the reference deployment's HiveMQ
  * container (reference/docker-compose.yml), not a production broker: no
  * persistence, no QoS 2, no retained messages, sessions die with the
  * socket.
  *
  * Concurrency: one daemon thread per connection; the subscription
  * registry is a synchronized map; per-subscriber delivery serializes on
  * that subscriber's output stream (Mqtt.writePacket synchronizes), so
  * concurrent publishers interleave whole packets, never bytes. */
final class MiniBroker(port0: Int = 0) {
  import Mqtt._

  private val server = new ServerSocket(port0)
  val port: Int = server.getLocalPort
  private val running = new AtomicBoolean(true)
  /** (filter, qos, out-stream) per live subscriber. */
  private val subs = mutable.Map.empty[DataOutputStream, mutable.Buffer[(String, Int)]]
  private val sockets = mutable.Set.empty[Socket]

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val s = server.accept()
        sockets.synchronized { sockets += s }
        val t = new Thread(() => serve(s), s"minibroker-conn-${s.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => () // closed during shutdown
        // any other accept failure (fd exhaustion, transient I/O) must not
        // kill the acceptor thread while the broker is live — back off and
        // keep accepting (round-8 self-review)
        case _: Throwable => if (running.get()) Thread.sleep(50)
      }
    }
  }, "minibroker-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(s: Socket): Unit = {
    s.setTcpNoDelay(true)
    val in = new DataInputStream(new BufferedInputStream(s.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
    try {
      val c = readPacket(in)
      require(c.ptype == Connect, s"first packet must be CONNECT, got ${c.ptype}")
      // session-present false, return code 0 (accepted)
      writePacket(out, Connack, 0, Array[Byte](0, 0))
      var open = true
      while (open && running.get()) {
        val p = readPacket(in)
        p.ptype match {
          case Subscribe =>
            val r = new BodyReader(p.body)
            val pid = r.readU16()
            val granted = mutable.Buffer.empty[Byte]
            while (r.remaining > 0) {
              val filter = r.readUtf()
              val qos = math.min(r.readByte(), 1) // QoS 2 downgraded
              subs.synchronized {
                subs.getOrElseUpdate(out, mutable.Buffer.empty) += ((filter, qos))
              }
              granted += qos.toByte
            }
            writePacket(out, Suback, 0, u16(pid) ++ granted.toArray)
          case Publish =>
            val r = new BodyReader(p.body)
            val topic = r.readUtf()
            val qos = (p.flags >> 1) & 3
            val pid = if (qos > 0) r.readU16() else 0
            val payload = r.rest()
            if (qos == 1) writePacket(out, Puback, 0, u16(pid))
            route(topic, payload)
          case Puback => () // subscriber acks; no redelivery tracking
          case Pingreq => writePacket(out, Pingresp, 0, Array.empty)
          case Disconnect => open = false
          case _ => ()
        }
      }
    } catch {
      case _: EOFException => ()
      case _: SocketException => ()
    } finally {
      subs.synchronized { subs -= out }
      sockets.synchronized { sockets -= s }
      try s.close() catch { case _: Throwable => () }
    }
  }

  /** Deliver to every matching subscriber at min(1, its granted QoS).
    * Outbound QoS 1 packet ids are per-broker sequential; PUBACKs are
    * accepted and dropped (no redelivery queue — see class note). */
  private val outId = new java.util.concurrent.atomic.AtomicInteger(0)
  private def route(topic: String, payload: Array[Byte]): Unit = {
    val targets = subs.synchronized {
      subs.toSeq.flatMap { case (out, filters) =>
        filters.collectFirst {
          case (f, qos) if topicMatches(f, topic) => (out, qos)
        }
      }
    }
    targets.foreach { case (out, qos) =>
      val pid = if (qos > 0) (outId.incrementAndGet() & 0xffff).max(1) else 0
      val (flags, body) = publishPacket(topic, payload, qos, pid)
      try writePacket(out, Publish, flags, body)
      catch { case _: Throwable => () } // dead subscriber; its serve loop cleans up
    }
  }

  def close(): Unit = {
    running.set(false)
    try server.close() catch { case _: Throwable => () }
    sockets.synchronized { sockets.foreach(s =>
      try s.close() catch { case _: Throwable => () }) }
  }
}
