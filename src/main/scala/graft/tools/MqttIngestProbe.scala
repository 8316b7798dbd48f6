package graft.tools

import graft.net.{MiniBroker, MqttClient}
import graft.sources.{MqttReaderFactory, MqttReceiver, MqttSlice, MqttStream, MqttWalSlice}

/** Ingest-edge throughput probe for the sharded MQTT source (round-9
  * verdict #2): measures wall time for P concurrent QoS 1 publishers to
  * push N messages through the loopback broker into K shard receivers
  * (K topic filters, one receiver/session/pump per shard — exactly what
  * the `topics = "f0,f1,..."` option gives the DSv2 source). The K=1 column is the
  * round-9 single-endpoint ceiling; K>1 shows the ceiling lifting because
  * the per-shard pumps, sockets, and (when enabled) WAL fsyncs run in
  * parallel, mirroring the reference deployment's N-generator fan-in
  * (reference/docker-compose.yml scales `mqttgen` containers against one
  * broker).
  *
  * Run: `sbt "runMain graft.tools.MqttIngestProbe [nMessages] [publishers]
  * [shardCounts...]"` — defaults 40000 4 1 2 4. One JSON line per shard
  * count: messages, wall seconds, msg/s. Publishers split evenly across
  * shards (a publisher publishes to ONE shard's topic — per-shard audit
  * stays exact); each publisher runs its own QoS 1 sync-ack loop, so
  * publisher-side latency is identical across configs and the delta
  * isolates the receive edge. */
object MqttIngestProbe {

  /** Drain the ingested backlog through the DSv2 batch machinery exactly
    * as the stream would — latestOffset / planInputPartitions / reader /
    * commit — and report (seconds, rows, partition-payload bytes). The
    * payload bytes are what the DRIVER serializes into tasks per batch:
    * with driver-resident [[MqttSlice]]s that is every row byte again;
    * with WAL-backed [[MqttWalSlice]]s it is a path + two offsets per
    * shard, the round-12 executor-read path (round-11 verdict #4). */
  private def drain(stream: MqttStream, total: Long): (Double, Long, Long) = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    var cur = stream.initialOffset()
    var drained = 0L
    var shipped = 0L
    val t0 = System.nanoTime()
    val deadline = System.currentTimeMillis() + 120000
    while (drained < total && System.currentTimeMillis() < deadline) {
      val end = stream.latestOffset(cur, ReadLimit.maxRows(8192))
      if (end == cur) Thread.sleep(1)
      else {
        stream.planInputPartitions(cur, end).foreach { p =>
          shipped += (p match {
            case MqttSlice(rows) =>
              val u8 = java.nio.charset.StandardCharsets.UTF_8
              rows.iterator.map(r => r._1.getBytes(u8).length +
                r._2.getBytes(u8).length + 8L).sum
            case w: MqttWalSlice => w.dir.length + 16L
          })
          val rd = MqttReaderFactory.createReader(p)
          while (rd.next()) { rd.get(); drained += 1 }
          rd.close()
        }
        stream.commit(end)
        cur = end
      }
    }
    require(drained == total, s"drain incomplete: $drained of $total")
    ((System.nanoTime() - t0) / 1e9, drained, shipped)
  }

  def run(n: Int, publishers: Int, shards: Int,
      walDir: Option[String]): (Double, Long, Double, Long) = {
    val broker = new MiniBroker()
    val cid = s"probe-$shards"
    try {
      // stop-in-finally: a drain timeout, a failed assertion, or a shard
      // receiver whose CONSTRUCTOR throws partway through the fan-out must
      // not leak registered receivers whose pumps reconnect-loop against
      // the closed broker forever (round-10 review, both passes); stop()
      // of a never-created shard is a no-op
      val receivers = (0 until shards).map { s =>
        MqttReceiver("127.0.0.1", broker.port, s"pr/$s/#",
          clientId = s"$cid-s$s", walDir = walDir.map(d => s"$d/shard-$s"))
      }
      val perPub = n / publishers
      val threads = (0 until publishers).map { p =>
        val shard = p % shards
        new Thread(() => {
          val c = new MqttClient("127.0.0.1", broker.port, s"pub-$p").connect()
          for (i <- 0 until perPub) c.publish(s"pr/$shard/x", s"m$p-$i")
          c.close()
        }, s"probe-pub-$p")
      }
      val total = perPub.toLong * publishers
      val t0 = System.nanoTime()
      threads.foreach(_.start())
      threads.foreach(_.join())
      val deadline = System.currentTimeMillis() + 120000
      while (receivers.map(_.size).sum < total &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(5)
      val sec = (System.nanoTime() - t0) / 1e9
      val got = receivers.map(_.size).sum
      require(got == total, s"ingest incomplete: $got of $total")
      // drain the backlog through the DSv2 batch path (reuses the shard
      // receivers via the registry — same clientIds, same walDirs)
      val stream =
        if (shards == 1) new MqttStream("127.0.0.1", broker.port,
          Seq("pr/0/#"), s"$cid-s0", 8192L, walDir.map(d => s"$d/shard-0"))
        else new MqttStream("127.0.0.1", broker.port,
          (0 until shards).map(s => s"pr/$s/#"), cid, 8192L, walDir)
      val (dSec, _, shipped) = drain(stream, total)
      (sec, got, dSec, shipped)
    } finally {
      try (0 until shards).foreach(s => MqttReceiver.stop(
        "127.0.0.1", broker.port, s"pr/$s/#", s"$cid-s$s"))
      finally broker.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(40000)
    val publishers = args.lift(1).map(_.toInt).getOrElse(4)
    val shardCounts =
      if (args.length > 2) args.drop(2).toSeq.map(_.toInt) else Seq(1, 2, 4)
    // one throwaway warmup so JIT/class-loading lands outside the timings
    run(2000, publishers, 1, None)
    for (k <- shardCounts; wal <- Seq(false, true)) {
      val dir =
        if (wal) Some(java.nio.file.Files
          .createTempDirectory(s"ingest_probe_$k").toString)
        else None
      val (sec, got, dSec, shipped) = run(n, publishers, k, dir)
      println(f"""{"shards":$k,"publishers":$publishers,"wal":$wal,""" +
        f""""messages":$got,"sec":${math.rint(sec * 1000) / 1000}%s,""" +
        f""""msg_per_sec":${math.rint(got / sec)}%.0f,""" +
        f""""drain_sec":${math.rint(dSec * 1000) / 1000}%s,""" +
        f""""drain_msg_per_sec":${math.rint(got / dSec)}%.0f,""" +
        f""""driver_shipped_bytes":$shipped}""")
    }
  }
}
