package graft

import org.apache.spark.sql.connector.read.streaming.ReadLimit

import graft.net.{MiniBroker, MqttClient}
import graft.sources.{MqttOffset, MqttReceiver, MqttStream}

/** Bounded live-tail soak (round-9 verdict #3): the receiver's claim that
  * "a caught-up live tail ingests forever in constant memory"
  * (MqttSource.scala) was argued from the trim/backlog economics but never
  * driven long. This spec consumes a 16k-message feed in 2000+ tiny
  * micro-batches and asserts — at EVERY commit — that the in-memory
  * backlog and the WAL directory (file count and bytes) stay bounded by
  * backlog + one pump batch + one segment, and that the concatenated batch
  * slices replay the feed exactly once in order. A deliberate mid-run
  * consumer stall drives the backlog up to the cap, proving the
  * backpressure path (pump stalls, TCP flow control holds the broker)
  * engages rather than merely never being needed. */
class MqttSoakSpec extends SparkSpec {

  private def walFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(dir)
    try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq }
    finally s.close()
  }

  test("a 2000-batch live tail keeps backlog and WAL bounded at every " +
      "commit, exercises the backpressure cap, and replays exactly once") {
    val broker = new MiniBroker()
    try {
      val walDir = java.nio.file.Files.createTempDirectory("mqtt_soak")
      val cid = s"soak-${broker.port}"
      val maxBuffered = 200
      val rollEvery = 64
      val n = 16000
      val receiver = MqttReceiver("127.0.0.1", broker.port, "soak/#",
        clientId = cid, maxBuffered = maxBuffered,
        walDir = Some(walDir.toString), walRollEvery = rollEvery)
      val stream = new MqttStream("127.0.0.1", broker.port, Seq("soak/#"),
        cid, 8L, Some(walDir.toString))
      val pubThread = new Thread(() => {
        val pub = new MqttClient("127.0.0.1", broker.port, "soak-pub").connect()
        for (i <- 0 until n) pub.publish("soak/x", s"s$i")
        pub.close()
      }, "soak-pub")
      pubThread.start()
      // one pumpOnce drain can overshoot the cap check by its batch bound
      // (512), so that is the honest backlog ceiling; segments follow it
      val backlogBound = maxBuffered + 512
      val segmentBound = backlogBound / rollEvery + 2
      val got = Vector.newBuilder[String]
      var cur = 0L
      var commits = 0
      var maxBacklog = 0L
      var maxWalBytes = 0L
      var stalled = false
      val deadline = System.currentTimeMillis() + 180000
      while (cur < n && System.currentTimeMillis() < deadline) {
        // mid-run consumer stall: let the publisher run ahead until the
        // receiver's cap engages, so the bounds below are tested under
        // backpressure, not just on a drained tail
        if (!stalled && cur >= n / 4) {
          stalled = true
          val stallUntil = System.currentTimeMillis() + 5000
          while (receiver.size - receiver.baseOffset < maxBuffered &&
              System.currentTimeMillis() < stallUntil)
            Thread.sleep(10)
        }
        val end = stream.latestOffset(MqttOffset(cur), ReadLimit.maxRows(8))
          .asInstanceOf[MqttOffset].emitted
        if (end == cur) Thread.sleep(1)
        else {
          // consume through the reader factory, exactly as an executor
          // would — with a walDir these are MqttWalSlice partitions, so
          // the 2000-commit soak also exercises the segment-file reader
          stream.planInputPartitions(MqttOffset(cur), MqttOffset(end))
            .foreach { p =>
              val rd = graft.sources.MqttReaderFactory.createReader(p)
              while (rd.next()) got += rd.get().getString(1)
              rd.close()
            }
          stream.commit(MqttOffset(end))
          cur = end
          commits += 1
          val backlog = receiver.size - receiver.baseOffset
          maxBacklog = math.max(maxBacklog, backlog)
          assert(backlog <= backlogBound,
            s"backlog $backlog exceeded bound $backlogBound at commit $commits")
          val files = walFiles(walDir)
          assert(files.size <= segmentBound,
            s"${files.size} WAL segments exceeded bound $segmentBound " +
              s"at commit $commits")
          val bytes = files.map(java.nio.file.Files.size).sum
          maxWalBytes = math.max(maxWalBytes, bytes)
        }
      }
      pubThread.join(30000)
      cur shouldBe n
      commits should be >= 2000 // ≤8-row batches: a genuinely long tail
      // the stall really drove the cap: backpressure engaged, then drained
      maxBacklog should be >= maxBuffered.toLong
      // drained tail: the WAL is back to at most base-boundary + active
      walFiles(walDir).size should be <= 2
      // WAL bytes never exceeded ~30 B/record over the backlog+segment span
      maxWalBytes should be <= ((backlogBound + 2 * rollEvery) * 64L)
      // exactly-once, in-order replay of the whole feed through the
      // batched slices — no loss, no dups, across 2000+ commits
      got.result() shouldBe (0 until n).map(i => s"s$i").toVector
      MqttReceiver.stop("127.0.0.1", broker.port, "soak/#", cid)
    } finally broker.close()
  }
}
