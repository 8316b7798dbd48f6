package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.functions._

import graft.net.{MiniBroker, Mqtt, MqttClient}
import graft.sources.{MqttReceiver, MqttSink, SensorGen}
import graft.streaming.SensorPipeline

/** The MQTT transport stack, loopback end-to-end: wire codec, client ↔
  * broker round-trips (QoS 1, wildcards, interleaving), and the DSv2
  * source driving broker-published sensor payloads through the R2 parse
  * stage inside a real micro-batch query. */
class MqttSpec extends SparkSpec {

  test("remaining-length varint round-trips at every boundary") {
    for (n <- Seq(0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 268435455)) {
      val bo = new ByteArrayOutputStream()
      Mqtt.writeRemainingLength(new DataOutputStream(bo), n)
      val bytes = bo.toByteArray
      bytes.length shouldBe (n match {
        case x if x < 128 => 1
        case x if x < 16384 => 2
        case x if x < 2097152 => 3
        case _ => 4
      })
      Mqtt.readRemainingLength(
        new DataInputStream(new ByteArrayInputStream(bytes))) shouldBe n
    }
  }

  test("packet framing round-trips with flags and payload intact") {
    val (flags, body) = Mqtt.publishPacket("sensors/1", "hello".getBytes, qos = 1,
      packetId = 77)
    val bo = new ByteArrayOutputStream()
    Mqtt.writePacket(new DataOutputStream(bo), Mqtt.Publish, flags, body)
    val p = Mqtt.readPacket(
      new DataInputStream(new ByteArrayInputStream(bo.toByteArray)))
    p.ptype shouldBe Mqtt.Publish
    p.flags shouldBe flags
    val r = new Mqtt.BodyReader(p.body)
    r.readUtf() shouldBe "sensors/1"
    r.readU16() shouldBe 77
    new String(r.rest()) shouldBe "hello"
  }

  test("topic filters: + is one level, # is the tail, $ topics opt out") {
    val cases = Seq(
      ("sensors/#", "sensors/1/temp", true),
      ("sensors/#", "sensors", true), // parent matches per spec
      ("#", "a/b/c", true),
      ("sensors/+/temp", "sensors/1/temp", true),
      ("sensors/+/temp", "sensors/1/2/temp", false),
      ("sensors/+", "sensors/1/temp", false),
      ("sensors/1", "sensors/1", true),
      ("sensors/1", "sensors/2", false),
      ("+/1", "sensors/1", true),
      ("#", "$SYS/stats", false),
      ("+/stats", "$SYS/stats", false))
    for ((f, t, want) <- cases)
      withClue(s"$f vs $t: ") { Mqtt.topicMatches(f, t) shouldBe want }
  }

  test("client publishes QoS 1 through the broker to a wildcard subscriber") {
    val broker = new MiniBroker()
    try {
      val sub = new MqttClient("127.0.0.1", broker.port, "sub-1").connect()
      sub.subscribe("sensors/#", qos = 1) shouldBe 1
      val pub = new MqttClient("127.0.0.1", broker.port, "pub-1").connect()
      val n = 200
      for (i <- 0 until n)
        pub.publish(s"sensors/${i % 3}", s"m$i") // QoS 1: each awaits PUBACK
      val got = (0 until n).flatMap(_ => sub.receive(2000))
      got.size shouldBe n
      // per-publisher order is preserved and payload/topic pairing is intact
      got.map(_.payloadString) shouldBe (0 until n).map(i => s"m$i")
      all(got.zipWithIndex.map { case (m, i) =>
        m.topic == s"sensors/${i % 3}" }) shouldBe true
      // a non-matching topic is not delivered
      pub.publish("other/1", "nope")
      pub.publish("sensors/9", "yes")
      sub.receive(2000).map(_.payloadString) shouldBe Some("yes")
      pub.close(); sub.close()
    } finally broker.close()
  }

  test("two subscribers with disjoint filters each get exactly their slice") {
    val broker = new MiniBroker()
    try {
      val a = new MqttClient("127.0.0.1", broker.port, "sub-a").connect()
      a.subscribe("t/a", qos = 0)
      val b = new MqttClient("127.0.0.1", broker.port, "sub-b").connect()
      b.subscribe("t/+", qos = 1)
      val pub = new MqttClient("127.0.0.1", broker.port, "pub-2").connect()
      pub.publish("t/a", "for-both")
      pub.publish("t/b", "for-b")
      a.receive(2000).map(_.payloadString) shouldBe Some("for-both")
      a.receive(300) shouldBe None
      b.receive(2000).map(_.payloadString) shouldBe Some("for-both")
      b.receive(2000).map(_.payloadString) shouldBe Some("for-b")
      pub.close(); a.close(); b.close()
    } finally broker.close()
  }

  test("full R1-R5 pipeline over MQTT equals the file-source replay on " +
      "identical payloads") {
    val lines = (1L to 500L).map(SensorGen.payload(
      seed = 42L, startEpoch = 1700000000L, intervalMs = 1000L, thread = 0, _))
    val inDir = java.nio.file.Files.createTempDirectory("mqtt_pipe_in")
    java.nio.file.Files.write(inDir.resolve("data.txt"),
      lines.mkString("\n").getBytes("UTF-8"))
    val fileOut = SensorPipeline.replay(spark, inDir.toString,
      java.nio.file.Files.createTempDirectory("mqtt_pipe_file").toString)
    val broker = new MiniBroker()
    try {
      val receiver = MqttReceiver("127.0.0.1", broker.port, "pipe/#",
        clientId = s"pipe-${broker.port}")
      val pub = new MqttClient("127.0.0.1", broker.port, "pub-p").connect()
      lines.foreach(l => pub.publish("pipe/s", l))
      pub.close()
      val deadline = System.currentTimeMillis() + 15000
      while (receiver.size < lines.size && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      receiver.size shouldBe lines.size
      val raw = spark.readStream.format("graft-mqtt")
        .option("host", "127.0.0.1").option("port", broker.port)
        .option("topic", "pipe/#").option("clientId", s"pipe-${broker.port}")
        .load()
        .select(col("value"))
      val mqttOut = SensorPipeline.replayFrom(spark, raw,
        java.nio.file.Files.createTempDirectory("mqtt_pipe_mqtt").toString)
      for ((pa, pb) <- Seq(fileOut.raw -> mqttOut.raw,
          fileOut.filtered -> mqttOut.filtered, fileOut.agg -> mqttOut.agg)) {
        val da = spark.read.parquet(pa)
        val db = spark.read.parquet(pb)
        withClue(s"$pa vs $pb: ") {
          da.count() shouldBe db.count()
          da.exceptAll(db).count() shouldBe 0
          db.exceptAll(da).count() shouldBe 0
        }
      }
    } finally broker.close()
  }

  test("MqttSink publishes the filtered pipeline output as JSON, " +
      "round-tripping through the broker intact") {
    val broker = new MiniBroker()
    try {
      val sub = new MqttClient("127.0.0.1", broker.port, "sink-sub").connect()
      sub.subscribe("out/filtered", qos = 1)
      // the R5 shape: filtered events, JSON-serialized, one message per row
      val lines = (1L to 120L).map(SensorGen.payload(
        seed = 7L, startEpoch = 1700000000L, intervalMs = 1000L, thread = 0, _))
      import SparkSpec.spark.implicits._
      val filtered = SensorPipeline.parse(lines.toDF("value"))
        .filter(SensorPipeline.isValid(col("temperature"), col("humidity")))
      val expected = filtered.toJSON.collect().sorted
      MqttSink.publish(filtered, "127.0.0.1", broker.port, "out/filtered")
      val got = (0 until expected.length).flatMap(_ => sub.receive(2000))
      got.size shouldBe expected.length
      got.map(_.payloadString).sorted shouldBe expected.toSeq
      sub.receive(300) shouldBe None // nothing extra
      sub.close()
    } finally broker.close()
  }

  test("DSv2 source: a restarted query resumes from its checkpoint with " +
      "no loss or duplication") {
    val broker = new MiniBroker()
    try {
      val receiver = MqttReceiver("127.0.0.1", broker.port, "rt/#",
        clientId = s"restart-${broker.port}")
      val pub = new MqttClient("127.0.0.1", broker.port, "pub-r").connect()
      def publishBatch(from: Int, until: Int): Unit =
        for (i <- from until until) pub.publish("rt/x", s"p$i")
      publishBatch(0, 300)
      val deadline = System.currentTimeMillis() + 15000
      while (receiver.size < 300 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val ckpt = java.nio.file.Files.createTempDirectory("mqtt_rt_ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("mqtt_rt_out").toString
      def startQuery() = spark.readStream.format("graft-mqtt")
        .option("host", "127.0.0.1").option("port", broker.port)
        .option("topic", "rt/#").option("clientId", s"restart-${broker.port}")
        .option("rowsPerBatch", 100L)
        .load()
        .writeStream.format("parquet")
        .option("path", s"$outDir/data").option("checkpointLocation", ckpt)
        .start()
      val q1 = startQuery()
      q1.processAllAvailable(); q1.stop()
      // more data arrives while no query is running; the receiver (the
      // in-process stand-in for broker-side session redelivery) buffers it
      publishBatch(300, 500)
      while (receiver.size < 500 && System.currentTimeMillis() < deadline + 15000)
        Thread.sleep(50)
      val q2 = startQuery()
      q2.processAllAvailable(); q2.stop()
      pub.close()
      val got = spark.read.parquet(s"$outDir/data")
        .select(col("value")).collect().map(_.getString(0)).sorted
      got.length shouldBe 500
      got.toSeq shouldBe (0 until 500).map(i => s"p$i").sorted
    } finally broker.close()
  }

  test("broker resumes a persistent session: un-acked QoS 1 messages are " +
      "redelivered after a crashed socket, with original packet ids") {
    val broker = new MiniBroker()
    try {
      val sub = new MqttClient("127.0.0.1", broker.port, "dur-sub",
        cleanSession = false).connect()
      sub.sessionPresent shouldBe false
      sub.subscribe("d/#", qos = 1) shouldBe 1
      val pub = new MqttClient("127.0.0.1", broker.port, "dur-pub").connect()
      for (i <- 0 until 100) pub.publish("d/x", s"a$i")
      // consume-and-ack a prefix, then crash without DISCONNECT
      val before = (0 until 30).flatMap(_ => sub.receive(2000)).map(_.payloadString)
      before.size shouldBe 30
      Thread.sleep(200) // let the broker process the in-flight PUBACKs
      sub.abort()
      // published while the subscriber is down: queued in the session
      for (i <- 0 until 50) pub.publish("d/y", s"b$i")
      // resume: same clientId, cleanSession=false — session-present, the
      // retained subscription needs no re-SUBSCRIBE, and every un-acked
      // message comes back (DUP set on re-attempts)
      val sub2 = new MqttClient("127.0.0.1", broker.port, "dur-sub",
        cleanSession = false).connect()
      sub2.sessionPresent shouldBe true
      val got = scala.collection.mutable.Set.empty[String]
      val deadline = System.currentTimeMillis() + 20000
      while (got.size < 120 && System.currentTimeMillis() < deadline)
        sub2.receiveRaw(500).foreach { case (m, pid, _) =>
          got += m.payloadString
          if (pid > 0) sub2.ack(pid)
        }
      // no loss: every message not acked before the crash arrives on resume
      val expected = ((30 until 100).map(i => s"a$i") ++
        (0 until 50).map(i => s"b$i")).toSet
      got.toSet should contain allElementsOf expected
      // nothing re-acked resurfaces: the acked prefix must NOT be redelivered
      got.intersect(before.toSet) shouldBe empty
      pub.close(); sub2.close()
    } finally broker.close()
  }

  test("QoS 2 publish delivers exactly once through the full " +
      "PUBREC/PUBREL/PUBCOMP handshake") {
    val broker = new MiniBroker()
    try {
      val sub = new MqttClient("127.0.0.1", broker.port, "q2-sub").connect()
      sub.subscribe("q2/#", qos = 2) shouldBe 2
      val pub = new MqttClient("127.0.0.1", broker.port, "q2-pub").connect()
      val n = 100
      for (i <- 0 until n)
        pub.publish("q2/x", s"e$i".getBytes("UTF-8"), qos = 2) // blocks per handshake
      val got = (0 until n).flatMap(_ => sub.receive(2000)).map(_.payloadString)
      got.size shouldBe n
      got shouldBe (0 until n).map(i => s"e$i") // in order, exactly once
      sub.receive(300) shouldBe None // and nothing extra
      // granted ceiling caps delivery: a QoS 2 publish to a QoS 0 grantee
      // arrives exactly once as QoS 0 (min of the two)
      val sub0 = new MqttClient("127.0.0.1", broker.port, "q2-sub0").connect()
      sub0.subscribe("q2/#", qos = 0) shouldBe 0
      pub.publish("q2/y", "capped".getBytes("UTF-8"), qos = 2)
      sub0.receive(2000).map(_.payloadString) shouldBe Some("capped")
      sub0.receive(300) shouldBe None
      pub.close(); sub.close(); sub0.close()
    } finally broker.close()
  }

  test("QoS 2 session resume: messages past PUBREC are released via " +
      "PUBREL only — never delivered twice; unseen ones arrive once") {
    val broker = new MiniBroker()
    try {
      val sub = new MqttClient("127.0.0.1", broker.port, "q2-dur",
        cleanSession = false).connect()
      sub.subscribe("qd/#", qos = 2) shouldBe 2
      val pub = new MqttClient("127.0.0.1", broker.port, "q2-dpub").connect()
      for (i <- 0 until 60) pub.publish("qd/x", s"d$i".getBytes("UTF-8"), qos = 2)
      // fully consume a prefix (receive PUBRECs at hand-over; the pump
      // answers the broker's PUBRELs as they arrive on later receives)
      val before = (0 until 20).flatMap(_ => sub.receive(2000)).map(_.payloadString)
      before.size shouldBe 20
      Thread.sleep(200) // let in-flight PUBREC/PUBREL/PUBCOMP rounds settle
      sub.abort()
      for (i <- 0 until 15) pub.publish("qd/y", s"q$i".getBytes("UTF-8"), qos = 2)
      val sub2 = new MqttClient("127.0.0.1", broker.port, "q2-dur",
        cleanSession = false).connect()
      sub2.sessionPresent shouldBe true
      val resumed = scala.collection.mutable.Buffer.empty[String]
      val deadline = System.currentTimeMillis() + 20000
      while (resumed.size < 55 && System.currentTimeMillis() < deadline)
        sub2.receive(500).foreach(m => resumed += m.payloadString)
      // every message not consumed before the crash arrives EXACTLY once
      val expected = ((20 until 60).map(i => s"d$i") ++
        (0 until 15).map(i => s"q$i")).sorted
      resumed.sorted.toSeq shouldBe expected
      // and the consumed prefix (PUBREC'd, relPhase broker-side) is only
      // ever released via PUBREL — it must not resurface as a message
      resumed.toSet.intersect(before.toSet) shouldBe empty
      pub.close(); sub2.close()
    } finally broker.close()
  }

  test("a resumed QoS 2 publisher reusing a packet id is routed, not " +
      "silently swallowed by stale handshake state") {
    // The in-repo client has no outbound persistence: after a crash it
    // starts a fresh pid sequence and never re-sends PUBLISH/PUBREL. If
    // the broker retained inbound QoS 2 pid state across a session resume,
    // a reused pid would alias a BRAND-NEW message — completing the whole
    // handshake while routing nothing (round-9 review). Drive the wire by
    // hand to pin the exact crash window: PUBLISH sent, PUBREC received,
    // socket dies before PUBREL.
    val broker = new MiniBroker()
    try {
      val sub = new MqttClient("127.0.0.1", broker.port, "st-sub").connect()
      sub.subscribe("st/#", qos = 2) shouldBe 2
      def rawConnect() = {
        val s = new java.net.Socket("127.0.0.1", broker.port)
        val out = new DataOutputStream(new java.io.BufferedOutputStream(s.getOutputStream))
        val in = new DataInputStream(new java.io.BufferedInputStream(s.getInputStream))
        Mqtt.writePacket(out, Mqtt.Connect, 0,
          Mqtt.connectBody("st-pub", cleanSession = false, keepAliveSec = 0))
        Mqtt.readPacket(in).ptype shouldBe Mqtt.Connack
        (s, out, in)
      }
      val (s1, o1, i1) = rawConnect()
      val (f1, b1) = Mqtt.publishPacket("st/x", "first".getBytes("UTF-8"),
        qos = 2, packetId = 1)
      Mqtt.writePacket(o1, Mqtt.Publish, f1, b1)
      Mqtt.readPacket(i1).ptype shouldBe Mqtt.Pubrec
      s1.close() // crash before PUBREL — pid 1 would linger in inboundRec
      sub.receive(2000).map(_.payloadString) shouldBe Some("first")
      // resume the persistent session; a fresh pid sequence reuses pid 1
      // for a NEW message — it must reach the subscriber
      val (s2, o2, i2) = rawConnect()
      val (f2, b2) = Mqtt.publishPacket("st/x", "second".getBytes("UTF-8"),
        qos = 2, packetId = 1)
      Mqtt.writePacket(o2, Mqtt.Publish, f2, b2)
      Mqtt.readPacket(i2).ptype shouldBe Mqtt.Pubrec
      Mqtt.writePacket(o2, Mqtt.Pubrel, 0x2, Mqtt.u16(1))
      Mqtt.readPacket(i2).ptype shouldBe Mqtt.Pubcomp
      sub.receive(2000).map(_.payloadString) shouldBe Some("second")
      s2.close(); sub.close()
    } finally broker.close()
  }

  test("receiver ingests a QoS 2 publisher exactly once through a " +
      "hard-dropped socket") {
    val broker = new MiniBroker()
    try {
      val receiver = MqttReceiver("127.0.0.1", broker.port, "k2/#",
        clientId = s"k2-${broker.port}")
      val n = 600
      val pubThread = new Thread(() => {
        val pub = new MqttClient("127.0.0.1", broker.port, "k2-pub").connect()
        for (i <- 0 until n)
          pub.publish("k2/x", s"z$i".getBytes("UTF-8"), qos = 2)
        pub.close()
      }, "k2-pub")
      pubThread.start()
      val deadline0 = System.currentTimeMillis() + 30000
      while (receiver.size < n / 3 && System.currentTimeMillis() < deadline0)
        Thread.sleep(10)
      receiver.abortConnection()
      pubThread.join(60000)
      val deadline = System.currentTimeMillis() + 30000
      while (receiver.size < n && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      broker.droppedOverflow(s"k2-${broker.port}") shouldBe 0
      receiver.size shouldBe n
      receiver.slice(0, n).map(_._2).sorted.toSeq shouldBe
        (0 until n).map(i => s"z$i").sorted
      MqttReceiver.stop("127.0.0.1", broker.port, "k2/#", s"k2-${broker.port}")
    } finally broker.close()
  }

  test("a persistent connect over a live clean session gets a FRESH " +
      "session and is not blackholed by the booted connection's cleanup") {
    val broker = new MiniBroker()
    try {
      val a = new MqttClient("127.0.0.1", broker.port, "takeover",
        cleanSession = true).connect()
      a.subscribe("cs/#", qos = 1)
      // same clientId, persistent: must NOT resume the live clean session
      val b = new MqttClient("127.0.0.1", broker.port, "takeover",
        cleanSession = false).connect()
      b.sessionPresent shouldBe false // a clean session is never resumable
      b.subscribe("cs/#", qos = 1)
      Thread.sleep(200) // let the booted connection's serve loop clean up
      val pub = new MqttClient("127.0.0.1", broker.port, "cs-pub").connect()
      pub.publish("cs/x", "after-takeover")
      b.receive(2000).map(_.payloadString) shouldBe Some("after-takeover")
      pub.close(); b.close()
    } finally broker.close()
  }

  test("a clean-session reconnect discards server state: no session-present, " +
      "no redelivery, no retained subscription") {
    val broker = new MiniBroker()
    try {
      val s1 = new MqttClient("127.0.0.1", broker.port, "wipe",
        cleanSession = false).connect()
      s1.subscribe("wipe/#", qos = 1)
      val pub = new MqttClient("127.0.0.1", broker.port, "wipe-pub").connect()
      for (i <- 0 until 5) pub.publish("wipe/x", s"m$i")
      s1.abort() // un-acked messages now pending in the persistent session
      val s2 = new MqttClient("127.0.0.1", broker.port, "wipe",
        cleanSession = true).connect()
      s2.sessionPresent shouldBe false
      s2.receive(500) shouldBe None // pending discarded with the old session
      pub.publish("wipe/y", "fresh")
      s2.receive(500) shouldBe None // subscription discarded too
      pub.close(); s2.close()
    } finally broker.close()
  }

  test("receiver survives a hard-dropped socket mid-stream: broker " +
      "redelivery + pid dedup close the audit with no loss and no dups") {
    val broker = new MiniBroker()
    try {
      val receiver = MqttReceiver("127.0.0.1", broker.port, "kill/#",
        clientId = s"kill-${broker.port}")
      val n = 2000
      val pubThread = new Thread(() => {
        val pub = new MqttClient("127.0.0.1", broker.port, "kill-pub").connect()
        for (i <- 0 until n) pub.publish("kill/x", s"k$i")
        pub.close()
      }, "kill-pub")
      pubThread.start()
      // crash the receiver's connection twice, mid-stream — while QoS 1
      // deliveries and acks are in full flight
      val deadline0 = System.currentTimeMillis() + 30000
      for (cut <- Seq(n / 10, n / 2)) {
        while (receiver.size < cut && System.currentTimeMillis() < deadline0)
          Thread.sleep(10)
        receiver.abortConnection()
      }
      pubThread.join(60000)
      val deadline = System.currentTimeMillis() + 30000
      while (receiver.size < n && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      // no loss AND no duplication: exactly the published multiset —
      // and the broker never hit its queue limit (a nonzero drop count
      // would make "no loss" vacuous rather than proven)
      broker.droppedOverflow(s"kill-${broker.port}") shouldBe 0
      receiver.size shouldBe n
      val got = receiver.slice(0, n).map(_._2).sorted
      got.toSeq shouldBe (0 until n).map(i => s"k$i").sorted
      MqttReceiver.stop("127.0.0.1", broker.port, "kill/#", s"kill-${broker.port}")
    } finally broker.close()
  }

  test("walDir makes offsets durable: a query restarted in a NEW session " +
      "and a NEW receiver resumes from its checkpoint with no loss or dups") {
    val broker = new MiniBroker()
    try {
      val walDir = java.nio.file.Files.createTempDirectory("mqtt_wal").toString
      val cid = s"wal-${broker.port}"
      val receiver = MqttReceiver("127.0.0.1", broker.port, "wal/#",
        clientId = cid, walDir = Some(walDir))
      val pub = new MqttClient("127.0.0.1", broker.port, "wal-pub").connect()
      for (i <- 0 until 300) pub.publish("wal/x", s"w$i")
      val deadline = System.currentTimeMillis() + 15000
      while (receiver.size < 300 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val ckpt = java.nio.file.Files.createTempDirectory("mqtt_wal_ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("mqtt_wal_out").toString
      def startQuery(s: org.apache.spark.sql.SparkSession) =
        s.readStream.format("graft-mqtt")
          .option("host", "127.0.0.1").option("port", broker.port)
          .option("topic", "wal/#").option("clientId", cid)
          .option("rowsPerBatch", 100L).option("walDir", walDir)
          .load()
          .writeStream.format("parquet")
          .option("path", s"$outDir/data").option("checkpointLocation", ckpt)
          .start()
      val q1 = startQuery(spark)
      q1.processAllAvailable(); q1.stop()
      // "process death": the receiver object is discarded entirely; only
      // the WAL directory and the broker-side persistent session survive
      MqttReceiver.stop("127.0.0.1", broker.port, "wal/#", cid)
      // arrives while nothing is listening — queued broker-side
      for (i <- 0 until 200) pub.publish("wal/x", s"x$i")
      pub.close()
      // "new process": a fresh receiver recovers the WAL (committed offsets
      // stay addressable) and the broker redelivers the queued tail; the
      // restarted query runs in a NEW SparkSession against the checkpoint
      val receiver2 = MqttReceiver("127.0.0.1", broker.port, "wal/#",
        clientId = cid, walDir = Some(walDir))
      val deadline2 = System.currentTimeMillis() + 15000
      while (receiver2.size < 500 && System.currentTimeMillis() < deadline2)
        Thread.sleep(50)
      receiver2.size shouldBe 500
      broker.droppedOverflow(cid) shouldBe 0 // queue limit never voided no-loss
      val spark2 = spark.newSession()
      val q2 = startQuery(spark2)
      q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(s"$outDir/data")
        .select(col("value")).collect().map(_.getString(0)).sorted
      got.length shouldBe 500
      got.toSeq shouldBe ((0 until 300).map(i => s"w$i") ++
        (0 until 200).map(i => s"x$i")).sorted
      MqttReceiver.stop("127.0.0.1", broker.port, "wal/#", cid)
    } finally broker.close()
  }

  test("injected PUBREL loss: the release is re-driven on session resume " +
      "and the QoS 2 message is never delivered twice") {
    val broker = new MiniBroker()
    try {
      val sub = new MqttClient("127.0.0.1", broker.port, "fi-rel",
        cleanSession = false).connect()
      sub.subscribe("rel/#", qos = 2) shouldBe 2
      val pub = new MqttClient("127.0.0.1", broker.port, "fi-rel-pub").connect()
      broker.dropPubrels.set(1) // lose the next release on the wire
      pub.publish("rel/x", "one".getBytes("UTF-8"), qos = 2)
      sub.receive(2000).map(_.payloadString) shouldBe Some("one")
      // the handshake is now stuck in relPhase broker-side: PUBREC
      // arrived, PUBREL was dropped. A later message still flows (the
      // stall is per-pid, not per-connection)
      pub.publish("rel/x", "two".getBytes("UTF-8"), qos = 2)
      sub.receive(2000).map(_.payloadString) shouldBe Some("two")
      Thread.sleep(200) // let in-flight acks land broker-side
      sub.abort()
      // resume: the broker must re-drive PUBREL (never the message) for
      // the stuck pid; the fresh client answers PUBCOMP transparently
      val sub2 = new MqttClient("127.0.0.1", broker.port, "fi-rel",
        cleanSession = false).connect()
      sub2.sessionPresent shouldBe true
      sub2.receive(500) shouldBe None // "one" does NOT resurface
      Thread.sleep(200) // PUBREL→PUBCOMP tail completes
      sub2.abort()
      // a SECOND resume proves the pending entry really cleared: nothing
      // left to re-drive
      val sub3 = new MqttClient("127.0.0.1", broker.port, "fi-rel",
        cleanSession = false).connect()
      sub3.sessionPresent shouldBe true
      sub3.receive(500) shouldBe None
      pub.publish("rel/x", "three".getBytes("UTF-8"), qos = 2)
      sub3.receive(2000).map(_.payloadString) shouldBe Some("three")
      sub3.receive(300) shouldBe None
      pub.close(); sub3.close()
    } finally broker.close()
  }

  test("injected stale-pid DUP redeliveries: the receiver's content-hash " +
      "defense keeps wrap-aliased and corrupted content, skips true dups") {
    val broker = new MiniBroker()
    try {
      val cid = s"fi-${broker.port}"
      val receiver = MqttReceiver("127.0.0.1", broker.port, "fi/#",
        clientId = cid)
      def inject(payload: String, dup: Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 5000
        while (!broker.injectPublish(cid, "fi/x",
            payload.getBytes("UTF-8"), qos = 1, pid = 77, dup = dup) &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(20)
      }
      def waitSize(k: Long): Unit = {
        val deadline = System.currentTimeMillis() + 5000
        while (receiver.size < k && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
      }
      // original delivery under pid 77: buffered, remembered
      inject("alpha", dup = false); waitSize(1)
      receiver.size shouldBe 1
      // true redelivery (lost-ack wire: same pid, same content, DUP):
      // skipped — re-buffering would double-count
      inject("alpha", dup = true)
      Thread.sleep(400)
      receiver.size shouldBe 1
      // pid-space wrap alias: pid 77 reused for DIFFERENT content whose
      // first attempt "was lost" (arrives only as DUP). The pid alone
      // matches the remembered entry — the content hash must keep it
      // (MqttSource.scala's pid-alias defense, exercised on a real wire
      // for the first time — round-9 verdict #4)
      inject("bravo", dup = true); waitSize(2)
      receiver.size shouldBe 2
      // corrupted redelivery (one byte flipped in transit): content no
      // longer matches the remembered delivery — kept as new, never
      // silently merged with the original
      inject("bravp", dup = true); waitSize(3)
      receiver.size shouldBe 3
      receiver.slice(0, 3).map(_._2).toSeq shouldBe Seq("alpha", "bravo", "bravp")
      MqttReceiver.stop("127.0.0.1", broker.port, "fi/#", cid)
    } finally broker.close()
  }

  test("a fresh checkpoint against a recovered walDir starts at the " +
      "recovered base; an OLDER checkpoint fails with the mismatch named") {
    import graft.sources.{MqttOffset, MqttStream}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val broker = new MiniBroker()
    try {
      val walDir = java.nio.file.Files.createTempDirectory("mqtt_stale").toString
      val cid = s"stale-${broker.port}"
      val r1 = MqttReceiver("127.0.0.1", broker.port, "stale/#",
        clientId = cid, walDir = Some(walDir), walRollEvery = 4)
      val pub = new MqttClient("127.0.0.1", broker.port, "stale-pub").connect()
      for (i <- 0 until 20) pub.publish("stale/x", s"s$i")
      pub.close()
      val deadline = System.currentTimeMillis() + 15000
      while (r1.size < 20 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      r1.size shouldBe 20
      val s1 = new MqttStream("127.0.0.1", broker.port, Seq("stale/#"), cid,
        100L, Some(walDir))
      s1.commit(MqttOffset(10)) // a checkpoint committed-and-trimmed to 10
      r1.baseOffset shouldBe 10
      // "process death": only the walDir survives; recovery rounds the
      // base down to the retained segment boundary (10 → 8 at rollEvery=4)
      MqttReceiver.stop("127.0.0.1", broker.port, "stale/#", cid)
      val r2 = MqttReceiver("127.0.0.1", broker.port, "stale/#",
        clientId = cid, walDir = Some(walDir), walRollEvery = 4)
      r2.baseOffset shouldBe 8
      r2.size shouldBe 20
      val s2 = new MqttStream("127.0.0.1", broker.port, Seq("stale/#"), cid,
        100L, Some(walDir))
      // FRESH checkpoint: initialOffset fast-forwards to the recovered base
      // instead of 0 (which would only fail later, in slice, with a
      // misleading message — round-9 advice)
      s2.initialOffset().asInstanceOf[MqttOffset].emitted shouldBe 8
      // OLDER checkpoint (offset below the base): planning fails naming the
      // stale-WAL/checkpoint mismatch, not a slice() internals error
      val e = intercept[IllegalArgumentException](
        s2.latestOffset(MqttOffset(4), ReadLimit.maxRows(100)))
      e.getMessage should include("recovered base")
      // and the fast-forwarded start plans cleanly over the retained range
      val end = s2.latestOffset(MqttOffset(8), ReadLimit.maxRows(100))
        .asInstanceOf[MqttOffset].emitted
      end shouldBe 20
      r2.slice(8, end).map(_._2).toSeq shouldBe (8 until 20).map(i => s"s$i")
      MqttReceiver.stop("127.0.0.1", broker.port, "stale/#", cid)
    } finally broker.close()
  }

  test("sharded source: three topic shards back three input partitions " +
      "with per-shard offsets, and the row cap waterfills across shards") {
    import graft.sources.{MqttOffset, MqttShardOffset, MqttStream}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val broker = new MiniBroker()
    try {
      val cid = s"shard-${broker.port}"
      val stream = new MqttStream("127.0.0.1", broker.port,
        Seq("ms/0/#", "ms/1/#", "ms/2/#"), cid, 100L)
      // initialOffset instantiates the shard receivers = subscribes all
      // three sessions BEFORE anything publishes
      stream.initialOffset() shouldBe MqttShardOffset(IndexedSeq(0L, 0L, 0L))
      val rs = (0 until 3).map(i =>
        MqttReceiver("127.0.0.1", broker.port, s"ms/$i/#", s"$cid-s$i"))
      val pub = new MqttClient("127.0.0.1", broker.port, "ms-pub").connect()
      for (i <- 0 until 90) pub.publish(s"ms/${i % 3}/x", s"m$i") // 30 each
      val deadline = System.currentTimeMillis() + 15000
      while (rs.exists(_.size < 30) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      rs.map(_.size) shouldBe Seq(30L, 30L, 30L)
      val zero = MqttShardOffset(IndexedSeq(0L, 0L, 0L))
      // even availability, cap below total: even split
      stream.latestOffset(zero, ReadLimit.maxRows(45)) shouldBe
        MqttShardOffset(IndexedSeq(15L, 15L, 15L))
      // cap above total: everything
      val all = stream.latestOffset(zero, ReadLimit.maxRows(1000))
      all shouldBe MqttShardOffset(IndexedSeq(30L, 30L, 30L))
      // a hot shard cannot starve the others: extra leftovers flow to it
      // only AFTER every shard got its even share
      for (i <- 0 until 40) pub.publish("ms/0/x", s"h$i")
      while (rs(0).size < 70 && System.currentTimeMillis() < deadline + 15000)
        Thread.sleep(50)
      // cap 60 over avail [70,30,30]: even 20-shares, no leftover phase
      stream.latestOffset(zero, ReadLimit.maxRows(60)) shouldBe
        MqttShardOffset(IndexedSeq(20L, 20L, 20L))
      // cap 100: shards 1/2 saturate at 30, the 7-row leftover then flows
      // to the hot shard — 40/30/30
      stream.latestOffset(zero, ReadLimit.maxRows(100)) shouldBe
        MqttShardOffset(IndexedSeq(40L, 30L, 30L))
      // one partition per shard with data; empty shards planned away
      stream.planInputPartitions(zero, all).length shouldBe 3
      stream.planInputPartitions(all,
        MqttShardOffset(IndexedSeq(70L, 30L, 30L))).length shouldBe 1
      // offset-shape drift (topic list changed under a checkpoint) is loud
      val e = intercept[IllegalArgumentException](
        stream.latestOffset(MqttOffset(0L), ReadLimit.maxRows(10)))
      e.getMessage should include("topic list changed")
      // commit trims each shard independently
      stream.commit(MqttShardOffset(IndexedSeq(70L, 30L, 30L)))
      rs.map(_.baseOffset) shouldBe Seq(70L, 30L, 30L)
      pub.close()
      (0 until 3).foreach(i =>
        MqttReceiver.stop("127.0.0.1", broker.port, s"ms/$i/#", s"$cid-s$i"))
    } finally broker.close()
  }

  test("filter-keyed offsets: a restart validates shard IDENTITY (reordered " +
      "topics fail loudly); legacy array checkpoints keep the count-only check") {
    import graft.sources.{MqttOffset, MqttShardOffset, MqttStream}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    // serde round-trip, no broker needed: the persisted object names each
    // shard's filter, the way Spark's Kafka source keys topic-partitions
    val o = MqttShardOffset(IndexedSeq(12L, 40L),
      IndexedSeq("plant/0/#", "plant/1/#"))
    o.json() shouldBe """{"plant/0/#":12,"plant/1/#":40}"""
    val p = MqttShardOffset.parse(o.json())
    p.emitted shouldBe IndexedSeq(12L, 40L)
    p.filters shouldBe IndexedSeq("plant/0/#", "plant/1/#")
    // round-10 bare-array form still parses, with no filter identity
    val legacy = MqttShardOffset.parse("[12,40]")
    legacy.emitted shouldBe IndexedSeq(12L, 40L)
    legacy.filters shouldBe empty
    // duplicate filters would collapse to one JSON key (and double-ingest):
    // rejected at construction
    val dup = intercept[IllegalArgumentException](
      new MqttStream("127.0.0.1", 1883, Seq("d/#", "d/#"), "dup-cid", 100L))
    dup.getMessage should include("duplicate")

    val broker = new MiniBroker()
    try {
      val cid = s"ident-${broker.port}"
      val topics = Seq("id/a/#", "id/b/#", "id/c/#")
      val s1 = new MqttStream("127.0.0.1", broker.port, topics, cid, 100L)
      val end = s1.latestOffset(s1.initialOffset(), ReadLimit.maxRows(10))
      // the stream now persists filter identity...
      end.json() should startWith("{")
      // ...and deserializeOffset reads back all three persisted forms
      val back = s1.deserializeOffset(end.json()).asInstanceOf[MqttShardOffset]
      back.filters shouldBe topics.toIndexedSeq
      s1.deserializeOffset("[0,0,0]") shouldBe
        MqttShardOffset(IndexedSeq(0L, 0L, 0L))
      s1.deserializeOffset("7") shouldBe MqttOffset(7L)
      // same checkpoint, topics list REORDERED: shard state (WAL subdirs,
      // broker sessions) is positional, so planning must fail naming the
      // mismatched filter — not silently replay shard a's offset as shard b's
      val s2 = new MqttStream("127.0.0.1", broker.port,
        Seq("id/b/#", "id/a/#", "id/c/#"), s"$cid-re", 100L)
      val e = intercept[IllegalStateException](
        s2.latestOffset(s2.deserializeOffset(end.json()), ReadLimit.maxRows(10)))
      e.getMessage should include("identity mismatch")
      e.getMessage should include("id/a/#")
      e.getMessage should include("id/b/#")
      // a legacy array checkpoint carries no identity: the reordered stream
      // keeps the documented weaker count-only check and plans
      s2.latestOffset(s2.deserializeOffset("[0,0,0]"), ReadLimit.maxRows(10))
      (0 until 3).foreach { i =>
        MqttReceiver.stop("127.0.0.1", broker.port, topics(i), s"$cid-s$i")
        MqttReceiver.stop("127.0.0.1", broker.port,
          Seq("id/b/#", "id/a/#", "id/c/#")(i), s"$cid-re-s$i")
      }
    } finally broker.close()
  }

  test("WAL-backed batches plan path+range partitions and the executor-side " +
      "segment reader reproduces the driver buffer exactly") {
    import graft.sources.{MqttWalSlice, MqttReaderFactory, MqttStream}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val broker = new MiniBroker()
    try {
      val walDir = java.nio.file.Files.createTempDirectory("mqtt_wslice").toString
      val cid = s"wslice-${broker.port}"
      val r = MqttReceiver("127.0.0.1", broker.port, "ws/#",
        clientId = cid, walDir = Some(walDir), walRollEvery = 4)
      val pub = new MqttClient("127.0.0.1", broker.port, "ws-pub").connect()
      for (i <- 0 until 19) pub.publish("ws/x", s"w$i")
      pub.close()
      val deadline = System.currentTimeMillis() + 15000
      while (r.size < 19 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      r.size shouldBe 19
      val wdir = java.nio.file.Paths.get(walDir)
      // range reads across segment rolls (rollEvery=4 → 5 segments), at
      // boundaries, mid-segment, and the live tail of the ACTIVE segment
      for ((a, b) <- Seq((0L, 19L), (3L, 9L), (4L, 8L), (8L, 12L), (18L, 19L),
          (5L, 5L))) {
        graft.sources.MqttWal.readRange(wdir, a, b).toSeq shouldBe
          r.slice(a, b).toSeq
      }
      // the stream plans a WAL slice (path + range, no row bytes) and the
      // reader factory reproduces the rows through the executor path
      val stream = new MqttStream("127.0.0.1", broker.port, Seq("ws/#"), cid,
        100L, Some(walDir))
      val start = stream.initialOffset()
      val end = stream.latestOffset(start, ReadLimit.maxRows(100))
      val parts = stream.planInputPartitions(start, end)
      parts.length shouldBe 1
      parts(0) shouldBe a[MqttWalSlice]
      val rd = MqttReaderFactory.createReader(parts(0))
      val got = Iterator.continually(rd)
        .takeWhile(_.next()).map(_.get().getString(1)).toSeq
      got shouldBe (0 until 19).map(i => s"w$i")
      MqttReceiver.stop("127.0.0.1", broker.port, "ws/#", cid)
    } finally broker.close()
  }

  test("'topic' with a literal comma is ONE filter (commas are legal in " +
      "MQTT names); 'topics' is the shard list; both at once is an error") {
    import graft.sources.{MqttOffset, MqttShardOffset, MqttTable}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import scala.jdk.CollectionConverters._
    val broker = new MiniBroker()
    try {
      def stream(opts: Map[String, String]) =
        new MqttTable(new CaseInsensitiveStringMap(
          (opts ++ Map("host" -> "127.0.0.1",
            "port" -> broker.port.toString)).asJava))
          .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
          .toMicroBatchStream("unused")
      // literal comma: one shard (scalar offset), one subscription whose
      // filter is the WHOLE string — a publish to the comma topic arrives
      val s1 = stream(Map("topic" -> "room,1/#", "clientId" -> "comma-sub"))
      s1.initialOffset() shouldBe MqttOffset(0L)
      val pub = new MqttClient("127.0.0.1", broker.port, "comma-pub").connect()
      pub.publish("room,1/x", "lit")
      val r = MqttReceiver("127.0.0.1", broker.port, "room,1/#", "comma-sub")
      val deadline = System.currentTimeMillis() + 10000
      while (r.size < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      r.slice(0, 1).map(_._2).toSeq shouldBe Seq("lit")
      // explicit shard list: composite offset, one shard per entry
      val s2 = stream(Map("topics" -> "tl/a/#,tl/b/#", "clientId" -> "tl-sub"))
      s2.initialOffset() shouldBe MqttShardOffset(IndexedSeq(0L, 0L))
      // both options: loud error
      val e = intercept[IllegalArgumentException](
        stream(Map("topic" -> "x/#", "topics" -> "y/#,z/#")))
      e.getMessage should include("not both")
      // an all-commas shard list fails at option parsing, naming the option
      val e2 = intercept[IllegalArgumentException](stream(Map("topics" -> " , ")))
      e2.getMessage should include("topics")
      pub.close()
    } finally {
      // cleanup in finally: a failed assertion must not leak receivers
      // whose pumps reconnect-loop against the closed broker
      try Seq("room,1/#" -> "comma-sub", "tl/a/#" -> "tl-sub-s0",
        "tl/b/#" -> "tl-sub-s1").foreach {
        case (t, c) => MqttReceiver.stop("127.0.0.1", broker.port, t, c) }
      finally broker.close()
    }
  }

  test("sharded source e2e: per-shard WALs and broker sessions survive a " +
      "restart in a new session; every shard's audit closes, no loss/dups") {
    val broker = new MiniBroker()
    try {
      val walDir = java.nio.file.Files.createTempDirectory("mqtt_shards").toString
      val cid = s"msr-${broker.port}"
      val topics = (0 until 3).map(i => s"sh/$i/#")
      // subscribe-before-publish: pre-create each shard's receiver under
      // the stream's naming convention (clientId-s<i>, walDir/shard-<i>)
      def receivers() = topics.zipWithIndex.map { case (t, i) =>
        MqttReceiver("127.0.0.1", broker.port, t, clientId = s"$cid-s$i",
          walDir = Some(s"$walDir/shard-$i"))
      }
      val rs = receivers()
      val pubs = (0 until 3).map(i =>
        new MqttClient("127.0.0.1", broker.port, s"msr-pub-$i").connect())
      def publish(from: Int, until: Int): Unit =
        for (i <- from until until; s <- 0 until 3)
          pubs(s).publish(s"sh/$s/x", s"m$s-$i")
      publish(0, 100)
      val deadline = System.currentTimeMillis() + 20000
      while (rs.exists(_.size < 100) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      rs.map(_.size) shouldBe Seq(100L, 100L, 100L)
      val ckpt = java.nio.file.Files.createTempDirectory("mqtt_sh_ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("mqtt_sh_out").toString
      def startQuery(ss: org.apache.spark.sql.SparkSession) =
        ss.readStream.format("graft-mqtt")
          .option("host", "127.0.0.1").option("port", broker.port)
          .option("topics", topics.mkString(","))
          .option("clientId", cid).option("rowsPerBatch", 40L)
          .option("walDir", walDir)
          .load()
          .writeStream.format("parquet")
          .option("path", s"$outDir/data").option("checkpointLocation", ckpt)
          .start()
      val q1 = startQuery(spark)
      q1.processAllAvailable(); q1.stop()
      // "process death" of every shard receiver; data arrives while down —
      // queued in each shard's persistent broker session
      topics.zipWithIndex.foreach { case (t, i) =>
        MqttReceiver.stop("127.0.0.1", broker.port, t, s"$cid-s$i") }
      publish(100, 160)
      val rs2 = receivers() // recover per-shard WALs + broker redelivery
      while (rs2.exists(_.size < 160) && System.currentTimeMillis() < deadline + 30000)
        Thread.sleep(50)
      rs2.map(_.size) shouldBe Seq(160L, 160L, 160L)
      (0 until 3).foreach(i => broker.droppedOverflow(s"$cid-s$i") shouldBe 0)
      val q2 = startQuery(spark.newSession())
      q2.processAllAvailable(); q2.stop()
      pubs.foreach(_.close())
      val got = spark.read.parquet(s"$outDir/data")
      got.count() shouldBe 480
      for (s <- 0 until 3) {
        val shard = got.filter(col("topic") === s"sh/$s/x")
          .select(col("value")).collect().map(_.getString(0)).sorted
        withClue(s"shard $s: ") {
          shard.length shouldBe 160
          shard.toSeq shouldBe (0 until 160).map(i => s"m$s-$i").sorted
        }
      }
      topics.zipWithIndex.foreach { case (t, i) =>
        MqttReceiver.stop("127.0.0.1", broker.port, t, s"$cid-s$i") }
    } finally broker.close()
  }

  test("DSv2 source: broker-published sensor payloads flow through parse " +
      "in micro-batches") {
    val broker = new MiniBroker()
    try {
      // subscribe-then-publish: the receiver exists before the publisher
      val receiver = MqttReceiver("127.0.0.1", broker.port, "sensors/#",
        clientId = s"spec-${broker.port}")
      val pub = new MqttClient("127.0.0.1", broker.port, "pub-3").connect()
      val n = 400
      for (loop <- 1L to n)
        pub.publish(s"sensors/t0", SensorGen.payload(
          seed = 42L, startEpoch = 1700000000L, intervalMs = 1000L,
          thread = 0, loop = loop))
      pub.close()
      // QoS 1 publishes are acked synchronously, but receiver pump drain is
      // async — wait for the buffer to hold everything
      val deadline = System.currentTimeMillis() + 15000
      while (receiver.size < n && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      receiver.size shouldBe n

      val raw = spark.readStream.format("graft-mqtt")
        .option("host", "127.0.0.1").option("port", broker.port)
        .option("topic", "sensors/#").option("clientId", s"spec-${broker.port}")
        .option("rowsPerBatch", 100L)
        .load()
      val parsed = SensorPipeline.parse(raw.select(col("value")))
      val q = parsed.writeStream.format("memory")
        .queryName(s"mqtt_e2e_${broker.port}")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("mqtt_ckpt").toString)
        .start()
      try {
        q.processAllAvailable()
        val rows = spark.table(s"mqtt_e2e_${broker.port}")
        rows.count() shouldBe n
        // the pipeline really parsed transport payloads: spec distribution
        // holds (every 100th empty → zero-sentinel, every other 10th outlier)
        val empty = rows.filter(col("temperature") === 0L && col("humidity") === 0L)
          .count()
        empty shouldBe n / 100
        // 4+ micro-batches were taken (rowsPerBatch = 100), not one gulp
        assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
          s"expected >= 4 non-empty micro-batches, got " +
            q.recentProgress.map(_.numInputRows).mkString(","))
      } finally q.stop()
    } finally broker.close()
  }

  test("acquire reports creation ownership atomically: reuse is flagged " +
      "not-ours (so shard-init cleanup won't stop it) and a failed create " +
      "leaves no poisoned registry entry") {
    val broker = new MiniBroker()
    try {
      val cid = s"acq-${broker.port}"
      val (r1, c1) = MqttReceiver.acquire("127.0.0.1", broker.port, "acq/#", cid)
      c1 shouldBe true
      // second acquire of the same endpoint: same receiver, NOT created by
      // this call — the flag a concurrent shard-init's partial-failure
      // cleanup keys its stop decisions on
      val (r2, c2) = MqttReceiver.acquire("127.0.0.1", broker.port, "acq/#", cid)
      c2 shouldBe false
      assert(r2 eq r1)
      MqttReceiver.stop("127.0.0.1", broker.port, "acq/#", cid)
      // after stop the endpoint is creatable again, by a fresh receiver
      val (r3, c3) = MqttReceiver.acquire("127.0.0.1", broker.port, "acq/#", cid)
      c3 shouldBe true
      assert(!(r3 eq r1))
      MqttReceiver.stop("127.0.0.1", broker.port, "acq/#", cid)
      // release undoes ONE acquire and closes only at the LAST reference:
      // two acquires (creator + sharer), one release → the endpoint stays
      // registered and alive for the sharer (the shard-init cleanup
      // contract: undoing a failed attempt can't stop a shared receiver)
      val (r4, c4) = MqttReceiver.acquire("127.0.0.1", broker.port, "acq/#", cid)
      c4 shouldBe true
      val (_, c5) = MqttReceiver.acquire("127.0.0.1", broker.port, "acq/#", cid)
      c5 shouldBe false
      MqttReceiver.release("127.0.0.1", broker.port, "acq/#", cid)
      val (r6, c6) = MqttReceiver.acquire("127.0.0.1", broker.port, "acq/#", cid)
      c6 shouldBe false // still the sharer's live receiver, not a re-create
      assert(r6 eq r4)
      // drain the remaining two references: the last release closes and
      // unregisters, so the next acquire creates afresh
      MqttReceiver.release("127.0.0.1", broker.port, "acq/#", cid)
      MqttReceiver.release("127.0.0.1", broker.port, "acq/#", cid)
      val (r7, c7) = MqttReceiver.acquire("127.0.0.1", broker.port, "acq/#", cid)
      c7 shouldBe true
      assert(!(r7 eq r4))
      MqttReceiver.stop("127.0.0.1", broker.port, "acq/#", cid)
      // a create that fails (no broker) must remove its registry entry:
      // the retry hits the wire again (IOException) instead of a poisoned
      // holder's IllegalStateException("receiver create failed")
      val deadPort = {
        val ss = new java.net.ServerSocket(0)
        val p = ss.getLocalPort; ss.close(); p
      }
      intercept[java.io.IOException](
        MqttReceiver.acquire("127.0.0.1", deadPort, "acq/#", "acq-dead"))
      intercept[java.io.IOException](
        MqttReceiver.acquire("127.0.0.1", deadPort, "acq/#", "acq-dead"))
    } finally broker.close()
  }

  test("concurrent acquires of one endpoint: one receiver instance, exactly " +
      "one created flag, and per-acquire releases tear it down exactly once") {
    val broker = new MiniBroker()
    try {
      val cid = s"acqc-${broker.port}"
      val nThreads = 8
      val got = new Array[(MqttReceiver, Boolean)](nThreads)
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until nThreads).map { i =>
        new Thread(() => {
          start.await()
          got(i) = MqttReceiver.acquire("127.0.0.1", broker.port, "acqc/#", cid)
        }, s"acqc-$i")
      }
      threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
      // the putIfAbsent + holder contract: every thread saw the SAME
      // receiver, and the creation credit went to exactly one of them
      got.map(_._1).distinct.length shouldBe 1
      got.count(_._2) shouldBe 1
      // refs == nThreads: the first nThreads - 1 releases keep it alive
      for (_ <- 0 until nThreads - 1)
        MqttReceiver.release("127.0.0.1", broker.port, "acqc/#", cid)
      val (again, createdAgain) =
        MqttReceiver.acquire("127.0.0.1", broker.port, "acqc/#", cid)
      createdAgain shouldBe false
      assert(again eq got(0)._1)
      // drain the two remaining references — the endpoint is then gone
      MqttReceiver.release("127.0.0.1", broker.port, "acqc/#", cid)
      MqttReceiver.release("127.0.0.1", broker.port, "acqc/#", cid)
      val (fresh, createdFresh) =
        MqttReceiver.acquire("127.0.0.1", broker.port, "acqc/#", cid)
      createdFresh shouldBe true
      assert(!(fresh eq got(0)._1))
      MqttReceiver.stop("127.0.0.1", broker.port, "acqc/#", cid)
    } finally broker.close()
  }
}
