package graft.tools

import java.nio.file.{Files, Path, Paths}

import graft.sources.{MqttReceiver, MqttWalMarks}

/** Standalone MQTT ingest pump — one PROCESS of the multi-process
  * transport edge. Owns the receivers (broker session, WAL writer, backlog
  * bound) for a SUBSET of a sharded source's topic filters, writes each
  * shard's WAL segments plus [[graft.sources.MqttWalMarks]] under the
  * shared `walDir`, and trims segments as the reader commits. The Spark
  * session that consumes the shards runs `format("graft-mqtt")
  * .option("follow", "true")` ([[graft.sources.MqttFollowStream]]) in a
  * DIFFERENT process — possibly a different host, with `walDir` on shared
  * storage — so ingest capacity scales with pump processes/hosts instead
  * of saturating the one driver box (the ceiling BASELINE.md's round-12
  * probe measured at ~8 in-process shards). The reference's ingest edge is
  * a single in-process subscription that scales to neither
  * (reference/src/main/java/stream/sources/HiveMQSource.java:62-106).
  *
  * Args: `host port walDir clientIdBase totalShards shardSpec [rollEvery]`
  * where shardSpec is a comma-separated `index=filter` list naming the
  * GLOBAL shard indices this pump owns (e.g. `"0=pr/0/#,2=pr/2/#"`) —
  * indices decide the WAL subdirectory (`walDir/shard-<i>`, or `walDir`
  * itself when totalShards=1) and the broker clientId
  * (`<clientIdBase>-s<i>`), so any partition of the shard set across pump
  * processes composes into exactly the layout the follower expects. Like
  * the source's `topics` option, filters here cannot contain literal
  * commas.
  *
  * Lifecycle: prints `PUMP_READY <indices>` once every owned receiver is
  * subscribed and its filter-identity mark is written; pumps until
  * `walDir/STOP` exists; then publishes final hwm marks, closes the
  * receivers, and prints one JSON line with per-shard ingested counts. */
object MqttIngestPump {

  def main(args: Array[String]): Unit = {
    require(args.length >= 6,
      "args: host port walDir clientIdBase totalShards shardSpec")
    val host = args(0)
    val port = args(1).toInt
    val walRoot = args(2)
    val cidBase = args(3)
    val totalShards = args(4).toInt
    val owned: Seq[(Int, String)] = args(5).split(",").toSeq.map { s =>
      // a bare MatchError on a malformed entry would be the one invalid-
      // launch path without a named error (round-13 advice)
      val parts = s.split("=", 2)
      require(parts.length == 2 && parts(0).trim.nonEmpty && parts(1).nonEmpty,
        s"malformed shardSpec entry '$s': expected 'index=filter' " +
          "(comma-separated, e.g. '0=sensors/a,1=sensors/b')")
      require(parts(0).trim.forall(_.isDigit),
        s"malformed shardSpec entry '$s': shard index '${parts(0).trim}' is not a non-negative integer")
      // all-digit but past Int range would still throw a bare
      // NumberFormatException — the same unnamed-path hole, one layer down
      val idx = try parts(0).trim.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"malformed shardSpec entry '$s': shard index '${parts(0).trim}' exceeds Int range")
      }
      (idx, parts(1))
    }
    require(owned.nonEmpty && owned.forall(o => o._1 >= 0 && o._1 < totalShards),
      s"shard indices out of [0, $totalShards): ${owned.map(_._1).mkString(",")}")
    // duplicate indices would give two receivers one WAL directory and one
    // broker clientId: interleaved offset sequences + a [MQTT-3.1.4-2]
    // session-takeover reconnect loop (round-13 review) — same rule as the
    // in-process source's distinct-topics check
    require(owned.map(_._1).distinct.size == owned.size,
      s"duplicate shard indices in spec: ${owned.map(_._1).mkString(",")}")
    val rollEvery = args.lift(6).map(_.toInt).getOrElse(4096)

    def shardDir(i: Int): Path =
      if (totalShards == 1) Paths.get(walRoot) else Paths.get(s"$walRoot/shard-$i")
    def shardCid(i: Int): String =
      if (totalShards == 1) cidBase else s"$cidBase-s$i"

    // subscribe-before-publish: receivers connect here, ahead of READY
    val receivers: Seq[(Int, Path, MqttReceiver)] = owned.map { case (i, f) =>
      val dir = shardDir(i)
      // an existing identity mark is a CONTRACT, not a default: restarting
      // this pump with a reassigned filter would repoint the mark and feed
      // the old filter's WAL bytes to the new filter's offsets — the exact
      // mis-assignment the mark exists to catch. Refuse, loudly, before
      // touching the WAL (round-13 review).
      MqttWalMarks.read(dir, MqttWalMarks.Filter).foreach { prev =>
        require(prev == f,
          s"shard $i WAL directory $dir is already marked for topic filter " +
            s"'$prev' but this pump was launched with '$f' at that index. " +
            "Shard WAL directories are positional; fix the pump's shard " +
            "spec (or use a fresh walDir) instead of overwriting history.")
      }
      // hwm must never regress across pump lives: with trimTo retaining
      // the last segment, a fresh recovery always reaches >= the published
      // mark — a SMALLER recovered end means WAL history vanished (manual
      // deletion, wrong directory) and restarting here would alias new
      // messages onto offsets the reader already consumed. Checked BEFORE
      // the receiver exists: its broker session starts redelivering (and
      // appending at the recovered offsets) the moment it subscribes
      // (round-13 review).
      MqttWalMarks.readLong(dir, MqttWalMarks.Hwm).foreach { prev =>
        val end = MqttWalMarks.recoveredEnd(dir)
        require(end >= prev,
          s"shard $i WAL in $dir recovers to offset $end but its " +
            s"published hwm mark says $prev: WAL history is missing. " +
            "Restore the directory or start a fresh walDir + checkpoint.")
      }
      val r = MqttReceiver(host, port, f, clientId = shardCid(i),
        walDir = Some(dir.toString), walRollEvery = rollEvery)
      // identity mark: lets the cross-process reader validate that this
      // directory's bytes belong to the filter IT expects at this position
      MqttWalMarks.write(dir, MqttWalMarks.Filter, f)
      MqttWalMarks.writeLong(dir, MqttWalMarks.Hwm, r.size)
      (i, dir, r)
    }
    println(s"PUMP_READY ${owned.map(_._1).mkString(",")}")

    val stop = Paths.get(walRoot, "STOP")
    val lastHwm = scala.collection.mutable.Map.empty[Int, Long]
    val nextHwmAt = scala.collection.mutable.Map.empty[Int, Long]
    val nextCommitPollAt = scala.collection.mutable.Map.empty[Int, Long]
    val lastCommitted = scala.collection.mutable.Map.empty[Int, Long]
    // STOP is polled at ~10/s, same DFS-chatter reasoning as the marks —
    // shutdown latency is bounded at ~100 ms, which no caller notices.
    // All pacing clocks are MONOTONIC (nanoTime): a backward wall-clock
    // step must not freeze STOP detection, trims, or hwm publication
    // (round-13 review, third pass)
    def monoMs: Long = System.nanoTime() / 1000000L
    var stopSeen = false
    var nextStopCheckAt = Long.MinValue // nanoTime origin is arbitrary
    while (!stopSeen) {
      receivers.foreach { case (i, dir, r) =>
        // receiver.size is the durable high-water: the pump buffers a
        // message only after its WAL append (fsync) returned. Publication
        // is rate-limited to ~20/s/shard: the mark write is itself
        // fsync'd (content + dir), and at sustained ingest an every-5 ms
        // republish would fight the WAL's own appends for the same disk —
        // the protocol tolerates staleness by design ("a stale hwm only
        // under-reports"), and the STOP path below publishes the final
        // value unconditionally (round-13 review, second pass).
        val h = r.size
        val now = monoMs
        if (!lastHwm.get(i).contains(h) && now >= nextHwmAt.getOrElse(i, Long.MinValue)) {
          MqttWalMarks.writeLong(dir, MqttWalMarks.Hwm, h)
          lastHwm(i) = h
          nextHwmAt(i) = now + 50
        }
        // the reader declares commits; the WAL's owner trims. Polled at
        // the hwm-publication cadence (~20/s/shard), not every loop tick:
        // trim latency is non-critical and a 5 ms metadata read per shard
        // is pure chatter on a shared DFS walDir (round-13 review).
        if (now >= nextCommitPollAt.getOrElse(i, Long.MinValue)) {
          nextCommitPollAt(i) = now + 50
          MqttWalMarks.readLong(dir, MqttWalMarks.Committed).foreach { c =>
            if (c > lastCommitted.getOrElse(i, -1L)) {
              r.trimTo(c)
              lastCommitted(i) = c
            }
          }
        }
      }
      Thread.sleep(5)
      val nw = monoMs
      if (nw >= nextStopCheckAt) {
        stopSeen = Files.exists(stop)
        nextStopCheckAt = nw + 100
      }
    }
    val counts = receivers.map { case (i, dir, r) =>
      val h = r.size
      MqttWalMarks.writeLong(dir, MqttWalMarks.Hwm, h)
      (i, h)
    }
    receivers.foreach { case (i, _, _) =>
      val f = owned.find(_._1 == i).get._2
      MqttReceiver.stop(host, port, f, shardCid(i))
    }
    println(counts.map { case (i, h) => s""""$i":$h""" }
      .mkString("""{"pump_ingested":{""", ",", "}}"))
  }
}
