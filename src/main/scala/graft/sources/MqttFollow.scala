package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}

/** Durable mark files a pump process leaves in each shard's WAL directory
  * so a READER IN A DIFFERENT PROCESS can plan batches off the WAL alone —
  * the coordination protocol between [[graft.tools.MqttIngestPump]]
  * (writes `hwm`/`filter`, polls `committed`) and [[MqttFollowStream]]
  * (reads `hwm`/`filter`, writes `committed`). All writes are
  * write-temp-then-atomic-rename, so a concurrent reader sees either the
  * old mark or the new one, never a torn file — the same contract Spark's
  * own checkpoint metadata relies on, and it holds on local disk and on
  * the POSIX-rename DFS mounts a cluster deployment would share.
  *
  * Semantics:
  *  - `hwm`: highest offset the pump has made DURABLE (WAL fsync'd). The
  *    pump publishes it only after `MqttWal.append` returned, so every
  *    record below a published hwm has complete bytes on storage — which
  *    is exactly the precondition [[MqttWal.readRange]] needs. A stale or
  *    missing hwm only under-reports (the reader waits); it can never
  *    expose a torn tail.
  *  - `committed`: highest offset the reader's stream has committed
  *    (Spark calls commit(end) only after the batch is durably recorded
  *    in ITS checkpoint). The pump trims segments wholly below it — trim
  *    authority stays with the WAL's owner, the reader only declares.
  *  - `filter`: the MQTT topic filter this shard directory serves, written
  *    once at pump start. The reader validates it against its own
  *    positional `topics` entry, extending the round-11 shard-identity
  *    check across the process boundary: a pump launched with reordered
  *    shard assignments fails the reader loudly instead of silently
  *    feeding shard A's bytes to shard B's offsets. */
private[graft] object MqttWalMarks {
  val Hwm = "hwm.mark"
  val Committed = "committed.mark"
  val Filter = "filter.id"

  def write(dir: Path, name: String, content: String): Unit = {
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, s".$name", ".tmp")
    try {
      // force the CONTENT before the rename: rename-without-fsync
      // filesystems may expose the new name with empty bytes after a power
      // loss, and an empty mark fails readLong loudly on every restart —
      // a crash-looping pump (round-13 review). The WAL's own fsync-before-
      // ack contract extends to the marks that index it.
      val ch = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        ch.write(java.nio.ByteBuffer.wrap(
          content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        ch.force(true)
      } finally ch.close()
      Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      // best-effort directory fsync so the rename itself is durable (the
      // Lucene/Kafka pattern: works on Linux, harmlessly refused elsewhere)
      try {
        val dch = java.nio.channels.FileChannel.open(dir,
          java.nio.file.StandardOpenOption.READ)
        try dch.force(true) finally dch.close()
      } catch { case _: java.io.IOException => () }
    } finally Files.deleteIfExists(tmp)
  }

  def writeLong(dir: Path, name: String, v: Long): Unit =
    write(dir, name, v.toString)

  def read(dir: Path, name: String): Option[String] = {
    val p = dir.resolve(name)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim)
  }

  /** Highest offset a fresh WAL recovery of `dir` would reach — the last
    * segment's start plus its intact record count; 0 with no segments.
    * Lets a restarting pump reconcile the directory against its published
    * hwm mark BEFORE creating a receiver (whose broker session would start
    * redelivering — and appending at the recovered offsets — immediately):
    * if history is missing, nothing may touch the WAL (round-13 review). */
  def recoveredEnd(dir: Path): Long =
    MqttWal.listSegments(dir).lastOption.map { case (start, path) =>
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        Files.newInputStream(path)))
      var n = 0L
      try {
        while (MqttWal.readRecord(in).isDefined) n += 1
      } catch { case _: java.io.EOFException => () } // truncated tail
      finally in.close()
      start + n
    }.getOrElse(0L)

  def readLong(dir: Path, name: String): Option[Long] =
    read(dir, name).map { s =>
      // toLong itself can still throw on all-digit strings past
      // Long.MaxValue — keep every corrupt shape on the SAME named failure
      val v = if (s.nonEmpty && s.forall(_.isDigit))
        try Some(s.toLong) catch { case _: NumberFormatException => None }
      else None
      require(v.isDefined,
        s"corrupt mark $name in $dir: '$s' is not a non-negative long")
      v.get
    }
}

/** Micro-batch stream over shard WALs OWNED BY OTHER PROCESSES — the
  * multi-process half of the transport edge. [[MqttStream]] couples the
  * ingest pump (broker session, WAL writer) to the Spark driver process;
  * past ~8 shards one box saturates (BASELINE.md round-12 probe), and the
  * reference's single-subscription source never scales at all
  * (reference/src/main/java/stream/sources/HiveMQSource.java:62-106).
  * This stream decouples them: N pump processes/hosts
  * ([[graft.tools.MqttIngestPump]]) each own a subset of shard receivers
  * and write WAL segments + [[MqttWalMarks]] to a shared directory tree;
  * ONE Spark session plans [[MqttWalSlice]] partitions off the marks and
  * executors read the segment bytes themselves. Per batch the driver
  * handles a path and two longs per shard — ingest capacity scales with
  * pump hosts, read capacity with executors, and the driver does neither.
  *
  * Offset compatibility: the follower uses the same [[MqttOffset]] /
  * [[MqttShardOffset]] forms, the same filter-keyed identity validation,
  * and the same waterfill admission control as [[MqttStream]]
  * ([[MqttShardOffsets]] is the shared implementation), so a checkpoint
  * written by either face of the source is honored by the other.
  *
  * Delivery semantics are unchanged from the WAL-backed in-process source:
  * at-least-once end-to-end (the pump acks only after fsync; the broker
  * redelivers un-acked messages), with the WAL offset ranges themselves
  * exactly-once per checkpoint. */
final class MqttFollowStream(shardDirs0: Seq[String], topics0: Seq[String],
    rowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  private val dirs: IndexedSeq[Path] =
    shardDirs0.iterator.map(Paths.get(_)).toIndexedSeq
  private val topics: IndexedSeq[String] = topics0.toIndexedSeq
  private val n = dirs.size
  require(n >= 1, "no shard WAL directory given")
  require(topics.size == n,
    s"${topics.size} topic filters for $n shard WAL directories")
  require(topics.distinct.size == n,
    s"duplicate MQTT topic filters: ${topics.mkString(", ")}")

  /** Lowest still-addressable offset of a shard: the first retained WAL
    * segment's start; with every segment trimmed away (reader fully caught
    * up and committed), the committed mark; a never-started shard is 0. */
  private def base(i: Int): Long = {
    val d = dirs(i)
    if (!Files.isDirectory(d)) 0L
    else MqttWal.listSegments(d).headOption.map(_._1)
      .orElse(MqttWalMarks.readLong(d, MqttWalMarks.Committed))
      .orElse(MqttWalMarks.readLong(d, MqttWalMarks.Hwm))
      .getOrElse(0L)
  }

  /** Durable high-water of a shard — the pump's published hwm mark. A
    * missing mark means "nothing admitted yet" (pump not started or its
    * first publish pending); the follower simply plans no rows for that
    * shard this round. But a dir that HOLDS segments with recoverable
    * records past the base while the mark stays missing is a different
    * state: the mark was lost (manual deletion, partial directory copy)
    * and the follower would idle forever, indistinguishable from "pump
    * not started". After a grace period (a just-launched pump publishes
    * its first mark within one batch) the follower names the missing
    * file once instead of idling silently (round-13 advice). */
  // package-visible so the spec can backdate the grace clock instead of
  // sleeping out the real 10 s window
  private[sources] val missingHwmSinceNanos = Array.fill(n)(0L)
  private[sources] val missingHwmWarned = Array.fill(n)(false)
  private def hwm(i: Int): Long =
    MqttWalMarks.readLong(dirs(i), MqttWalMarks.Hwm) match {
      case Some(h) =>
        missingHwmSinceNanos(i) = 0L
        // clear the warned latch too: a pump restart republishes the mark,
        // and a SECOND loss afterwards (another partial copy) must warn
        // again instead of idling silently behind a stale latch
        missingHwmWarned(i) = false
        h
      case None =>
        // one directory listing serves both the base fallback and the
        // lost-mark probe (hwm() was listing the same shard dir twice per
        // planning round while the mark was missing — metadata chatter the
        // pump side deliberately rate-limits on shared walDirs)
        val d = dirs(i)
        val segs = if (Files.isDirectory(d)) MqttWal.listSegments(d) else Nil
        val b = segs.headOption.map(_._1)
          .orElse(MqttWalMarks.readLong(d, MqttWalMarks.Committed))
          .getOrElse(0L)
        if (!missingHwmWarned(i) && segs.nonEmpty) {
          val now = System.nanoTime()
          if (missingHwmSinceNanos(i) == 0L) missingHwmSinceNanos(i) = now
          else if (now - missingHwmSinceNanos(i) > MqttFollowStream.MissingHwmGraceNanos) {
            val rec = MqttWalMarks.recoveredEnd(d)
            if (rec > b) {
              // latch ONLY on the printed warning: latching on the silent
              // rec<=b path would permanently suppress a later real loss
              missingHwmWarned(i) = true
              System.err.println(
                s"[graft-mqtt] WARNING shard $i: WAL directory $d holds " +
                  s"segments with ${rec - b} recoverable record(s) beyond base $b " +
                  s"but no '${MqttWalMarks.Hwm}' mark after " +
                  s"${MqttFollowStream.MissingHwmGraceNanos / 1000000000L} s - the " +
                  "hwm mark was likely lost (manual deletion, partial directory " +
                  "copy). This follower will plan ZERO rows for the shard until " +
                  "a pump restarts there and republishes the mark.")
            } else {
              // segments with nothing recoverable past base is a legitimate
              // steady state (fully drained + trimmed), not a lost mark:
              // re-arm the clock so the probe stays alive at one
              // recoveredEnd scan per grace window, bounded
              missingHwmSinceNanos(i) = now
            }
          }
        }
        b
    }

  /** Cross-process shard-identity validation: once a shard's `filter` mark
    * exists, it must equal this source's positional topic filter. Checked
    * every planning round until it passes once (the pump may start after
    * the reader), then latched. */
  private val identityOk = Array.fill(n)(false)
  private def validateIdentity(): Unit =
    (0 until n).foreach { i =>
      if (!identityOk(i))
        MqttWalMarks.read(dirs(i), MqttWalMarks.Filter).foreach { f =>
          if (f != topics(i))
            throw new IllegalStateException(
              s"MQTT shard $i identity mismatch: WAL directory ${dirs(i)} " +
                s"is pumped for topic filter '$f' but this source expects " +
                s"'${topics(i)}' at that position. Shard WAL directories are " +
                "positional — a pump launched with reordered/renamed shard " +
                "assignments would feed one shard's bytes to another's " +
                "offsets. Fix the pump's shard spec or this source's " +
                "'topics' order.")
          identityOk(i) = true
        }
    }

  private def offsets(o: Offset): IndexedSeq[Long] =
    MqttShardOffsets.decode(o, topics)
  private def mkOffset(e: IndexedSeq[Long]): Offset =
    MqttShardOffsets.encode(e, topics)

  /** A fresh checkpoint against pre-populated WALs starts at each shard's
    * retained base, mirroring [[MqttStream.initialOffset]]'s recovered-base
    * rule: offsets below the base were committed (and trimmed) during an
    * earlier checkpoint's life and are gone. */
  override def initialOffset(): Offset = mkOffset((0 until n).map(base))
  override def deserializeOffset(json: String): Offset =
    MqttShardOffsets.deserialize(json)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    validateIdentity()
    val s = offsets(start)
    val high = (0 until n).map { i =>
      // stale-WAL / checkpoint mismatch, cross-process edition: the pump
      // trimmed past this checkpoint (a NEWER checkpoint committed it) —
      // fail at planning time with the mismatch named, like MqttStream
      val b = base(i)
      require(s(i) >= b,
        s"MQTT checkpoint offset ${s(i)} (shard $i) predates the WAL's " +
          s"retained base $b in ${dirs(i)}: the pump trimmed past this " +
          "checkpoint (a newer checkpoint committed it). Restore the " +
          "matching checkpoint, or start a fresh one to resume from the base")
      math.max(hwm(i), s(i))
    }
    val cap = MqttShardOffsets.rowCap(limit).getOrElse(Long.MaxValue)
    val take =
      MqttShardOffsets.waterfill((0 until n).map(i => high(i) - s(i)), cap)
    mkOffset((0 until n).map(i => s(i) + take(i)))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: Spark calls latestOffset(start, limit)")
  override def reportLatestOffset(): Offset =
    mkOffset((0 until n).map(i => hwm(i)))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = offsets(start)
    val e = offsets(end)
    (0 until n).iterator
      .filter(i => e(i) > s(i))
      .map[InputPartition](i => MqttWalSlice(dirs(i).toString, s(i), e(i)))
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory = MqttReaderFactory

  /** Declare the committed prefix; the PUMP trims (only the WAL's owner
    * deletes its segments). Spark guarantees it will only request offsets
    * > end after this call, so nothing the checkpoint can still reference
    * is ever below the mark. */
  private val lastCommitted = Array.fill(n)(-1L)
  override def commit(end: Offset): Unit = {
    val e = offsets(end)
    // skip shards whose mark would not move: a batch that advanced 1 of K
    // shards should not pay K fsync'd create+rename round-trips on the
    // shared (possibly DFS) walDir (round-13 review)
    (0 until n).foreach { i =>
      if (e(i) != lastCommitted(i)) {
        MqttWalMarks.writeLong(dirs(i), MqttWalMarks.Committed, e(i))
        lastCommitted(i) = e(i)
      }
    }
  }
  override def stop(): Unit = ()
}

object MqttFollowStream {
  /** How long a shard may hold WAL segments with no hwm mark before the
    * follower warns that the mark is likely lost — long enough for a
    * just-launched pump's first rate-limited mark publication (~20/s per
    * shard once ingesting), short enough that an operator watching a
    * stalled drain sees the cause within one look at the logs. */
  private[sources] val MissingHwmGraceNanos: Long = 10L * 1000000000L

  /** The shard-directory layout shared with [[MqttStream]]: the WAL root
    * itself for a single shard, `<root>/shard-<i>` for a sharded source —
    * so a pump and a follower configured from the same (walDir, topics)
    * options agree on where every shard lives. */
  def shardDirs(walDir: String, n: Int): IndexedSeq[String] =
    if (n == 1) IndexedSeq(walDir)
    else (0 until n).map(i => s"$walDir/shard-$i")
}
