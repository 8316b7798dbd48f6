package graft.sources

import java.nio.file.{Files, Path}

/** Durability contract of the receiver WAL ([[MqttWal]]) in isolation:
  * segment roll-over, reopen recovery, crash-truncated tails, commit-trim
  * file deletion, and loud failure on a gapped segment chain. The
  * end-to-end cross-process story lives in MqttSpec ("walDir makes offsets
  * durable"); these pin the file-level invariants that story rests on. */
class MqttWalSpec extends graft.SparkSpec {

  private def tmp(): Path = Files.createTempDirectory("mqtt_wal_spec")

  private def recs(from: Int, until: Int): Seq[(String, String, Int)] =
    (from until until).map(i => (s"t/${i % 3}", s"payload-$i", i + 1))

  import scala.jdk.CollectionConverters._

  private def walFiles(dir: Path): Seq[String] = {
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }

  test("a zero-record recovered segment re-opened by the writer survives " +
      "trimTo (one Segment entry per file, never a deletable stale twin)") {
    val dir = tmp()
    val w = new MqttWal(dir, rollEvery = 4)
    w.append(recs(0, 5)) // wal-0 (4 records) + wal-4 (1 record)
    w.close()
    // crash truncates wal-4's only record mid-write: recovery must see a
    // ZERO-record segment at offset 4
    val seg4 = dir.resolve(f"wal-${4}%020d.log")
    val raw = Files.readAllBytes(seg4)
    Files.write(seg4, raw.take(3))
    val w2 = new MqttWal(dir, rollEvery = 4)
    w2.recovered.size shouldBe 4
    // the first append re-opens the SAME path (next == 4); the stale
    // recovered entry must be dropped, or trimTo(4) would classify it dead
    // and delete the file the live writer is appending to (round-12
    // review — fatal since MqttWalSlice readers read these files)
    w2.append(recs(4, 6))
    w2.trimTo(4)
    walFiles(dir) shouldBe Seq(f"wal-${4}%020d.log")
    // the re-opened segment is intact end-to-end: executor-side range read
    // and a fresh recovery both see exactly the two live records
    MqttWal.readRange(dir, 4, 6).toSeq shouldBe
      recs(4, 6).map(r => (r._1, r._2))
    w2.close()
    val w3 = new MqttWal(dir, rollEvery = 4)
    w3.recoveredBase shouldBe 4
    w3.recovered shouldBe recs(4, 6).toVector
    w3.close()
  }

  test("records round-trip across rolled segments and a reopen") {
    val dir = tmp()
    val w = new MqttWal(dir, rollEvery = 10)
    w.recoveredBase shouldBe 0L
    w.recovered shouldBe empty
    w.append(recs(0, 25))
    w.close()
    walFiles(dir) shouldBe Seq(
      f"wal-${0}%020d.log", f"wal-${10}%020d.log", f"wal-${20}%020d.log")
    val w2 = new MqttWal(dir, rollEvery = 10)
    w2.recoveredBase shouldBe 0L
    w2.recovered shouldBe recs(0, 25).toVector
    // appends after recovery land in a FRESH segment at the recovered
    // high-water mark (never appended to a possibly-truncated tail file)
    w2.append(recs(25, 27))
    w2.close()
    walFiles(dir) should contain(f"wal-${25}%020d.log")
    val w3 = new MqttWal(dir, rollEvery = 10)
    w3.recovered shouldBe recs(0, 27).toVector
    w3.close()
  }

  test("a crash-truncated tail record is dropped; the chain stays consistent") {
    val dir = tmp()
    val w = new MqttWal(dir, rollEvery = 10)
    w.append(recs(0, 12))
    w.close()
    // chop 3 bytes off the active segment's last record — a crash mid-append
    val last = dir.resolve(f"wal-${10}%020d.log")
    val bytes = Files.readAllBytes(last)
    Files.write(last, java.util.Arrays.copyOf(bytes, bytes.length - 3))
    val w2 = new MqttWal(dir, rollEvery = 10)
    // record 11 (index) was torn: never exposed, never acked — dropped;
    // the broker still owns it and will redeliver
    w2.recovered shouldBe recs(0, 11).toVector
    w2.append(recs(11, 13))
    w2.close()
    // the re-append starts a fresh segment at offset 11 and a THIRD
    // recovery sees the contiguous chain 0..13
    val w3 = new MqttWal(dir, rollEvery = 10)
    w3.recovered shouldBe recs(0, 13).toVector
    w3.close()
  }

  test("a fully-committed trim with an IDLE writer keeps the last segment: " +
      "the offset baseline survives pump restarts instead of resetting to 0") {
    val dir = tmp()
    val w = new MqttWal(dir, rollEvery = 4)
    w.append(recs(0, 10)) // segments 0(4), 4(4), 8(2)
    w.close()
    // pump life 2: recover, reader commits EVERYTHING, owner trims — with
    // no append yet there is no active writer, and a full reclaim here
    // would erase the only carrier of the offset baseline
    val w2 = new MqttWal(dir, rollEvery = 4)
    w2.recovered.size shouldBe 10
    w2.trimTo(10)
    walFiles(dir) shouldBe Seq(f"wal-${8}%020d.log")
    w2.close()
    // pump life 3: recovery still counts in the original sequence — a new
    // message lands at offset 10, not 0 (which would silently replay as
    // already-consumed data under the reader's checkpoint)
    val w3 = new MqttWal(dir, rollEvery = 4)
    w3.recoveredBase shouldBe 8L
    w3.recovered shouldBe recs(8, 10).toVector
    w3.append(recs(10, 11))
    w3.close()
    val w4 = new MqttWal(dir, rollEvery = 4)
    (w4.recoveredBase + w4.recovered.size) shouldBe 11L
    w4.close()
  }

  test("trimTo deletes wholly-committed segments but never the active one") {
    val dir = tmp()
    val w = new MqttWal(dir, rollEvery = 5)
    w.append(recs(0, 13)) // segments 0(5), 5(5), 10(3 — active)
    w.trimTo(10)
    walFiles(dir) shouldBe Seq(f"wal-${10}%020d.log")
    // a commit INSIDE the active segment deletes nothing
    w.trimTo(12)
    walFiles(dir) shouldBe Seq(f"wal-${10}%020d.log")
    w.close()
    // recovery replays the retained segment from its base — committed
    // offsets below the base are gone, exactly the slice() contract
    val w2 = new MqttWal(dir, rollEvery = 5)
    w2.recoveredBase shouldBe 10L
    w2.recovered shouldBe recs(10, 13).toVector
    w2.close()
  }

  test("a batch straddling segment rolls syncs every touched segment " +
      "before append returns — fsync-before-ack covers rolled-away records") {
    val dir = tmp()
    val w = new MqttWal(dir, rollEvery = 4)
    w.append(recs(0, 10)) // segments 0-3, 4-7 (rolled away), 8-9 (active)
    // one sync per rolled-away segment + one for the active tail: every
    // record of the batch is durable when append returns, so the PUBACKs
    // that follow never ack flush-only data (round-9 verdict #1 — the old
    // roll path close()d without sync, so an OS crash could lose the tail
    // of a rolled-away segment whose records were already acked)
    w.syncCount shouldBe 3L
    // a batch ending exactly on a roll boundary still ends with a sync of
    // the segment holding its tail
    w.append(recs(10, 12)) // fills segment 8-11; no roll
    w.syncCount shouldBe 4L
    w.append(recs(12, 13)) // rolls 8-11 away (sync), then syncs the tail
    w.syncCount shouldBe 6L
    w.close()
    val w2 = new MqttWal(dir, rollEvery = 4)
    w2.recovered shouldBe recs(0, 13).toVector
    w2.close()
  }

  test("a range read over a truncated/short segment fails loudly naming the " +
      "range — from the constructor's skip-scan too, which must release its " +
      "segment stream (no fd leak from a failed reader init)") {
    val dir = tmp()
    val w = new MqttWal(dir, rollEvery = 5)
    w.append(recs(0, 12)) // segments 0(5), 5(5), 10(2 — active)
    w.close()
    def fdsOn(p: Path): Int = {
      val s = Files.list(java.nio.file.Paths.get("/proc/self/fd"))
      try s.iterator().asScala.count { fd =>
        try Files.readSymbolicLink(fd).toString == p.toAbsolutePath.toString
        catch { case _: Exception => false }
      } finally s.close()
    }
    // clean EOF short of the planned range (intact files): loud, not silent
    val e0 = intercept[IllegalStateException](MqttWal.readRange(dir, 10, 13).toSeq)
    e0.getMessage should include("truncated")
    // tear segment 5 mid-record (half the file: some middle record is torn)
    val seg5 = dir.resolve(f"wal-${5}%020d.log")
    val bytes = Files.readAllBytes(seg5)
    Files.write(seg5, java.util.Arrays.copyOf(bytes, bytes.length / 2))
    // iteration path: the reader hits the tear mid-drain
    val e1 = intercept[IllegalStateException](MqttWal.readRange(dir, 5, 10).toSeq)
    e1.getMessage should include("truncated")
    // constructor path: positioning at offset 9 skip-scans across the tear —
    // the failure escapes before any caller holds a close() handle, so the
    // init block itself must release the stream (round-12 review)
    val e2 = intercept[IllegalStateException](MqttWal.readRange(dir, 9, 10))
    e2.getMessage should include("truncated")
    fdsOn(seg5) shouldBe 0 // nothing left open on the torn segment
  }

  test("recovery at EVERY byte-truncation point yields a clean record " +
      "prefix — never garbage, a torn record, or a crash — and range reads " +
      "over the recovered prefix drain it exactly") {
    val dir = tmp()
    val w = new MqttWal(dir, rollEvery = 100) // one segment
    val rs = recs(0, 8)
    w.append(rs)
    w.close()
    val seg = dir.resolve(f"wal-${0}%020d.log")
    val full = Files.readAllBytes(seg)
    // byte offset where each record ENDS, per the wire format (len-prefixed
    // topic, len-prefixed payload, int pid) — a cut keeps exactly the
    // records that end at or before it
    val ends = rs.map { case (t, p, _) =>
      4 + t.getBytes("UTF-8").length + 4 + p.getBytes("UTF-8").length + 4
    }.scanLeft(0)(_ + _).tail
    ends.last shouldBe full.length // the format model matches the file
    // exhaustive, not sampled: the decoder's EOF classification (clean
    // boundary vs torn length-prefix vs torn body) must hold at every cut
    for (cut <- 0 until full.length) {
      Files.write(seg, java.util.Arrays.copyOf(full, cut))
      val w2 = new MqttWal(dir, rollEvery = 100)
      w2.recoveredBase shouldBe 0L
      w2.recovered.size shouldBe ends.count(_ <= cut)
      w2.recovered shouldBe rs.take(w2.recovered.size).toVector
      if (w2.recovered.nonEmpty)
        MqttWal.readRange(dir, 0, w2.recovered.size).toSeq shouldBe
          rs.take(w2.recovered.size).map(r => (r._1, r._2))
      w2.close()
    }
    Files.write(seg, full)
    new MqttWal(dir, rollEvery = 100).recovered shouldBe rs.toVector
  }

  test("segment trim pins in-flight ranges: a trim at an uncommitted " +
      "batch's start never reclaims a segment the range still needs, and a " +
      "straddling segment survives to the exact wholly-below boundary") {
    val dir = tmp()
    val w = new MqttWal(dir, rollEvery = 4)
    w.append(recs(0, 14)) // segments 0(4), 4(4), 8(4), 12(2 — active)
    // micro-batch lifecycle: batch [6, 13) is planned but UNCOMMITTED.
    // Spark commits batch N only after it completes and only ever trims to
    // a committed offset, so the newest trim possible while this range is
    // in flight is the range's own start (the previous batch's end).
    val it = MqttWal.readRange(dir, 6, 13)
    val first = it.next() // reader mid-flight, positioned inside segment 4
    w.trimTo(6)
    // segment 0 (wholly below the commit) is reclaimed; segment 4
    // STRADDLES it — records 6..7 belong to the in-flight batch — and MUST
    // survive: the guard is `start + count <= offset`, not `start < offset`
    // (the buggy strictly-weaker check would delete it here and break the
    // executor's read mid-batch)
    walFiles(dir) shouldBe Seq(
      f"wal-${4}%020d.log", f"wal-${8}%020d.log", f"wal-${12}%020d.log")
    // the in-flight reader drains intact across the trim, including the
    // roll into later segments
    (first +: it.toSeq) shouldBe recs(6, 13).map(r => (r._1, r._2))
    // exact boundary: one record shy of wholly-below keeps the segment...
    w.trimTo(7)
    walFiles(dir) should contain(f"wal-${4}%020d.log")
    // ...and the committed batch's end releases it
    w.trimTo(8)
    walFiles(dir) shouldBe Seq(f"wal-${8}%020d.log", f"wal-${12}%020d.log")
    w.close()
  }

  test("a gapped segment chain fails recovery loudly") {
    val dir = tmp()
    val w = new MqttWal(dir, rollEvery = 5)
    w.append(recs(0, 15)) // segments 0, 5, 10
    w.close()
    Files.delete(dir.resolve(f"wal-${5}%020d.log")) // not a prefix deletion
    val e = intercept[IllegalArgumentException](new MqttWal(dir, rollEvery = 5))
    e.getMessage should include("WAL gap")
  }
}
