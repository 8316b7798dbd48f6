package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.tables.TimeTravel

/** Snapshot-versioning semantics: history reconstruction, pointer
  * carry-forward, retention/vacuum, empty batches, and the orphan-dir
  * crash contract. The oracle-gated read path is q_time_travel. */
class TimeTravelSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_tt_spec").toString + "/t"

  test("each merge commits a snapshot; readAt reconstructs every state") {
    val t = tmp()
    val v0 = TimeTravel.mergeVersioned(t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    val v1 = TimeTravel.mergeVersioned(t,
      Seq((2L, "B"), (3L, "c")).toDF("k", "v"), Seq("k"))
    val v2 = TimeTravel.mergeVersioned(t,
      Seq((1L, "A")).toDF("k", "v"), Seq("k"))
    (v0, v1, v2) shouldBe ((0, 1, 2))
    def state(v: Int) = TimeTravel.readAt(spark, t, v).as[(Long, String)]
      .collect().toSet
    state(0) shouldBe Set((1L, "a"), (2L, "b"))
    state(1) shouldBe Set((1L, "a"), (2L, "B"), (3L, "c"))
    state(2) shouldBe Set((1L, "A"), (2L, "B"), (3L, "c"))
    TimeTravel.versions(spark, t) shouldBe Seq(0, 1, 2)
  }

  test("untouched buckets are carried by pointer: old version dirs serve " +
      "newer snapshots") {
    val t = tmp()
    // many keys spread over buckets in v0; v1 touches exactly one key.
    // Pointer mechanics need a MULTI-bucket layout, which 50 keys no longer
    // auto-derive (keys/50k rule) — pin it explicitly at creation.
    TimeTravel.mergeVersioned(t,
      (1L to 50L).map(k => (k, s"v$k")).toDF("k", "v"), Seq("k"), nBuckets = 32)
    TimeTravel.mergeVersioned(t, Seq((7L, "SEVEN")).toDF("k", "v"), Seq("k"))
    val s1 = TimeTravel.readAt(spark, t, 1).as[(Long, String)].collect().toMap
    s1(7L) shouldBe "SEVEN"
    s1(8L) shouldBe "v8"
    s1.size shouldBe 50
    // v1's file dir must hold ONLY the affected bucket's rows
    val v1Rows = spark.read.parquet(s"$t/files/v1").count()
    assert(v1Rows < 50, s"v1 rewrote $v1Rows rows; pointer carry-forward broken")
  }

  test("vacuum reclaims carried-forward dirs once compaction de-references them") {
    val t = tmp()
    // explicit multi-bucket layout: carried-forward references require v1
    // to leave most of v0's buckets untouched (see pointer test above)
    TimeTravel.mergeVersioned(t,
      (1L to 20L).map(k => (k, "x")).toDF("k", "v"), Seq("k"), nBuckets = 32)
    TimeTravel.mergeVersioned(t, Seq((1L, "y")).toDF("k", "v"), Seq("k"))
    // first vacuum: v0's manifest goes but its files stay (v1 references
    // them for the untouched buckets)
    TimeTravel.vacuum(spark, t, keepLast = 1)
    new java.io.File(s"$t/files/v0").exists() shouldBe true
    // compaction de-references v0's files; the next vacuum must reclaim the
    // dir even though no v0 manifest survives to list it (round-7 advice:
    // droppability must come from the disk listing, not versions())
    TimeTravel.compactLatest(spark, t)
    val dropped = TimeTravel.vacuum(spark, t, keepLast = 1)
    dropped should contain(0)
    new java.io.File(s"$t/files/v0").exists() shouldBe false
    new java.io.File(s"$t/files").listFiles().map(_.getName).toSeq shouldBe Seq("v2")
    TimeTravel.readAt(spark, t, 2).as[(Long, String)].collect().toMap
      .apply(1L) shouldBe "y"
  }

  test("additive schema evolution: old snapshots readable, carried rows NULL") {
    val t = tmp()
    TimeTravel.mergeVersioned(t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    // batch 1 ADDS a column; only key 2 is touched
    TimeTravel.mergeVersioned(t,
      Seq((2L, "B", 9L)).toDF("k", "v", "extra"), Seq("k"))
    // old snapshot keeps its original (narrow) shape
    TimeTravel.readAt(spark, t, 0).columns.toSet shouldBe Set("k", "v")
    // new snapshot reads the union schema; the carried row is NULL there
    val rows = TimeTravel.readAt(spark, t, 1).collect()
      .map(r => r.getLong(r.fieldIndex("k")) ->
        (r.getString(r.fieldIndex("v")),
          if (r.isNullAt(r.fieldIndex("extra"))) None
          else Some(r.getLong(r.fieldIndex("extra"))))).toMap
    rows(1L) shouldBe (("a", None))
    rows(2L) shouldBe (("B", Some(9L)))
    // a narrow LATE batch nulls the columns it omits for its keys
    TimeTravel.mergeVersioned(t, Seq((1L, 7L)).toDF("k", "extra"), Seq("k"))
    val rows2 = TimeTravel.readAt(spark, t, 2).collect()
      .map(r => r.getLong(r.fieldIndex("k")) ->
        (Option(r.getAs[String]("v")), Option(r.getAs[java.lang.Long]("extra"))
          .map(_.longValue))).toMap
    rows2(1L) shouldBe ((None, Some(7L)))
    rows2(2L) shouldBe ((Some("B"), Some(9L)))
  }

  test("restoreVersion is metadata-only and the upsert line continues from it") {
    val t = tmp()
    TimeTravel.mergeVersioned(t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    TimeTravel.mergeVersioned(t, Seq((1L, "X")).toDF("k", "v"), Seq("k"))
    val v2 = TimeTravel.restoreVersion(spark, t, 0)
    v2 shouldBe 2
    // pure metadata: no data dir was written for the restored version
    new java.io.File(s"$t/files/v2").exists() shouldBe false
    TimeTravel.readAt(spark, t, 2).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "a"), (2L, "b"))
    // the rolled-back version is still readable until vacuumed
    TimeTravel.readAt(spark, t, 1).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "X"), (2L, "b"))
    // and new merges continue from the restored state
    TimeTravel.mergeVersioned(t, Seq((2L, "Y")).toDF("k", "v"), Seq("k"))
    TimeTravel.readAt(spark, t, 3).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "a"), (2L, "Y"))
  }

  test("vacuum heals a pre-existing de-referenced dir even when every " +
      "manifest is retained, but never touches dirs past the commit head") {
    val t = tmp()
    TimeTravel.mergeVersioned(t, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    TimeTravel.mergeVersioned(t, Seq((1L, "b")).toDF("k", "v"), Seq("k"))
    TimeTravel.compactLatest(spark, t) // v2, self-contained
    // simulate a leak inherited from an older binary: v1's manifest lost
    // out-of-band, so files/v1 is referenced by nothing yet listed nowhere
    new java.io.File(s"$t/_manifests/v1").delete()
    // and an in-flight/crash-orphan dir PAST the commit head, which vacuum
    // must never touch (files land before the manifest)
    val inflight = new java.io.File(s"$t/files/v9"); inflight.mkdirs()
    // vs.size (2) <= keepLast (5): an early return here would skip the disk
    // scan and leak files/v1 forever (round-8 self-review)
    val dropped = TimeTravel.vacuum(spark, t, keepLast = 5)
    dropped should contain(1)
    dropped should not contain 9
    new java.io.File(s"$t/files/v1").exists() shouldBe false
    inflight.exists() shouldBe true
    TimeTravel.readAt(spark, t, 2).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "b"))
  }

  test("mergeVersioned rejects NULL-key update rows loudly") {
    val t = tmp()
    TimeTravel.mergeVersioned(t, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    val bad = Seq((Option(2L), "b"), (Option.empty[Long], "c")).toDF("k", "v")
    an[IllegalArgumentException] should be thrownBy
      TimeTravel.mergeVersioned(t, bad, Seq("k"))
    // the failed merge must not have committed a snapshot
    TimeTravel.versions(spark, t) shouldBe Seq(0)
  }

  test("vacuum drops pruned snapshots but keeps files newer manifests reference") {
    val t = tmp()
    // explicit multi-bucket layout so v2's manifest genuinely references
    // v0's files for the untouched buckets (the behavior under test)
    TimeTravel.mergeVersioned(t,
      (1L to 20L).map(k => (k, "x")).toDF("k", "v"), Seq("k"), nBuckets = 32)
    TimeTravel.mergeVersioned(t, Seq((1L, "y")).toDF("k", "v"), Seq("k"))
    TimeTravel.mergeVersioned(t, Seq((2L, "z")).toDF("k", "v"), Seq("k"))
    val dropped = TimeTravel.vacuum(spark, t, keepLast = 1)
    dropped shouldBe Seq(0, 1)
    TimeTravel.versions(spark, t) shouldBe Seq(2)
    // latest still fully readable even though v0's manifest is gone —
    // v2's manifest references v0's files for untouched buckets
    val s2 = TimeTravel.readAt(spark, t, 2).as[(Long, String)].collect().toMap
    s2.size shouldBe 20
    s2(1L) shouldBe "y"
    s2(2L) shouldBe "z"
    s2(3L) shouldBe "x"
    intercept[IllegalArgumentException](TimeTravel.readAt(spark, t, 0))
  }

  test("empty first batch commits an empty readable snapshot; empty later " +
      "batch is a no-op returning the current version") {
    val t = tmp()
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    TimeTravel.mergeVersioned(t, empty, Seq("k")) shouldBe 0
    TimeTravel.readAt(spark, t, 0).count() shouldBe 0
    TimeTravel.mergeVersioned(t, Seq((1L, "a")).toDF("k", "v"), Seq("k")) shouldBe 1
    TimeTravel.mergeVersioned(t, empty, Seq("k")) shouldBe 1
    TimeTravel.versions(spark, t) shouldBe Seq(0, 1)
  }

  test("orphan file dir from a crash before the manifest is invisible and " +
      "overwritten by the retry") {
    val t = tmp()
    TimeTravel.mergeVersioned(t, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    // simulate a crash: files for v1 land, manifest does not
    Seq((9L, "GHOST")).toDF("k", "v")
      .withColumn("bucket", lit(0))
      .write.partitionBy("bucket").parquet(s"$t/files/v1")
    TimeTravel.versions(spark, t) shouldBe Seq(0)
    intercept[IllegalArgumentException](TimeTravel.readAt(spark, t, 1))
    // retry commits v1 properly; the ghost rows are overwritten, not merged
    TimeTravel.mergeVersioned(t, Seq((2L, "b")).toDF("k", "v"), Seq("k")) shouldBe 1
    val s1 = TimeTravel.readAt(spark, t, 1).as[(Long, String)].collect().toSet
    s1 shouldBe Set((1L, "a"), (2L, "b"))
  }

  test("changesBetween types inserts/updates/deletes and skips unchanged keys") {
    val t = tmp()
    TimeTravel.mergeVersioned(t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), Seq("k"))
    TimeTravel.mergeVersioned(t,
      Seq((2L, "B"), (4L, "d")).toDF("k", "v"), Seq("k"))
    // re-upsert key 3 with the SAME value: its bucket pointer moves but the
    // row is unchanged — it must NOT appear in the feed
    TimeTravel.mergeVersioned(t, Seq((3L, "c")).toDF("k", "v"), Seq("k"))
    val feed = TimeTravel.changesBetween(spark, t, 0, 2, Seq("k"))
      .selectExpr("k", "change", "before.v as bv", "after.v as av")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.getString(2)), Option(r.getString(3)))))
      .toMap
    feed.keySet shouldBe Set(2L, 4L)
    feed(2L) shouldBe (("update", Some("b"), Some("B")))
    feed(4L) shouldBe (("insert", None, Some("d")))
    // identity feed is empty
    TimeTravel.changesBetween(spark, t, 2, 2, Seq("k")).count() shouldBe 0L
  }

  test("streaming foreachBatch through mergeVersioned: one snapshot per " +
      "micro-batch, latest equals the batch recompute, history readable") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft_tt_stream").toString
    val table = s"$base/table"
    // three input files → maxFilesPerTrigger=1 → three deterministic batches
    (0 until 3).foreach { b =>
      Seq((b * 10L + 1L, s"b$b"), (b * 10L + 2L, s"b$b"))
        .toDF("k", "v").coalesce(1).write.parquet(s"$base/in/f$b")
    }
    val stream = SparkSpec.spark.readStream
      .schema("k LONG, v STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/in/*")
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        TimeTravel.mergeVersioned(table, batch, Seq("k")): Unit
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val vs = TimeTravel.versions(spark, table)
    vs.size shouldBe 3
    TimeTravel.readAt(spark, table, vs.last).count() shouldBe 6
    // every intermediate snapshot is still readable with 2 more rows each
    vs.zipWithIndex.foreach { case (v, i) =>
      TimeTravel.readAt(spark, table, v).count() shouldBe 2L * (i + 1)
    }
  }

  test("compactLatest: identical state, self-contained manifest, old " +
      "versions vacuum away cleanly") {
    val t = tmp()
    TimeTravel.mergeVersioned(t,
      (1L to 30L).map(k => (k, s"v$k")).toDF("k", "v"), Seq("k"))
    TimeTravel.mergeVersioned(t, Seq((5L, "X")).toDF("k", "v"), Seq("k"))
    TimeTravel.mergeVersioned(t, Seq((31L, "n")).toDF("k", "v"), Seq("k"))
    val before = TimeTravel.readAt(spark, t, 2).as[(Long, String)]
      .collect().toSet
    val cv = TimeTravel.compactLatest(spark, t)
    cv shouldBe 3
    TimeTravel.readAt(spark, t, cv).as[(Long, String)]
      .collect().toSet shouldBe before
    // pre-compaction snapshots still read correctly
    TimeTravel.readAt(spark, t, 0).count() shouldBe 30
    // after retention passes, only the compacted dir remains on disk
    TimeTravel.vacuum(spark, t, keepLast = 1)
    TimeTravel.versions(spark, t) shouldBe Seq(3)
    val dirs = new java.io.File(s"$t/files").listFiles().map(_.getName).sorted
    dirs.toSeq shouldBe Seq("v3")
    TimeTravel.readAt(spark, t, 3).as[(Long, String)]
      .collect().toSet shouldBe before
  }

  test("auto-sized layout: first non-empty merge derives the bucket count " +
      "from its key count, pins it, and later explicit disagreement fails") {
    val t = tmp()
    // empty first batch commits v0 but pins NO layout
    TimeTravel.mergeVersioned(t,
      Seq.empty[(Long, String)].toDF("k", "v"), Seq("k")) shouldBe 0
    new java.io.File(s"$t/_graft_buckets").exists() shouldBe false
    // first non-empty merge: 3 keys → keys/50k rule → 1 bucket, pinned
    TimeTravel.mergeVersioned(t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), Seq("k")) shouldBe 1
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$t/_graft_buckets")), "UTF-8").trim shouldBe "1"
    // the pinned layout governs later merges and reads stay exact
    TimeTravel.mergeVersioned(t, Seq((2L, "B")).toDF("k", "v"), Seq("k"))
    TimeTravel.readAt(spark, t, 2).as[(Long, String)].collect().toSet shouldBe
      Set((1L, "a"), (2L, "B"), (3L, "c"))
    // an explicit count that disagrees with the marker fails loudly (the
    // shared Merge.resolveBuckets cross-check — one exception type for
    // both table kinds since round 19)
    an[IllegalStateException] should be thrownBy
      TimeTravel.mergeVersioned(t, Seq((4L, "d")).toDF("k", "v"), Seq("k"),
        nBuckets = 8)
  }

  test("a rejected (NULL-key) FIRST batch pins no layout marker") {
    import spark.implicits._
    val t = tmp()
    val bad = Seq((Option(1L), "a"), (Option.empty[Long], "b")).toDF("k", "v")
    an[IllegalArgumentException] should be thrownBy
      TimeTravel.mergeVersioned(t, bad, Seq("k"))
    new java.io.File(s"$t/_graft_buckets").exists() shouldBe false
    // a valid retry is then free to size from ITS row count
    TimeTravel.mergeVersioned(t, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    new java.io.File(s"$t/_graft_buckets").exists() shouldBe true
  }

  test("committed version data without a marker fails loudly, never re-sizes") {
    import spark.implicits._
    val t = tmp()
    TimeTravel.mergeVersioned(t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$t/_graft_buckets"))
    val e = intercept[IllegalStateException] {
      TimeTravel.mergeVersioned(t, Seq((3L, "c")).toDF("k", "v"), Seq("k"))
    }
    e.getMessage should include("no _graft_buckets marker")
  }

  test("Merge.autoBuckets applies the keys/50k rule with floor and cap") {
    import graft.tables.Merge
    Merge.autoBuckets(0L) shouldBe 1
    Merge.autoBuckets(1L) shouldBe 1
    Merge.autoBuckets(50000L) shouldBe 1
    Merge.autoBuckets(50001L) shouldBe 2
    Merge.autoBuckets(1600000L) shouldBe 32
    Merge.autoBuckets(Long.MaxValue / 4) shouldBe Merge.MaxAutoBuckets
  }

  test("the demo key's history equals the per-version recompute") {
    val df = tables.TableRegistry.timeTravelDemo(spark, sf).collect()
    val evs = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id as uid", "event_id")
      .where("uid is not null and event_id is not null").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nb = tables.TableRegistry.MergeBatches
    val want = (0 until nb).flatMap { v =>
      evs.groupBy(_._1).flatMap { case (u, xs) =>
        val eligible = xs.filter(e => (e._2 % nb) <= v)
        if (eligible.isEmpty) None else {
          val bmax = eligible.map(_._2 % nb).max
          val last = eligible.filter(_._2 % nb == bmax)
          Some((v.toLong, u, last.map(_._2).max, last.length.toLong))
        }
      }
    }.toSet
    df.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet shouldBe want
  }
}
