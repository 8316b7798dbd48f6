package graft

import org.apache.spark.sql.functions._
import graft.tables.{Layout, Tables}

/** The clustered-write contract: range-partitioned files carry disjoint
  * min/max key intervals — the precondition for parquet row-group/file
  * pruning on range predicates at scale. */
class LayoutSpec extends SparkSpec {

  test("range-clustered write yields non-overlapping per-file key intervals") {
    val path = sys.props("java.io.tmpdir") + "/graft_clustered_lineitem"
    val n = 8
    Layout.writeClustered(
      Tables(spark, sf).lineitem.select("l_orderkey", "l_shipdate", "l_quantity"),
      path, "l_shipdate", n)

    val back = spark.read.parquet(path)
    back.count() shouldBe Tables(spark, sf).lineitem.count()

    // one file per range slice
    val perFile = back
      .groupBy(input_file_name().as("f"))
      .agg(min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"),
        count(lit(1)).as("rows"))
      .collect()
    perFile.length shouldBe n

    // sorted by their minimum, the intervals must not interleave: every
    // file's range starts at or after the previous file's range ends —
    // exactly what lets a range predicate skip whole files via footer stats
    // timestamp columns surface as java.sql.Timestamp (TimestampType) or
    // LocalDateTime (NTZ) depending on how the parquet was read — compare
    // as instants either way
    def inst(v: Any): java.time.Instant = v match {
      case t: java.sql.Timestamp => t.toInstant
      case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC)
      case other => fail(s"unexpected timestamp value $other")
    }
    val iv = perFile
      .map(r => (inst(r.get(1)), inst(r.get(2))))
      .sortBy(_._1)(Ordering.fromLessThan(_.isBefore(_)))
    iv.sliding(2).foreach {
      case Array((_, hiPrev), (loNext, _)) =>
        assert(!hiPrev.isAfter(loNext),
          s"overlapping clustered ranges: $hiPrev > $loNext")
      case _ =>
    }
    // range sampling must not have collapsed everything into one slice
    assert(perFile.map(_.getLong(3)).max < back.count(),
      "clustering produced a single non-empty slice")
  }

  test("graft_zorder ≡ per-bit Morton reference, interpreted and codegen'd") {
    import graft.functions.ZOrder2
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (b <- 0 until 32) {
        z |= ((x >> b) & 1L) << (2 * b)
        z |= ((y >> b) & 1L) << (2 * b + 1)
      }
      z
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xffffffffL, 0L),
      (0L, 0xffffffffL), (0xffffffffL, 0xffffffffL), (-1L, -1L)) ++
      Seq.fill(200)((rnd.nextLong(), rnd.nextLong()))
    cases.foreach { case (x, y) =>
      ZOrder2.compute(x, y) shouldBe ref(x & 0xffffffffL, y & 0xffffffffL)
    }
    // the SQL/codegen path must agree with the static kernel
    val viaSql = spark.createDataFrame(cases).toDF("x", "y")
      .selectExpr("x", "y", "graft_zorder(x, y) AS z").collect()
    viaSql.foreach(r =>
      r.getLong(2) shouldBe ZOrder2.compute(r.getLong(0), r.getLong(1)))
  }

  test("compact shrinks a fragmented table without changing its content") {
    import graft.tables.Layout
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val frag = s"$base/frag"
    // fragment: one file per order-key slice
    Tables(spark, sf).orders.repartition(64).write.mode("overwrite").parquet(frag)
    def files(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files(frag) >= 32, "fixture must start fragmented")
    val out = s"$base/compacted"
    val n = Layout.compact(spark, frag, out, targetFileBytes = 1L << 30)
    n shouldBe 1 // tiny table well under the target → single file
    files(out) shouldBe 1
    val before = Tables(spark, sf).orders.select("o_orderkey")
      .collect().map(_.getLong(0)).sorted
    val after = spark.read.parquet(out).select("o_orderkey")
      .collect().map(_.getLong(0)).sorted
    after shouldBe before
    // sortKey variant restores clustering while compacting
    val outSorted = s"$base/compacted_sorted"
    Layout.compact(spark, frag, outSorted, targetFileBytes = 1L << 18,
      sortKey = Some("o_orderkey"))
    val boxes = spark.read.parquet(outSorted)
      .groupBy(input_file_name())
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    boxes.sliding(2).foreach {
      case Array((_, hiPrev), (loNext, _)) => assert(hiPrev <= loNext)
      case _ =>
    }
  }

  test("generic mergeInto: insert, update, idempotence, layout pinning") {
    import graft.tables.Merge
    import org.apache.spark.sql.functions.lit
    val table = java.nio.file.Files
      .createTempDirectory("graft_merge_generic").toString + "/t"
    def df(rows: (Long, String, Double)*) =
      spark.createDataFrame(rows).toDF("k", "name", "score")
    // creation with an explicit bucket count
    Merge.mergeInto(table, df((1L, "a", 1.0), (2L, "b", 2.0)), Seq("k"),
      requestedBuckets = Some(4))
    def state() = spark.read.parquet(table).select("k", "name", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    state() shouldBe Set((1L, "a", 1.0), (2L, "b", 2.0))
    // update one key + insert another, with the request now ABSENT: the
    // persisted 4-bucket marker must govern
    Merge.mergeInto(table, df((2L, "b2", 9.0), (3L, "c", 3.0)), Seq("k"))
    state() shouldBe Set((1L, "a", 1.0), (2L, "b2", 9.0), (3L, "c", 3.0))
    // replaying the same merge leaves the table unchanged (exactly-once)
    Merge.mergeInto(table, df((2L, "b2", 9.0), (3L, "c", 3.0)), Seq("k"))
    state() shouldBe Set((1L, "a", 1.0), (2L, "b2", 9.0), (3L, "c", 3.0))
    spark.read.parquet(table).select("bucket").distinct().collect()
      .map(_.getInt(0)).foreach(b => assert(b >= 0 && b < 4))
    // a disagreeing bucket request fails loudly
    val e = intercept[IllegalStateException] {
      Merge.mergeInto(table, df((4L, "d", 4.0)), Seq("k"),
        requestedBuckets = Some(8))
    }
    e.getMessage should include("requires a rebuild")
    // reserved column name is rejected
    intercept[IllegalArgumentException] {
      Merge.mergeInto(table, df((5L, "e", 5.0)).withColumn("bucket", lit(0)),
        Seq("k"))
    }
  }

  test("mergeInto recovers from a crash between marker write and first data") {
    import graft.tables.Merge
    val table = java.nio.file.Files
      .createTempDirectory("graft_merge_crash").toString + "/t"
    // simulate the crash window: the layout marker was pinned (written
    // FIRST, by design) but the driver died before any data committed
    new java.io.File(table).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$table/_graft_buckets"), "4".getBytes("UTF-8"))
    // the recovery run carries NO bucket request — it must adopt the
    // pinned 4-bucket layout, not silently fall back to the default 32
    Merge.mergeInto(table,
      spark.createDataFrame(Seq((1L, "a"))).toDF("k", "v"), Seq("k"))
    val buckets = spark.read.parquet(table).select("bucket").distinct()
      .collect().map(_.getInt(0))
    buckets.foreach(b => assert(b >= 0 && b < 4))
    // and a conflicting later request still fails loudly against the marker
    val e = intercept[IllegalStateException] {
      Merge.mergeInto(table,
        spark.createDataFrame(Seq((2L, "b"))).toDF("k", "v"), Seq("k"),
        requestedBuckets = Some(32))
    }
    e.getMessage should include("requires a rebuild")
  }

  test("z-value clustering tightens BOTH dimension extents vs single-key") {
    import org.apache.spark.sql.functions.call_function
    val n = 8
    val day = (ops.Out.epochSec(col("l_shipdate")) / 86400).cast("long")
    val cells = Tables(spark, sf).lineitem.select(
      floor(col("l_extendedprice") * 65535.0 / 110000.0).cast("long").as("cx"),
      least(greatest((day - 9131) * 26, lit(0L)), lit(65535L)).as("cy"))
      .withColumn("zval", call_function("graft_zorder", col("cx"), col("cy")))
    def meanExtent(key: String): (Double, Double) = {
      val path = sys.props("java.io.tmpdir") + s"/graft_zorder_$key"
      Layout.writeClustered(cells, path, key, n)
      val boxes = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col("cx")) - min(col("cx"))).as("xe"),
          (max(col("cy")) - min(col("cy"))).as("ye"))
        .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
      (boxes.map(_._1).sum / boxes.length, boxes.map(_._2).sum / boxes.length)
    }
    val (xCx, yCx) = meanExtent("cx") // single-key layout: cy extent ~ full
    val (xZ, yZ) = meanExtent("zval")
    // z-layout must shrink the OTHER dimension's mean box edge materially
    // while keeping its own dimension's extent bounded (not exploding it)
    yZ should be < yCx * 0.8
    xZ should be < xCx * 8.0
  }
}
