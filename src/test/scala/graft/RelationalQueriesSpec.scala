package graft

import org.apache.spark.sql.functions._
import graft.ops.RelationalQueries
import graft.tables.Tables

/** Brute-force + plan-shape checks for the relational operator library. */
class RelationalQueriesSpec extends SparkSpec {

  private lazy val orders: Seq[(Long, Long, Double)] =
    Tables(spark, sf).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("bandedNtile: agrees with ntile on distinct values when bands divide " +
      "the count; keeps ties in ONE band where ntile splits them; and plans " +
      "no window at all") {
    import org.apache.spark.sql.expressions.Window
    val sp = spark
    import sp.implicits._
    // distinct values, 8 rows / 4 bands: value-banding == ntile
    val distinctDf = (1 to 8).map(_.toDouble).toDF("v")
    val banded = RelationalQueries.bandedNtile(distinctDf, "v", 4, exact = true)
      .select(col("v"), col("band")).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val tiled = distinctDf
      .select(col("v"), ntile(4).over(Window.orderBy(col("v"))).cast("long").as("t"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    banded shouldBe tiled
    // ties: ntile SPLITS a run of equal values across tiles (count
    // equalization by row position); value banding keeps every equal value
    // in the same band — the documented semantic difference
    val ties = Seq(1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 3.0).toDF("v")
    val b2 = RelationalQueries.bandedNtile(ties, "v", 4, exact = true)
      .select(col("v"), col("band")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    b2.filter(_._1 == 2.0).map(_._2).distinct.length shouldBe 1 // one band for all ties
    val t2 = ties
      .select(col("v"), ntile(4).over(Window.orderBy(col("v"))).cast("long").as("t"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    t2.filter(_._1 == 2.0).map(_._2).distinct.length should be > 1 // ntile splits the run
    // every row lands in [1, nBands]
    b2.map(_._2).foreach(b => assert(b >= 1 && b <= 4))
    // scale shape: the assignment is an aggregate + broadcast-back + map —
    // NO window operator (so no unpartitioned sort) in the optimized plan
    val big = RelationalQueries.bandedNtile(
      Tables(spark, sf).orders, "o_totalprice", 10)
    val p = plan(big)
    p.toLowerCase should not include "window"
    p should include("BroadcastNestedLoopJoin") // the 1-row bounds frame
  }

  test("bandedNtile: an input frame already carrying __bounds bands cleanly " +
      "(internal column uniquified, caller's column survives)") {
    val sp = spark
    import sp.implicits._
    // e.g. a preserved intermediate of an earlier banding pass
    val withBounds = (1 to 8).map(i => (i.toDouble, s"b$i")).toDF("v", "__bounds")
    val out = RelationalQueries.bandedNtile(withBounds, "v", 4, exact = true)
    out.columns.toSeq shouldBe Seq("v", "__bounds", "band")
    val got = out.collect().map(r => (r.getDouble(0), r.getString(1), r.getLong(2)))
    got.map(_._2).toSet shouldBe (1 to 8).map(i => s"b$i").toSet // caller's column intact
    got.foreach { case (v, _, b) => b shouldBe math.ceil(v / 2).toLong } // 8 rows / 4 bands
    // outCol = "__bounds": the internal name must dodge the OUTPUT name
    // too, or the final drop would silently delete the band column itself
    val asBounds = RelationalQueries.bandedNtile(
      (1 to 8).map(_.toDouble).toDF("v"), "v", 4, outCol = "__bounds",
      exact = true)
    asBounds.columns.toSeq shouldBe Seq("v", "__bounds")
    asBounds.collect().map(_.getLong(1)).toSet shouldBe Set(1L, 2L, 3L, 4L)
    // a differently-CASED collision: the default resolver is
    // case-insensitive, so "__BOUNDS" must count as taken
    val cased = (1 to 8).map(i => (i.toDouble, i)).toDF("v", "__BOUNDS")
    val outCased = RelationalQueries.bandedNtile(cased, "v", 4, exact = true)
    outCased.columns.toSeq shouldBe Seq("v", "__BOUNDS", "band")
    outCased.collect().map(r => (r.getDouble(0), r.getLong(2)))
      .foreach { case (v, b) => b shouldBe math.ceil(v / 2).toLong }
  }

  test("top-k matches a full driver-side sort") {
    val expected = orders.sortBy(o => (-o._3, o._1)).take(100).map(_._1)
    val got = rows(RelationalQueries.sortLimitTopK(spark, sf))
      .map(_(0).asInstanceOf[Long])
    got shouldBe expected
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val df = Tables(spark, sf).orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
    plan(df) should include("TakeOrderedAndProject")
  }

  test("window rank returns at most 3 rows per customer, correctly ordered") {
    val got = rows(RelationalQueries.windowRank(spark, sf))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Double], r(3).asInstanceOf[Long]))
    val byCust = got.groupBy(_._1)
    val expected = orders.groupBy(_._2).map { case (c, os) =>
      c -> os.sortBy(o => (-o._3, o._1)).take(3).map(_._1)
    }
    byCust.foreach { case (c, rs) =>
      rs.size should be <= 3
      rs.map(_._2) shouldBe expected(c)
      rs.map(_._4) shouldBe (1L to rs.size)
    }
    byCust.keySet shouldBe expected.filter(_._2.nonEmpty).keySet
  }

  test("semi + anti join partition the customers exactly") {
    val semi = rows(RelationalQueries.joinSemi(spark, sf)).map(_(0)).toSet
    // joinSemi threshold is 400k, joinAnti is 450k — recompute anti at 400k
    val t = Tables(spark, sf)
    val anti400 = t.customer.join(
        t.orders.filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
    val anti = rows(anti400).map(_(0)).toSet
    val all = rows(t.customer.select(col("c_custkey"))).map(_(0)).toSet
    (semi intersect anti) shouldBe empty
    (semi union anti) shouldBe all
  }

  test("broadcast star join actually broadcasts the dims") {
    val p = plan(RelationalQueries.joinBroadcast(spark, sf))
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
  }

  test("left join keeps customers without matching orders") {
    val leftN = RelationalQueries.joinLeft(spark, sf).count()
    leftN shouldBe Tables(spark, sf).customer.count()
  }

  test("rollup row count = groups + flag-subtotals + grand total") {
    val li = Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_linestatus")).collect()
    val pairs = li.map(r => (r.getString(0), r.getString(1))).toSeq
    val nPairs = pairs.distinct.size
    val nFlags = pairs.map(_._1).distinct.size
    RelationalQueries.rollupAgg(spark, sf).count() shouldBe (nPairs + nFlags + 1)
    RelationalQueries.cubeAgg(spark, sf).count() shouldBe
      (nPairs + nFlags + pairs.map(_._2).distinct.size + 1)
  }

  test("set ops: |union| = |A| + |B| - |intersect|; |except| = |A| - |intersect|") {
    val t = Tables(spark, sf)
    val a = t.customer.filter(col("c_mktsegment") === "BUILDING").count()
    val b = t.customer.filter(col("c_acctbal") > 7000.0).count()
    val i = RelationalQueries.setIntersect(spark, sf).count()
    RelationalQueries.setUnion(spark, sf).count() shouldBe (a + b - i)
    RelationalQueries.setExcept(spark, sf).count() shouldBe (a - i)
  }

  test("tpch1 filter is pushed to the parquet scan") {
    val df = Tables(spark, sf).lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"))
    plan(df) should include("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate")
  }

  test("agg filter: conditional counts match direct filtered recomputes") {
    val t = Tables(spark, sf)
    val got = rows(RelationalQueries.aggFilter(spark, sf))
      .map(r => r(0).asInstanceOf[String] -> r).toMap
    val nAll = t.lineitem.groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDisc = t.lineitem.filter(col("l_discount") > 0.05)
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.keySet shouldBe nAll.keySet
    nAll.foreach { case (f, n) => got(f)(1) shouldBe n }
    nDisc.foreach { case (f, n) => got(f)(2) shouldBe n }
    got.values.foreach { r =>
      assert(r(2).asInstanceOf[Long] <= r(1).asInstanceOf[Long])
      assert(r(4).asInstanceOf[Long] <= r(1).asInstanceOf[Long])
    }
  }

  test("tpch3: descending top-k, all winners from the filtered segment") {
    val got = RelationalQueries.tpch3TopK(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 10)
    val revs = got.map(_.getDouble(3))
    revs.toSeq shouldBe revs.sortBy(-_).toSeq
    val t = Tables(spark, sf)
    val keys = got.map(_.getLong(0)).toSeq
    val seg = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderkey").isin(keys: _*))
      .select("c_mktsegment").distinct().collect().map(_.getString(0)).toSet
    seg shouldBe Set("BUILDING")
    // k argument is live
    RelationalQueries.tpch3TopK(spark, sf, k = 3).count() shouldBe
      math.min(3, got.length).toLong
  }

  test("tpch5: revenue per nation ≡ driver-side recompute at a non-default region") {
    val t = Tables(spark, sf)
    val got = RelationalQueries
      .tpch5Volume(spark, sf, regionName = "EUROPE",
        yearStart = "1997-01-01", yearEnd = "1998-01-01")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    // brute force: collect the whole snowflake and fold on the driver
    val rk = t.region.collect().filter(_.getString(1) == "EUROPE")
      .map(_.getInt(0)).toSet
    val nat = t.nation.collect().filter(r => rk(r.getInt(2)))
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val supNat = t.supplier.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val custNat = t.customer.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val ordCust = t.orders.collect()
      .filter { r =>
        // Timestamp (TimestampType) or LocalDateTime (NTZ) depending on the
        // parquet read path - compare as UTC instants either way
        val d = r.get(4) match {
          case t: java.sql.Timestamp => t.toInstant
          case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC)
          case other => fail(s"unexpected timestamp value $other")
        }
        val lo = java.time.Instant.parse("1997-01-01T00:00:00Z")
        val hi = java.time.Instant.parse("1998-01-01T00:00:00Z")
        !d.isBefore(lo) && d.isBefore(hi)
      }.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rev = scala.collection.mutable.Map.empty[String, BigDecimal]
    t.lineitem.collect().foreach { r =>
      for {
        custkey <- ordCust.get(r.getLong(0))
        snat <- supNat.get(r.getLong(2)) if nat.contains(snat)
        cnat <- custNat.get(custkey) if cnat == snat
      } {
        val term = BigDecimal(r.getDouble(5)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
          BigDecimal(1.0 - r.getDouble(6)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        rev(nat(snat)) = rev.getOrElse(nat(snat), BigDecimal(0)) + term
      }
    }
    val expected = rev.toSeq.map { case (n, v) => (n, v.toDouble) }
      .sortBy { case (n, v) => (-v, n) }
    got shouldBe expected
  }

  test("tpch18: threshold argument is live and every winner clears it") {
    val got = RelationalQueries.tpch18BigOrders(spark, sf, minQty = 150.0, k = 5)
      .collect()
    got.length should be <= 5
    got.foreach(_.getDouble(5) should be > 150.0)
    val t = Tables(spark, sf)
    val truth = t.lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q")).filter(col("q") > 150.0)
      .collect().map(_.getLong(0)).toSet
    got.map(_.getLong(2)).foreach(k => truth should contain(k))
    // default threshold returns a subset of the lower-threshold key set
    RelationalQueries.tpch18BigOrders(spark, sf, minQty = 300.0).collect()
      .map(_.getLong(2)).foreach(k => truth should contain(k))
  }

  test("tpch5/tpch18 plan shape: dims broadcast, top-k never a global sort") {
    val p5 = plan(RelationalQueries.tpch5Volume(spark, sf))
    // region→nation→supplier fold and the supplier side into lineitem are
    // explicit broadcast()s — present at ANY scale factor, by construction
    "BroadcastHashJoin".r.findAllIn(p5).length should be >= 2
    p5 should not include "CartesianProduct"
    val p18 = plan(RelationalQueries.tpch18BigOrders(spark, sf))
    p18 should include("TakeOrderedAndProject") // per-partition heaps, no sort
    p18 should not include "CartesianProduct"
    // the quantity aggregate + HAVING runs BEFORE the detail joins: the
    // aggregate subtree must not contain a join (semi-join reduction order)
    val aggIdx = p18.indexOf("qtyDec")
    aggIdx should be >= 0
  }

  test("scd2 islands: ranges chain, statuses alternate, one hash shuffle") {
    val got = RelationalQueries.scd2Islands(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
    got.map(_._6).sum shouldBe Tables(spark, sf).orders.count()
    got.groupBy(_._1).values.foreach { hist =>
      val h = hist.sortBy(_._2)
      h.head._2 shouldBe 1L // islands number consecutively from 1
      h.map(_._2).toSeq shouldBe (1L to h.length)
      h.last._5 shouldBe None // open-ended current island
      h.sliding(2).foreach {
        case Array(prev, cur) =>
          prev._5 shouldBe Some(cur._4) // valid_to chains to next valid_from
          prev._3 should not be cur._3 // adjacent islands differ in status
        case _ =>
      }
    }
    // the whole build shuffles ONCE on the customer key (the output sort's
    // range exchange is presentation, not computation)
    val p = plan(RelationalQueries.scd2Islands(spark, sf))
    val hashExchanges = "hashpartitioning\\(o_custkey".r.findAllIn(p).length
    assert(p.split("Exchange hashpartitioning").length - 1 <= 1,
      s"expected a single hash exchange, plan:\n$p")
    hashExchanges should be >= 1
  }

  test("approx distinct: exact column matches and sketch claim holds") {
    val t = Tables(spark, sf)
    val exact = t.events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = RelationalQueries.approxDistinct(spark, sf).collect()
    got should not be empty
    got.foreach { r =>
      r.getAs[Long]("exact_users") shouldBe exact(r.getString(0))
      withClue(s"sketch drifted out of tolerance for ${r.getString(0)}: ") {
        r.getAs[Boolean]("within_tol") shouldBe true
      }
    }
  }

  test("snapshot diff covers all four arms, including removed (synthetic)") {
    val oldSnap = spark.createDataFrame(
      Seq((1L, 2L, 100.0), (2L, 1L, 50.0), (3L, 3L, 75.0)))
      .toDF("cust", "old_n", "old_total")
    val newSnap = spark.createDataFrame(
      Seq((1L, 2L, 100.0), (2L, 2L, 90.0), (4L, 1L, 10.0)))
      .toDF("cust", "new_n", "new_total")
    val got = RelationalQueries.diffSnapshots(oldSnap, newSnap)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got shouldBe Map(2L -> "changed", 3L -> "removed", 4L -> "added")
    // cust 1 is 'same' and must be absent from the exception report
  }

  test("skyline ≡ brute-force strict-dominance scan") {
    val orders = Tables(spark, sf).orders
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        floor(col("o_orderdate").cast("timestamp").cast("double")).cast("long").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = orders.filter { case (_, c, d) =>
      !orders.exists { case (_, c2, d2) => c2 < c && d2 > d }
    }.map(_._1).toSet
    val got = RelationalQueries.skylineOrders(spark, sf).collect()
      .map(_.getLong(0)).toSet
    got shouldBe expected
    got should not be empty
  }
}
