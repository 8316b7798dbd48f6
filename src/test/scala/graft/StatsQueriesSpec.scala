package graft

import org.apache.spark.sql.functions._
import graft.ops.StatsQueries
import graft.tables.Tables

/** Brute-force oracles for the stats/analytics operators (sf0.001). */
class StatsQueriesSpec extends SparkSpec {

  test("histogram buckets partition the table: counts sum to row count") {
    val li = Tables(spark, sf).lineitem
    val h = StatsQueries.histogram(spark, sf).collect()
    h.map(_.getAs[Long]("n")).sum shouldBe li.count()
    // every row's price sits inside its bucket's [lo, hi]
    h.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      val b = r.getAs[Long]("bucket")
      math.floor(lo / 5000).toLong shouldBe b
      math.floor(hi / 5000).toLong shouldBe b
    }
  }

  test("percentiles are ordered and bracketed by min/max") {
    StatsQueries.percentiles(spark, sf).collect().foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75)
    }
  }

  test("corr matches a driver-side two-pass computation") {
    val rows = Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0))
    val got = StatsQueries.corrStats(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("corr_qp")).toMap
    rows.foreach { case (flag, rs) =>
      val q = rs.map(_.getDouble(1)); val p = rs.map(_.getDouble(2))
      val n = q.length.toDouble
      val mq = q.sum / n; val mp = p.sum / n
      val cov = q.zip(p).map { case (a, b) => (a - mq) * (b - mp) }.sum
      val ref = cov / math.sqrt(q.map(a => (a - mq) * (a - mq)).sum *
        p.map(b => (b - mp) * (b - mp)).sum)
      got(flag) shouldBe ref +- 1e-4
    }
  }

  test("approx percentiles: exact columns match q_percentiles, sketch claim holds") {
    val exact = StatsQueries.percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))).toMap
    val got = graft.ops.RelationalQueries.approxPercentiles(spark, sf).collect()
    got should not be empty
    got.foreach { r =>
      val (e25, e50, e75) = exact(r.getString(0))
      r.getAs[Double]("p25") shouldBe e25
      r.getAs[Double]("p50") shouldBe e50
      r.getAs[Double]("p75") shouldBe e75
      withClue(s"GK sketch drifted out of tolerance for ${r.getString(0)}: ") {
        r.getAs[Boolean]("within_tol") shouldBe true
      }
    }
  }

  test("pivot cells sum to group totals") {
    val piv = StatsQueries.pivot(spark, sf).collect()
    val totals = Tables(spark, sf).lineitem.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    piv.foreach { r =>
      r.getAs[Long]("F") + r.getAs[Long]("O") shouldBe totals(r.getString(0))
    }
  }

  test("hash sample is deterministic and ~5%") {
    val s1 = StatsQueries.sampleHash(spark, sf).collect().map(_.getLong(0)).toSeq
    val s2 = StatsQueries.sampleHash(spark, sf).collect().map(_.getLong(0)).toSeq
    s1 shouldBe s2
    val total = Tables(spark, sf).orders.count()
    assert(s1.length > total / 40 && s1.length < total / 10) // 2.5%..10% band
  }

  test("binned range join equals the naive θ-join") {
    val e = Tables(spark, sf).events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val naive = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.us") - col("b.us")) <= 60000000L)
      .groupBy(col("a.user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binned = StatsQueries.rangeJoinBinned(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_pairs")).toMap
    binned shouldBe naive
  }

  test("mad outliers ≡ driver-side median/MAD recompute") {
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val h = (s.length - 1) / 2.0
      val (lo, hi) = (s(h.floor.toInt), s(h.ceil.toInt))
      lo + (h - h.floor) * (hi - lo) // linear interpolation, both engines' rule
    }
    val byType = Tables(spark, sf).events
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq.groupBy(_._1)
    val got = StatsQueries.madOutliers(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    got.keySet shouldBe byType.keySet
    byType.foreach { case (tpe, rowsT) =>
      val vals = rowsT.map(_._2)
      val med = medianOf(vals)
      val mad = medianOf(vals.map(v => math.abs(v - med)))
      val nOut = vals.count(v => math.abs(v - med) > 3.0 * 1.4826 * mad)
      val (n, gMed, gMad, gOut) = got(tpe)
      n shouldBe vals.size
      gMed shouldBe (med +- 1e-4)
      gMad shouldBe (mad +- 1e-4)
      gOut shouldBe nOut
    }
  }

  test("scalar subquery counts match a join-side aggregate") {
    val sub = StatsQueries.scalarSubquery(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_orders")).toMap
    val joined = Tables(spark, sf).customer.join(
        Tables(spark, sf).orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n")).toMap
    sub shouldBe joined
  }

  test("trend OLS matches a driver-side exact-sum regression per event type") {
    val base = StatsQueries.OlsEpochBase
    val pts = Tables(spark, sf).events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"), floor(col("ts").cast("double")).cast("long"),
        col("value"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1) - base, r.getDouble(2)))
    val want = pts.groupBy(_._1).map { case (et, ps) =>
      // exact sums via BigDecimal on the scale-4 quantized inputs, then the
      // identical double formula tree as the query
      def bd(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val xs = ps.map(p => bd(p._2.toDouble)); val ys = ps.map(p => bd(p._3))
      val n = ps.size.toDouble
      val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
      val sxx = xs.map(x => x * x).sum.toDouble
      val syy = ys.map(y => y * y).sum.toDouble
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
      val varx = n * sxx - sx * sx
      val slope = (n * sxy - sx * sy) / varx
      et -> (ps.size.toLong, slope, (sy - slope * sx) / n,
        ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (varx * (n * syy - sy * sy)))
    }
    val got = StatsQueries.trendOls(spark, sf).collect()
    got.map(_.getString(0)).toSet shouldBe want.keySet
    got.foreach { r =>
      val (n, slope, intercept, r2) = want(r.getString(0))
      r.getLong(1) shouldBe n
      r.getDouble(2) shouldBe slope +- 1e-6
      r.getDouble(3) shouldBe intercept +- 1e-6
      r.getDouble(4) shouldBe r2 +- 1e-6
      r.getDouble(4) should (be >= 0.0 and be <= 1.0)
    }
  }

  test("KS drift matches a driver-side ECDF supremum per source") {
    val docs = Tables(spark, sf).documents
      .select(col("source"), col("n_chars").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val all = docs.map(_._2).sorted
    val domain = all.distinct
    val bySrc = docs.groupBy(_._1)
    val got = StatsQueries.ksDrift(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_src"), r.getAs[Long]("n_rest"),
          r.getAs[Double]("ks_d"), r.getAs[Long]("d_at"))).toMap
    got.keySet shouldBe bySrc.keySet
    bySrc.foreach { case (src, rs) =>
      val mine = rs.map(_._2).sorted
      val rest = docs.filter(_._1 != src).map(_._2).sorted
      val gaps = domain.map { v =>
        v -> math.abs(
          mine.count(_ <= v).toDouble / mine.length -
            rest.count(_ <= v).toDouble / rest.length)
      }
      val d = gaps.map(_._2).max
      val at = gaps.filter(_._2 == d).map(_._1).min
      val (nSrc, nRest, ksD, dAt) = got(src)
      nSrc shouldBe mine.length.toLong
      nRest shouldBe rest.length.toLong
      ksD shouldBe d +- 1e-6
      dAt shouldBe at
    }
  }

  test("equi-depth histogram bins partition each type with ~quartile depths") {
    val byType = Tables(spark, sf).events
      .filter(col("value").isNotNull)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = StatsQueries.histogramEquidepth(spark, sf).collect()
      .groupBy(_.getString(0))
    got.keySet shouldBe byType.keySet
    got.foreach { case (et, bins) =>
      bins.map(_.getAs[Long]("n")).sum shouldBe byType(et)
      bins.map(_.getAs[Long]("bin")).sorted shouldBe (0L until bins.length)
      // equi-depth: each bin within ±1 of n/4 would be exact only for
      // distinct values; allow interpolation slack of 25% of the depth
      val depth = byType(et).toDouble / 4
      bins.foreach(b =>
        b.getAs[Long]("n").toDouble shouldBe depth +- (depth * 0.5 + 2))
      // bins tile the range in order: lo/hi are non-decreasing across bins
      val ordered = bins.sortBy(_.getAs[Long]("bin"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          a.getAs[Double]("hi") should be <= b.getAs[Double]("lo") + 1e-9
        case _ =>
      }
    }
  }

  test("chi-square independence matches a driver-side contingency recompute") {
    val obs = Tables(spark, sf).documents
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = obs.keySet.map(_._1).toSeq.sorted
    val srcs = obs.keySet.map(_._2).toSeq.sorted
    val rl = langs.map(l => l -> obs.collect { case ((`l`, _), c) => c }.sum).toMap
    val cs = srcs.map(s => s -> obs.collect { case ((_, `s`), c) => c }.sum).toMap
    val n = obs.values.sum.toDouble
    val chi2 = (for { l <- langs; s <- srcs } yield {
      val e = rl(l) * cs(s) / n
      val o = obs.getOrElse((l, s), 0L).toDouble
      (o - e) * (o - e) / e
    }).sum
    val r = StatsQueries.chisqIndependence(spark, sf).collect()
    r.length shouldBe 1
    r(0).getLong(0) shouldBe n.toLong
    r(0).getLong(1) shouldBe langs.size.toLong * srcs.size
    r(0).getDouble(2) shouldBe chi2 +- 1e-5
    r(0).getDouble(2) should be >= 0.0
  }

  test("bootstrap CI: deterministic, ordered bounds, full resample count") {
    val a = StatsQueries.bootstrapCi(spark, sf).collect()
    a.length should be > 0
    a.foreach { r =>
      r.getAs[Long]("n_resamples") shouldBe StatsQueries.BootstrapB.toLong
      r.getAs[Double]("ci_lo") should be <= r.getAs[Double]("ci_hi")
    }
    // hash-derived weights ⇒ bit-identical on rerun (the property RNG
    // bootstraps lack)
    val b = StatsQueries.bootstrapCi(spark, sf).collect()
    a.map(_.toSeq).toSeq shouldBe b.map(_.toSeq).toSeq
  }

  test("compaction plan: bins partition the files, stay day-ordered, near target") {
    import graft.tables.{TableRegistry, Tables}
    val plan = TableRegistry.compactionPlan(spark, sf).collect()
    plan.length should be > 0
    val totalDays = Tables(spark, sf).lineitem
      .select((floor(col("l_shipdate").cast("double") / 86400)).cast("long"))
      .distinct().count()
    plan.map(_.getAs[Long]("n_files")).sum shouldBe totalDays
    // consecutive bins cover disjoint, increasing day ranges
    plan.sortBy(_.getAs[Long]("bin")).sliding(2).foreach {
      case Array(p, n) =>
        assert(p.getAs[Long]("day_hi") < n.getAs[Long]("day_lo"))
      case _ =>
    }
    // every bin but the last reaches the target up to one file's slack
    // (prefix binning: a bin closes only once cumulative bytes cross its
    // boundary, so it can fall short of the target by at most the largest
    // single file)
    val maxFile = Tables(spark, sf).lineitem
      .groupBy((floor(col("l_shipdate").cast("double") / 86400)).cast("long"))
      .count().agg(max(col("count"))).collect()(0).getLong(0) *
      TableRegistry.CompactRowBytes
    plan.sortBy(_.getAs[Long]("bin")).dropRight(1).foreach { r =>
      (r.getAs[Long]("bin_bytes") + maxFile) should be >=
        TableRegistry.CompactTargetBytes
    }
  }

  test("dataskip audit: class semantics hold and matches sum to the direct count") {
    import graft.ops.StatsQueries._
    val rows = StatsQueries.dataskipAudit(spark, sf).collect()
    rows.length should be > 0
    // the audit partitions the table: bucket rows sum to the table count
    rows.map(_.getAs[Long]("n_rows")).sum shouldBe
      Tables(spark, sf).lineitem.count()
    rows.foreach { r =>
      val (nRows, nMatch) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_match"))
      r.getAs[String]("cls") match {
        case "pruned" => nMatch shouldBe 0L // skipping is CORRECT, never lossy
        case "full" => nMatch shouldBe nRows // metadata decides the predicate
        case "partial" => // must scan; no constraint beyond bounds
          nMatch should be <= nRows
        case other => fail(s"unknown class $other")
      }
      // zones bracket the bucket (weekly layout: days within the bucket week)
      r.getAs[Long]("day_lo") / 7 shouldBe r.getAs[Long]("wk")
      r.getAs[Long]("day_hi") / 7 shouldBe r.getAs[Long]("wk")
    }
    // total matches = direct predicate evaluation on the base table
    val direct = Tables(spark, sf).lineitem
      .where((floor(col("l_shipdate").cast("double") / 86400).cast("long")
          .between(SkipDayLo, SkipDayHi - 1)) &&
        col("l_extendedprice") >= SkipPriceLo &&
        col("l_extendedprice") < SkipPriceHi)
      .count()
    rows.map(_.getAs[Long]("n_match")).sum shouldBe direct
  }
}
