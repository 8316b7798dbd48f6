package graft

import graft.ops.TimeseriesQueries
import graft.tables.Tables

/** Brute-force driver-side oracles and invariants for the time-series
  * operators (sf0.001) — independent plain-Scala recomputation. */
class TimeseriesSpec extends SparkSpec {

  private lazy val events: Seq[(Long, Long, Long, Double)] =
    Tables(spark, sf).events
      .select("event_id", "user_id", "ts", "value")
      .selectExpr("event_id", "user_id",
        "cast(floor(cast(ts as double)) as bigint) as sec", "value")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("anomaly z-score = brute-force per-user two-sided 2-sigma flags") {
    // Recompute with BigDecimal sums (mirrors the decimal-exact power sums)
    // then the same double moment formulas.
    val want = events.groupBy(_._2).flatMap { case (_, es) =>
      val n = es.size.toDouble
      if (n < 2) Seq.empty
      else {
        val vs = es.map(e => BigDecimal(e._4).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        val s = vs.sum.toDouble
        val ss = vs.map(v => v * v).sum.toDouble
        val mean = s / n
        val std = math.sqrt((n * ss - s * s) / (n * (n - 1.0)))
        es.filter(e => math.abs(e._4 - mean) > TimeseriesQueries.ZThreshold * std)
          .map(e => e._1 -> ((e._4 - mean) / std))
      }
    }
    val got = TimeseriesQueries.anomalyZscore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    got.keySet shouldBe want.keySet
    got.foreach { case (id, z) => z shouldBe (want(id) +- 1e-6) }
    // sanity: anomalies exist but are a small minority
    assert(got.nonEmpty && got.size < events.size / 4)
  }

  test("anomaly threshold argument is live: 3-sigma flags are a strict subset") {
    val at2 = TimeseriesQueries.anomalyZscore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val at3 = TimeseriesQueries.anomalyZscore(spark, sf, threshold = 3.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(at3.size < at2.size)
    at3.keySet.subsetOf(at2.keySet) shouldBe true
    at3.foreach { case (id, z) =>
      math.abs(z) should be > 3.0 - 1e-6
      at2(id) shouldBe z // same stats, same z — only the gate moved
    }
  }

  test("gap fill honors stepSec: daily bars cover the same span more coarsely") {
    val day = 86400L
    val daily = TimeseriesQueries.gapFill(spark, sf, stepSec = day).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    daily.foreach { case (_, bar, _) => bar % day shouldBe 0L }
    // per user: counts conserved and grid strictly coarser than hourly
    val hourlyRows = TimeseriesQueries.gapFill(spark, sf).count()
    assert(daily.length < hourlyRows)
    val byUser = daily.groupBy(_._1)
    events.groupBy(_._2).foreach { case (u, es) =>
      byUser(u).map(_._3).sum shouldBe es.size.toLong
    }
  }

  test("gap fill: contiguous hourly grid, counts conserved, fill correct") {
    val step = TimeseriesQueries.GridStepSec
    val rows = TimeseriesQueries.gapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4)))
    val byUser = rows.groupBy(_._1)
    val evByUser = events.groupBy(_._2)
    byUser.keySet shouldBe evByUser.keySet
    byUser.foreach { case (u, g) =>
      val hours = g.map(_._2)
      // grid is exactly [h0, h1] with step — no holes, no extras
      hours.toSeq shouldBe (hours.min to hours.max by step).toSeq
      // observed hours/counts match raw events; first grid row is observed
      val obs = evByUser(u).groupBy(e => e._3 / step * step).view.mapValues(_.size.toLong).toMap
      g.filter(_._3 > 0).map(r => r._2 -> r._3).toMap shouldBe obs
      assert(g.minBy(_._2)._3 > 0 && g.maxBy(_._2)._3 > 0)
      // forward fill: every row carries the bar average of the most recent
      // observed hour (never null — the first grid hour is observed)
      val sorted = g.sortBy(_._2)
      var lastAvg = Double.NaN
      sorted.foreach { case (_, h, n, avg, gap) =>
        gap shouldBe (if (n == 0) 1L else 0L)
        if (n > 0) {
          val es = evByUser(u).filter(e => e._3 / step * step == h).map(_._4)
          val exact = es.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble / es.size
          avg.get shouldBe (exact +- 1e-9)
          lastAvg = avg.get
        } else avg.get shouldBe lastAvg
      }
    }
  }

  test("trailing EWMA = brute-force per-user weighted-lag kernel") {
    val evs = Tables(spark, sf).events
      .selectExpr("event_id", "user_id", "unix_micros(ts) as us", "value")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val w = TimeseriesQueries.EwmaWeights
    val want = evs.groupBy(_._2).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      sorted.indices.drop(w.size - 1).map { i =>
        val vals = w.indices.map(j =>
          BigDecimal(sorted(i - j)._4).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        val wsum = w.zip(vals).map { case (wt, v) => v * wt }.sum
        sorted(i)._1 -> wsum.toDouble / w.sum
      }
    }
    val got = TimeseriesQueries.ewmaTrailing(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    got.keySet shouldBe want.keySet
    got.foreach { case (id, v) => v shouldBe (want(id) +- 1e-6) }
    assert(got.nonEmpty, "corpus must have users with a full kernel history")
    // a flat-weight kernel is a plain 4-tap moving average — argument is live
    val flat = TimeseriesQueries.ewmaTrailing(spark, sf, weights = Seq(1, 1, 1, 1))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    flat.keySet shouldBe want.keySet
    assert(flat.exists { case (id, v) => math.abs(v - got(id)) > 1e-9 },
      "different weights must move at least one smoothed value")
  }
}
