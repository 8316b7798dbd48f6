package graft

import org.apache.spark.sql.functions._
import graft.ops.{BehaviorQueries, Out}
import graft.tables.Tables

/** Brute-force oracles for the behavior-analytics operators (sf0.001). */
class BehaviorSpec extends SparkSpec {

  test("interval coverage equals a driver-side interval-union merge") {
    val dur = BehaviorQueries.ConcurrencyDurSec
    val day = BehaviorQueries.DaySec
    val evs = Tables(spark, sf).events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), Out.epochSec(col("ts")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute force: day-boundary split, then the classic sorted-merge union
    val segs = evs.flatMap { case (u, s) =>
      val e = s + dur
      val b = (s / day) * day + day
      if (e > b) Seq((u, s / day, s, b), (u, b / day, b, e))
      else Seq((u, s / day, s, e))
    }
    val expected = segs.groupBy(x => (x._1, x._2)).map { case ((u, d), xs) =>
      val sorted = xs.map(x => (x._3, x._4)).sorted
      var covered = 0L
      var curLo = Long.MinValue; var curHi = Long.MinValue
      sorted.foreach { case (lo, hi) =>
        if (curHi == Long.MinValue) { curLo = lo; curHi = hi }
        else if (lo <= curHi) curHi = math.max(curHi, hi)
        else { covered += curHi - curLo; curLo = lo; curHi = hi }
      }
      if (curHi != Long.MinValue) covered += curHi - curLo
      (u, d * day) -> covered
    }
    val starts = evs.groupBy(x => (x._1, (x._2 / day) * day))
      .map { case (k, xs) => k -> xs.length.toLong }

    val got = BehaviorQueries.intervalCoverage(spark, sf).collect()
    got.length shouldBe expected.size
    got.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("day"))
      r.getAs[Long]("covered_sec") shouldBe expected(key)
      // a tail-only day (interval crossing midnight) has coverage, 0 starts
      r.getAs[Long]("n_starts") shouldBe starts.getOrElse(key, 0L)
      // union can never exceed the day
      r.getAs[Long]("covered_sec") should be <= day
      r.getAs[Double]("busy_frac") shouldBe
        BigDecimal(expected(key).toDouble / day)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-12
    }
  }
}
