package graft

import org.apache.spark.sql.functions._
import graft.ops.EventQueries
import graft.tables.Tables

/** Brute-force oracles for the event-domain operators at sf0.001 (1000 rows —
  * small enough to recompute in plain Scala collections, giving a check that
  * is independent of Spark's own aggregation/window machinery). */
class EventQueriesSpec extends SparkSpec {

  private case class Ev(eventId: Long, tsMicros: Long, userId: Long,
      eventType: String, value: Double, k: Option[Long])

  // Raw events collected once, JSON `props.k` parsed driver-side.
  private lazy val evs: Seq[Ev] = {
    val kRe = """"k"\s*:\s*(-?\d+)""".r
    Tables(spark, sf).events
      .select(col("event_id"), unix_micros(col("ts")), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .collect().toSeq
      .map { r =>
        val k = Option(r.getString(5))
          .flatMap(s => kRe.findFirstMatchIn(s)).map(_.group(1).toLong)
        Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          if (r.isNullAt(4)) 0.0 else r.getDouble(4), k)
      }
  }

  test("validity predicate truth table (R4 semantics: OR, zero-sentinel)") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // (value, k, expectedKept)  — mirrors FIXTURES.md §1 truth table
      (0.0, 0L, false),  // empty sentinel: both zero → drop
      (25.0, 30L, true), // both in range
      (60.0, 30L, true), // value out but k < 50 → OR keeps it
      (30.0, 90L, true), // k out but value < 50
      (60.0, 90L, false),// both out of range
      (50.0, 50L, false),// boundary: strict <
      (0.0, 10L, true),  // single zero is NOT the sentinel
      (10.0, 0L, true)
    )
    val df = cases.toDF("value", "k", "expected")
      .withColumn("kept",
        EventQueries.validityPredicate(col("value"), col("k")))
    df.collect().foreach { r =>
      assert(r.getBoolean(3) === r.getBoolean(2),
        s"value=${r.getDouble(0)} k=${r.getLong(1)}")
    }
  }

  test("validity predicate treats NULLs as the zero sentinel") {
    val s = spark
    import s.implicits._
    val df = Seq[(Option[Double], Option[Long])](
      (None, None), (Some(25.0), None), (None, Some(60L)))
      .toDF("value", "k")
      .withColumn("kept", EventQueries.validityPredicate(col("value"), col("k")))
    rows(df.select(col("kept"))) shouldBe Seq(
      Seq(false), // null,null ≡ 0,0 → empty drop
      Seq(true),  // 25 < 50
      Seq(true))  // value≡0 passes "v<50"
  }

  test("tumbling max matches brute force") {
    val expected = evs
      .groupBy(e => (e.userId, e.tsMicros / 60000000L * 60L))
      .map { case ((u, w), g) => (u, w, g.map(_.value).max) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = rows(EventQueries.tumblingMax(spark, sf))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Double]))
    got shouldBe expected
  }

  test("grouped agg matches brute force counts and extremes") {
    val expected = evs.groupBy(_.eventType)
      .map { case (t, g) => (t, g.size.toLong, g.map(_.value).max, g.map(_.value).min) }
      .toSeq.sortBy(_._1)
    val got = rows(EventQueries.groupedAgg(spark, sf))
      .map(r => (r(0).asInstanceOf[String], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Double], r(3).asInstanceOf[Double]))
    got shouldBe expected
  }

  test("exact dedup keeps exactly the min event_id per (user, type)") {
    val expected = evs.groupBy(e => (e.userId, e.eventType))
      .map { case (_, g) => g.minBy(_.eventId).eventId }
      .toSeq.sorted
    val got = rows(EventQueries.dedupExact(spark, sf)).map(_(0).asInstanceOf[Long])
    got shouldBe expected
  }

  test("as-of join picks the latest prior click per purchase") {
    val byUser = evs.groupBy(_.userId)
    val expected = evs.filter(_.eventType == "purchase").map { p =>
      val clicks = byUser(p.userId).filter(c =>
        c.eventType == "click" &&
          (c.tsMicros < p.tsMicros ||
            (c.tsMicros == p.tsMicros))) // click sorts before purchase at equal ts
      val best = clicks.sortBy(c => (c.tsMicros, c.eventId)).lastOption
      (p.eventId, best.map(_.eventId))
    }.sortBy(_._1)
    val got = rows(EventQueries.asofJoin(spark, sf)).map(r =>
      (r(0).asInstanceOf[Long], Option(r(3)).map(_.asInstanceOf[Long])))
    got shouldBe expected
  }

  test("sliding window: every event contributes to exactly two windows") {
    val total = rows(EventQueries.slidingCount(spark, sf))
      .map(_(2).asInstanceOf[Long]).sum
    total shouldBe evs.size * 2L
  }

  test("session window partitions all events, no session spans a 30-min gap") {
    val df = EventQueries.sessionWindow(spark, sf)
    rows(df).map(_(2).asInstanceOf[Long]).sum shouldBe evs.size.toLong
    // sessions per user are disjoint: starts strictly increasing
    val byUser = rows(df).groupBy(_(0))
    byUser.values.foreach { ss =>
      val starts = ss.map(_(1).asInstanceOf[Long])
      starts shouldBe starts.sorted
      starts.distinct.size shouldBe starts.size
    }
  }

  test("attribution: every purchase lands exactly once; organic arm = " +
      "users with no in-window click") {
    val ev = Tables(spark, sf).events
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        graft.ops.Out.epochSec(col("ts")).as("t")).collect()
    val purchases = ev.filter(_.getString(2) == "purchase")
    val clicks = ev.filter(_.getString(2) == "click")
      .map(r => (r.getLong(1), r.getLong(3)))
    val w = graft.ops.BehaviorQueries.AttribWindowSec
    val wantAttributed = purchases.count { p =>
      val (uid, tp) = (p.getLong(1), p.getLong(3))
      clicks.exists { case (cu, tc) => cu == uid && tc <= tp && tc > tp - w }
    }
    val got = graft.ops.BehaviorQueries.attributionLastTouch(spark, sf)
      .collect()
    got.map(_.getAs[Long]("n_purchases")).sum shouldBe purchases.length.toLong
    got.map(_.getAs[Long]("n_attributed")).sum shouldBe wantAttributed.toLong
    got.foreach { r =>
      r.getAs[Long]("n_attributed") + r.getAs[Long]("n_organic") shouldBe
        r.getAs[Long]("n_purchases")
    }
  }
}
