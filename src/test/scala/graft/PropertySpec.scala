package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.streaming.{SensorPipeline, StatefulOps}

/** Property-based checks (SURVEY.md §5 test strategy, item 3): semantic
  * invariants over ScalaCheck-generated inputs, not just fixture rows.
  * Samples are drawn with fixed seeds (`pureApply`) so failures reproduce;
  * per-case rows are batched into one DataFrame per property to keep the
  * suite fast. */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  /** The reference R4 predicate as a pure function
    * (StreamProcessor.java:61-78). */
  private def refKeep(t: Long, h: Long): Boolean =
    !(t == 0 && h == 0) && (t < 50 || h < 100)

  test("validity filter ≡ reference predicate for arbitrary metric values") {
    val cases = samples(Gen.zip(Gen.chooseNum(-5L, 200L), Gen.chooseNum(-5L, 200L)), 300)
      .zipWithIndex.map { case ((t, h), i) => (i.toLong, t, h) }
    val df = spark.createDataFrame(cases).toDF("case_id", "temperature", "humidity")
    val kept = df.filter(SensorPipeline.isValid(col("temperature"), col("humidity")))
      .select("case_id").collect().map(_.getLong(0)).toSet
    cases.foreach { case (i, t, h) =>
      assert(kept.contains(i) == refKeep(t, h),
        s"case $i: t=$t h=$h engine=${kept.contains(i)} reference=${refKeep(t, h)}")
    }
  }

  test("zero-sentinel: arbitrary partial metrics JSON parses to Gson defaults") {
    val field = Gen.option(Gen.chooseNum(0L, 150L))
    val cases = samples(Gen.zip(field, field), 200).zipWithIndex
      .map { case ((t, h), i) =>
        val metrics = (t.map(v => s""""temperature": $v""") ++
          h.map(v => s""""humidity": $v""")).mkString("{", ", ", "}")
        (i.toLong,
          s"""{"id": "s$i", "messageId": "m$i", "timestamp": ${1700000000L + i}, "metrics": $metrics}""",
          t.getOrElse(0L), h.getOrElse(0L))
      }
    val parsed = SensorPipeline.parse(
        spark.createDataFrame(cases.map { case (_, json, _, _) => Tuple1(json) }).toDF("value"))
      .select("messageId", "temperature", "humidity").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    cases.foreach { case (i, _, t, h) =>
      parsed(s"m$i") shouldBe ((t, h))
    }
  }

  test("kafka-shape serialization round-trips: parse(kafkaShape(x)) ≡ x") {
    // R5's to_json must be the exact inverse of R2's from_json for every
    // reachable record (the reference relies on this implicitly: its Kafka
    // topic is re-parsed by KSQL with the same schema).
    val metric = Gen.chooseNum(0L, 150L)
    val cases = samples(Gen.zip(metric, metric), 150).zipWithIndex.map {
      case ((t, h), i) => (s"s$i", s"m$i", s"${1700000000L + i}", t, h)
    }
    val df = spark.createDataFrame(cases)
      .toDF("id", "messageId", "timestamp", "temperature", "humidity")
    val roundTripped = SensorPipeline.parse(SensorPipeline.kafkaShape(df))
      .select("id", "messageId", "timestamp", "temperature", "humidity")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sorted.toSeq
    roundTripped shouldBe cases.sorted
  }

  test("record-high fold is invariant under input permutation") {
    val readings = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 100L), Gen.chooseNum(0L, 50L)))
    samples(readings, 100).zipWithIndex.foreach { case (rs, k) =>
      val base = rs.zipWithIndex.map { case ((temp, tOff), i) =>
        StatefulOps.Reading("s", s"m$i",
          new java.sql.Timestamp(1700000000000L + tOff * 1000), temp)
      }
      val shuffled = new scala.util.Random(k).shuffle(base)
      StatefulOps.foldKey(shuffled.iterator, None) shouldBe
        StatefulOps.foldKey(base.iterator, None)
    }
  }

  test("graft_minhash ≡ the HOF sha256-window composition, bit for bit") {
    // The native kernel (functions/MinHash16.scala) must match the spelling
    // it replaced — lane p = array_min over shingles of the p-th 8-hex-char
    // window of sha2('0:'+x)++sha2('1:'+x) — on arbitrary inputs including
    // unicode, nulls inside the array, and empty arrays.
    val shingle = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("", "a b c", "émigré café", "日本語テスト", "tab\tsep", "q'uote\"d"))
    val arr = Gen.frequency(
      (8, Gen.listOfN(20, shingle).map(_.map(Option(_)))),
      (1, Gen.listOfN(5, Gen.option(shingle))),
      (1, Gen.const(List.empty[Option[String]])))
    val cases = samples(arr, 120).zipWithIndex
      .map { case (sh, i) => (i.toLong, sh.map(_.orNull)) }
    val df = spark.createDataFrame(cases).toDF("case_id", "sh")
    val hof =
      """transform(sequence(0, 15), p -> array_min(
        |  transform(transform(sh, x -> concat(sha2(concat('0:', x), 256),
        |                                      sha2(concat('1:', x), 256))),
        |            s -> substr(s, p * 8 + 1, 8))))""".stripMargin
    val rows = df.select(col("case_id"), expr("graft_minhash(sh)").as("native"),
        expr(hof).as("ref")).collect()
    rows should have length 120
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"case ${r.getLong(0)}: native=${r.getSeq[String](1)} ref=${r.getSeq[String](2)}")
    }
  }

  test("graft_shingles ≡ array_distinct ∘ transform-slice composition") {
    // The native kernel (functions/Shingles.scala) must match the HOF
    // spelling it replaced — including first-occurrence dedup order and the
    // fewer-than-n-tokens empty result — for arbitrary token arrays.
    val token = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("", "a", "的", "naïve", "x"))
    val arr = Gen.chooseNum(0, 30).flatMap(k => Gen.listOfN(k, token))
    val cases = samples(arr, 150).zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = spark.createDataFrame(cases).toDF("case_id", "w")
    Seq(1, 2, 3, 5).foreach { n =>
      val rows = df.select(col("case_id"),
          expr(s"graft_shingles(w, $n)").as("native"),
          expr(s"array_distinct(${ops.TextQueries.shinglesExpr(n)})").as("ref"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n case ${r.getLong(0)}: native=${r.getSeq[String](1)} ref=${r.getSeq[String](2)}")
      }
    }
  }

  test("windowed agg equals brute force for arbitrary event times") {
    val events = samples(Gen.listOfN(40,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 600L), Gen.chooseNum(1L, 99L))), 20)
    events.foreach { es =>
      val df = spark.createDataFrame(
          es.map { case (id, off, temp) =>
            (id, temp, new java.sql.Timestamp(1700000000000L + off * 1000)) })
        .toDF("id", "temperature", "eventTime")
      val got = SensorPipeline.windowedAgg(df)
        .select("id", "w_start", "max_temperature", "min_temperature", "n").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val want = es.groupBy { case (id, off, _) => (id, (1700000000L + off) / 60 * 60) }
        .map { case ((id, wStart), rows) =>
          val temps = rows.map(_._3)
          (id, wStart * 1000, temps.max, temps.min, temps.size.toLong)
        }.toSet
      got shouldBe want
    }
  }

  test("token packing conserves per-language doc and token totals") {
    import graft.ops.{PipelineQueries, TextQueries}
    import graft.tables.Tables
    val packed = PipelineQueries.tokenPacking(spark, sf)
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("docs"), sum(col("n_tokens")).as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val truth = Tables(spark, sf).documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(expr(s"cast(size(${TextQueries.wordsExpr}) as long)")).as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    packed shouldBe truth // chunking may never drop or duplicate a doc/token
  }

  test("stratified sample is exactly n per stratum at a non-default n") {
    import graft.ops.StatsQueries
    val counts = StatsQueries.stratifiedSample(spark, sf, n = 7)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    counts should not be empty
    counts.foreach { case (_, c) => c shouldBe 7L }
  }

  test("rebalanced mix weights form a distribution and rates are feasible") {
    import graft.ops.PipelineQueries
    val rows = PipelineQueries.mixRebalance(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    rows.map(_._2).sum shouldBe 1.0 +- 1e-5
    rows.foreach { case (n, w, rate) =>
      w should be > 0.0
      rate should (be > 0.0 and be <= 1.0)
      // a rate of exactly 1 means the lang is fully taken, never oversampled
      (rate * n) should be <= (n.toDouble + 1e-6)
    }
  }

  test("funnel stage times are strictly increasing where present") {
    import graft.ops.EventQueries
    EventQueries.funnel(spark, sf).collect().foreach { r =>
      val tv = r.getLong(1)
      if (!r.isNullAt(2)) {
        r.getLong(2) should be > tv
        if (!r.isNullAt(3)) r.getLong(3) should be > r.getLong(2)
      } else r.isNullAt(3) shouldBe true // no stage skipping
    }
  }

  test("chunk census reports only genuinely shared chunks") {
    import graft.ops.MultimodalQueries
    MultimodalQueries.chunkCensus(spark, sf).collect().foreach { r =>
      val (docs, total) = (r.getLong(1), r.getLong(2))
      total should be >= 2L
      docs should be >= 1L
      total should be >= docs
    }
    // topK is live, and the cut respects the (n_total desc, chunk) order
    val top3 = MultimodalQueries.chunkCensus(spark, sf, topK = 3).collect()
    top3.length should be <= 3
    val all = MultimodalQueries.chunkCensus(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    top3.map(r => (r.getString(0), r.getLong(2))).toSeq shouldBe all.take(top3.length).toSeq
  }

  test("curation report is self-consistent and rerun-deterministic") {
    import graft.ops.CurationQueries
    val rows = CurationQueries.curationReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.map(_._1).toSeq shouldBe (0L to 4L)
    rows.foreach { case (_, _, nIn, nOut, nDropped) =>
      nDropped shouldBe nIn - nOut
      nOut should be <= nIn
    }
    // each stage's n_in chains from the previous stage's n_out
    rows.sliding(2).foreach { case Array(prev, cur) => cur._3 shouldBe prev._4 }
    // the final stage count equals the capstone pipeline's output
    rows.last._4 shouldBe CurationQueries.curate(spark, sf).count()
    CurationQueries.curationReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq shouldBe
      rows.map(r => (r._1, r._4)).toSeq
  }

  test("ratio-to-report shares sum to 1 per region; revenue reconciles") {
    import graft.ops.RelationalQueries
    import graft.tables.Tables
    val got = RelationalQueries.ratioToReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    got.groupBy(_._1).values.foreach { region =>
      region.map(_._4).sum shouldBe 1.0 +- 1e-4
      val total = region.map(_._3).sum
      region.foreach { case (_, _, rev, share) =>
        share shouldBe (rev / total) +- 1e-4
      }
    }
    val totalRevenue = got.map(_._3).sum
    val want = Tables(spark, sf).orders
      .agg(sum(col("o_totalprice"))).collect()(0).getDouble(0)
    totalRevenue shouldBe (want +- 1e-2) // every order lands in one nation
  }

  test("seasonal profile covers every event exactly once") {
    import graft.ops.TimeseriesQueries
    import graft.tables.Tables
    val got = TimeseriesQueries.seasonalProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.map(_._3).sum shouldBe Tables(spark, sf).events.count()
    got.foreach(_._2 should (be >= 0L and be <= 23L))
  }

  test("verified dedup pairs carry TRUE shingle Jaccard ≥ the threshold") {
    import graft.ops.DedupQueries
    import graft.tables.Tables
    // mirror TextQueries.wordsExpr (`split(text, ' ')`, no normalization)
    def shingles(text: String): Set[String] = {
      val w = text.split(" ", -1)
      (if (w.length < 3) Seq.empty
       else w.sliding(3).map(_.mkString(" ")).toSeq).toSet
    }
    val docs = Tables(spark, sf).documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    val got = DedupQueries.dedupVerified(spark, sf, minJaccard = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got should not be empty
    got.foreach { case (a, b, j) =>
      j should be >= 0.5
      val (sa, sb) = (docs(a), docs(b))
      val inter = sa.intersect(sb).size.toDouble
      val truth = inter / (sa.size + sb.size - inter)
      j shouldBe (math.rint(truth * 1e4) / 1e4 +- 1e-9) // exact, only rounded
    }
  }

  test("containment dedup ≡ exhaustive driver-side inverted-index sweep") {
    import graft.ops.DedupQueries
    import graft.tables.Tables
    def shingles(text: String): Set[String] = {
      val w = text.split(" ", -1)
      (if (w.length < 3) Seq.empty
       else w.sliding(3).map(_.mkString(" ")).toSeq).toSet
    }
    val minSh = DedupQueries.ContainmentMinShingles
    val full = Tables(spark, sf).documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
      .filter(_._2.size >= minSh)
    // df over the min-shingle corpus, then df-capped sets (query convention)
    val df = full.values.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
    val capped = full.map { case (id, sh) =>
      id -> sh.filter(s => df(s) <= DedupQueries.JaccardDfCap)
    }
    // exhaustive qualifying pairs via an inverted index (no prefix filter —
    // independent of the query's pruning, so completeness is actually tested)
    val byShingle = capped.toSeq.flatMap { case (id, sh) => sh.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val candidates = byShingle.values.flatMap(ids =>
      for (a <- ids; b <- ids if a != b) yield (a, b)).toSet
    val expected = candidates.flatMap { case (a, b) =>
      val o = capped(a).intersect(capped(b)).size
      val c = math.rint(o.toDouble / full(a).size * 1e4) / 1e4
      if (c >= DedupQueries.ContainmentMin)
        Some((a, b, full(a).size.toLong, full(b).size.toLong, o.toLong, c))
      else None
    }
    val got = DedupQueries.containmentDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    got shouldBe expected
    expected should not be empty // fixture must exercise the operator
  }

  test("canonical docs: one row per curateCC component, max-quality member wins") {
    import graft.ops.CurationQueries
    val comps = CurationQueries.curateCC(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // doc_id, comp, csize
    val canon = CurationQueries.canonicalDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    // exactly the component set, with matching sizes
    canon.map(_._1).toSet shouldBe comps.map(_._2).toSet
    val sizeByComp = comps.groupBy(_._2).map { case (c, xs) => c -> xs.length.toLong }
    canon.foreach { case (comp, csize, id, _, nDropped) =>
      csize shouldBe sizeByComp(comp)
      nDropped shouldBe csize - 1
      // the canonical member belongs to its own component
      comps.find(_._1 == id).map(_._2) shouldBe Some(comp)
    }
  }

  test("fuzzy name match ≡ driver-side blocked Levenshtein at non-default dist") {
    import graft.ops.DedupQueries
    import graft.tables.Tables
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables(spark, sf).part.collect()
      .map(_.getAs[String]("p_name"))
      .groupBy(identity).map { case (n, g) => (n, g.length.toLong) }.toSeq
    val expected = (for {
      (na, ca) <- names; (nb, cb) <- names
      if na < nb && na.split(" ")(1) == nb.split(" ")(1)
      d = lev(na, nb) if d <= 1
    } yield (na, nb, d.toLong, ca, cb)).sortBy(p => (p._1, p._2))
    val got = DedupQueries.fuzzyNameMatch(spark, sf, maxDist = 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe expected
  }

  test("IVF recall is exact (1.0 everywhere) when every list is probed") {
    import graft.ops.VectorQueries
    val full = VectorQueries.ivfRecall(spark, sf,
      nprobe = VectorQueries.IvfCentroids).collect()
    full.length should be > 0
    full.foreach { r =>
      r.getAs[Double]("recall") shouldBe 1.0
      r.getAs[Long]("hits") shouldBe VectorQueries.RecallK.toLong
    }
    // and the demo nprobe is a lower bound, never exceeding 1
    VectorQueries.ivfRecall(spark, sf).collect()
      .foreach(_.getAs[Double]("recall") should be <= 1.0)
  }

  test("asof-nearest ≡ brute-force nearest click within tolerance") {
    import graft.ops.EventQueries
    import graft.tables.Tables
    val tol = EventQueries.AsofNearestTolSec
    val ev = Tables(spark, sf).events
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("event_id"),
        floor(col("ts").cast("double")).cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val clicks = ev.filter(_._2 == "click").groupBy(_._1)
    val got = EventQueries.asofNearest(spark, sf).collect()
    got.length should be > 0
    var matched = 0
    got.foreach { r =>
      val (pid, uid, tp) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cands = clicks.getOrElse(uid, Array.empty[(Long, String, Long, Long)])
        .filter(c => math.abs(c._4 - tp) <= tol)
      if (r.isNullAt(3)) cands shouldBe empty
      else {
        matched += 1
        val best = cands.minBy(c => (math.abs(c._4 - tp), c._3))
        r.getLong(3) shouldBe best._3 // click_id
        r.getLong(5) shouldBe best._4 - tp // lag
      }
    }
    assert(matched > 0, "fixture must produce matches")
  }

  test("weighted percentiles ≡ driver-side cumulative-weight crossing") {
    import graft.ops.StatsQueries
    import graft.tables.Tables
    val rows = Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3), BigDecimal(r.getDouble(4)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP)))
    val got = StatsQueries.weightedPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("wp50"), r.getAs[Double]("wp90"))).toMap
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val sorted = rs.sortBy(x => (x._2, x._3, x._4))
      val tot = sorted.map(_._5).sum
      var cum = BigDecimal(0)
      var (p50, p90) = (Option.empty[Double], Option.empty[Double])
      sorted.foreach { case (_, p, _, _, w) =>
        cum += w
        if (p50.isEmpty && cum * 2 >= tot) p50 = Some(p)
        if (p90.isEmpty && cum * 10 >= tot * 9) p90 = Some(p)
      }
      got(flag) shouldBe ((p50.get, p90.get))
    }
  }

  test("freshness SLA: freshest type has zero lag; day counts bounded") {
    import graft.ops.EventQueries
    val rows = EventQueries.freshnessSla(spark, sf).collect()
    rows.length should be > 0
    rows.map(_.getAs[Long]("lag_sec")).min shouldBe 0L
    rows.foreach { r =>
      r.getAs[Long]("n_last_day") should be <= r.getAs[Long]("n_total")
      r.getAs[Long]("lag_sec") should be >= 0L
      // the flag is exactly the threshold predicate
      r.getAs[Long]("stale") shouldBe
        (if (r.getAs[Long]("lag_sec") > EventQueries.FreshnessSlaSec) 1L else 0L)
    }
  }

  test("RAKE phrases are stopword-free, bounded, and positively scored") {
    import graft.ops.TextQueries
    val rows = TextQueries.rakePhrases(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      words.length should be <= TextQueries.RakeMaxLen
      words.foreach(w => TextQueries.Stopwords should not contain w)
      r.getAs[Long]("n_occ") should be >= 1L
      r.getAs[Double]("score") should be > 0.0
    }
  }
}
