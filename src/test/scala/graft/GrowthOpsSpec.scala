package graft

import graft.ops.{BehaviorQueries, DedupQueries, TextQueries, TimeseriesQueries, VectorQueries}

/** Brute-force oracles for the round-7 growth batch: the Scala
  * recomputation runs on sf0.001 with naive single-machine logic, so any
  * agreement with the distributed plan is evidence of the plan, not of a
  * shared shortcut. (The DuckDB gate at sf0.01 is the primary oracle; these
  * pin the semantics at a second scale and cover the non-SQL invariants.) */
class GrowthOpsSpec extends SparkSpec {

  test("q_burst_detect flags exactly the days a naive trailing scan flags") {
    val daily = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "cast(floor(cast(date_trunc('day', ts) as double)) as bigint) as day", "1L as one")
      .where("event_type is not null and day is not null")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.length.toLong) }
      .toSeq
    val want = daily.groupBy(_._1).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.flatMap { i =>
        val frame = sorted.slice(math.max(0, i - TimeseriesQueries.BurstWindow), i)
          .takeRight(TimeseriesQueries.BurstWindow)
        if (i >= TimeseriesQueries.BurstWindow &&
            frame.length == TimeseriesQueries.BurstWindow) {
          val ns = frame.map(_._3)
          val nD = TimeseriesQueries.BurstWindow.toDouble
          val s = ns.sum.toDouble
          val ss = ns.map(n => n * n).sum.toDouble
          val mean = s / nD
          val std = math.sqrt(math.max(nD * ss - s * s, 0.0) / (nD * (nD - 1.0)))
          if (sorted(i)._3 > mean + TimeseriesQueries.BurstSigma * std)
            Some((sorted(i)._1, sorted(i)._2))
          else None
        } else None
      }
    }.toSet
    val got = TimeseriesQueries.burstDetect(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    got shouldBe want
  }

  test("q_late_arrival: census is total, lateness bounded by delay + batch") {
    val total = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .where("ts is not null and event_id is not null").count()
    val rows = TimeseriesQueries.lateArrival(spark, sf).collect()
    rows.map(_.getAs[Long]("n_events")).sum shouldBe total
    // an event's watermark deficit cannot exceed the worst transport delay
    // plus one batch width (events that beat it into an earlier batch were
    // at most maxDelay newer; the batch floor adds at most one batch)
    rows.foreach(r => r.getAs[Long]("max_late_sec") should be <=
      (TimeseriesQueries.LateMaxDelay + TimeseriesQueries.LateBatchSec))
    assert(rows.length >= 2, "hash jitter must produce at least one late band")
  }

  test("q_running_distinct: cumulative curve is the distinct-user count") {
    val users = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .where("ts is not null and user_id is not null")
      .select("user_id").distinct().count()
    val got = BehaviorQueries.runningDistinct(spark, sf).collect()
    got.map(_.getAs[Long]("new_users")).sum shouldBe users
    got.last.getAs[Long]("cum_users") shouldBe users
    // monotone, and each step is exactly the day's new users
    got.sliding(2).foreach {
      case Array(a, b) =>
        b.getAs[Long]("cum_users") - a.getAs[Long]("cum_users") shouldBe
          b.getAs[Long]("new_users")
      case _ =>
    }
  }

  test("q_bpe_pair_merges matches a naive per-word pair count") {
    val freq = SparkSpec.spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("text").collect().iterator
      .flatMap(_.getString(0).split(" ", -1)).filter(_.length >= 2)
      .foldLeft(Map.empty[String, Long]) { (m, w) =>
        m.updated(w, m.getOrElse(w, 0L) + 1L) }
    // positional pairs: duplicates within a word count once per position
    val want = freq.toSeq
      .flatMap { case (w, f) =>
        (0 until w.length - 1).map(i => w.substring(i, i + 2) -> f) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      .toSeq.sortBy { case (p, n) => (-n, p) }
      .take(TextQueries.BpeTopK)
    val got = TextQueries.bpePairMerges(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    got shouldBe want
  }

  test("q_dedup_prefix groups exactly the docs sharing a token prefix") {
    val docs = SparkSpec.spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy { case (_, _, t) =>
        t.split(" ", -1).take(DedupQueries.PrefixTokens).mkString(" ") }
      .values.filter(_.size >= 2)
      .map(g => (g.map(_._1).min, g.size.toLong, g.map(_._2).distinct.size.toLong))
      .toSet
    val got = DedupQueries.dedupPrefix(spark, sf).collect()
      .map(r => (r.getAs[Long]("min_doc_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_sources"))).toSet
    got shouldBe want
  }

  test("q_rrf_fusion: fused score recomputes from the arm ranks") {
    val rows = VectorQueries.rrfFusion(spark, sf).collect()
    rows.length should be <= VectorQueries.RrfArmDepth
    rows.foreach { r =>
      val rt = Option(r.getAs[java.lang.Long]("rank_text")).map(_.toLong)
      val rv = Option(r.getAs[java.lang.Long]("rank_vec")).map(_.toLong)
      assert(rt.nonEmpty || rv.nonEmpty, "a fused doc must come from an arm")
      val want = rt.map(x => 1.0 / (VectorQueries.RrfK + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (VectorQueries.RrfK + x)).getOrElse(0.0)
      r.getAs[Double]("rrf") shouldBe (want +- 1e-6)
    }
    // both arms contribute: at least one doc per arm is present
    assert(rows.exists(r => r.getAs[java.lang.Long]("rank_text") != null))
    assert(rows.exists(r => r.getAs[java.lang.Long]("rank_vec") != null))
  }

  test("q_vocab_coverage matches a naive per-source census") {
    val toks = SparkSpec.spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(r.getString(0) -> _))
    val want = toks.groupBy(_._1).map { case (src, xs) =>
      val census = xs.groupBy(_._2).map(_._2.size.toLong)
      val n = xs.length.toLong
      val f1 = census.count(_ == 1L).toLong
      src -> (n, census.size.toLong, f1, census.count(_ == 2L).toLong,
        f1.toDouble / n)
    }
    val got = TextQueries.vocabCoverage(spark, sf).collect()
    got.length shouldBe want.size
    got.foreach { r =>
      val (n, types, f1, f2, mass) = want(r.getString(0))
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe
        ((n, types, f1, f2))
      r.getAs[Double]("gt_unseen_mass") shouldBe (mass +- 1e-6)
      r.getAs[Double]("coverage") shouldBe (1.0 - mass +- 1e-6)
    }
  }

  test("q_ab_lift: arms partition the users; z recomputes from the counts") {
    val users = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .where("user_id is not null").select("user_id").distinct().count()
    val r = BehaviorQueries.abLift(spark, sf).collect().head
    val (na, ca, nb, cb) = (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))
    na + nb shouldBe users
    ca should be <= na
    cb should be <= nb
    val pPool = (ca + cb).toDouble / (na + nb)
    val se = math.sqrt(pPool * (1 - pPool) * (1.0 / na + 1.0 / nb))
    if (se > 0)
      r.getAs[Double]("z") shouldBe
        ((ca.toDouble / na - cb.toDouble / nb) / se +- 1e-6)
    else assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("q_time_to_convert matches a naive first-view/first-purchase scan") {
    val evs = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "event_type",
        "cast(floor(cast(ts as double)) as bigint) as sec")
      .where("user_id is not null and sec is not null").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = evs.groupBy(_._1).flatMap { case (u, xs) =>
      val v = xs.filter(_._2 == "view").map(_._3)
      val p = xs.filter(_._2 == "purchase").map(_._3)
      if (v.nonEmpty && p.nonEmpty && p.min >= v.min)
        Some(u -> (p.min - v.min))
      else None
    }
    val got = BehaviorQueries.timeToConvert(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("convert_sec")).toMap
    got shouldBe want
  }

  test("q_profile_drift: halves partition the stream at the span midpoint") {
    val rows = ops.StatsQueries.profileDrift(spark, sf).collect()
    rows.map(_.getString(0)).toSeq shouldBe Seq("h1_early", "h2_late")
    val total = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .where("ts is not null").count()
    rows.map(_.getAs[Long]("n_rows")).sum shouldBe total
  }

  test("q_minhash_est_error: scores in [0,1]; error is their gap; " +
      "the verified pairs are exactly the candidates above threshold") {
    val rows = DedupQueries.minhashEstError(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val ex = r.getAs[Double]("exact_jaccard")
      est should (be >= 0.0 and be <= 1.0)
      ex should (be >= 0.0 and be <= 1.0)
      r.getAs[Double]("abs_err") shouldBe
        (BigDecimal(math.abs(est - ex)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9)
    }
    val above = rows.filter(_.getAs[Double]("exact_jaccard") >=
      DedupQueries.VerifiedMinJaccard).map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = DedupQueries.dedupVerified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    above shouldBe verified
  }

  test("q_window_funnel matches a naive in-window staged scan") {
    val evs = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "event_type",
        "cast(floor(cast(ts as double)) as bigint) as sec")
      .where("user_id is not null and sec is not null").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val w = ops.EventQueries.FunnelWindowSec
    val want = evs.groupBy(_._1).flatMap { case (u, xs) =>
      val v = xs.filter(_._2 == "view").map(_._3)
      if (v.isEmpty) None else {
        val t1 = v.min
        val dl = t1 + w
        val t2 = xs.filter(x => x._2 == "click" && x._3 > t1 && x._3 <= dl)
          .map(_._3).minOption
        val t3 = t2.flatMap(c => xs
          .filter(x => x._2 == "purchase" && x._3 > c && x._3 <= dl)
          .map(_._3).minOption)
        Some(u -> (Some(t1), t2, t3,
          1L + t2.size + t3.size))
      }
    }
    val got = ops.EventQueries.windowFunnel(spark, sf).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getLong(0) -> ((opt(1), opt(2), opt(3), r.getAs[Long]("level")))
    }.toMap
    got shouldBe want
  }

  test("q_seasonal_anomaly flags exactly the per-(type, hour) outliers") {
    val evs = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "event_type", "cast(hour(ts) as bigint) as h", "value")
      .where("ts is not null and event_type is not null and value is not null")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val want = evs.groupBy(x => (x._2, x._3)).flatMap { case (_, xs) =>
      val n = xs.length.toDouble
      if (n < 2) Seq.empty[Long] else {
        val vs = xs.map(x => BigDecimal(x._4).setScale(4,
          BigDecimal.RoundingMode.HALF_UP))
        val s = vs.sum.toDouble
        val ss = vs.map(v => v * v).sum.toDouble
        val mean = s / n
        val std = math.sqrt(math.max(n * ss - s * s, 0.0) / (n * (n - 1.0)))
        xs.filter(x => math.abs(x._4 - mean) >
          ops.TimeseriesQueries.SeasonalZ * std).map(_._1).toSeq
      }
    }.toSet
    val got = ops.TimeseriesQueries.seasonalAnomaly(spark, sf).collect()
      .map(_.getLong(0)).toSet
    got shouldBe want
  }

  test("q_char_entropy matches a naive per-source character census") {
    val docs = SparkSpec.spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).map { case (src, xs) =>
      val census = xs.flatMap(_._2.toSeq).groupBy(identity).map(_._2.size.toLong)
      val n = census.sum.toDouble
      val h = -census.map { c =>
        val p = c / n
        BigDecimal(p * math.log(p)).setScale(12, BigDecimal.RoundingMode.DOWN)
      }.sum.toDouble / math.log(2.0)
      src -> (census.sum, census.size.toLong, h)
    }
    val got = TextQueries.charEntropy(spark, sf).collect()
    got.length shouldBe want.size
    got.foreach { r =>
      val (n, a, h) = want(r.getString(0))
      (r.getLong(1), r.getLong(2)) shouldBe ((n, a))
      r.getAs[Double]("entropy_bits") shouldBe (h +- 1e-5)
    }
  }

  test("q_session_paths matches a naive journey-prefix census") {
    val evs = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "cast(floor(cast(ts as double)) as bigint) as sec",
        "event_id", "event_type")
      .where("user_id is not null and sec is not null and event_id is not null")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = evs.groupBy(_._1).map { case (_, xs) =>
      xs.sortBy(x => (x._2, x._3)).take(ops.BehaviorQueries.PathLen)
        .map(_._4).mkString(">")
    }.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      .toSeq.sortBy { case (p, n) => (-n, p) }
      .take(ops.BehaviorQueries.PathTopK)
    val got = BehaviorQueries.sessionPaths(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    got shouldBe want
  }

  test("q_ppr matches a driver-side integer recompute; mass near seeds") {
    import ops.GraphQueries._
    val es = SparkSpec.spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
      .join(SparkSpec.spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .selectExpr("o_custkey * 2 as src", "l_suppkey * 2 + 1 as dst")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = es ++ es.map(e => (e._2, e._1))
    val deg = und.groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
    def isSeed(n: Long) = n % 2 == 0 && n < PprSeedMax
    var pr = deg.keys.map(n => n -> (if (isSeed(n)) PrScale else 0L)).toMap
    (1 to PrIters).foreach { _ =>
      val in = und.groupBy(_._2).map { case (dst, xs) =>
        dst -> xs.map(e => pr(e._1) / deg(e._1)).sum
      }
      pr = in.map { case (n, m) =>
        n -> ((if (isSeed(n)) PrTeleport else 0L) + PrDampNum * m / PrDampDen)
      }
    }
    val got = pprTrade(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("pr")).toMap
    got.keySet shouldBe pr.keySet
    got.foreach { case (n, v) => v shouldBe pr(n) }
    // proximity semantics: restart mass only ever travels PrIters hops, so
    // every node farther than that from ALL seeds must hold exactly zero,
    // and every seed holds at least its own teleport mass
    val adjMap = und.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var frontier = deg.keys.filter(isSeed).toSet
    var reach = frontier
    (1 to PrIters).foreach { _ =>
      frontier = frontier.flatMap(n =>
        adjMap.getOrElse(n, Array.empty[Long]).toSeq) -- reach
      reach ++= frontier
    }
    got.foreach { case (n, v) =>
      if (!reach.contains(n)) v shouldBe 0L
      if (isSeed(n)) v should be >= PrTeleport
    }
    assert(got.keys.exists(n => !reach.contains(n) || !isSeed(n)),
      "corpus must exercise non-seed nodes")
  }

  test("q_retention_flags matches a naive per-user horizon scan") {
    val act = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id",
        "cast(floor(cast(ts as double)) as bigint) div 86400 as day")
      .where("user_id is not null and day is not null")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byUser = act.groupBy(_._1).map { case (u, xs) =>
      val days = xs.map(_._2).toSet
      val f = days.min
      u -> ops.BehaviorQueries.RetentionHorizons.map(h => days.contains(f + h))
    }
    val r = BehaviorQueries.retentionFlags(spark, sf).collect().head
    r.getAs[Long]("n_users") shouldBe byUser.size
    ops.BehaviorQueries.RetentionHorizons.zipWithIndex.foreach { case (h, i) =>
      val wantUsers = byUser.values.count(_(i)).toLong
      r.getAs[Long](s"d${h}_users") shouldBe wantUsers
      r.getAs[Double](s"d${h}_rate") shouldBe
        (wantUsers.toDouble / byUser.size +- 1e-6)
    }
  }

  test("q_dedup_transitivity recomputes from the verified edge list") {
    val edges = DedupQueries.dedupVerified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = edges ++ edges.map(e => (e._2, e._1))
    // wedges (a, c) through every shared center, a < c, multiplicity kept
    val byOut = und.groupBy(_._1)
    val wedges = und.flatMap { case (a, ctr) =>
      byOut.getOrElse(ctr, Array.empty[(Long, Long)]).collect {
        case (_, c) if a < c => (a, c)
      }
    }
    val eset = edges.toSet
    val r = DedupQueries.dedupTransitivity(spark, sf).collect().head
    r.getAs[Long]("n_edges") shouldBe edges.length.toLong
    r.getAs[Long]("n_wedges") shouldBe wedges.length.toLong
    r.getAs[Long]("n_closed") shouldBe wedges.count(eset).toLong
  }

  test("q_split_balance: splits partition the corpus; shares sum to 1 per split") {
    val rows = ops.PipelineQueries.splitBalance(spark, sf).collect()
    val total = SparkSpec.spark.read.parquet(s"$sf/documents.parquet").count()
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe total
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      g.map(_.getAs[Double]("split_share")).sum shouldBe (1.0 +- 1e-4)
    }
    rows.foreach { r =>
      r.getAs[Double]("share_delta") shouldBe
        (r.getAs[Double]("split_share") - r.getAs[Double]("corpus_share") +- 1e-5)
    }
  }

  test("q_approx_topk: claims all TRUE and heads match the exact census") {
    val rows = TextQueries.approxTopkTokens(spark, sf).collect()
    rows.length shouldBe TextQueries.TopkK
    rows.foreach(r => r.getAs[Boolean]("sketch_agrees") shouldBe true)
    val exact = SparkSpec.spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(text, ' ')) as w").where("w <> ''")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (w, n) => (-n, w) }.take(TextQueries.TopkK)
    rows.map(r => r.getString(0) -> r.getLong(1)).toSeq shouldBe exact.toSeq
  }

  test("q_bigram_lm matches a naive Laplace-smoothed recompute") {
    val docs = SparkSpec.spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val toks = docs.flatMap(_._2)
    val c1 = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val vsz = c1.size.toLong
    val bigrams = docs.flatMap { case (_, ws) => ws.sliding(2).filter(_.size == 2) }
      .map(p => (p(0), p(1)))
    val c12 = bigrams.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val want = docs.flatMap { case (id, ws) =>
      val bgs = ws.sliding(2).filter(_.size == 2).toSeq
      if (bgs.isEmpty) None else {
        val nll = bgs.map { p =>
          val term = -math.log(
            (c12((p(0), p(1))) + 1.0) / (c1(p(0)) + vsz))
          BigDecimal(term).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        Some(id -> (bgs.size.toLong, nll.toDouble / bgs.size))
      }
    }.toMap
    val got = TextQueries.bigramLm(spark, sf).collect()
    got.length shouldBe want.size
    got.foreach { r =>
      val (n, avg) = want(r.getLong(0))
      r.getLong(1) shouldBe n
      r.getAs[Double]("avg_nll") shouldBe (avg +- 1e-5)
    }
  }

  test("q_covariate_shift: weighted early histogram approaches the late one") {
    val rows = ops.PipelineQueries.covariateShift(spark, sf).collect()
    val nE = rows.map(_.getAs[Long]("c_early")).sum.toDouble
    val nL = rows.map(_.getAs[Long]("c_late")).sum.toDouble
    assert(nE > 0 && nL > 0)
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      w should be > 0.0
      w should be <= ops.PipelineQueries.ShiftMaxWeight
      // unclamped weights reproduce the smoothed density ratio
      val sm = ops.PipelineQueries.ShiftSmooth
      val bins = ops.PipelineQueries.PsiBins
      val expect = ((r.getAs[Long]("c_late") + sm) / (nL + sm * bins)) /
        ((r.getAs[Long]("c_early") + sm) / (nE + sm * bins))
      if (expect < ops.PipelineQueries.ShiftMaxWeight)
        w shouldBe (expect +- 1e-5)
    }
  }

  test("q_lpa_modularity recomputes from the labels and edges; Q in [-1, 1]") {
    import ops.GraphQueries
    val t = graft.tables.Tables(spark, sf)
    val pairs = t.orders.select("o_orderkey", "o_custkey")
      .join(t.lineitem.select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"))
      .join(t.supplier.select("s_suppkey", "s_nationkey"),
        org.apache.spark.sql.functions.col("s_suppkey") ===
          org.apache.spark.sql.functions.col("l_suppkey"))
      .where("c_nationkey = s_nationkey")
      .selectExpr("o_custkey * 2 as src", "l_suppkey * 2 + 1 as dst")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs ++ pairs.map(e => (e._2, e._1))
    val labels = GraphQueries.labelPropagationTrade(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dd = edges.length.toDouble
    val per = edges.groupBy(e => labels(e._1)).map { case (_, es) =>
      val degc = es.length.toDouble
      val withinc = es.count(e => labels(e._1) == labels(e._2)).toDouble
      BigDecimal(withinc / dd - (degc / dd) * (degc / dd))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val want = per.sum.toDouble
    val r = GraphQueries.lpaModularity(spark, sf).collect().head
    assert(r.getAs[Long]("n_communities") == per.size.toLong)
    assert(r.getAs[Long]("n_edges") == edges.length.toLong / 2)
    r.getAs[Double]("modularity") shouldBe (want +- 1e-6)
    r.getAs[Double]("modularity") should (be >= -1.0 and be <= 1.0)
  }

  test("q_langid_confusion: shares sum to 1 per lang; census covers all docs") {
    val rows = TextQueries.langidConfusion(spark, sf).collect()
    val total = SparkSpec.spark.read.parquet(s"$sf/documents.parquet").count()
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe total
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      g.map(_.getAs[Double]("share")).sum shouldBe (1.0 +- 1e-4)
    }
    // the heuristic only emits en/und
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("en", "und")))
  }

  test("q_simhash_recall: counts recompute from the two pair generators") {
    val truth = DedupQueries.dedupVerified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = DedupQueries.simhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = DedupQueries.simhashRecall(spark, sf).collect().head
    assert(r.getAs[Long]("n_truth") == truth.size.toLong)
    assert(r.getAs[Long]("n_cand") == cand.size.toLong)
    assert(r.getAs[Long]("n_hit") == truth.intersect(cand).size.toLong)
    if (truth.nonEmpty)
      r.getAs[Double]("recall") shouldBe
        (truth.intersect(cand).size.toDouble / truth.size +- 1e-6)
  }

  test("q_asof_tolerance: fresh rows match the unbounded asof within bound; " +
      "stale rows are nulled, never dropped") {
    val unbounded = ops.EventQueries.asofJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> (Option(r.getAs[java.lang.Long]("click_id")),
        Option(r.getAs[java.lang.Long]("click_ts")),
        r.getLong(2))).toMap
    val rows = ops.EventQueries.asofTolerance(spark, sf).collect()
    rows.length shouldBe unbounded.size
    rows.foreach { r =>
      val (clickId, clickTs, pTs) = unbounded(r.getLong(0))
      val fresh = clickTs.exists(ct => pTs - ct <= ops.EventQueries.AsofToleranceSec)
      r.getAs[Long]("is_fresh") shouldBe (if (fresh) 1L else 0L)
      if (fresh) {
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong) shouldBe
          clickId.map(_.toLong)
        r.getAs[Long]("gap_sec") shouldBe (pTs - clickTs.get)
      } else {
        assert(r.isNullAt(r.fieldIndex("click_id")))
        assert(r.isNullAt(r.fieldIndex("gap_sec")))
      }
    }
  }

  test("q_feature_matrix: features never see post-cutoff data, label never " +
      "sees pre-cutoff data (recompute)") {
    val evs = SparkSpec.spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "cast(floor(cast(ts as double)) as bigint) as sec",
        "event_type", "value")
      .where("user_id is not null and sec is not null").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val mid = (evs.map(_._2).min + evs.map(_._2).max) / 2
    val want = evs.groupBy(_._1).flatMap { case (u, xs) =>
      val preE = xs.filter(_._2 < mid)
      if (preE.isEmpty) None else {
        val vals = preE.flatMap(_._4)
        val avg = if (vals.isEmpty) None else Some(
          (vals.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble / vals.size))
        Some(u -> (preE.length.toLong,
          preE.count(_._3 == "purchase").toLong,
          avg,
          preE.map(_._2 / 86400).distinct.length.toLong,
          mid / 86400 - preE.map(_._2 / 86400).max,
          if (xs.exists(x => x._2 >= mid && x._3 == "purchase")) 1L else 0L))
      }
    }
    val got = ops.PipelineQueries.featureMatrix(spark, sf).collect()
    got.length shouldBe want.size
    got.foreach { r =>
      val (n, np, avg, da, rec, lab) = want(r.getLong(0))
      (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6)) shouldBe
        ((n, np, da, rec, lab))
      avg match {
        case Some(a) => r.getAs[Double]("avg_value_pre") shouldBe (a +- 1e-5)
        case None => assert(r.isNullAt(r.fieldIndex("avg_value_pre")))
      }
    }
  }

  test("q_tokenizer_fertility matches a naive per-lang token recount") {
    val docs = SparkSpec.spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("lang", "text").where("lang is not null").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val re = "[a-z]+|[0-9]+|[^a-z0-9 ]".r
    val want = docs.groupBy(_._1).map { case (lang, xs) =>
      val ws = xs.map(_._2.split(" ", -1).length.toLong).sum
      val rt = xs.map(x => re.findAllIn(x._2).length.toLong).sum
      lang -> (xs.length.toLong, ws, rt)
    }
    val got = TextQueries.tokenizerFertility(spark, sf).collect()
    got.length shouldBe want.size
    got.foreach { r =>
      val (n, ws, rt) = want(r.getString(0))
      (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((n, ws, rt))
      r.getAs[Double]("fertility") shouldBe (rt.toDouble / ws +- 1e-5)
    }
  }

  test("q_sample_bias: grid sums to corpus; deltas are share differences") {
    val rows = ops.StatsQueries.sampleBias(spark, sf).collect()
    val total = SparkSpec.spark.read.parquet(s"$sf/orders.parquet")
      .where("o_orderstatus is not null").count()
    rows.map(_.getAs[Long]("n_full")).sum shouldBe total
    rows.foreach { r =>
      r.getAs[Long]("n_sample") should be <= r.getAs[Long]("n_full")
      r.getAs[Double]("share_delta") shouldBe
        (r.getAs[Double]("sample_share") - r.getAs[Double]("full_share") +- 1e-5)
    }
    rows.map(_.getAs[Double]("full_share")).sum shouldBe (1.0 +- 1e-4)
  }

  test("q_lsh_band_sweep: monotone S-curve ordering — more bands never " +
      "lose candidates or recall") {
    val rows = DedupQueries.lshBandSweep(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_cand"),
        r.getAs[Long]("n_hit"), r.getAs[Long]("n_truth")))).toMap
    rows.keySet shouldBe DedupQueries.BandConfigs.map(_._1).toSet
    // P(candidate | J) = 1 − (1 − J^lanes)^bands is monotone in the config
    // direction 2x8 → 4x4 → 8x2 for every J, so candidate and hit counts
    // must be non-decreasing along it (caps permitting; no cap binds at
    // this SF)
    val Seq(c2, c4, c8) = Seq("b2x8", "b4x4", "b8x2").map(rows)
    c2._1 should be <= c4._1
    c4._1 should be <= c8._1
    c2._2 should be <= c4._2
    c4._2 should be <= c8._2
    // all arms share one truth set
    Seq(c2, c4, c8).map(_._3).distinct.size shouldBe 1
  }

  test("q_pq_search matches a naive ADC recompute over the same codebook") {
    import ops.VectorQueries.PqCodec._
    val vecs = SparkSpec.spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def chunk(v: Array[Double], s: Int) = v.slice(s * SubDim, (s + 1) * SubDim)
    def d2(a: Array[Double], b: Array[Double]) = {
      // same three-dot identity, left-fold order, as both engines
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    }
    val codebook = (0 until SubSpaces).map { s =>
      s -> (0L until CodebookSize).map(c => c -> chunk(vecs(c), s)).toMap
    }.toMap
    val probe = vecs(0L)
    val want = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val adc = (0 until SubSpaces).map { s =>
        val code = codebook(s).minBy { case (c, cw) => (d2(chunk(v, s), cw), c) }._1
        BigDecimal(d2(chunk(probe, s), codebook(s)(code)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      (id, BigDecimal(adc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, a) => (a, id) }.take(ops.VectorQueries.PqSearchK)
    val got = ops.VectorQueries.pqSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Double]("adc_d2")))
    got.map(_._1).toSeq shouldBe want.map(_._1)
    got.zip(want).foreach { case ((_, g), (_, w)) => g shouldBe (w +- 1e-5) }
  }

  test("q_ivf_pq: results come only from probed lists and agree with the " +
      "full-ADC ranking restricted to them") {
    import ops.VectorQueries
    val full = VectorQueries.pqSearch(spark, sf, probeId = 42L,
      k = Int.MaxValue - 1).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("adc_d2")).toMap
    val rows = VectorQueries.ivfPqSearch(spark, sf).collect()
    rows.length should be <= VectorQueries.PqSearchK
    assert(rows.nonEmpty)
    // every hit's ADC value equals the unrestricted ADC computation
    rows.foreach { r =>
      r.getAs[Double]("adc_d2") shouldBe (full(r.getLong(0)) +- 1e-9)
    }
    // hits are confined to <= nprobe distinct lists
    rows.map(_.getAs[Long]("cent_id")).distinct.length should be <=
      VectorQueries.IvfNprobe
    // ADC-ordered within the output
    val adcs = rows.map(_.getAs[Double]("adc_d2")).toSeq
    adcs shouldBe adcs.sorted
  }

  test("q_embedding_cov: diagonal is the (quantized) per-dim variance, ≥ 0") {
    val vecs = SparkSpec.spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val got = VectorQueries.embeddingCov(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cov")).toMap
    got.size shouldBe VectorQueries.CovDims * (VectorQueries.CovDims + 1) / 2
    (0 until VectorQueries.CovDims).foreach { i =>
      val q = vecs.map(v => math.floor(v(i) * VectorQueries.CovQuant))
      val n = q.length.toDouble
      val mean = q.sum / n
      val varPop = (q.map(x => x * x).sum / n - mean * mean) /
        (VectorQueries.CovQuant.toDouble * VectorQueries.CovQuant)
      got((i.toLong, i.toLong)) shouldBe (varPop +- 1e-6)
      got((i.toLong, i.toLong)) should be >= 0.0
    }
  }
}
