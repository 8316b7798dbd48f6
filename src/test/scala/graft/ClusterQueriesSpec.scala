package graft

import org.apache.spark.sql.functions._
import graft.ops.{ClusterQueries, EventQueries}
import graft.tables.Tables

/** Driver-side independent recomputation of the clustering + funnel
  * operators (sf0.001) — plain Scala, no SQL on either side. */
class ClusterQueriesSpec extends SparkSpec {

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().toSeq
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).foldLeft(0.0) { case (acc, (u, v)) => acc + u * v }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  /** Argmax-cosine assignment to centroids, lowest-id tie-break. */
  private def assign(cents: Map[Long, Array[Double]])(v: Array[Double]): Long =
    cents.toSeq.map { case (c, cv) => (c, cosine(v, cv)) }
      .sortBy { case (c, d) => (-d, c) }.head._1

  private lazy val seedCents: Map[Long, Array[Double]] =
    (0L until ClusterQueries.KmeansK).map(id => id -> vecs(id)).toMap

  private lazy val assign0: Map[Long, Long] =
    vecs.map { case (id, v) => id -> assign(seedCents)(v) }

  test("kmeansRefine matches a driver-side Lloyd iteration") {
    val dims = vecs.head._2.length
    val refined: Map[Long, Array[Double]] = assign0.groupBy(_._2).map {
      case (c, members) =>
        val vs = members.keys.toSeq.map(vecs)
        // exact-enough mean for a 1e-9 comparison on ~unit components
        c -> Array.tabulate(dims)(d => vs.map(_(d)).sum / vs.size)
    }
    val want = vecs.keys.toSeq.sorted.map { id =>
      (id, assign0(id), assign(refined)(vecs(id)))
    }
    val got = ClusterQueries.kmeansRefine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
    // at least one vector should move clusters, else the test is vacuous
    assert(want.exists { case (_, c0, c1) => c0 != c1 }, "no movers at sf0.001")
  }

  test("kmeans runs Lloyd to a true fixpoint with argmax-consistent assignments") {
    val res = ClusterQueries.kmeans(spark, sf)
    assert(res.converged, s"did not converge in ${res.iters} rounds")
    assert(res.iters > 2, "converged suspiciously fast — loop not exercised")
    val cents: Map[Long, Array[Double]] = res.centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = res.assignments.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.size shouldBe vecs.size
    // fixpoint means every vector already sits with its argmax centroid
    got.foreach { case (id, c) => c shouldBe assign(cents)(vecs(id)) }
    // determinism: a second run lands on the identical fixpoint
    val again = ClusterQueries.kmeans(spark, sf)
    again.iters shouldBe res.iters
    again.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe got
  }

  test("semDedup keeps exactly the lowest-id representative of each in-cluster near-dup set") {
    val tau = ClusterQueries.SemDedupTau
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byCluster = assign0.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted)
    val dropped: Set[Long] = byCluster.values.flatMap { ids =>
      for {
        b <- ids
        a <- ids if a < b && r6(cosine(vecs(a), vecs(b))) >= tau
      } yield b
    }.toSet
    val got = ClusterQueries.semDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.length shouldBe vecs.size
    got.foreach { case (id, cluster, keep) =>
      cluster shouldBe assign0(id)
      keep shouldBe (if (dropped(id)) 0L else 1L)
    }
    assert(dropped.nonEmpty, "no drops at sf0.001 — threshold too high to test")
  }

  test("IVF over kmeans-trained centroids is exact when every list is probed") {
    import graft.ops.VectorQueries
    val trained = ClusterQueries.kmeans(spark, sf).centroids
      .select(col("cluster").as("cent_id"), col("ce"))
    val nCents = trained.count().toInt
    val got = VectorQueries.ivfSearchWith(spark, sf, trained,
        probeId = 7L, k = 5, nprobe = nCents)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    // nprobe = |cents| probes every inverted list ⇒ candidate set = corpus
    // ⇒ the serving path degrades gracefully to exact brute force
    val brute = VectorQueries.similarVectors(spark, sf, probeId = 7L, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    got shouldBe brute
  }

  test("semDedup aborts loudly when a cluster exceeds the pair-join cap") {
    // k=1 funnels every vector into one cluster; a cap below the corpus
    // size must abort rather than run the quadratic pair join
    val e = intercept[Exception] {
      ClusterQueries.semDedup(spark, sf, k = 1, cap = 100).count()
    }
    e.getMessage should include("cluster cap")
    // at the default cap the same degenerate clustering is merely slow-path
    ClusterQueries.semDedup(spark, sf, k = 1).count() shouldBe vecs.size
  }

  test("clusterStats reports sizes, pair volumes, and cap headroom") {
    val sizes = assign0.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = ClusterQueries.clusterStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.map(_._1).toSet shouldBe sizes.keySet
    got.foreach { case (c, n, pairs, headroom) =>
      n shouldBe sizes(c)
      pairs shouldBe n * (n - 1) / 2
      headroom shouldBe ClusterQueries.SemDedupClusterCap - n
    }
  }

  test("funnel stages match a driver-side event scan") {
    val events = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"),
        graft.ops.Out.epochSec(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def firstAfter(user: Long, typ: String, after: Long): Option[Long] = {
      val ts = events.collect { case (u, ty, t) if u == user && ty == typ && t > after => t }
      if (ts.isEmpty) None else Some(ts.min)
    }
    val want = events.collect { case (u, "view", t) => (u, t) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      .map { case (u, tv) =>
        val tc = firstAfter(u, "click", tv)
        val tp = tc.flatMap(firstAfter(u, "purchase", _))
        (u, tv, tc, tp)
      }.toSeq.sortBy(_._1)
    val got = EventQueries.funnel(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toSeq
    got shouldBe want
    // the strict-ordering chain must actually fire end-to-end
    assert(want.exists(_._4.nonEmpty), "no completed funnel at sf0.001")
  }

  test("funnel emits nulls for unreached stages and honors a custom stage list") {
    // the real fixture is dense (every user completes every stage), so the
    // null path needs a synthetic corpus: ts is raw NANOS longs, matching
    // the testdata parquet layout Tables.events expects
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_spec").toString
    def ns(sec: Long) = sec * 1000000000L
    Seq(
      // user 1 completes: view@10 → click@20 → purchase@30
      (1L, ns(10), 1L, "view", 1.0, "{}"), (2L, ns(20), 1L, "click", 1.0, "{}"),
      (3L, ns(30), 1L, "purchase", 1.0, "{}"),
      // user 2's only click is BEFORE its view: t_click and t_purchase null
      (4L, ns(5), 2L, "click", 1.0, "{}"), (5L, ns(10), 2L, "view", 1.0, "{}"),
      (6L, ns(30), 2L, "purchase", 1.0, "{}"),
      // user 3 purchases before clicking: t_purchase null
      (7L, ns(10), 3L, "view", 1.0, "{}"), (8L, ns(25), 3L, "purchase", 1.0, "{}"),
      (9L, ns(30), 3L, "click", 1.0, "{}"),
      // user 4 never views: absent from the funnel entirely
      (10L, ns(10), 4L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventQueries.funnel(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toSeq
    got shouldBe Seq(
      (1L, 10L, Some(20L), Some(30L)),
      (2L, 10L, None, None),
      (3L, 10L, Some(30L), None))
    // custom stage list: view → purchase skips the click gate
    val vp = EventQueries.funnel(spark, dir, Seq("view", "purchase")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    vp shouldBe Seq(
      (1L, 10L, Some(30L)), (2L, 10L, Some(30L)), (3L, 10L, Some(25L)))
  }

  test("streaming funnel updates equal the batch funnel (live + batch execution)") {
    import graft.streaming.StatefulOps
    val stages = Seq("view", "click", "purchase")
    val base = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"),
        graft.ops.Out.epochSec(col("ts")).as("t"), col("event_id"))
    // the batch funnel's per-user stage times, flattened to (user, stage) → t
    val want: Map[(Long, Int), Long] = EventQueries.funnel(spark, sf).collect()
      .flatMap { r =>
        (0 until 3).flatMap(i =>
          if (r.isNullAt(i + 1)) None
          else Some((r.getLong(0), i) -> r.getLong(i + 1)))
      }.toMap
    // batch execution of the stateful fold
    val batchRun = StatefulOps.funnelUpdates(base, stages).collect()
      .map(u => (u.userId, u.stage) -> u.t).toMap
    batchRun shouldBe want
    // streaming execution: single-file replay (one micro-batch ⇒ the
    // in-order contract holds trivially)
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_stream").toString
    base.coalesce(1).write.parquet(s"$dir/ev")
    val q = StatefulOps.funnelUpdates(
        spark.readStream.schema(base.schema).parquet(s"$dir/ev"), stages)
      .writeStream.format("memory").queryName("funnel_updates")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("funnel_updates").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
      streamed shouldBe want
    } finally q.stop()
  }
}
