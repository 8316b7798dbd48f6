package graft

import graft.ops.GraphQueries
import graft.tables.Tables

/** Exact integer recompute of the fixed-point PageRank (sf0.001) — the
  * whole point of the fixed-point formulation is that a driver-side Long
  * loop must reproduce the distributed result BIT-identically, not
  * approximately. */
class GraphQueriesSpec extends SparkSpec {

  private def recompute(iters: Int): (Map[Long, Long], Map[Long, Long]) = {
    val t = Tables(spark, sf)
    val custOfOrder = t.orders.select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = t.lineitem.select("l_orderkey", "l_suppkey").collect()
      .flatMap(r => custOfOrder.get(r.getLong(0)).map(c => (c * 2, r.getLong(1) * 2 + 1)))
      .distinct
    val edges = pairs ++ pairs.map { case (u, v) => (v, u) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr: Map[Long, Long] = deg.map { case (n, _) => n -> GraphQueries.PrScale }
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => pr(src) / deg(src) }.sum
      }
      pr = in.map { case (n, m) =>
        n -> (GraphQueries.PrTeleport +
          GraphQueries.PrDampNum * m / GraphQueries.PrDampDen)
      }
    }
    (pr, deg)
  }

  test("fixed-point pagerank = exact driver-side integer recompute") {
    val (pr, deg) = recompute(GraphQueries.PrIters)
    val got = GraphQueries.pagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    got.map(g => g._1 -> g._3).toMap shouldBe pr // bit-exact, no tolerance
    got.foreach { case (node, kind, rank) =>
      kind shouldBe (if (node % 2 == 0) "cust" else "supp")
      assert(rank >= GraphQueries.PrTeleport, s"node $node rank $rank below teleport floor")
    }
    // every graph node is ranked (undirected edges → no dangling nodes)
    got.map(_._1).toSet shouldBe deg.keySet
  }


  test("hash-stepped Pregel joins are result-identical and actually plan SHJ") {
    // The scale gate (Tables.bigInputs) flips hashSteps on past 256 MB of
    // lineitem; this pins BOTH halves of its contract at test scale:
    // (a) hashSteps=true changes only the physical join strategy, never a
    // row (bit-exact vs the ungated plan), and (b) the hint genuinely
    // plans ShuffledHashJoin (a silently-ignored hint would make the 100x
    // OOM fix a no-op without failing anything else).
    val t = Tables(spark, sf)
    val es = {
      val base = GraphQueries.pagerank(spark, sf) // warm staged trade_edges
      base.count()
      // rebuild the edge frame the same way the wrappers do
      val pairs = t.orders.select(org.apache.spark.sql.functions.col("o_orderkey"),
          org.apache.spark.sql.functions.col("o_custkey"))
        .join(t.lineitem.select(org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_suppkey")),
          org.apache.spark.sql.functions.col("o_orderkey") ===
            org.apache.spark.sql.functions.col("l_orderkey"))
        .select((org.apache.spark.sql.functions.col("o_custkey") * 2).as("src"),
          (org.apache.spark.sql.functions.col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      pairs.unionByName(pairs.select(
        org.apache.spark.sql.functions.col("dst").as("src"),
        org.apache.spark.sql.functions.col("src").as("dst")))
    }
    val plain = GraphQueries.pagerankOf(es, hashSteps = false).collect()
    val hashed = GraphQueries.pagerankOf(es, hashSteps = true)
    hashed.collect() shouldBe plain // bit-exact: strategy, not semantics
    val p = hashed.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"hashSteps=true must plan shuffled hash joins:\n$p")
  }

  test("Tables.bigInputs gates on real lineitem bytes, memoized per dir") {
    val t = Tables(spark, sf)
    // test corpora are far under the production 256 MB gate: OFF
    assert(!t.bigInputs(), s"gate must be off at $sf")
    // the same dir passes a 1-byte threshold: the walk reads real sizes
    assert(t.bigInputs(thresholdBytes = 1L))
    // and a missing dir is simply not big (no throw - plan-build safety)
    assert(!Tables(spark, "/nonexistent-graft-dir").bigInputs(thresholdBytes = 1L))
  }

  test("pagerank honors the iters argument (1 round, still bit-exact)") {
    val (pr, _) = recompute(1)
    GraphQueries.pagerank(spark, sf, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap shouldBe pr
    assert(pr.values.toSet.size > 1, "one round must already differentiate ranks")
  }

  test("triangle count + degree distribution = brute force over the co-order graph") {
    val t = Tables(spark, sf)
    val lo = t.lineitem.select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    // thresholded undirected edges as ordered (lo, hi) pairs
    val edges = lo.groupBy(_._1).values.flatMap { ls =>
      val ss = ls.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
    }.groupBy(identity) // NB: not Map#collect-to-tuple — that would rebuild a Map and collapse by s1
      .filter(_._2.size >= GraphQueries.TriMinShared).keySet
    assert(edges.nonEmpty, "threshold must leave a graph to count on")
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    // unordered enumeration a < b < c — blind to the orientation trick
    var tri = 0L
    for { (a, b) <- edges; c <- nodes if c > b
          if edges((b, c)) && edges((a, c)) } tri += 1
    GraphQueries.triangleCount(spark, sf).collect()(0).getLong(0) shouldBe tri
    val deg = nodes.map(n => n -> edges.count(e => e._1 == n || e._2 == n))
    val wantDist = deg.groupBy(_._2).map { case (d, g) => d.toLong -> g.size.toLong }
    val gotDist = GraphQueries.degreeDist(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    gotDist shouldBe wantDist
    // handshake identity on the distribution itself
    gotDist.map { case (d, n) => d * n }.sum shouldBe 2L * edges.size
  }

  test("k-core peels a synthetic graph to its known core, and ≡ brute force") {
    // 4-clique {0,1,2,3} + a pendant path 3-4-5: the 3-core is exactly the
    // clique (peeling 5 drops 4's degree to 1, which peels 4 too)
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L))
    val sym = und ++ und.map(_.swap)
    val df = spark.createDataFrame(sym).toDF("src", "dst")
    val core = GraphQueries.kCoreOf(df, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    core shouldBe Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L)
    // k above the max degree empties the graph (and still converges)
    GraphQueries.kCoreOf(df, k = 10).count() shouldBe 0L
    // wrapper over the co-order graph ≡ driver-side iterative peel
    val lo = Tables(spark, sf).lineitem.select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = lo.groupBy(_._1).values.flatMap { ls =>
      val ss = ls.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
    }.groupBy(identity)
      .filter(_._2.size >= GraphQueries.TriMinShared).keySet
    val k = 5
    var adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var changed = true
    while (changed) {
      val keep = adj.filter(_._2.size >= k).keySet
      val next = adj.collect { case (n, ns) if keep(n) =>
        n -> ns.intersect(keep)
      }.filter(_._2.nonEmpty)
      changed = next != adj
      adj = next
    }
    val want = adj.map { case (n, ns) => n -> ns.size.toLong }
    GraphQueries.kCore(spark, sf, k = k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe want
    // peel-depth budget: a path graph peels one layer per round (depth ~L/2
    // at k=2), so a too-small maxRounds must FAIL LOUDLY, never return a
    // half-peeled subgraph — and the budget counts PEELS, so a graph whose
    // depth equals the budget still converges (its last round is the cheap
    // node-probe, not another peel)
    val chain = (0L until 7L).sliding(2).map(s => (s(0), s(1))).toSeq
    val chainDf = spark.createDataFrame(chain ++ chain.map(_.swap)).toDF("src", "dst")
    an[IllegalStateException] should be thrownBy
      GraphQueries.kCoreOf(chainDf, k = 2, maxRounds = 2).count()
    GraphQueries.kCoreOf(chainDf, k = 2, maxRounds = 3).count() shouldBe 0L
  }

  test("label propagation ≡ driver-side synchronized rounds; cliques unify") {
    // brute-force mirror of the sync rule: mode of neighbor labels, min tie
    def lpa(und: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val adj = (und ++ und.map(_.swap)).groupBy(_._1)
        .map { case (n, es) => n -> es.map(_._2).distinct }
      var labels = adj.keys.map(n => n -> n).toMap
      (1 to rounds).foreach { _ =>
        labels = adj.map { case (n, ns) =>
          val freq = ns.map(labels).groupBy(identity)
            .map { case (l, g) => (l, g.size) }
          n -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
      labels
    }
    // two disjoint 4-cliques: each must unify on its min node id
    val cliques = (for (s <- Seq(0L, 10L); i <- 0 to 3; j <- i + 1 to 3)
      yield (s + i, s + j))
    val sym = cliques ++ cliques.map(_.swap)
    val got = GraphQueries.labelPropagationOf(
      spark.createDataFrame(sym).toDF("src", "dst"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe lpa(cliques, 4)
    got.filterKeys(_ < 10L).values.toSet shouldBe Set(0L)
    got.filterKeys(_ >= 10L).values.toSet shouldBe Set(10L)
    // and the co-order wrapper matches the driver mirror at a non-default budget
    val lo = Tables(spark, sf).lineitem.select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = lo.groupBy(_._1).values.flatMap { ls =>
      val ss = ls.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
    }.groupBy(identity)
      .filter(_._2.size >= GraphQueries.TriMinShared).keys.toSeq
    GraphQueries.labelPropagation(spark, sf, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe lpa(edges, 3)
  }

  test("pagerank BIGINT tripwire fires on an over-envelope hub; decimal path stays exact") {
    import org.apache.spark.sql.functions._
    // 10^7 unit-rank leaves aim 10^19 of fixed-point mass at one hub in the
    // first round - past Long.MaxValue, so the BIGINT sum wraps negative and
    // the tripwire must fire instead of emitting garbage.
    val n = 10000000L
    val leaves = spark.range(n).select((col("id") * 2 + 2).as("leaf"))
    val star = leaves.select(col("leaf").as("src"), lit(1L).as("dst"))
      .unionByName(leaves.select(lit(1L).as("src"), col("leaf").as("dst")))
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    val boom = intercept[Exception] {
      GraphQueries.pagerankOf(star, iters = 1).collect()
    }
    // Under Spark 4's default ANSI mode the long sum itself throws
    // ARITHMETIC_OVERFLOW before the negative-wrap tripwire can see a row;
    // with ANSI off the wrap reaches the tripwire. Either way: LOUD, never
    // silent garbage - which is the contract under test.
    assert(causes(boom).exists(c => Option(c.getMessage).exists(m =>
      m.contains("fixed-point overflow") || m.contains("ARITHMETIC_OVERFLOW"))),
      s"expected a loud overflow failure, got: $boom")

    // The decimal escalation path on the SAME graph: bit-exact against a
    // BigInt recompute of the same constants (truncating division).
    val P = BigInt(GraphQueries.PrScale)
    val tele = BigInt(GraphQueries.PrTeleport)
    val dn = BigInt(GraphQueries.PrDampNum); val dd = BigInt(GraphQueries.PrDampDen)
    val hubExpected = tele + dn * (BigInt(n) * P) / dd
    val leafExpected = tele + dn * (P / BigInt(n)) / dd
    val got = GraphQueries.pagerankOf(star, iters = 1, decimalSums = true)
      .filter(col("node").isin(1L, 2L)).collect()
      .map(r => r.getLong(0) -> BigInt(r.getDecimal(2).toBigInteger)).toMap
    got(1L) shouldBe hubExpected
    got(2L) shouldBe leafExpected
    assert(BigInt(n) * P > BigInt(Long.MaxValue),
      "the hub's undamped incoming mass must genuinely exceed the BIGINT " +
        "envelope for this test to bite")
  }

  test("fixed-point HITS = exact driver-side integer recompute") {
    val s = spark
    import s.implicits._
    // Bipartite: hub c1 points at 3 suppliers, c2 at one of them, c3 at a
    // private supplier — c1 must out-rank c2/c3, the shared supplier s1
    // must out-rank the private s3, and every round's top score is exactly
    // HitsScale (max-normalization fixed point).
    val pairs = Seq((1L, 1L), (1L, 2L), (1L, 4L), (2L, 1L), (3L, 3L))
      .toDF("cust", "supp")
    val S = GraphQueries.HitsScale
    var hub = pairs.select("cust").distinct().collect()
      .map(_.getLong(0) -> S).toMap
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    var auth: Map[Long, Long] = Map.empty
    for (_ <- 1 to GraphQueries.HitsIters) {
      val aRaw = edges.groupBy(_._2).map { case (s, es) =>
        s -> es.map { case (c, _) => hub(c) }.sum }
      val am = aRaw.values.max
      auth = aRaw.map { case (s, a) => s -> a * S / am }
      val hRaw = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map { case (_, s) => auth(s) }.sum }
      val hm = hRaw.values.max
      hub = hRaw.map { case (c, h) => c -> h * S / hm }
    }
    val got = GraphQueries.hitsOf(pairs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.filter(_._1._1 == "cust").map { case ((_, n), s) => n -> s } shouldBe hub
    got.filter(_._1._1 == "supp").map { case ((_, n), s) => n -> s } shouldBe auth
    got(("cust", 1L)) shouldBe S               // the 3-authority hub wins
    assert(got(("cust", 2L)) < S && got(("cust", 3L)) < S)
    got(("supp", 1L)) shouldBe S               // the shared authority wins
    assert(got(("supp", 3L)) < got(("supp", 1L)))
  }
}
