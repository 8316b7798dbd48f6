package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Iterative graph analytics over relationship graphs derived from the batch
  * tables — the second graph primitive next to
  * [[ConnectedComponents]] (which powers the near-dup clustering queries).
  *
  * PageRank here is **fixed-point integer** PageRank: ranks are unnormalized
  * 10¹²-scaled integers and every damping/contribution step uses integer
  * floor division. That is a real distributed-systems technique, not a test
  * convenience — floating-point PageRank is NOT reproducible across cluster
  * sizes (partial-sum order changes the low bits every run), while integer
  * fixed-point arithmetic makes the whole iteration bit-identical on 1
  * executor or 1000, and lets the oracle agree exactly. Truncation error is
  * bounded by 1 ulp (10⁻¹² of a unit rank) per edge per iteration —
  * irrelevant at ranking granularity.
  */
object GraphQueries {

  /** Fixed iteration count (unrolled in the oracle SQL — keep in sync by
    * construction: the oracle is generated from this constant). */
  val PrIters = 3

  /** Initial per-node rank, 10¹² fixed-point "1.0". With B=10¹² and damping
    * 85/100, a BIGINT holds the hot-node worst case up to ~10⁵ nodes of
    * total mass per receiving node; beyond that (the 100 TB regime) the SAME
    * plan runs with the sums in DECIMAL(38,0) — still exact, still
    * order-independent. */
  val PrScale = 1000000000000L

  /** Damping factor as an exact rational (85/100 ≡ 0.85). */
  val PrDampNum = 85L
  val PrDampDen = 100L

  /** Teleport mass per node per iteration: scale·(1−d), exact. */
  val PrTeleport: Long = PrScale * (PrDampDen - PrDampNum) / PrDampDen

  /** Shuffled-hash-join build-side hint for the Pregel-step joins
    * (`edges ⋈ ranks/dist/labels` and the staged `orders ⋈ lineitem`).
    *
    * WHY a hint at all (round-15, 100× stage profiles): these joins plan
    * sort-merge, and SMJ re-SORTS the 119 M-row edge stream every
    * iteration — ~90 MB of sort buffer per task that is pure overhead (the
    * downstream hash agg needs no order) and stacks with the round's
    * partial-agg map into exactly the per-task demand that falls over at
    * 32 tasks × 8 GiB (AGGREGATE_OUT_OF_MEMORY on `q_bfs_frontier`,
    * spill-reader OOM on `q_pagerank` at local[4] — a real 4-core/8 GiB
    * executor shape). Hash-building the node-sized side instead is
    * O(nodes/partitions) memory and streams the edges: measured
    * q_bfs_frontier OOM → 44 s, q_hits 80.7 → 58.5, q_pagerank 76.6 →
    * 59.2 at 100×.
    *
    * WHY the hint must be SCALE-GATED (`when`): at sf0.1 the same hint
    * cost 1.5–5.4× across the family because it blocks AQE's runtime
    * SMJ→BROADCAST demotion that small scales live on. And WHY a static
    * gate instead of delegating to the planner (both were built and
    * measured this round): the build sides sit directly above a final
    * aggregate whose output partitioning already satisfies the join — no
    * exchange under the join means AQE's DynamicJoinSelection
    * (`maxShuffledHashJoinLocalMapThreshold`) has no map stats to read,
    * and Catalyst's static estimate for an aggregate is its CHILD's size,
    * so `preferSortMergeJoin=false` never sees a qualifying build either;
    * both mechanisms were confirmed inert on this exact shape (synthetic
    * repro + executed-plan reads). The gate therefore decides from the
    * REAL input scale at plan-build time — the same decision a CBO makes
    * from table stats, sourced from the one statistic that is always
    * available and exact: the input parquet bytes ([[Tables.bigInputs]]).
    * Below the gate no hint is emitted and runtime broadcast demotion
    * serves the small scale; at/above it the hash build is provably right
    * (the node side no longer broadcasts, and sort-merge only spills). */
  private def shj(buildSide: DataFrame, when: Boolean = true): DataFrame =
    if (when) buildSide.hint("shuffle_hash") else buildSide

  /** Explicit-width repartition for the spill-prone staged DISTINCT/agg
    * builds past the scale gate. The builds dedup a fact-sized join output
    * (60 M rows at 100×) whose hash-agg state spilled ~5 GB per stage in
    * 32 post-shuffle tasks at 8 g (round-15 final readings); 4× the width
    * quarters per-task state and the spill disappears (round-16 A/B).
    *
    * Spelled as `repartition(N, col)` — shuffle origin REPARTITION_BY_NUM —
    * rather than the round-16 session-conf overrides
    * (`spark.sql.shuffle.partitions=128` + coalescing off): AQE's
    * `CoalesceShufflePartitions` only folds ENSURE_REQUIREMENTS /
    * REPARTITION_BY_COL / REBALANCE shuffles, so a user-pinned width
    * survives `parallelismFirst` with ZERO conf mutation (pinned in
    * PlanShapeSpec). The conf spelling mutated the SHARED session's SQL
    * confs for the build window — any concurrently-planned query (streaming
    * feeds, a parallel test) silently picked them up (round-16 advice).
    * Below the gate: column-only repartition, exactly the pre-gate plan —
    * sf0.1 builds fit comfortably and tiny tasks only add overhead. */
  private def stagedRepartition(df: DataFrame, t: Tables,
      key: org.apache.spark.sql.Column): DataFrame =
    if (t.bigInputs()) df.repartition(128, key) else df.repartition(key)

  /** Customer–supplier trade graph: an edge for every (customer, supplier)
    * pair connected through at least one order line. Node ids are disjoint
    * by parity (customer → 2k, supplier → 2k+1 — cheaper than a tag column
    * and keeps the join key a single BIGINT). Undirected: each pair yields
    * both directions, so every node has in- and out-degree ≥ 1 and the
    * random walk has no dangling mass to redistribute. */
  private def edges(t: Tables): DataFrame = {
    // Staged once per (process, dir) as PARQUET scratch files
    // ([[Staged.viaParquet]], round-15: columnar-encoded longs through the
    // vectorized reader beat row-serialized checkpoint blocks ~3× on these
    // narrow tables): the 600 k-row orders⋈lineitem join reduces to a
    // ~32 k-row edge list consumed by pagerank / k-core / BFS — a small
    // derivative, the granularity staging pays at. Only the ORIENTED pairs
    // are staged (round-14, from a 100× stage profile where the staged
    // write was the graph family's single largest stage): the symmetrized
    // doubling is a union of two projections over the same parquet files —
    // two cheap columnar scans per consumer instead of writing (and
    // distinct-shuffling) twice the rows once.
    val pairs = Staged.viaParquet("trade_edges", t.spark, t.dir) {
      // At sf0.1 the orders side broadcasts statically (2 MB) and the gate
      // stays off; past the gate it is SMJ by estimate and the hash build
      // is the measured win (round-15 stage profile: the SMJ here sorted
      // the 60 M-row lineitem stream for 10.5 GB of spill at 100×).
      val joined =
        shj(t.orders.select(col("o_orderkey"), col("o_custkey")), t.bigInputs())
        .join(t.lineitem.select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        // Dedup AND src-cluster on ONE exchange: HashPartitioning(src)
        // satisfies the dedup aggregate's ClusteredDistribution(src, dst)
        // (equal pairs share a src), so Catalyst plans the dropDuplicates
        // directly on the repartition output with no second shuffle — the
        // same exchange count as a bare distinct(), but the staged files
        // land src-disjoint and (src, dst)-sorted. Sorted near-monotone
        // longs delta-encode tighter in parquet and compress tighter
        // through every consumer's edge shuffle (measured this round at
        // 100×: hash(src,dst)-sharded unsorted staging cost 941–1281 MB
        // per symmetrized exchange and 176 MB per degree exchange;
        // src-clustered sorted staging cut those to ~790 MB and ~25 MB).
        // Width from [[stagedRepartition]] (128 past the gate).
      stagedRepartition(joined, t, col("src"))
        .dropDuplicates("src", "dst")
        .sortWithinPartitions(col("src"), col("dst"))
    }
    pairs.unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** [[PrIters]] rounds of fixed-point PageRank over the trade graph.
    * Output: every node with its kind and integer rank.
    *
    * Shape at scale: the degree table is computed ONCE and attached to the
    * edge list before the loop (`adj`), so each iteration is exactly one
    * equi-join (ranks ⋈ adj on the source id) plus one partial-aggregated
    * shuffle (contributions summed by destination) — the canonical Pregel
    * step expressed declaratively. The unrolled plan repeats the `adj`
    * subtree per iteration textually, but its exchanges canonicalize
    * identically, so runtime exchange reuse materializes the graph shuffle
    * once; an explicit `persist()` of adj+deg was A/B'd at sf0.1 (3 runs
    * each) and came out ~15% SLOWER (3.66 s → 4.26 s median) — the cache
    * write costs more than it saves over ReusedExchange, so the lazy
    * spelling stands. At true 100 TB scale, an iterate-to-convergence
    * variant would persist the graph and `localCheckpoint` per round
    * exactly as [[ConnectedComponents.run]] does (a dynamic loop cannot
    * lean on single-query exchange reuse); 3 fixed unrolled iterations
    * don't need it — lineage depth is bounded. All sums are BIGINT (exact):
    * no floating-point anywhere in the loop. */
  /** The fixed-point iteration over an arbitrary symmetrized edge set.
    *
    * `decimalSums` is the promised escalation path past the BIGINT mass
    * envelope (~9×10⁶ × PrScale of incoming mass per node — a ~10⁷-degree
    * hub wraps a long): the SAME plan with every rank/sum in DECIMAL(38,0).
    * Still exact, still order-independent, ~25 more decimal digits of
    * headroom; the price is decimal arithmetic instead of codegen'd long
    * ops. Exact floor division is spelled `(x − pmod(x, d)) / d` because
    * Spark's `div` returns LONG for ANY input width — the one operator that
    * would silently reintroduce the 64-bit ceiling — while the
    * subtract-mod quotient is integral, so the decimal division is exact at
    * any result scale. Overflow PAST decimal(38,0) nulls the sum (non-ANSI
    * mode), so the tripwire adds an isNull check: fail loudly, never emit
    * garbage — same contract as the BIGINT path's negative-wrap check. */
  def pagerankOf(edges: DataFrame, iters: Int = PrIters,
      decimalSums: Boolean = false, hashSteps: Boolean = false): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val adj = edges.join(shj(deg, hashSteps), Seq("src"))
    val dec = "decimal(38,0)"
    def floorDiv(x: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      ((x - pmod(x, d)) / d).cast(dec)
    var ranks = deg.select(col("src").as("node"),
      (if (decimalSums) lit(PrScale).cast(dec) else lit(PrScale)).as("pr"))
    for (_ <- 1 to iters) {
      val contrib =
        if (decimalSums) floorDiv(col("pr"), col("deg"))
        else expr("pr div deg")
      val damped =
        if (decimalSums)
          (lit(PrTeleport).cast(dec) +
            floorDiv(col("m") * lit(PrDampNum), lit(PrDampDen))).cast(dec)
        else lit(PrTeleport) + expr(s"($PrDampNum * m) div $PrDampDen")
      ranks = adj.join(shj(ranks, hashSteps), col("src") === col("node"))
        .select(col("dst"), contrib.as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("m"))
        .select(col("dst").as("node"), damped.as("pr"))
    }
    // The trailing isNotNull mirrors the constraint every NON-final
    // iteration already carries: round k's output joins round k+1's adj
    // INNER on the node id, which pushes isnotnull(dst) down into round
    // k's edge scan — but the LAST round has no next join, so its scan's
    // pushed DataFilters were weaker, the exchange canonicalized
    // differently, and runtime exchange reuse skipped it: the 100× plan
    // materialized the 984 MB symmetrized-edge shuffle TWICE (round-15
    // verdict #2, read off the AQE-final plan: iterations 1–2 shared one
    // Exchange + ReusedExchange, the final iteration rebuilt its own).
    // Node ids are never null (integer arithmetic over join keys), so this
    // filter drops nothing; it only makes every round's scan — and hence
    // every round's exchange — canonically identical.
    ranks.where(col("node").isNotNull).select(
        col("node"),
        when(col("node") % 2 === 0, lit("cust")).otherwise(lit("supp")).as("kind"),
        // Overflow guard: the BIGINT fixed-point envelope (scaladoc above)
        // holds until a node's incoming mass nears 2⁶³; past it, Spark's
        // non-ANSI sum WRAPS silently where the DuckDB oracle's HUGEINT
        // errors loudly. A wrapped mass is negative long before the final
        // damping, so a negative rank is the cheap, codegen'd tripwire —
        // fail loudly (the ConnectedComponents convention) instead of
        // emitting garbage. The decimal path's overflow symptom is NULL
        // (decimal sum overflow), caught by the same guard.
        when(col("pr") < 0 || col("pr").isNull, expr(
          "raise_error('pagerank fixed-point overflow: a hub exceeded the " +
            "mass envelope — use decimalSums (BIGINT path), lower PrScale, " +
            "or shard the hub')"))
          .otherwise(col("pr")).as("pr"))
      .orderBy(col("node"))
  }

  /** [[PrIters]] rounds of fixed-point PageRank over the trade graph (the
    * oracle-gated spelling — BIGINT sums). */
  def pagerank(spark: SparkSession, dir: String,
      iters: Int = PrIters): DataFrame = {
    val t = Tables(spark, dir)
    pagerankOf(edges(t), iters, hashSteps = t.bigInputs())
  }

  /** Seed-set bound for [[pprTrade]]: customers with custkey < 50 (node
    * encoding custkey·2, so node < 100 ∧ even). Shared with the oracle. */
  val PprSeedMax = 100L

  /** Personalized PageRank from a seed set: the restart mass lands ONLY on
    * the seeds, so ranks measure proximity TO the seeds rather than global
    * centrality — the "expand this customer cohort" primitive behind
    * lookalike audiences and seed-based graph retrieval. Same fixed-point
    * integer discipline as [[pagerankOf]] (BIGINT ranks at [[PrScale]],
    * integer damping, truncating div): bit-reproducible at any parallelism,
    * the oracle unrolls the identical recurrence.
    *
    * Shape at scale: identical to [[pagerank]] — degree attached to edges
    * once, each round one equi-join + one partial-agg shuffle; the seed
    * predicate is a codegen'd projection, never a join against a seed
    * table (for dynamic seed sets it would become a broadcast semi-join —
    * same plan class). Non-seed teleport is zero, so mass drains from
    * regions unreachable from the seeds — exactly the semantics that make
    * PPR a proximity measure. */
  def pprTrade(spark: SparkSession, dir: String,
      iters: Int = PrIters, seedMax: Long = PprSeedMax): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.bigInputs()
    val es = edges(t)
    val deg = es.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val adj = es.join(shj(deg, big), Seq("src"))
    def seed(c: org.apache.spark.sql.Column) = c % 2 === 0 && c < seedMax
    var ranks = deg.select(col("src").as("node"),
      when(seed(col("src")), lit(PrScale)).otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to iters) {
      ranks = adj.join(shj(ranks, big), col("src") === col("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("m"))
        .select(col("dst").as("node"),
          (when(seed(col("dst")), lit(PrTeleport)).otherwise(lit(0L)) +
            expr(s"($PrDampNum * m) div $PrDampDen")).as("pr"))
    }
    // same last-round exchange-canonicalization filter as [[pagerankOf]]
    ranks.where(col("node").isNotNull).select(col("node"),
        when(col("node") % 2 === 0, lit("cust")).otherwise(lit("supp")).as("kind"),
        when(seed(col("node")), 1L).otherwise(0L).as("is_seed"),
        // same wrap tripwire as pagerankOf: fail loudly on overflow
        when(col("pr") < 0, expr(
          "raise_error('ppr fixed-point overflow: a hub exceeded the mass " +
            "envelope — lower PrScale or shard the hub')"))
          .otherwise(col("pr")).as("pr"))
      .orderBy(col("node"))
  }

  /** Minimum distinct shared orders for a supplier pair to count as a
    * co-order edge (shared with the oracle SQL via interpolation). The
    * threshold is what keeps the projected graph sparse: an unthresholded
    * co-occurrence projection of a transaction log is near-complete (every
    * pair of popular suppliers eventually shares SOME order), and near-
    * complete graphs make every triangle algorithm quadratic. */
  val TriMinShared = 25

  /** Supplier co-order graph: an undirected edge (s1 < s2) for every
    * supplier pair appearing together in ≥ `minShared` distinct orders.
    *
    * Shape at scale: the per-order pair enumeration is a self-join of the
    * DISTINCT (order, supplier) table on the order key — fan-out bounded by
    * lines-per-order² (a per-ORDER property, independent of corpus size),
    * then one partial-aggregated shuffle on the pair key applies the
    * threshold. No all-pairs path: suppliers never join against suppliers,
    * only within an order. */
  private[ops] def coOrderEdges(t: Tables, minShared: Int): DataFrame =
    // Staged per minShared: triangles / degree-dist / assortativity /
    // link-predict all replay the same co-order self-join otherwise.
    Staged.viaParquet(s"coorder_edges_$minShared", t.spark, t.dir) {
    // Both aggregations ride explicit repartitions (round-16, same measured
    // anti-pattern as the DedupQueries counting joins): (1) the (order,
    // supplier) distinct's map-side partial agg collapsed ~5% of 60 M rows
    // while spilling 4.6 GB at 100× — hash(o) clusters it for free and the
    // dedup plans no second exchange; the self-join on the order key then
    // reuses that same exchange on both sides. (2) a supplier pair's
    // co-occurrences live in DIFFERENT order partitions, so the pair
    // count's map-side partial agg collapsed nothing (1.7 GB spill) —
    // shuffle the raw pairs on hash(s1) and aggregate above it. Widths
    // come from [[stagedRepartition]] (128 pinned past the gate).
    val lo = stagedRepartition(
        t.lineitem.select(col("l_orderkey").as("o"), col("l_suppkey").as("s")),
        t, col("o"))
      .dropDuplicates("o", "s")
    stagedRepartition(
      lo.as("a").join(lo.as("b"), col("a.o") === col("b.o") && col("a.s") < col("b.s"))
        .select(col("a.s").as("s1"), col("b.s").as("s2")),
      t, col("s1"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("s1"), col("s2"))
    }

  /** Degree assortativity of the co-order graph: the Pearson correlation
    * of endpoint degrees over the DIRECTED edge list (both directions —
    * the standard undirected-graph convention). Positive r = hubs trade
    * with hubs (resilient core, fragile periphery); negative = hub-spoke.
    * One number that summarizes the wiring the degree distribution alone
    * can't see.
    *
    * Exactness: degrees are integers, so all six Pearson moments are
    * integer sums (LONG is ample here — Σdeg² per edge tops out near
    * 10¹¹ at this corpus; a 100 TB graph would lift the moments to
    * DECIMAL(38,0), same plan); r is one shared double formula with
    * 0-clamped variance numerators ([[StatsQueries]] discipline). Shape:
    * edge build + degree partial agg + two broadcast-sized degree joins +
    * one global agg. */
  def assortativity(spark: SparkSession, dir: String,
      minShared: Int = TriMinShared): DataFrame = {
    val e = coOrderEdges(Tables(spark, dir), minShared)
    val deg = degrees(e)
    val directed = e.select(col("s1").as("u"), col("s2").as("v"))
      .unionByName(e.select(col("s2").as("u"), col("s1").as("v")))
    val j = directed
      .join(deg.select(col("src").as("u"), col("deg").as("dx")), Seq("u"))
      .join(deg.select(col("src").as("v"), col("deg").as("dy")), Seq("v"))
    val m = j.agg(count(lit(1)).as("n"),
      sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dy") * col("dy")).as("syy"),
      sum(col("dx") * col("dy")).as("sxy"))
    val n = col("n").cast("double")
    val vx = n * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val cxy = n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    m.select(col("n").as("n_directed_edges"),
      round(cxy / (sqrt(greatest(vx, lit(0.0))) * sqrt(greatest(vy, lit(0.0)))), 6)
        .as("assortativity"))
  }

  /** Per-node degree over the thresholded co-order graph. */
  private def degrees(edges: DataFrame): DataFrame =
    edges.select(col("s1").as("src")).unionByName(edges.select(col("s2").as("src")))
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))

  /** Exact triangle count over the co-order graph via **degree-ordered
    * orientation** — the standard scale trick (Chiba–Nishizeki / the
    * "compact-forward" order): direct every undirected edge from its
    * lower-(degree, id) endpoint to its higher one, so each triangle is
    * counted exactly once at its unique two-out-edge apex, and — the scale
    * point — every node's OUT-degree is bounded by O(√m) on any graph
    * (arboricity bound), so the wedge join `D ⋈ D` is bounded by
    * Σ outdeg² ≤ m·√m instead of Σ deg² , which a hub node would otherwise
    * blow up quadratically. Three equi-joins, no products:
    * wedge = D(a→b) ⋈ D(b→c), close it with D(a→c). Output: one row,
    * the triangle count. */
  def triangleCount(spark: SparkSession, dir: String,
      minShared: Int = TriMinShared): DataFrame = {
    val edges = coOrderEdges(Tables(spark, dir), minShared)
    val deg = degrees(edges)
    val oriented = edges
      .join(deg.select(col("src").as("s1"), col("deg").as("d1")), "s1")
      .join(deg.select(col("src").as("s2"), col("deg").as("d2")), "s2")
      // s1 < s2 by construction, so (deg, id) order resolves ties toward s1
      .select(
        when(col("d1") <= col("d2"), col("s1")).otherwise(col("s2")).as("u"),
        when(col("d1") <= col("d2"), col("s2")).otherwise(col("s1")).as("v"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    wedges.join(oriented.as("e3"),
        col("a") === col("e3.u") && col("c") === col("e3.v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Degree distribution of the co-order graph: how many suppliers have k
    * co-order partners. Two partial-aggregated shuffles (node, then degree
    * value); the output is at most max-degree rows — driver-safe at any
    * scale. */
  def degreeDist(spark: SparkSession, dir: String,
      minShared: Int = TriMinShared): DataFrame =
    degrees(coOrderEdges(Tables(spark, dir), minShared))
      .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("deg"))

  /** k-core of an undirected edge set: iteratively peel every node whose
    * degree is below `k` until no node is removed, and return the surviving
    * nodes with their within-core degree — the standard graph-mining
    * density filter (community seeds, spam-farm detection, influence
    * cores).
    *
    * `edges` MUST be symmetrized — both (u,v) and (v,u) present, no
    * self-loops (the [[kCore]]/[[kCoreTrade]] wrappers do this). Since the
    * round-14 anti-join peel this is a CORRECTNESS precondition, not just a
    * semantic convention: degrees are counted over `src` only, so a node
    * appearing only as `dst` has no degree row, is never placed in the
    * removed set, and its edges are retained forever — a wrong core that
    * can also never peel. (The old semi-join-on-kept peel silently DROPPED
    * such edges instead.) A debug-level guard is not worth a full edge scan
    * per call; symmetry is enforced by construction at both call sites.
    *
    * Shape at scale: each round is ONE partial-agg degree count plus two
    * ANTI-joins against the under-k REMOVED set — never a window, never a
    * collect. Anti-join on removed, not semi-join on kept (round-14, from
    * a 100× stage profile): the survivor set is ~node-sized (99.7% of the
    * 1.6 M trade-graph nodes at 100× survive round 1), which sat just past
    * the broadcast threshold and forced TWO full shuffles of the 119 M-row
    * edge set per peel; the removed set is the naturally SPARSE side
    * (~4 k nodes there — peeling terminates when it reaches zero), so AQE
    * broadcasts it and the edge set never shuffles. Neither join side is
    * forced: a pathological round that removes half the graph degrades to
    * a shuffled anti-join, never a failure. The peel is monotone, and
    * convergence is probed on the DEGREE table: zero under-k nodes ⇔
    * fixpoint (every node in the degree table has ≥ 1 edge, so an under-k
    * node always removes edges and vice versa); probing before peeling
    * means the terminal round costs one node-sized aggregate, not a peel.
    *
    * Iterates on `persist()` (columnar MEMORY_AND_DISK batches), not
    * `localCheckpoint` (round-14, same profile): checkpoint blocks store
    * DESERIALIZED rows — the 119 M-edge set materialized at 12.2 GB and
    * each round's re-read dragged ~1 s of GC per task-second — where the
    * compressed columnar cache is ~6× smaller and byte-array-shaped. Each
    * round materializes the next edge set through the caches it reads,
    * then drops them; lineage stays INTACT (an evicted block recomputes,
    * where an unpersisted localCheckpoint is unrecoverable by design).
    * Plan depth grows by two joins per round, bounded by `maxRounds` —
    * rounds are data-bounded (≤ peel depth; real graphs converge in tens),
    * and like CC a non-convergence within `maxRounds` throws rather than
    * returning a half-peeled subgraph. */
  /** Max removed-set rows [[kCoreOf]] will explicitly broadcast per peel.
    * Honest sizing (this bound is a memory decision, not a wire one): 4 M
    * longs are 32 MB raw, but the anti-join build side materializes as a
    * LongHashedRelation, MEASURED at exactly 256 MB for 4 M distinct
    * sparse long keys (`estimatedSize`/`dataSize` metric of the
    * BroadcastExchange, Spark 4.1.2 — LongToUnsafeRowMap's power-of-two
    * page sizing) — held once on the driver and once per executor for the
    * round. That is ~6% of a 4 GiB executor heap: safe, with margin for
    * the degree cache sharing the region. The choice is made
    * from the exact runtime count, not an estimate; larger peels degrade
    * to a shuffled anti-join, never fail. */
  val KCoreBroadcastMaxRemoved = 4000000L

  def kCoreOf(edges: DataFrame, k: Int, maxRounds: Int = 50): DataFrame = {
    var e = edges.persist()
    var deg: DataFrame = null
    var converged = false
    var rounds = 0
    // rounds counts PEELS; the budget must allow the terminal probe-only
    // round too, so the loop runs while rounds ≤ maxRounds and a peel at
    // rounds == maxRounds is the failure (same contract as before: a graph
    // whose peel depth exceeds the budget fails loudly on both engines).
    // The cache contract is kept LOCAL: on any exception (the
    // non-convergence throw, or a failed round) the live e and deg are
    // unpersisted here rather than leaking to the Verify/Bench cleanup
    // loops (round-14 advice).
    try {
      while (!converged) {
        // node-sized and cached so the convergence probe and the removed
        // list share ONE aggregation over the edge set per round
        deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
        val removed = deg.filter(col("deg") < k).select(col("src"))
        // node-sized probe doubling as the broadcast decision: zero under-k
        // survivors ⇔ fixpoint (empty edge set converges here too: its
        // degree table is empty)
        val nRemoved = removed.count()
        if (nRemoved == 0L) {
          converged = true
          deg.unpersist(blocking = false)
          deg = null
        } else if (rounds >= maxRounds) {
          throw new IllegalStateException(
            s"$k-core peel did not converge within $maxRounds rounds — " +
              "raise maxRounds for this graph's peel depth")
        } else {
          // Explicit broadcast when the measured count provably fits: the
          // static estimate of `removed` inherits the FULL cached degree
          // table's size (no filter stats over a cache), which planned a
          // shuffled anti-join of the whole edge set at 100×, and AQE cannot
          // demote a running big-side stage. The runtime count is exact and
          // already paid for by the probe; past the bound (a measured
          // 256 MB HashedRelation per holder) fall back to the shuffled
          // anti-join rather than risk the driver.
          // fallback past the broadcast bound: shuffled-hash anti-join
          // (build the removed side per partition) — same no-sort argument
          // as [[shj]]; sort-merge would re-sort the edge stream per peel
          val rem = if (nRemoved <= KCoreBroadcastMaxRemoved)
            broadcast(removed) else shj(removed)
          val eNext = e.join(rem, Seq("src"), "left_anti")
            .join(rem.select(col("src").as("dst")), Seq("dst"), "left_anti")
            .persist()
          try eNext.count() // materialize through this round's caches
          catch { case t: Throwable =>
            eNext.unpersist(blocking = false); throw t }
          e.unpersist(blocking = false)
          deg.unpersist(blocking = false)
          deg = null
          e = eNext
          rounds += 1
        }
      }
    } catch { case t: Throwable =>
      e.unpersist(blocking = false)
      if (deg != null) deg.unpersist(blocking = false)
      throw t
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("node"), col("core_deg"))
      .orderBy(col("node"))
  }

  /** [[kCoreOf]] over the symmetrized co-order supplier graph. */
  def kCore(spark: SparkSession, dir: String, k: Int = 20,
      minShared: Int = TriMinShared): DataFrame = {
    val base = coOrderEdges(Tables(spark, dir), minShared)
    kCoreOf(
      base.select(col("s1").as("src"), col("s2").as("dst"))
        .unionByName(base.select(col("s2").as("src"), col("s1").as("dst"))),
      k)
  }

  /** Core threshold and peel-round budget for the oracle-gated trade-graph
    * k-core. The budget is shared BY CONSTRUCTION with the oracle SQL's
    * unrolled peel (GraphRegistry generates one CTE per round from this
    * constant): the peel is monotone, so once converged every further
    * unrolled round is a no-op — the oracle is exact whenever the true peel
    * depth ≤ the budget, and the Spark side passes the same budget as
    * `maxRounds` so a deeper graph FAILS LOUDLY on both engines instead of
    * hash-mismatching. Measured depth on the trade graph is 1 at sf0.001,
    * sf0.01 and sf0.1 (one layer of thin customers peels; supplier degrees
    * sit far above k) — 6 is a 6× margin. */
  val KCoreK = 8
  val KCoreRounds = 6

  /** [[kCoreOf]] over the symmetrized customer–supplier trade graph (the
    * PageRank graph): the "dense trade core" — customers with ≥ k supplier
    * relationships that survive peeling, and the suppliers they sustain. */
  def kCoreTrade(spark: SparkSession, dir: String, k: Int = KCoreK): DataFrame =
    kCoreOf(edges(Tables(spark, dir)), k, maxRounds = KCoreRounds)

  /** Synchronized label propagation over an undirected edge set: every node
    * starts labeled with its own id; each round it adopts the most frequent
    * label among its NEIGHBORS (ties → smallest label). Communities =
    * groups of nodes sharing a final label — the density-sensitive
    * companion to [[ConnectedComponents]] (CC answers "reachable?"; LPA
    * answers "densely knit?", splitting a connected graph at its sparse
    * cuts).
    *
    * `edges` must be symmetrized, no self-loops (the [[labelPropagation]]
    * wrapper handles the co-order graph). The round budget is FIXED, not
    * convergence-detected: synchronized LPA can oscillate between two
    * labelings on bipartite-ish structures, so a fixpoint test may never
    * fire — the standard spelling is a fixed budget with deterministic
    * ties, which also makes the result reproducible by construction.
    *
    * Shape at scale: each round is one equi-join (edge list ⋈ labels on the
    * neighbor id) and two partial-agg shuffles ((node, label) counts, then
    * the per-node argmax via `max_by` — never a window over the adjacency
    * stream). The FIXED round budget also settles the lineage question the
    * same way [[pagerank]]'s unrolled loop does: the whole propagation is one
    * declarative plan whose repeated edge-list subtree canonicalizes into a
    * reused exchange, and a per-round `localCheckpoint` was A/B'd at sf0.1 as
    * ~1.8× SLOWER (5.4 s → 3.0 s median after removal) — materialization per
    * round costs more than it saves at bounded depth. A convergence-driven
    * variant (dynamic rounds) would checkpoint per round exactly as
    * [[ConnectedComponents.minLabel]] and [[kCoreOf]] must. */
  def labelPropagationOf(edges: DataFrame, rounds: Int = 5,
      hashSteps: Boolean = false): DataFrame = {
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      labels = edges
        .join(shj(labels.select(col("node").as("dst"), col("label")), hashSteps),
          Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("src"))
        .agg(max_by(col("label"), struct(col("n"), (-col("label")).as("tb")))
          .as("label"))
        .select(col("src").as("node"), col("label"))
    }
    labels.orderBy(col("node"))
  }

  /** [[labelPropagationOf]] over the symmetrized co-order supplier graph. */
  def labelPropagation(spark: SparkSession, dir: String, rounds: Int = 5,
      minShared: Int = TriMinShared): DataFrame = {
    val t = Tables(spark, dir)
    val base = coOrderEdges(t, minShared)
    labelPropagationOf(
      base.select(col("s1").as("src"), col("s2").as("dst"))
        .unionByName(base.select(col("s2").as("src"), col("s1").as("dst"))),
      rounds, hashSteps = t.bigInputs())
  }

  /** Round budget for the oracle-gated LPA (unrolled in the oracle SQL —
    * generated from this constant, same keep-in-sync-by-construction
    * contract as [[PrIters]]). */
  val LpaRounds = 5

  /** Same-nation trade graph: the customer–supplier trade edges restricted
    * to pairs in the SAME nation — a graph with real community structure
    * (one dense cluster per nation, bridged only through shared suppliers),
    * unlike the full bipartite trade graph, which LPA would collapse to a
    * handful of labels. Node ids use the PageRank parity encoding. */
  // NO stagedBuildConfs here (round-16 measured regression): the
  // same-nation filter shrinks the distinct's input ~25×, so the default
  // 32-partition build never spilled — while 128 coalescing-off partitions
  // landed the SMALL output as 128 tiny files that every LPA round
  // re-scans (q_label_prop 5.5 → 11.3 s, q_lpa_modularity 5.7 → 13.7 s at
  // 100× before this revert).
  private[ops] def nationTradeEdges(t: Tables): DataFrame =
    Staged.viaParquet("nation_trade_edges", t.spark, t.dir) {
    val pairs = shj(t.orders.select(col("o_orderkey"), col("o_custkey")), t.bigInputs())
      .join(t.lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("c_custkey") === col("o_custkey"))
      .join(t.supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("s_suppkey") === col("l_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    pairs.unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
    }

  /** [[labelPropagationOf]] over the same-nation trade graph: communities ≈
    * national trade clusters. */
  def labelPropagationTrade(spark: SparkSession, dir: String,
      rounds: Int = LpaRounds): DataFrame = {
    val t = Tables(spark, dir)
    labelPropagationOf(nationTradeEdges(t), rounds, hashSteps = t.bigInputs())
  }

  /** Newman modularity of the LPA communities over the same-nation trade
    * graph — the quality score that decides whether [[labelPropagationTrade]]'s
    * partition means anything: Q ≈ 0 is no better than random, Q ≳ 0.3 is
    * real community structure. Emitting Q next to the labels is what a
    * community-detection pipeline monitors per run (sync LPA can oscillate;
    * a Q drop flags a bad round budget before anyone consumes the labels).
    *
    * Q = Σ_c [ within_c/D − (deg_c/D)² ] over the DIRECTED edge census
    * (D = 2m): both terms are exact-integer ratios evaluated in double,
    * each community's term truncated to DECIMAL(38,12) so the sum is
    * partition-order-independent (the [[StatsQueries.columnEntropy]]
    * contract).
    *
    * Shape at scale: the label table joins the edge list twice (equi-joins
    * on the node key), one partial-agg shuffle to the ≤#labels community
    * grid, a 1-row broadcast edge total, and a 1-row output. */
  def lpaModularity(spark: SparkSession, dir: String,
      rounds: Int = LpaRounds): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.bigInputs()
    val edges = nationTradeEdges(t)
    val labels = labelPropagationOf(edges, rounds, hashSteps = big)
    val ew = edges
      .join(shj(labels.select(col("node").as("src"), col("label").as("l1")), big),
        Seq("src"))
      .join(shj(labels.select(col("node").as("dst"), col("label").as("l2")), big),
        Seq("dst"))
    val per = ew.groupBy(col("l1").as("label"))
      .agg(count(lit(1)).as("degc"),
        sum(when(col("l1") === col("l2"), 1L).otherwise(0L)).as("withinc"))
    val d = ew.agg(count(lit(1)).as("dd"))
    per.crossJoin(broadcast(d))
      .select(((col("withinc").cast("double") / col("dd").cast("double")) -
        (col("degc").cast("double") / col("dd").cast("double")) *
          (col("degc").cast("double") / col("dd").cast("double")))
        .cast("decimal(38,12)").as("term"), col("dd"))
      .agg(count(lit(1)).as("n_communities"),
        (max(col("dd")) / 2).cast("long").as("n_edges"),
        round(sum(col("term")).cast("double"), 6).as("modularity"))
  }

  /** Fixed-point scale for the resource-allocation link-prediction score:
    * RA(u,v) = Σ_{c ∈ CN(u,v)} 1/deg(c) (Zhou/Lü/Zhang's RA index), summed
    * as `RaScale div deg` integer contributions — the same exact,
    * partition-order-independent discipline as [[PrScale]] PageRank. A
    * double spelling (`SUM(1.0/deg)` or Adamic–Adar's `1/ln deg`) would
    * hash-diverge between engines on both summation order and libm ulps. */
  val RaScale = 1000000000000L

  /** Candidate pairs emitted by [[linkPredict]] (top-k by RA score). */
  val LinkPredTopK = 100

  /** Link prediction over the co-order supplier graph: for every
    * NON-adjacent supplier pair sharing ≥ 1 common neighbor, the
    * common-neighbor count and fixed-point resource-allocation score;
    * top-[[LinkPredTopK]] by score. The "which suppliers should be trading
    * but aren't" recommender primitive.
    *
    * Shape at scale: wedges are enumerated through their CENTER node (one
    * self-equi-join of the symmetrized edge list on the center id), so the
    * pair generator is Σ deg(c)² — bounded here because [[coOrderEdges]]'
    * `minShared` threshold keeps the projection sparse (same arboricity
    * argument as [[triangleCount]]; an unthresholded hub would need the
    * degree-cap treatment [[ConnectedComponents]] documents). One
    * partial-agg shuffle scores the pairs, a broadcast-sized anti-join
    * removes existing edges, and the top-k is TakeOrderedAndProject — a
    * per-partition heap, never a global sort.
    *
    * The thresholded edge set is MATERIALIZED before fan-out (as staged
    * parquet scratch, [[Staged.viaParquet]] via [[coOrderEdges]]): it is
    * referenced three times (sym ×2, anti-join ×1) with DIFFERENT required
    * columns, and Catalyst's column pruning pushes per-consumer projections
    * into the aggregate subtree, so the three references canonicalize
    * differently and exchange reuse never fires — without materialization
    * the expensive order-fanout pair aggregation runs three times (measured
    * 11.6 s → 2.4 s at sf0.1, on the round-10 localCheckpoint spelling;
    * round 15 moved the materialization to parquet files). The edge set
    * itself is sparse by construction (minShared thresholding), so the
    * staged files are metadata-scale at any corpus size. */
  def linkPredict(spark: SparkSession, dir: String,
      minShared: Int = TriMinShared, k: Int = LinkPredTopK): DataFrame = {
    // coOrderEdges is already staged parquet — scans are cheap re-reads
    val e = coOrderEdges(Tables(spark, dir), minShared)
    val sym = e.select(col("s1").as("src"), col("s2").as("dst"))
      .unionByName(e.select(col("s2").as("src"), col("s1").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val wedges = sym.as("a").join(sym.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .select(col("a.src").as("c"), col("a.dst").as("u"), col("b.dst").as("v"))
    wedges.join(deg.select(col("src").as("c"), col("deg")), Seq("c"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"), sum(expr(s"$RaScale div deg")).as("ra_fp"))
      .join(e, col("u") === col("s1") && col("v") === col("s2"), "left_anti")
      .orderBy(col("ra_fp").desc, col("u"), col("v"))
      .limit(k)
  }

  /** Unrolled BFS round budget (the oracle's CTE chain is generated from
    * this constant — keep-in-sync-by-construction, as [[PrIters]]). */
  val BfsRounds = 3

  /** Seed nation for [[bfsFrontier]]: distances are measured from the
    * suppliers of this nation. */
  val BfsSeedNation = 0

  /** [[BfsRounds]]-hop BFS over the trade graph from nation-
    * [[BfsSeedNation]] suppliers: every node within `rounds` hops with its
    * exact hop distance — the bounded-radius reachability primitive
    * (blast-radius, fraud-ring neighborhood, supply-chain exposure).
    *
    * Shape at scale: each round is ONE equi-join (edge list ⋈ current
    * distance set on the source id) plus one partial-agg MIN shuffle —
    * the same Pregel step as [[pagerankOf]], and like it the fixed unrolled
    * budget runs as one declarative plan with the edge-list exchange
    * reused across rounds. The distance set only grows monotonically
    * (min keeps the first-reached hop), so rounds past the true
    * eccentricity are no-ops. A dynamic iterate-to-fixpoint variant would
    * localCheckpoint per round as [[ConnectedComponents.run]] does. */
  def bfsFrontier(spark: SparkSession, dir: String,
      rounds: Int = BfsRounds): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.bigInputs()
    val e = edges(t)
    val seeds = t.supplier.filter(col("s_nationkey") === BfsSeedNation)
      .select((col("s_suppkey") * 2 + 1).as("src")).distinct()
      .join(e.select(col("src")).distinct(), Seq("src"), "left_semi")
      .select(col("src").as("node"), lit(0L).as("dist"))
    var dist = seeds
    for (_ <- 1 to rounds) {
      val next = e.join(shj(dist.select(col("node").as("src"), col("dist")), big),
        Seq("src"))
        .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
      dist = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    }
    // same last-round exchange-canonicalization filter as [[pagerankOf]]:
    // rounds 1..n-1's edge scans carry isnotnull(dst) pushed back through
    // the next round's inner join; the last round's did not, splitting the
    // edge exchange in two at 100×.
    dist.where(col("node").isNotNull).select(col("node"),
        when(col("node") % 2 === 0, lit("cust")).otherwise(lit("supp")).as("kind"),
        col("dist"))
      .orderBy(col("node"))
  }

  /** Fixed HITS iteration count (unrolled in the oracle, same
    * keep-in-sync-by-construction contract as [[PrIters]]). */
  val HitsIters = 2

  /** HITS fixed-point scale. 10⁶ (not PageRank's 10¹²) because each
    * round multiplies a degree-weighted sum by the scale before the
    * normalizing division: post-normalization scores are ≤ 10⁶, a sum
    * over an in-degree-D hub is ≤ D·10⁶, and the re-scale multiply peaks
    * at D·10¹² — BIGINT-safe to D ≈ 9×10⁶. Past that hub envelope the
    * [[pagerankOf]] `decimalSums` escalation applies identically. */
  val HitsScale = 1000000L

  /** Directed customer→supplier order edges (the bipartite half of
    * [[edges]]: no symmetrization — HITS needs the direction). */
  private def orderPairs(t: Tables): DataFrame =
    Staged.viaParquet("order_pairs", t.spark, t.dir) {
      // same gated hash-build shape as [[edges]] — see the note there
      val joined =
        shj(t.orders.select(col("o_orderkey"), col("o_custkey")), t.bigInputs())
        .join(t.lineitem.select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      // single-exchange clustered dedup, same spelling + rationale as
      // [[edges]]: hash(cust) satisfies the dedup's clustering, files
      // land cust-disjoint and sorted for tighter parquet + shuffle
      // compression in both HITS half-step exchanges
      stagedRepartition(joined, t, col("cust"))
        .dropDuplicates("cust", "supp")
        .sortWithinPartitions(col("cust"), col("supp"))
    }

  /** [[HitsIters]] rounds of fixed-point HITS (hubs & authorities) over
    * the directed trade graph — customers are natural hubs (they point),
    * suppliers natural authorities (they are pointed at). Kleinberg's
    * mutual reinforcement: auth(s) = Σ hub(c) over in-edges, hub(c) =
    * Σ auth(s) over out-edges, normalized each half-step.
    *
    * The float formulation L2-normalizes — not reproducible across
    * partitionings (same reason [[pagerankOf]] is integer). Here each
    * half-step max-normalizes in fixed point: x ← x·scale ∕∕ max(x), an
    * integer expression whose max is an exact scalar — bit-identical at
    * any parallelism, and ranking-equivalent to the L2 convention (both
    * are scalar rescalings; the fixed point differs only in the constant).
    *
    * Shape at scale: each half-step is one equi-join (scores ⋈ the edge
    * list) + one partial-agg shuffle keyed by the receiving side, then a
    * 1-row broadcast for the max — the Pregel step again; the edge list's
    * exchange canonicalizes identically across the unrolled rounds, so
    * runtime exchange reuse materializes the pair shuffle once
    * ([[pagerankOf]]'s measured A/B applies). */
  def hitsOf(pairs: DataFrame, iters: Int = HitsIters,
      hashSteps: Boolean = false): DataFrame = {
    var hub = pairs.select(col("cust")).distinct()
      .select(col("cust"), lit(HitsScale).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = pairs.join(shj(hub, hashSteps), Seq("cust"))
        .groupBy(col("supp")).agg(sum(col("h")).as("a"))
      auth = aRaw.crossJoin(broadcast(aRaw.agg(max(col("a")).as("am"))))
        .select(col("supp"), expr(s"a * $HitsScale div am").as("a"))
      val hRaw = pairs.join(shj(auth, hashSteps), Seq("supp"))
        .groupBy(col("cust")).agg(sum(col("a")).as("h"))
      hub = hRaw.crossJoin(broadcast(hRaw.agg(max(col("h")).as("hm"))))
        .select(col("cust"), expr(s"h * $HitsScale div hm").as("h"))
    }
    // same last-half-step exchange-canonicalization filters as
    // [[pagerankOf]]: every non-final half-step's pair scan inherits an
    // isnotnull on its group key from the NEXT half-step's inner join; the
    // final hub and auth half-steps have no next join, so without these
    // their pair exchanges canonicalize differently and lose reuse.
    hub.where(col("cust").isNotNull)
      .select(lit("cust").as("kind"), col("cust").as("node"),
        col("h").as("score"))
      .unionByName(auth.where(col("supp").isNotNull)
        .select(lit("supp").as("kind"),
          col("supp").as("node"), col("a").as("score")))
      .orderBy(col("kind"), col("node"))
  }

  /** [[hitsOf]] over the order trade graph (the registry entry). */
  def hitsTrade(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    hitsOf(orderPairs(t), hashSteps = t.bigInputs())
  }
}
