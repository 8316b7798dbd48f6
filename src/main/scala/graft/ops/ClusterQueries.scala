package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import VectorQueries.{cosine, dot, emb}

/** Embedding-space clustering operators for corpus curation — the k-means
  * family (Lloyd refinement) and cluster-scoped semantic dedup (the SemDeDup
  * shape: Abbas et al., "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", arXiv:2303.09540 — public paper). The
  * reference (an IoT stream job) has none of these; they are north-star
  * extensions for the LLM-data pipeline, designed Spark-first:
  *
  *   - **Assignment** is an argmax over a `broadcast` centroid table via a
  *     map-side-combinable `max_by` partial aggregate — one narrow pass over
  *     the corpus, one partial-agg shuffle row per vector, k·cost(dot) CPU
  *     per vector. k is driver metadata (10²–10⁵ centroids), never shuffled.
  *   - **The M-step** ([[kmeansRefine]]) is a (cluster, dim) partial agg with
  *     DECIMAL(38,12)-exact componentwise sums — a parallel double sum is
  *     partition-order-dependent, and k-means iteration amplifies any
  *     nondeterminism into different assignments, so the means must be exact
  *     to reproduce across cluster sizes (and to match the DuckDB oracle
  *     bit-for-bit).
  *   - **SemDeDup** ([[semDedup]]) does pairwise cosine ONLY within a
  *     cluster: k scales with n (the paper uses ~10⁵ clusters for web scale)
  *     so cluster sizes stay bounded and the within-cluster self-join is
  *     O(n · avg_cluster_size), never O(n²). The cluster id is the shuffle
  *     key; a degenerate cluster (skew) is visible as a slow task and fixed
  *     by raising k — the same observable-skew posture as the LSH bucket cap.
  *
  * Determinism contract (shared with [[VectorRegistry]]'s oracle spelling):
  * all dots are the same left-fold `graft_dot` kernel, ties in argmax break
  * on the lowest centroid id, and every emitted double is rounded once. */
object ClusterQueries {

  /** Demo centroid count (centroids = vectors 0..k-1, deterministically
    * seeded so the oracle can replay them). Production k tracks corpus size:
    * n / k ≈ target cluster size (10³–10⁴ vectors). */
  val KmeansK = 8

  /** Demo SemDeDup cosine threshold. The testdata corpus is random unit
    * vectors (max pairwise cos ≈ 0.5), so the demo threshold sits low to
    * exercise the drop path; a production run uses 0.9+ on model
    * embeddings where near-dups concentrate. Shared with the oracle. */
  val SemDedupTau = 0.25

  /** Hard ceiling on cluster size for [[semDedup]]'s within-cluster pair
    * join — the one quadratic risk in this family. A cluster of m vectors
    * contributes m²/2 pairs, so a runaway cluster (k undersized for the
    * corpus, or a degenerate embedding space) silently turns the linear
    * plan quadratic; above this cap the query ABORTS with instructions to
    * raise k, instead of grinding — the same fail-loudly posture as the
    * n-gram Jaccard exactness guard, chosen over cap-and-skip because a
    * skipped cluster here would silently pass duplicates through a DEDUP
    * step (the LSH bucket cap can skip because its monitor
    * `q_lsh_bucket_stats` makes the recall loss observable; dedup
    * correctness can't be a monitoring concern). [[clusterStats]]
    * (`q_cluster_stats`) is the sizing monitor to watch BEFORE the cap
    * trips. 10⁴ vectors ⇒ ≤ 5·10⁷ pairs per cluster — an easy task. */
  val SemDedupClusterCap = 10000

  /** The ONE auto-k rule, shared by the engine ([[resolveK]]) and the
    * oracle side ([[oracleK]]): a retune applied to one but not the other
    * would desync the engine's k from the oracle SQL's seed count and fail
    * q_semdedup as an opaque row-hash mismatch at the next blown-up-scale
    * sweep (round-12 review). */
  private def autoK(n: Long, cap: Int): Int =
    math.max(KmeansK, math.ceil(n / (cap / 4.0)).toInt)

  /** Auto-k for [[semDedup]] (k ≤ 0 means "size it for me"): target
    * clusters of ~cap/4 vectors — comfortably under the abort cap with
    * headroom for imbalance — from the corpus's measured vector count
    * (cached zero-column scan), never below [[KmeansK]]. The same
    * measure-then-encode pattern as LSH auto-geometry: the round-10 100×
    * full-sweep probe tripped the cluster-cap guard exactly as designed
    * ("raise k"), and this makes the raise self-applying. At test scale
    * (n ≤ [[KmeansK]] · cap/4 = 20 k) it resolves to [[KmeansK]], so the
    * static oracle is k-stable. An EXPLICIT k still wins — the guard still
    * aborts if a caller undersizes it. */
  private def resolveK(spark: SparkSession, dir: String, k: Int, cap: Int): Int =
    if (k > 0) k
    else {
      // the pinned corpus-size conf drives auto-k the same way it drives
      // LSH geometry (one sizing knob, every auto-sizer) — else the
      // cached measured count
      val n = VectorQueries.EmbeddingLsh.pinnedCorpus(spark)
        .getOrElse(VectorQueries.corpusSize(spark, dir))
      val auto = autoK(n, cap)
      // the flip is a deliberate result change on corpus growth (cluster
      // ids and keep/drop decisions shift with k, as they must) — say so
      // once instead of changing silently (round-10 review)
      if (auto != KmeansK && !loggedAutoK.getAndSet(true))
        System.err.println(s"[graft-semdedup] auto k=$auto for $n vectors " +
          s"(target cluster ~${cap / 4}; pass k explicitly to pin)")
      auto
    }
  private val loggedAutoK = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** k the ORACLE SQL renders q_semdedup's seed centroids with: auto-k of
    * [[VectorQueries.EmbeddingLsh.oracleCorpus]] when the blown-up-scale
    * oracle sweep pins a corpus count (same rule as [[resolveK]] under the
    * pinned conf), else [[KmeansK]] — the auto answer at test scale. */
  def oracleK(cap: Int = SemDedupClusterCap): Int =
    VectorQueries.EmbeddingLsh.oracleCorpus
      .map(autoK(_, cap))
      .getOrElse(KmeansK)

  /** E-step: every vector of `vectors` (vec_id, e) argmax-cosine-assigned
    * to its nearest centroid in `cents` (cluster, ce) → (vec_id, e,
    * cluster). The `max_by` ordering struct (cos, -cluster) reproduces the
    * oracle's `ORDER BY cos DESC, cluster` tie-break. `cents` is always
    * driver-scale metadata (10²–10⁵ rows), hence the explicit broadcast.
    *
    * The argmax aggregates SCALARS ONLY and joins `e` back afterwards
    * (round-17, from a 100× stage profile): any `max_by` whose value or
    * ordering is non-fixed-width plans as SortAggregate — HashAggregate
    * needs mutable fixed-width buffer slots — and the old spelling carried
    * the embedding array in the `max_by` payload, so the physical plan
    * SORTED the entire k×-exploded cross-join stream with ~600 B of vector
    * on every row (q_semdedup: 8.4 GB memory spill in a stage that emits
    * one 40 B row per vector). Slimming the agg row to (vec_id, cluster,
    * cs, tb) still plans SortAggregate (struct ordering), but the sort data
    * shrinks ~15× and the spill disappears; the vectors ride ONE explicit
    * hash(vec_id) exchange that the agg's clustering AND the e-recovery
    * join both reuse (ReusedExchange — no second shuffle). Measured 100×
    * A/B in BASELINE round-17; q_kmeans_refine and the Lloyd loop share
    * this E-step. */
  private def assignTo(vectors: DataFrame, cents: DataFrame): DataFrame = {
    val v = vectors.repartition(
      vectors.sparkSession.sparkContext.defaultParallelism, col("vec_id"))
    val win = v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cluster"),
        cosine(col("e"), col("ce")).as("cs"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cluster"),
        struct(col("cs"), (-col("cluster")).as("tb"))).as("cluster"))
    win.join(v, Seq("vec_id"))
      .select(col("vec_id"), col("e"), col("cluster"))
  }

  /** M-step: exact per-(cluster, dim) DECIMAL(38,12) means over an
    * assignment frame (vec_id, e, cluster), reassembled into centroid
    * vectors (cluster, ce) via a dim-ordered struct sort (deterministic;
    * dim count is the embedding width, so collect_list stays tiny). A
    * cluster that loses all members simply disappears — the standard Lloyd
    * empty-cluster behavior. */
  private def mStep(assign: DataFrame): DataFrame =
    assign.select(col("cluster"), posexplode(col("e")))
      .groupBy(col("cluster"), col("pos"))
      .agg((sum(col("col").cast("decimal(38,12)")).cast("double") / count(lit(1)))
        .as("c"))
      .groupBy(col("cluster"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)")
        .as("ce"))

  /** Seed centroids: vectors 0..k-1 (deterministic, oracle-replayable). */
  private def seedCents(spark: SparkSession, dir: String, k: Int): DataFrame =
    emb(spark, dir).filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster"), col("e").as("ce"))

  /** (vec_id, cluster, e): assignment to the `k` seed centroids. */
  private def assigned(spark: SparkSession, dir: String, k: Int): DataFrame =
    assignTo(emb(spark, dir).select(col("vec_id"), col("e")),
      seedCents(spark, dir, k))

  /** One Lloyd refinement: assign to the k seed centroids, recompute each
    * centroid as the exact componentwise mean of its members, re-assign.
    * Output: per vector, the seed-round cluster, the refined-round cluster,
    * and the cosine to its refined centroid — the convergence signal a
    * pipeline monitors (movers per round → stop).
    *
    * Iterating to convergence is this plan in a loop (persist the
    * assignment, loop on the mover count — same driver-iteration pattern as
    * [[ConnectedComponents]]); one refinement keeps the DuckDB oracle a
    * finite CTE chain while exercising both halves (E-step + M-step) of the
    * iteration body. */
  def kmeansRefine(spark: SparkSession, dir: String, k: Int = KmeansK): DataFrame = {
    val a0 = assigned(spark, dir, k)
    val cents1 = mStep(a0).select(col("cluster").as("cluster1"), col("ce"))
    a0.crossJoin(broadcast(cents1))
      .select(col("vec_id"), col("cluster"), col("cluster1"),
        cosine(col("e"), col("ce")).as("cs"))
      .groupBy(col("vec_id"), col("cluster"))
      .agg(max_by(struct(col("cluster1"), col("cs")),
        struct(col("cs"), (-col("cluster1")).as("tb"))).as("m"))
      .select(col("vec_id"), col("cluster").as("cluster0"),
        col("m.cluster1").as("cluster1"), round(col("m.cs"), 6).as("cos_c1"))
      .orderBy(col("vec_id"))
  }

  /** Result of [[kmeans]]: final assignments (vec_id, cluster), final
    * centroids (cluster, ce), Lloyd rounds run, and whether the fixpoint
    * was reached within the round budget. */
  final case class KmeansResult(assignments: DataFrame, centroids: DataFrame,
    iters: Int, converged: Boolean)

  /** Full Lloyd iteration to fixpoint (zero movers) — the production
    * clustering behind [[semDedup]]'s cluster map, run with the same
    * driver-iteration pattern as [[ConnectedComponents]]: the per-round
    * plans are pure E-step ([[assignTo]]) / M-step ([[mStep]]) dataflows,
    * the driver only counts movers (one scalar per round) and decides
    * whether to loop, and `localCheckpoint` truncates lineage each round so
    * round N's plan doesn't replay rounds 1..N-1.
    *
    * Per round: one narrow pass over the vectors against broadcast
    * centroids (E), one (cluster, dim)-keyed partial agg (M), one mover
    * count (vec_id-keyed join of two checkpointed assignment frames). At
    * 100 TB with k ~ 10⁵: centroids stay driver metadata, the E-step stays
    * shuffle-free except the per-vector argmax partial agg, and rounds are
    * O(log)-ish in practice (k-means converges fast to near-stable
    * assignments; `maxIters` bounds the tail). Deterministic end to end:
    * exact decimal means + fixed tie-breaks ⇒ the same fixpoint on every
    * run and every cluster size. */
  def kmeans(spark: SparkSession, dir: String, k: Int = KmeansK,
      maxIters: Int = 25): KmeansResult = {
    val e = emb(spark, dir).select(col("vec_id"), col("e")).persist()
    var assign = assignTo(e, seedCents(spark, dir, k)).localCheckpoint()
    var cents: DataFrame = null
    var iters = 1
    var moved = -1L
    while (moved != 0L && iters < maxIters) {
      cents = mStep(assign)
      val next = assignTo(e, cents).localCheckpoint()
      moved = next.select(col("vec_id"), col("cluster").as("c1"))
        .join(assign.select(col("vec_id"), col("cluster").as("c0")), Seq("vec_id"))
        .filter(col("c0") =!= col("c1")).count()
      assign = next
      iters += 1
    }
    e.unpersist()
    KmeansResult(assign.select(col("vec_id"), col("cluster")),
      if (cents == null) seedCents(spark, dir, k) else cents,
      iters, moved == 0L)
  }

  /** Cluster-scoped semantic dedup (SemDeDup): within each cluster, a vector
    * is dropped iff some LOWER-id cluster-mate sits within cosine ≥ `tau`
    * (the lowest id of each near-dup group survives — deterministic, no
    * iteration). Output: every vector with its cluster and a 0/1 `keep`.
    *
    * The within-cluster self-join is the whole trick: pairwise cosine never
    * crosses cluster boundaries, so with k sized to hold clusters at ~10⁴
    * vectors the candidate volume is linear in n. Norms are computed once
    * per vector (not per pair), same as [[VectorQueries.embeddingPairs]]. */
  def semDedup(spark: SparkSession, dir: String, k: Int = -1,
      tau: Double = SemDedupTau, cap: Int = SemDedupClusterCap): DataFrame = {
    val raw = assigned(spark, dir, resolveK(spark, dir, k, cap))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    // Oversized-cluster guard: computed on the per-cluster frame (k rows,
    // one evaluation per cluster) and joined back on the shuffle key the
    // pair join needs anyway, so the guard rides for free.
    val sizes = raw.groupBy(col("cluster")).agg(count(lit(1)).as("csz"))
      .withColumn("csz",
        when(col("csz") <= cap, col("csz"))
          .otherwise(raise_error(concat(
            lit(s"semDedup cluster cap ($cap) exceeded: cluster "),
            col("cluster"), lit(" holds "), col("csz"),
            lit(" vectors - raise k (see ClusterQueries.clusterStats)")))))
    // the csz >= 1 filter is tautological for a count but NOT provable by
    // Catalyst, so it pins the guarded column against projection pruning
    // (a bare select(cluster) would optimize the raise_error away)
    val a = raw.join(broadcast(sizes), Seq("cluster"))
      .filter(col("csz") >= 1).drop("csz")
      .persist() // feeds both sides of the pair join + the output frame
    val lo = a.select(col("cluster"), col("vec_id").as("vec_a"),
      col("e").as("ea"), col("nrm").as("na"))
    val hi = a.select(col("cluster"), col("vec_id").as("vec_b"),
      col("e").as("eb"), col("nrm").as("nb"))
    val dropped = lo.join(hi, Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
        >= lit(tau))
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("is_dup", lit(1L))
    a.select(col("vec_id"), col("cluster"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        when(col("is_dup").isNull, 1L).otherwise(0L).as("keep"))
      .orderBy(col("vec_id"))
  }

  /** Per-cluster census for the seed assignment — size, the pair volume the
    * cluster contributes to [[semDedup]] (m·(m−1)/2), and headroom to the
    * [[SemDedupClusterCap]]. This is the sizing monitor a production
    * pipeline alerts on BEFORE the cap guard aborts a run (growing max
    * cluster size means k is falling behind corpus growth) — same role
    * [[VectorQueries.lshBucketStats]] plays for the LSH geometry. */
  def clusterStats(spark: SparkSession, dir: String, k: Int = -1,
      cap: Int = SemDedupClusterCap): DataFrame =
    // default k auto-resolves IDENTICALLY to semDedup's (round-10 review:
    // the cap-abort message points here, so the monitor must report the
    // clustering semDedup actually runs, not the fixed seed count) — and
    // `cap` is the same parameter semDedup takes, so a caller running a
    // custom cap monitors the headroom against THAT cap, not the default
    assigned(spark, dir, resolveK(spark, dir, k, cap))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"))
      .select(col("cluster"), col("n_vecs"),
        (col("n_vecs") * (col("n_vecs") - 1) / 2).cast("long").as("n_pairs"),
        (lit(cap.toLong) - col("n_vecs")).as("cap_headroom"))
      .orderBy(col("cluster"))
}
