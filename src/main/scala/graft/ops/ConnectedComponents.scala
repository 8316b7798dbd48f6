package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list, via the
  * alternating large-star / small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC '14) — the standard
  * relational CC that converges in O(log n) rounds instead of O(diameter).
  *
  * Each round is pure `groupBy` + `join` on the edge endpoints: a per-node
  * `min` (partial-aggregated map-side) followed by an equi-join back to the
  * edges. No collected neighbor arrays, no vertex-side state, no driver
  * data — the only driver decision is the convergence test (an `isEmpty` on
  * the symmetric difference), so the rounds scale like any shuffle join. At
  * 100 TB the round count stays logarithmic and per-round skew is bounded
  * upstream: candidate edges come from bucket-capped LSH bands, so max
  * degree ≤ bands × (bucket cap − 1) by construction.
  *
  * The fixpoint is a min-rooted star forest — every non-root vertex holds
  * exactly the edge (v, root) — which makes the result DETERMINISTIC (the
  * component label is the component's minimum id, independent of partition
  * order and round count), and therefore oracle-checkable against a
  * recursive-CTE reachability query (CurationRegistry `q_curation_cc`).
  *
  * North-star context: this replaces the greedy keep-lowest near-dup rule
  * (CurationQueries stage 3), which keeps every LOCAL minimum of the
  * candidate graph; true CC keeps only the GLOBAL minimum per cluster —
  * strictly stronger dedup, and the grouping a curation pipeline needs to
  * pick one representative per duplicate cluster. */
object ConnectedComponents {

  /** One large-star round: every node connects each LARGER neighbor to the
    * minimum of its closed neighborhood. */
  private def largeStar(e: DataFrame): DataFrame = {
    val bi = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    val mins = bi.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    bi.join(mins, "u").where(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
      .where(col("a") =!= col("b")).distinct()
  }

  /** (row count, order-independent xor of per-row xxhash64) of an (a, b)
    * edge frame — one partial-agg job, used as the cheap per-round
    * convergence probe in [[minLabel]]. */
  private def fingerprint(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("a"), col("b")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** One small-star round: every node connects its smaller neighbors (and
    * itself) to the minimum of that set. */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("a"), col("b")).as("u"),
      least(col("a"), col("b")).as("v"))
    val mins = oriented.groupBy("u").agg(min("v").as("m"))
    oriented.join(mins, "u").select(col("v").as("a"), col("m").as("b"))
      .unionByName(mins.select(col("u").as("a"), col("m").as("b")))
      .where(col("a") =!= col("b")).distinct()
  }

  /** Min-label component mapping for every vertex appearing in `edges`
    * (columns `a`, `b`; self-loops and duplicates tolerated): returns
    * `(id, comp)` where `comp` is the smallest id in the vertex's component
    * — roots included, mapped to themselves. Vertices with no edges are the
    * caller's to add (`coalesce(comp, id)` after a left join).
    *
    * Every round `localCheckpoint`s its edge set: each star op references
    * the previous round's frame four times, so without lineage truncation
    * the logical plan grows ~16× per round — exponential analysis cost long
    * before any data problem. Local checkpoints trade executor-loss
    * recovery for speed; on a real cluster where a lost executor must not
    * kill a multi-hour CC job, set `spark.sparkContext.setCheckpointDir`
    * and swap in reliable `.checkpoint()` — same algorithm, same plans.
    * `maxRounds` is a safety bound ≈ 2·log₂(n) at any plausible n;
    * convergence is checked every round. */
  def minLabel(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    var e = edges.select(col("a"), col("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint()
    var (eCount, eFp) = fingerprint(e)
    var converged = eCount == 0L
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      // Convergence test in ONE cheap partial-agg job per round: (count,
      // order-independent xor fingerprint). Unequal → provably not converged
      // and the expensive exceptAll is skipped; equal → one exceptAll
      // CONFIRMS set equality (both sides are distinct'd, so equal count +
      // empty one-directional difference is full equality — a fingerprint
      // collision merely costs that one extra exceptAll, never correctness).
      // The former symmetric exceptAll pair ran every round; this runs a
      // scan-agg every round and exceptAll exactly once, at the fixpoint.
      val (nextCount, nextFp) = fingerprint(next)
      converged = nextCount == eCount && nextFp == eFp &&
        next.exceptAll(e).isEmpty
      e = next
      eCount = nextCount
      eFp = nextFp
      rounds += 1
    }
    // Round-3 review: exiting non-converged would silently extract an
    // inconsistent mapping from a non-star-forest edge set (a vertex could
    // map to multiple components) — fail loudly instead. 25 rounds covers
    // any plausible n (rounds ≈ 2·log₂ n); a caller with a pathological
    // graph raises maxRounds explicitly rather than getting wrong answers.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxRounds " +
          "large/small-star rounds; the edge set is not a star forest — " +
          "raise maxRounds (≈ 2·log₂(vertex count)) for this graph")
    // Converged: a star forest. Non-roots carry (v, root); roots are the
    // b-side ids that never appear on the a-side.
    val nonRoots = e.select(col("a").as("id"), col("b").as("comp"))
    val roots = e.select(col("b").as("id")).distinct()
      .join(e.select(col("a").as("id")).distinct(), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    nonRoots.unionByName(roots)
  }
}
