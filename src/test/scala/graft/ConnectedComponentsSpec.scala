package graft

import org.apache.spark.sql.functions._
import graft.ops.{ConnectedComponents, CurationQueries}

/** Unit contract for the large-star/small-star CC operator: min-label
  * mapping on known graphs, log-round convergence on a long chain, and the
  * curation-CC invariants vs the greedy pipeline. */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ConnectedComponents.minLabel(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
  }

  test("chain, triangle, pair, self-loop: min-label per component") {
    val got = cc(Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),          // chain 1-2-3-4
      (10L, 11L), (11L, 12L), (12L, 10L),    // triangle
      (21L, 20L),                            // pair
      (30L, 30L)))                           // self-loop only: no real edge
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
  }

  test("a 64-node chain converges within the logarithmic round bound") {
    // O(diameter) label propagation would need 64 rounds; large/small-star
    // must finish inside the default maxRounds = 25 ≈ 2·log₂(n).
    val edges = (1L until 64L).map(i => (i, i + 1))
    val got = cc(edges)
    got.keySet shouldBe (1L to 64L).toSet
    got.values.toSet shouldBe Set(1L)
  }

  test("empty and single-edge graphs") {
    cc(Seq.empty) shouldBe Map.empty
    cc(Seq((7L, 3L))) shouldBe Map(3L -> 3L, 7L -> 3L)
  }

  test("curation CC labels are a consistent refinement of the greedy rule") {
    val greedySurvivors = CurationQueries.curate(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ccRows = CurationQueries.curateCC(spark, sf)
      .select("doc_id", "comp", "csize").collect()
    // representative is the component's min id; sizes match the grouping
    ccRows.foreach { r => r.getLong(1) should be <= r.getLong(0) }
    ccRows.groupBy(_.getLong(1)).foreach { case (comp, rows) =>
      rows.map(_.getLong(2)).toSet shouldBe Set(rows.length.toLong)
      rows.map(_.getLong(0)).min shouldBe comp
    }
    // Greedy drops each pair's higher id, so every non-representative member
    // of a multi-doc cluster has a smaller near-dup neighbor somewhere in
    // the cluster; the set of docs greedy DROPS at the near-dup stage is a
    // subset of the docs CC marks as non-representatives. Observable here
    // as: greedy's output never contains a doc outside the uniq universe,
    // and CC never shrinks below one rep per cluster.
    val allUniq = ccRows.map(_.getLong(0)).toSet
    (greedySurvivors -- allUniq) shouldBe Set.empty
    val reps = ccRows.filter(r => r.getLong(0) == r.getLong(1)).map(_.getLong(0)).toSet
    reps.size shouldBe ccRows.map(_.getLong(1)).toSet.size
    spark.sharedState.cacheManager.clearCache()
  }
}
