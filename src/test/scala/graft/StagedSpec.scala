package graft

import org.apache.spark.sql.functions._

import graft.ops.Staged

/** Contract of the process-level prefix staging ([[graft.ops.Staged]]):
  * build-once memoization, row-identity with the inline computation, and
  * survival across the Bench/Verify per-query cleanup (clearCache +
  * unpersist-all-but-pinned) — the property the family amortization
  * depends on. */
class StagedSpec extends SparkSpec {

  private var builds = 0
  private def build() = {
    builds += 1
    spark.range(100).select(col("id"), (col("id") * 3).as("v"))
  }

  test("staged table builds once, returns identical rows thereafter") {
    val n0 = builds
    val a = Staged("spec_probe_a", spark, sf)(build()).collect().map(_.getLong(1)).sorted
    val b = Staged("spec_probe_a", spark, sf)(build()).collect().map(_.getLong(1)).sorted
    builds - n0 shouldBe 1 // second call never evaluates the thunk
    b shouldBe a
    a.toSeq shouldBe (0L until 100L).map(_ * 3)
  }

  test("staged blocks survive the Bench/Verify cleanup cycle") {
    val df = Staged("spec_probe_b", spark, sf)(build())
    df.count() shouldBe 100
    // the exact cleanup Bench/Verify run between queries
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs
      .foreach { case (id, rdd) =>
        if (!Staged.pinned(id)) rdd.unpersist(blocking = false) }
    // the pinned checkpoint must still be materialized (a recompute would
    // re-enter the thunk; the count stays served from pinned blocks)
    val n0 = builds
    Staged("spec_probe_b", spark, sf)(build()).count() shouldBe 100
    builds shouldBe n0
    assert(spark.sparkContext.getPersistentRDDs.keys.exists(Staged.pinned),
      "expected at least one pinned staged RDD to survive cleanup")
  }

  test("nested staged chain (A stages B stages C) survives first-build " +
      "intermediate-unpersist and the cleanup loop between consumers") {
    // The round-8 near-miss: Staged's first-build unpersists every RDD the
    // build persisted along the way (mid -- before). With nesting, the
    // INNER staged tables' localCheckpoints land inside the OUTER build's
    // window; if the filterNot(Staged.pinned) guard were ever dropped, the
    // outer build would destroy them unrecoverably — and the failure only
    // surfaced in full-sweep key order (commit 0825f27). Pin it here.
    var builtB = 0; var builtC = 0
    def stageC() = Staged("spec_nest_c", spark, sf) {
      builtC += 1
      spark.range(50).select(col("id"), (col("id") * 7).as("w"))
    }
    def stageB() = Staged("spec_nest_b", spark, sf) {
      builtB += 1
      stageC().select(col("id"), (col("w") + 1).as("w"))
    }
    val a = Staged("spec_nest_a", spark, sf) {
      stageB().select(col("id"), (col("w") * 2).as("w"))
    }
    a.count() shouldBe 50
    // the exact cleanup Bench/Verify run between consumer queries
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (!Staged.pinned(id)) rdd.unpersist(blocking = false) }
    }
    cleanup()
    // every level of the chain must still be readable from pinned blocks —
    // a destroyed nested checkpoint throws (block lost, lineage truncated),
    // a re-entered thunk bumps the build counters
    val (b0, c0) = (builtB, builtC)
    stageB().agg(sum(col("w"))).collect()(0).getLong(0) shouldBe
      (0L until 50L).map(_ * 7 + 1).sum
    cleanup()
    stageC().agg(sum(col("w"))).collect()(0).getLong(0) shouldBe
      (0L until 50L).map(_ * 7).sum
    cleanup()
    a.count() shouldBe 50
    builtB shouldBe b0
    builtC shouldBe c0
  }

  test("staging is keyed by dir: different dirs build separately") {
    val n0 = builds
    Staged("spec_probe_c", spark, sf)(build()).count()
    Staged("spec_probe_c", spark, "/tmp")(build()).count()
    builds - n0 shouldBe 2
  }
}
