package graft

import graft.ops.VectorQueries
import graft.ops.VectorQueries.EmbeddingLsh

/** The embedding-LSH sizing knob (round-3 VERDICT #5): `geometryFor` is the
  * production dial, `CorpusSizeConf` wires it into the query path, and the
  * bucket-stats monitor proves the default geometry is cap-clean at bench
  * scale. */
class LshGeometrySpec extends SparkSpec {

  test("geometryFor pins the worked examples from the scaladoc") {
    // n = 10⁹, cap 1000, cos ≥ 0.95, recall 0.95 — the worked example
    EmbeddingLsh.geometryFor(1000000000L) shouldBe ((30, 22))
    // n = 10⁶ → 2^12 buckets keep E[bucket] ≈ 244 < cap; 10 bands for recall
    EmbeddingLsh.geometryFor(1000000L) shouldBe ((10, 12))
    // small-n regime: bits floors at 8, bands at the recall-derived 6 —
    // one band fewer than the fixed 8×8 default, which stays deliberately
    // conservative (extra recall) for unset-knob sessions
    EmbeddingLsh.geometryFor(500L) shouldBe ((6, 8))
    EmbeddingLsh.geometryFor(1L) shouldBe ((6, 8))
  }

  test("CorpusSizeConf drives the planned band count through the query path") {
    spark.conf.set(EmbeddingLsh.CorpusSizeConf, "1000000")
    try {
      EmbeddingLsh.geometry(spark, sf) shouldBe ((10, 12))
      // one row per band in the census — the 12-bit/10-band geometry is what
      // the public query actually plans, not just what geometryFor returns
      val rows = VectorQueries.lshBucketStats(spark, sf).collect()
      rows.length shouldBe 10
      rows.map(_.getLong(0)).sorted.toSeq shouldBe (0L until 10L)
    } finally spark.conf.unset(EmbeddingLsh.CorpusSizeConf)
  }

  test("default geometry skips no buckets at sf0.1 (recall monitor clean)") {
    val rows = VectorQueries.lshBucketStats(spark, "/root/testdata/sf0.1").collect()
    rows.length shouldBe EmbeddingLsh.Bands
    rows.map(_.getLong(3)).sum shouldBe 0L // n_skipped
  }

  test("geometry auto-sizes from the measured corpus count above the " +
      "threshold and keeps the defaults below it (round-10)") {
    // below AutoThreshold: defaults, so the static oracle geometry holds
    EmbeddingLsh.geometry(spark, sf) shouldBe
      ((EmbeddingLsh.Bands, EmbeddingLsh.BitsPerBand))
    // the MEASURED-count branch itself (no conf set): seed the cached
    // count past the threshold and the geometry must flip to
    // geometryFor(n) — the 100× full-sweep failure mode (200 k vectors
    // under the 8×8 defaults → ~780-vector buckets → ~6×10⁸ candidate
    // pairs) is exactly what this branch prevents
    EmbeddingLsh.geometryFor(200000L) shouldBe ((8, 10))
    VectorQueries.withCorpusCount(sf, 200000L) {
      EmbeddingLsh.geometry(spark, sf) shouldBe ((8, 10))
    }
    // back on the real (small) corpus: defaults again
    EmbeddingLsh.geometry(spark, sf) shouldBe
      ((EmbeddingLsh.Bands, EmbeddingLsh.BitsPerBand))
    // and the conf override wins over any measured count
    val conf = EmbeddingLsh.CorpusSizeConf
    spark.conf.set(conf, "200000")
    try EmbeddingLsh.geometry(spark, sf) shouldBe ((8, 10))
    finally spark.conf.unset(conf)
  }
}
