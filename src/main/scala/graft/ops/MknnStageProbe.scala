package graft.ops

import org.apache.spark.sql.SparkSession

import graft.{GraftExtensions, GraftSession}

/** Stage-attribution probe for the mutual-kNN / embedding-pair plan at
  * blown-up scale: times successive prefixes of the SAME plan so the cost of
  * each pair-volume stage is a subtraction, not a guess.
  *
  *   join_score   — banded self-join + inline cosine, NO distinct
  *   plus_distinct — the above through the `(vec_a, vec_b)` distinct
  *   mutual_knn   — the full query (window top-k + mutuality join)
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.ops.MknnStageProbe <dir>"`.
  * One JSON line per timing on stdout; `[probe]` progress on stderr. The
  * probe exists because the 100× record (`tools/bench_100x_r14.json`,
  * `q_mutual_knn` isolated 1276.6 s) cannot say WHICH of the three
  * pair-volume stages to optimize — shuffle-eliminating work (min-band
  * emission, bounded-heap top-k) should chase the measured stage, not the
  * most theoretically pleasing one. */
object MknnStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(GraftSession.withMaster(
      SparkSession.builder().config("spark.sql.shuffle.partitions", cpus),
      s"local[$cpus]")).getOrCreate()
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    def clean(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!Staged.pinned(id)) rdd.unpersist(blocking = false) }
    }
    // Warm the JVM on the 1x dir sibling so the first timed stage doesn't
    // absorb codegen/parquet JIT.
    try VectorQueries.mutualKnn(spark, new java.io.File(dir).getParent + "/sf0.001").count()
    catch { case t: Throwable => System.err.println(s"[probe] warmup skipped: ${t.getMessage}") }
    clean()
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] $name $sec%.1f s ($n rows)")
      println(s"""{"stage":"$name","sec":${math.rint(sec * 100) / 100},"rows":$n,"dir":"$dir"}""")
      clean()
    }
    time("join_score") {
      VectorQueries.scoredEmbeddingPairs(spark, dir).count()
    }
    time("plus_distinct") {
      VectorQueries.embeddingPairs(spark, dir, minCos = -1.0).count()
    }
    time("mutual_knn") {
      VectorQueries.mutualKnn(spark, dir).count()
    }
    spark.stop()
  }
}
