package graft.ops

import org.apache.spark.sql.SparkSession

import graft.{GraftExtensions, GraftSession}

/** Stage-attribution probe for the mutual-kNN / embedding-pair plan at
  * blown-up scale: times successive prefixes of the SAME plan so the cost of
  * each pair-volume stage is a subtraction, not a guess.
  *
  * Current form — a CONTROLLED interleaved A/B, two rounds of:
  *
  *   ctrl_join_score — the exactly-once candidate stream alone (regime
  *                     control; its drift calibrates the other readings)
  *   window_nockpt   — the r13/r14-committed shape: window top-k, plan
  *                     referenced twice by the mutuality self-join
  *   window_ckpt     — window top-k + localCheckpoint (SHIPPED shape)
  *   agg_ckpt        — graft_topk_pairs aggregate + localCheckpoint
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.ops.MknnStageProbe <dir>"`.
  * One JSON line per timing on stdout; `[probe]` progress on stderr. The
  * probe exists because cross-process wall clocks were uninterpretable
  * under the degraded-box episode (1.5–4× swings) — only same-JVM
  * interleaved deltas with a shared control settled the round-14 window-vs-
  * aggregate decision (window+ckpt 77–115 s vs agg+ckpt 480–502 s at 100×;
  * see TopKPairs' scaladoc for the mechanism). An earlier form of this
  * probe timed plan PREFIXES (join / +distinct / full), which is what
  * attributed ~90% of the pre-round-14 wall to the top-k machinery. */
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
    import org.apache.spark.sql.functions._
    // The r13/r14-committed window spelling, reconstructed inline so the
    // two top-k strategies can be A/B'd in ONE process with a shared
    // control — the degraded-box episode swings cross-process readings by
    // 1.5–4×, so only interleaved same-JVM deltas are interpretable.
    def windowMutualKnn(ckpt: Boolean) = {
      import org.apache.spark.sql.expressions.Window
      val und = VectorQueries.embeddingPairs(spark, dir, minCos = -1.0)
      val directed = und.select(col("vec_a").as("src"), col("vec_b").as("dst"), col("cos_sim"))
        .union(und.select(col("vec_b").as("src"), col("vec_a").as("dst"), col("cos_sim")))
      val w = Window.partitionBy(col("src")).orderBy(col("cos_sim").desc, col("dst"))
      val knn0 = directed
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= VectorQueries.MutualK)
      val knn = if (ckpt) knn0.localCheckpoint() else knn0
      knn.as("f")
        .join(knn.select(col("src").as("dst"), col("dst").as("src"),
          col("rn").as("rn_rev")).as("r"), Seq("src", "dst"))
        .filter(col("src") < col("dst"))
        .select(col("src").as("vec_a"), col("dst").as("vec_b"),
          col("cos_sim"), col("rn").as("rank_a"), col("rn_rev").as("rank_b"))
    }
    (1 to 2).foreach { round =>
      time(s"r$round.ctrl_join_score") {
        VectorQueries.scoredEmbeddingPairs(spark, dir).count()
      }
      time(s"r$round.window_nockpt") { windowMutualKnn(ckpt = false).count() }
      time(s"r$round.window_ckpt") { windowMutualKnn(ckpt = true).count() }
      time(s"r$round.agg_ckpt") { VectorQueries.mutualKnn(spark, dir).count() }
    }
    spark.stop()
  }
}
