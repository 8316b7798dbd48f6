package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session so the first timed query measures the query, not JVM
    // startup. The range/parquet pass warms the basics, but the heavy paths
    // (digest kernels, LSH banding, broadcast + window exec) JIT lazily —
    // measured ~6-7 s absorbed by whichever query ran first before the
    // representative sf0.001 warmup runs below were added.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val warmDir = "/root/testdata/sf0.001"
    Seq("q_minhash_lsh", "q_dedup_embedding", "q_join_broadcast", "q_window_rank",
        "q_curation_cc")
      .foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
    spark.sharedState.cacheManager.clearCache()
    // Local-iteration filter: SPARK_GRAFT_ONLY=q_a,q_b times just those.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // Deterministic order in only-mode so A/B hotspot comparisons aren't
    // confounded by hash-map iteration putting a different query first
    // (the first query absorbs residual JIT/codegen warmup).
    val selected: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      SparkEntry.queries
        .filter { case (n, _) => only.isEmpty || only(n) }
        .toSeq.sortBy(_._1)
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      // Signature-table persists (dedup/vector queries) are per-plan and
      // never unpersisted by the builders; drop them between queries so the
      // 60+-query run doesn't accumulate cached partitions.
      spark.sharedState.cacheManager.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
