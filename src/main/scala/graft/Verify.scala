package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(GraftSession.withMaster(
      SparkSession.builder()
        .config("spark.sql.shuffle.partitions", cpus),
      s"local[$cpus]"))
      .getOrCreate()
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    // The DuckDB oracles bake EmbeddingLsh geometry at object construction
    // — the fixed defaults, or geometryFor(SPARK_GRAFT_ORACLE_CORPUS) when
    // a blown-up-scale oracle sweep pins a corpus count (round-12). Keep
    // the engine in lock-step: pin the conf from the SAME env var, and
    // fail on a conf the oracle side doesn't know about (a leaked conf
    // would re-plan the Spark side of the vector/multimodal queries and
    // produce opaque hash mismatches).
    ops.VectorQueries.EmbeddingLsh.oracleCorpus match {
      case Some(n) =>
        spark.conf.set(ops.VectorQueries.EmbeddingLsh.CorpusSizeConf, n.toString)
      case None =>
        require(spark.conf.getOption(ops.VectorQueries.EmbeddingLsh.CorpusSizeConf).isEmpty,
          s"${ops.VectorQueries.EmbeddingLsh.CorpusSizeConf} must be unset during oracle runs: " +
            "the DuckDB oracles assume the default LSH geometry (set " +
            "SPARK_GRAFT_ORACLE_CORPUS to size BOTH sides from one count)")
    }
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter (same contract as Bench): SPARK_GRAFT_ONLY=q_a,q_b
    // verifies just those; the driver sets nothing and gets the full dump.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // builder-persisted signature tables are per-plan; drop them so the
      // 60-query run doesn't accumulate cached partitions (same as Bench,
      // incl. the localCheckpoint blocks of the iterative queries) — but
      // keep the process-level Staged prefix tables, which exist to be
      // shared across the family's queries.
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (!ops.Staged.pinned(id)) rdd.unpersist(blocking = false) }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
