package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the graft engine.
  *
  * Design point: the engine targets a large multi-executor cluster; locally we
  * run `local[N]`. All scale-sensitive knobs live here so every entry point
  * (tests, Verify, Bench, user code) gets the same, cluster-honest defaults:
  *
  *   - `spark.sql.shuffle.partitions` sized to the core count (not the 200
  *     default, which is wrong for local mode and would be re-derived by AQE
  *     coalescing on a real cluster anyway);
  *   - AQE on (runtime partition coalescing, skew-join splitting, dynamic
  *     broadcast) — the same plan survives a 100x scale-up because AQE re-plans
  *     from runtime statistics;
  *   - UTC session timezone so event-time semantics match the DuckDB oracle and
  *     are deployment-independent.
  */
object GraftSession {

  def defaultParallelism: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  /** Nearest ancestor of the CWD holding build.sbt, falling back to the CWD
    * itself — one resolver shared by Bench (bands + bench_full.json) and the
    * local-cluster jar discovery, so a future fix (symlinked CWD,
    * multi-module build) lands in one place. */
  def projectRoot: java.io.File = {
    var d = new java.io.File(".").getAbsoluteFile.getParentFile
    while (d != null && !new java.io.File(d, "build.sbt").exists())
      d = d.getParentFile
    if (d != null) d else new java.io.File(".").getAbsoluteFile.getParentFile
  }

  /** Apply graft engine defaults to an arbitrary builder (so Verify/Bench can
    * keep their driver-mandated master/partition settings). */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    // native engine expressions (graft_dot, …) — see GraftExtensions
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")
    // events.ts is parquet TIMESTAMP(NANOS), which the vectorized reader
    // rejects; read nanos as long session-wide (harmless for non-nanos files)
    // instead of mutating the conf at plan-build time (round-1 ADVICE).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Testdata timestamps ship isAdjustedToUTC=false (would infer as
    // TIMESTAMP_NTZ); with UTC pinned above, reading them as TimestampType at
    // the SCAN keeps the whole engine on one timestamp type AND keeps ts
    // predicates pushable into parquet (a plan-level NTZ→TZ cast would block
    // pushdown). Tables.withNanoTs still normalizes NTZ for untuned sessions.
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // NOTE on join strategy for the iterative graph queries: the
    // node-sized Pregel build sides (ranks/dist/labels) sit directly
    // above a final aggregate whose output partitioning already satisfies
    // the join, so there is no exchange under the join for AQE's
    // DynamicJoinSelection to read map stats from, and Catalyst's static
    // estimate for an aggregate is its CHILD's size — both the runtime
    // (spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold) and the
    // static (spark.sql.join.preferSortMergeJoin=false) SMJ→SHJ paths
    // were tried in round 15 and measured to never fire on this shape.
    // The scale-aware static hint lives in GraphQueries.shj instead.
    // Shuffle files, broadcast blocks, and localCheckpoint RDDs are cleaned
    // by ContextCleaner only when the driver GCs their references; the
    // default periodic-GC interval (30 min) never fires inside a multi-
    // minute 180-query sweep, so a long single-JVM run accumulates dead
    // blocks until the block manager evicts live state from the heavy
    // iterative queries. 30 s keeps cleanup flowing at negligible cost on
    // any deployment (a real cluster's driver GCs naturally; this only
    // schedules what would happen anyway).
    .config("spark.cleaner.periodicGC.interval", "30s")
    // our state-free batch queries re-read tiny dims often in tests; keep the
    // broadcast threshold at the default 10 MB (cluster-safe), AQE raises it
    // dynamically when runtime stats allow.
    .applyGraftConf

  /** `SPARK_GRAFT_CONF="k=v;k2=v2"` — A/B conf overrides for any entry
    * point (Bench/Verify/tests), same contract ScaleProbe already honors.
    * Applied LAST so an override beats every tuned default. */
  implicit private final class ConfOps(private val b: SparkSession.Builder)
      extends AnyVal {
    def applyGraftConf: SparkSession.Builder = {
      sys.env.get("SPARK_GRAFT_CONF").toSeq
        .flatMap(_.split(";").map(_.trim).filter(_.nonEmpty))
        .foldLeft(b) { (bb, kv) =>
          val i = kv.indexOf('=')
          require(i > 0, s"SPARK_GRAFT_CONF entry '$kv' is not key=value")
          bb.config(kv.take(i).trim, kv.drop(i + 1).trim)
        }
    }
  }

  /** Apply the entry point's default master, honoring the
    * `SPARK_GRAFT_MASTER` override (round-14 multi-executor-JVM gate:
    * `local-cluster[2,16,4096]`).
    *
    * `local[n]` shares the driver JVM, so the sbt classpath is the executor
    * classpath. A `local-cluster` master launches REAL separate executor
    * processes (an in-process standalone Master/Worker pair, executors as
    * child JVMs) that inherit NOTHING from the driver's classpath — exactly
    * the deployment shape a 100 TB cluster has — so the packaged graft
    * classes must travel as ordinary `spark.jars`: `SPARK_GRAFT_JAR`
    * (comma-list, e.g. main + test jars) or the newest packaged jar under
    * `target/scala-N` of the nearest build.sbt ancestor.
    * Executor memory defaults to the per-worker allowance from the master
    * string (third bracket field, MB): Spark's 1g default would silently
    * strand 3/4 of the granted worker memory. Both fall to
    * `SPARK_GRAFT_CONF` overrides, which `tune` applies last.
    *
    * Fails fast when SPARK_HOME is missing: the launcher library resolves
    * the executor command against it, and without the guard the Worker dies
    * asynchronously with a bare IllegalStateException long after
    * getOrCreate() returned.
    */
  def withMaster(b: SparkSession.Builder, defaultMaster: String): SparkSession.Builder = {
    val m = sys.env.getOrElse("SPARK_GRAFT_MASTER", defaultMaster)
    val bb = b.master(m)
    if (!m.startsWith("local-cluster")) bb
    else {
      require(sys.env.get("SPARK_HOME").exists(h => new java.io.File(h, "jars").isDirectory),
        "local-cluster executors are launched via the Spark launcher, which needs " +
          "a distribution root: export SPARK_HOME=/opt/spark (jars/ must exist under it)")
      // The launcher's getScalaVersion() probes $SPARK_HOME/launcher/target
      // (a source-build layout) unless SPARK_SCALA_VERSION is exported —
      // normally load-spark-env.sh's job, but our in-JVM Worker launches
      // executors without it and they die async with "Cannot find any build
      // directories." after getOrCreate() already returned.
      require(sys.env.contains("SPARK_SCALA_VERSION"),
        "export SPARK_SCALA_VERSION=2.13 - the launcher resolving the executor " +
          "command needs it against a binary distribution")
      val jars = sys.env.get("SPARK_GRAFT_JAR").map(_.split(",").toSeq).getOrElse {
        val found = discoverJars(projectRoot)
        require(found.nonEmpty,
          "local-cluster executors do not share the driver classpath: run `sbt package` " +
            "first (or set SPARK_GRAFT_JAR=/path/a.jar[,b.jar])")
        found.map(_.getAbsolutePath)
      }
      workerMemMb(m).foldLeft(bb.config("spark.jars", jars.mkString(","))) {
        (b2, mem) => b2.config("spark.executor.memory", s"${mem}m")
      }
    }
  }

  /** Packaged jars to ship to local-cluster executors: the newest jar per
    * kind (main / `-tests`) under `<root>/target/scala-N` — shipping every
    * historical version would let a stale jar win classloading on executors
    * after a version bump (NoSuchMethodError at a distance); `-sources` /
    * `-javadoc` never carry classes. */
  private[graft] def discoverJars(root: java.io.File): Seq[java.io.File] =
    Option(new java.io.File(root, "target").listFiles()).toSeq.flatten
      .filter(_.isDirectory).filter(_.getName.startsWith("scala-"))
      .flatMap(sd => Option(sd.listFiles()).toSeq.flatten)
      .filter(f => f.getName.endsWith(".jar") &&
        !f.getName.contains("-sources") && !f.getName.contains("-javadoc"))
      .groupBy(_.getName.endsWith("-tests.jar")).values.toSeq
      .map(_.maxBy(_.lastModified())).sortBy(_.getName)

  /** Per-worker memory (MB) from a local-cluster master string's third
    * bracket field — the default for `spark.executor.memory`, since Spark's
    * 1g default would strand 3/4 of a 4096 MB worker allowance. */
  private[graft] def workerMemMb(master: String): Option[String] =
    "local-cluster\\[\\s*\\d+\\s*,\\s*\\d+\\s*,\\s*(\\d+)\\s*\\]".r
      .findFirstMatchIn(master).map(_.group(1))

  def local(appName: String = "graft", cores: Int = defaultParallelism): SparkSession = {
    val spark = tune(
      withMaster(
        SparkSession.builder()
          .appName(appName)
          .config("spark.sql.shuffle.partitions", cores.toString),
        s"local[$cores]")
    ).getOrCreate()
    // getOrCreate() ignores spark.sql.extensions when it returns a session
    // that already existed — re-register the native functions imperatively
    // so resolution never fails at a confusing distance (round-2 ADVICE).
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
