package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.streaming.{SensorPipeline, StreamRegistry}

/** Measurement harness for the state-store provider question: the stateful
  * replays (changelog table, sessions, dedup) spend most of their time in
  * state-store commit + checkpoint machinery (BASELINE.md profiled ~5 s of
  * q_changelog_table as state commit). Spark ships two providers —
  * HDFS-backed (default: whole store serialized per commit) and RocksDB
  * (incremental changelog, designed for large state). This probe times the
  * same replay under both so the engine's default is a measured choice,
  * not a guess: at local scale the HDFS store's full-snapshot cost is tiny,
  * while at 100 TB state RocksDB's incremental commit is the standard
  * choice — the crossover belongs in BASELINE.md.
  *
  * Run: `sbt "Test/runMain graft.StateStoreProbe <sfDir> <provider>"`
  * where provider ∈ {hdfs, rocksdb}. */
object StateStoreProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val provider = args.lift(1).getOrElse("hdfs")

    val builder = GraftSession.tune(SparkSession.builder()
      .master(s"local[${GraftSession.defaultParallelism}]")
      .appName("graft-statestore-probe")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultParallelism))
    if (provider == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory(s"graft_ss_$provider").toString
    StreamRegistry.eventsAsSensorJson(spark, sfDir, s"$base/in")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm the streaming machinery once so the timed runs compare providers,
    // not first-use JIT
    SensorPipeline.replayChangelog(spark, s"$base/in", s"$base/warm")
    val tChangelog = time(
      SensorPipeline.replayChangelog(spark, s"$base/in", s"$base/cl"))
    val tSessions = time(
      SensorPipeline.replaySessions(spark, s"$base/in", s"$base/se"))
    val tDedup = time(
      SensorPipeline.replayDedup(spark, s"$base/in", s"$base/dd"))
    println(s"""{"probe":"state_store","provider":"$provider","sf":"$sfDir",""" +
      s""""changelog_sec":${f"$tChangelog%.1f"},"sessions_sec":${f"$tSessions%.1f"},""" +
      s""""dedup_sec":${f"$tDedup%.1f"}}""")
    spark.stop()
  }
}
