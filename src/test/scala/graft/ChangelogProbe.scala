package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{SensorPipeline, StreamRegistry}
import graft.tables.Tables

/** One-off measurement harness for the changelog-table compaction question
  * (round-3 VERDICT #7): how does update-mode replay cost scale with key
  * cardinality, and must [[SensorPipeline.ChangelogBucketsConf]] scale with
  * it (buckets ≈ keys / 50 k)?
  *
  * Stages the `events` table as sensor JSON with key cardinality multiplied
  * `keyMult`× (id ← id·keyMult + messageId mod keyMult — same event count,
  * same window layout, keyMult× the (id, window) upsert keys), then times
  * [[SensorPipeline.replayChangelog]] at a given bucket count.
  *
  * Run: `sbt "Test/runMain graft.ChangelogProbe <sfDir> <keyMult> <buckets>"`
  * Results recorded in BASELINE.md ("Changelog compaction probe").
  */
object ChangelogProbe {

  def stageJson(spark: SparkSession, dir: String, outDir: String, keyMult: Int): Long = {
    import org.apache.spark.sql.types._
    val kSchema = StructType(Seq(StructField("k", LongType)))
    val df = Tables(spark, dir).events
      .select(to_json(struct(
        (col("user_id") * keyMult + pmod(col("event_id"), lit(keyMult)))
          .cast("string").as("id"),
        col("event_id").cast("string").as("messageId"),
        col("ts").cast("long").cast("string").as("timestamp"),
        struct(
          col("value").cast("long").as("temperature"),
          coalesce(from_json(col("props"), kSchema).getField("k"), lit(0L)).as("humidity")
        ).as("metrics"))).as("value"))
    df.write.mode("overwrite").text(outDir)
    spark.read.text(outDir).count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keyMult = args.lift(1).map(_.toInt).getOrElse(10)
    val buckets = args.lift(2).map(_.toInt).getOrElse(SensorPipeline.ChangelogBuckets)

    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[${GraftSession.defaultParallelism}]")
      .appName("graft-changelog-probe")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultParallelism))
      .getOrCreate()
    spark.conf.set(SensorPipeline.ChangelogBucketsConf, buckets.toString)

    val base = Files.createTempDirectory("graft_changelog_probe").toString
    val rows = stageJson(spark, sfDir, s"$base/in", keyMult)
    val t0 = System.nanoTime()
    val table = SensorPipeline.replayChangelog(spark, s"$base/in", s"$base/out")
    val sec = (System.nanoTime() - t0) / 1e9
    val state = spark.read.parquet(table)
    val keys = state.select(col("id"), col("w_sec")).distinct().count()
    val nFiles = state.inputFiles.length
    // One JSON line, greppable like Bench's.
    println(s"""{"metric":"changelog_probe","sf":"$sfDir","key_mult":$keyMult,""" +
      s""""buckets":$buckets,"input_rows":$rows,"final_keys":$keys,""" +
      s""""files":$nFiles,"replay_sec":${math.round(sec * 1000) / 1000.0}}""")
    spark.stop()
  }
}
