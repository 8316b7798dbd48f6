package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.tables.Tables

/** Driver-facing entry for the streaming pipeline (SURVEY.md §2.4
  * `q_stream_pipeline`, no SQL oracle — correctness is the batch-stream
  * equivalence property in StreamingPipelineSpec plus the driver's rows>0). */
object StreamRegistry {

  /** The `events` table re-serialized as reference-shaped sensor JSON lines
    * (FIXTURES.md mapping: user_id→id, event_id→messageId, ts→timestamp
    * epoch-seconds string, value→temperature, props.k→humidity). Written with
    * a distributed Spark write — no driver-side loop. */
  def eventsAsSensorJson(spark: SparkSession, dir: String, outDir: String): Unit = {
    import org.apache.spark.sql.types._
    val kSchema = StructType(Seq(StructField("k", LongType)))
    Tables(spark, dir).events
      .select(to_json(struct(
        col("user_id").cast("string").as("id"),
        col("event_id").cast("string").as("messageId"),
        col("ts").cast("long").cast("string").as("timestamp"),
        struct(
          col("value").cast("long").as("temperature"),
          coalesce(from_json(col("props"), kSchema).getField("k"), lit(0L)).as("humidity")
        ).as("metrics"))).as("value"))
      .write.mode("overwrite").text(outDir)
  }

  /** Full pipeline on the `events` table: serialize → replay through the
    * three-sink streaming job → return the windowed-agg sink contents. */
  def streamPipeline(spark: SparkSession, dir: String): DataFrame = {
    // Unique staging root per invocation: a fixed path would let two
    // concurrent sessions (e.g. a Bench overlapping a Verify) delete each
    // other's checkpoints mid-run. Hourly sweeps are the OS's job.
    val base = Files.createTempDirectory("graft_stream_pipeline").toString
    eventsAsSensorJson(spark, dir, s"$base/in")
    val out = SensorPipeline.replay(spark, s"$base/in", s"$base/out")
    spark.read.parquet(out.agg)
      .orderBy(col("id"), col("w_start"))
  }

  /** The DSv2 sensor generator (reference mqttgen, R7) driven through the
    * reference's parse→filter→aggregate chain in batch mode — proves the
    * native source end-to-end without file staging. Deterministic (seeded)
    * but Spark-side only, so no SQL oracle; SensorGenSpec holds the
    * distribution + batch-stream-equivalence checks. */
  def sensorGenAgg(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.format("sensor-gen")
      .option("messages", 2000).option("threads", 4).load()
    val parsed = SensorPipeline.parse(raw)
    SensorPipeline.windowedAgg(
      parsed.filter(SensorPipeline.isValid(col("temperature"), col("humidity"))))
      .orderBy(col("id"), col("w_start"))
  }

  def all: Seq[QueryDef] = Seq(
    QueryDef.noOracle("q_stream_pipeline")(streamPipeline),
    QueryDef.noOracle("q_sensor_gen")(sensorGenAgg)
  )
}
