package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.ops.Out
import graft.tables.Tables

/** Driver-facing entries for the streaming pipeline (SURVEY.md §2.4).
  *
  * Both file-staged replays are anchored to the DuckDB hash gate (round-2
  * VERDICT #4): the whole serialize → parse → filter → window chain is
  * SQL-expressible, including append mode's watermark semantics — the final
  * watermark of a drained `AvailableNow` run is `max(eventTime) − delay`
  * over the filtered stream, so "finalized window" is the deterministic
  * predicate `w_end ≤ max_sec − 600`. `q_changelog_table` (update mode)
  * needs no such filter: its final upserted state is the full aggregate. */
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
    * three-sink streaming job → return the windowed-agg sink contents
    * (oracle-shaped: epoch-seconds window start, BIGINT/DOUBLE columns). */
  def streamPipeline(spark: SparkSession, dir: String): DataFrame = {
    // Unique staging root per invocation: a fixed path would let two
    // concurrent sessions (e.g. a Bench overlapping a Verify) delete each
    // other's checkpoints mid-run. Hourly sweeps are the OS's job.
    val base = Files.createTempDirectory("graft_stream_pipeline").toString
    eventsAsSensorJson(spark, dir, s"$base/in")
    val out = SensorPipeline.replay(spark, s"$base/in", s"$base/out")
    spark.read.parquet(out.agg)
      .select(col("id"), Out.epochSec(col("w_start")).as("w_start"),
        col("max_temperature"), col("min_temperature"),
        col("avg_temperature"), col("n"))
      .orderBy(col("id"), col("w_start"))
  }

  /** K8 update-mode changelog (reference MAX_TABLE, README.md:96-107): the
    * same staged replay through [[SensorPipeline.replayChangelog]] — update
    * mode + idempotent keyed upsert — returning the final table state, which
    * must equal the batch aggregate over the whole input. */
  def changelogTable(spark: SparkSession, dir: String): DataFrame = {
    val base = Files.createTempDirectory("graft_changelog").toString
    eventsAsSensorJson(spark, dir, s"$base/in")
    val table = SensorPipeline.replayChangelog(spark, s"$base/in", s"$base/out")
    spark.read.parquet(table)
      .select(col("id"), col("w_sec").cast("long").as("w_start"),
        col("max_temperature"), col("min_temperature"),
        col("avg_temperature"), col("n"))
      .orderBy(col("id"), col("w_start"))
  }

  /** Session-window half of the K layer: the staged replay through
    * [[SensorPipeline.replaySessions]] (append mode, 30-min gap), returning
    * the finalized sessions — those whose end cleared the drained watermark. */
  def streamSessions(spark: SparkSession, dir: String): DataFrame = {
    val base = Files.createTempDirectory("graft_stream_sessions").toString
    eventsAsSensorJson(spark, dir, s"$base/in")
    val path = SensorPipeline.replaySessions(spark, s"$base/in", s"$base/out")
    spark.read.parquet(path)
      .select(col("id"), Out.epochSec(col("s_start")).as("s_start"),
        Out.epochSec(col("s_end")).as("s_end"),
        col("max_temperature"), col("min_temperature"), col("n"))
      .orderBy(col("id"), col("s_start"))
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

  /** DuckDB spelling of the staged serialize → parse → validity chain.
    * Truncation parity: Spark's double→long cast truncates toward zero
    * (TRUNC here, where a bare DuckDB CAST rounds) and timestamp→long floors
    * seconds (FLOOR(EPOCH)); Gson-default zeros come from the COALESCEs. */
  private val sensorCtes =
    """e AS (SELECT CAST(user_id AS VARCHAR) AS id,
      |        CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
      |        COALESCE(CAST(TRUNC(value) AS BIGINT), 0) AS temperature,
      |        COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS humidity
      |      FROM events),
      |v AS (SELECT * FROM e WHERE NOT (temperature = 0 AND humidity = 0)
      |                        AND (temperature < 50 OR humidity < 100))""".stripMargin

  private val windowedAggSql =
    """SELECT id, (sec // 60) * 60 AS w_start,
      |  MAX(temperature) AS max_temperature, MIN(temperature) AS min_temperature,
      |  CAST(SUM(temperature) AS DOUBLE) / COUNT(*) AS avg_temperature,
      |  COUNT(*) AS n
      |FROM v GROUP BY 1, 2""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_stream_pipeline",
      s"""WITH $sensorCtes
         |$windowedAggSql
         |HAVING (sec // 60) * 60 + 60 <= (SELECT MAX(sec) - 600 FROM v)
         |ORDER BY id, w_start""".stripMargin)(streamPipeline),
    QueryDef("q_changelog_table",
      s"""WITH $sensorCtes
         |$windowedAggSql
         |ORDER BY id, w_start""".stripMargin)(changelogTable),
    // Session semantics: events exactly 1800 s apart do NOT merge (Spark
    // merges on window OVERLAP), hence the strict < in the LAG predicate;
    // session end = last event + gap; finalized ⇔ end cleared the drained
    // watermark max(sec) − 600.
    QueryDef("q_stream_sessions",
      s"""WITH $sensorCtes,
         |o AS (SELECT id, sec, temperature,
         |        CASE WHEN sec - LAG(sec) OVER (PARTITION BY id ORDER BY sec)
         |                  < 1800 THEN 0 ELSE 1 END AS new_s
         |      FROM v),
         |s AS (SELECT id, sec, temperature,
         |        SUM(new_s) OVER (PARTITION BY id ORDER BY sec
         |          ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM o)
         |SELECT id, MIN(sec) AS s_start, MAX(sec) + 1800 AS s_end,
         |  MAX(temperature) AS max_temperature,
         |  MIN(temperature) AS min_temperature, COUNT(*) AS n
         |FROM s GROUP BY id, sid
         |HAVING MAX(sec) + 1800 <= (SELECT MAX(sec) - 600 FROM v)
         |ORDER BY id, s_start""".stripMargin)(streamSessions),
    QueryDef.noOracle("q_sensor_gen")(sensorGenAgg)
  )
}
