package graft.tables

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef

/** Oracle-gated exercise of the generic batch MERGE INTO
  * ([[Merge.mergeInto]]) — the table-maintenance primitive the streaming
  * changelog sink delegates to. Until this key existed, mergeInto was only
  * driven through that sink, so a regression in the batch-merge path proper
  * (create-then-merge, affected-bucket rewrite, marker pinning) could hide
  * behind the streaming machinery (round-5 verdict item).
  *
  * The scenario is a deterministic three-batch upsert sequence over the
  * `events` table: batch b (b = 0, 1, 2 in order) carries one row per user
  * summarizing that user's events with `event_id % 3 = b` (their max event
  * id and count). Upsert semantics are full-row replace, so after the
  * sequence the table holds, for every user, exactly the summary row of the
  * LAST batch that contained them — which the DuckDB oracle recomputes
  * directly as a grouped join on `max(batch)` per user. Batch 0 exercises
  * table creation + layout-marker pinning; batches 1 and 2 exercise the
  * affected-bucket copy-on-write merge against committed data. */
object TableRegistry {

  /** Number of upsert batches in the merge exercise (shared with the oracle
    * via interpolation). */
  val MergeBatches = 3

  def mergeIntoDemo(spark: SparkSession, dir: String): DataFrame = {
    val table = Files.createTempDirectory("graft_merge_into").toString + "/table"
    val e = Tables(spark, dir).events
      .select(col("user_id").as("uid"), col("event_id"))
      .filter(col("uid").isNotNull && col("event_id").isNotNull)
    for (b <- 0 until MergeBatches) {
      val batch = e.filter(pmod(col("event_id"), lit(MergeBatches)) === b)
        .groupBy(col("uid"))
        .agg(max(col("event_id")).as("v_last"), count(lit(1)).as("n_b"))
      Merge.mergeInto(table, batch, keyCols = Seq("uid"))
    }
    spark.read.parquet(table)
      .select(col("uid"), col("v_last"), col("n_b"))
      .orderBy(col("uid"))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_merge_into",
      s"""WITH e AS (
         |  SELECT user_id AS uid, event_id, event_id % $MergeBatches AS b
         |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
         |m AS (SELECT uid, max(b) AS bmax FROM e GROUP BY 1)
         |SELECT e.uid, max(e.event_id) AS v_last, count(*) AS n_b
         |FROM e JOIN m ON e.uid = m.uid AND e.b = m.bmax
         |GROUP BY e.uid ORDER BY e.uid""".stripMargin)(mergeIntoDemo))
}
