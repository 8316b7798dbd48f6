package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state beyond windowed aggregation —
  * `flatMapGroupsWithState`, the Structured Streaming surface the KSQL layer
  * of the reference cannot express (its tables are aggregates only).
  *
  * Operator: **per-sensor record highs.** Emit a row whenever a sensor
  * reports a temperature strictly above every reading it has ever reported —
  * the classic "alert on new extreme" monitor. State per key is ONE long (the
  * running max): bounded, tiny, and exactly what the state store is for —
  * unlike a windowed agg, the comparison spans the sensor's entire history,
  * which no finite window covers.
  *
  * Scale/determinism notes:
  *   - state is per-sensor and O(1); a million sensors cost megabytes;
  *   - arrival order within a micro-batch is not defined, so each batch's
  *     group iterator is sorted by (eventTime, messageId) before folding —
  *     deterministic given deterministic batch boundaries (and in batch mode,
  *     where the whole input is one group iterator, fully deterministic);
  *   - the same fold runs in batch via [[recordHighsBatch]] for the
  *     batch-stream equivalence test (single "batch" == whole history).
  */
object StatefulOps {

  final case class Reading(id: String, messageId: String, eventTime: Timestamp,
      temperature: Long)
  final case class RecordHigh(id: String, messageId: String, eventTime: Timestamp,
      temperature: Long, prev_max: Long)

  /** Fold one key's (sorted) readings over the running max, emitting new
    * record highs. Shared verbatim by the streaming and batch paths. */
  def foldKey(rows: Iterator[Reading], max0: Option[Long]): (Seq[RecordHigh], Long) = {
    var mx = max0.getOrElse(Long.MinValue)
    val out = Seq.newBuilder[RecordHigh]
    rows.toSeq.sortBy(r => (r.eventTime.getTime, r.messageId)).foreach { r =>
      if (r.temperature > mx) {
        out += RecordHigh(r.id, r.messageId, r.eventTime, r.temperature,
          if (mx == Long.MinValue) r.temperature else mx)
        mx = r.temperature
      }
    }
    (out.result(), mx)
  }

  /** Streaming (or batch) record-high detector over parsed sensor events
    * (columns id, messageId, eventTime, temperature — the
    * [[SensorPipeline.parse]] shape). */
  def recordHighs(parsed: DataFrame): Dataset[RecordHigh] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.select(col("id"), col("messageId"), col("eventTime"), col("temperature"))
      .as[Reading]
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Reading], state: GroupState[Long]) => {
          val (out, mx) = foldKey(rows, state.getOption)
          if (mx != Long.MinValue) state.update(mx)
          out.iterator
        })
  }

  /** Batch oracle: the same fold applied per key to the whole history. */
  def recordHighsBatch(parsed: DataFrame): Seq[RecordHigh] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.select(col("id"), col("messageId"), col("eventTime"), col("temperature"))
      .as[Reading].collect().groupBy(_.id).toSeq
      .flatMap { case (_, rs) => foldKey(rs.iterator, None)._1 }
  }
}
