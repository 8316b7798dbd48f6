package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Batched per-partition media decoding — the Scala/Dataset analog of a
  * `mapInPandas` decode stage (north-star multimodal extension).
  *
  * The decode itself is a STUB (`FakeCodec`): the container ships no image/
  * audio libraries, so it derives deterministic fake dimensions from the
  * payload bytes. Everything around the stub is the real 100 TB plumbing —
  * and the part worth testing:
  *
  *   - input is an opaque `binary` column + typed metadata, never a
  *     materialized driver-side collection;
  *   - ONE codec instance per partition (constructed inside
  *     `mapPartitions`), amortized across that partition's rows — the
  *     distributed-systems point the reference's producer-per-record
  *     anti-pattern (StreamProcessor.java:113-118) gets wrong;
  *   - output is a typed Dataset with an explicit schema, so downstream
  *     relational ops (joins, aggregations over width/height) stay in
  *     Tungsten rows;
  *   - swapping `FakeCodec` for a real JNI/Java codec changes no plan shape:
  *     the partitioning, batching, and schema are decode-agnostic.
  */
object MultimodalStub {

  /** Decoded media metadata (what a real header parse would return). */
  final case class MediaMeta(doc_id: Long, n_bytes: Int,
      width: Int, height: Int, channels: Int)

  /** STUB codec: deterministic pseudo-decode from payload bytes. A real
    * implementation would parse the container header; this one hashes the
    * first bytes so tests get stable, payload-dependent values. The expensive
    * `open()` models codec initialization cost — done once per partition. */
  final class FakeCodec {
    private var opened = false
    def open(): Unit = { opened = true } // real codec: load native lib, etc.
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      require(opened, "codec used before open()")
      var h = 1125899906842597L
      var i = 0
      val n = math.min(payload.length, 64)
      while (i < n) { h = 31 * h + payload(i); i += 1 }
      val hp = h & Long.MaxValue
      MediaMeta(docId, payload.length,
        width = 64 + (hp % 1857L).toInt,
        height = 64 + ((hp / 1857L) % 1017L).toInt,
        channels = 1 + (hp % 4L).toInt)
    }
  }

  /** (id, payload) rows → decoded metadata, one codec per partition. */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = new FakeCodec // once per PARTITION, not per row
        codec.open()
        rows.map { case (id, payload) => codec.decode(id, payload) }
      }
  }
}
