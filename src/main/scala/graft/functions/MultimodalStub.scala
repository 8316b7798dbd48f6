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

  /** Extracted feature vector (what a real vision/audio encoder emits). */
  final case class MediaFeatures(doc_id: Long, features: Seq[Double])

  /** STUB feature extractor — the `mapInPandas`-model-inference analog.
    * A real implementation loads an encoder once per partition and runs
    * batched forward passes; this one derives each dimension
    * deterministically from the content digest (feature j =
    * `hash48(md5 ++ ":" ++ j) % 1e5 / 1e5`), so the SURROUNDING plumbing —
    * one model per partition, rows streamed through it, typed vector
    * output — is exercised under the driver's DuckDB hash gate, which no
    * real network could be. */
  final class FakeEncoder(dims: Int) {
    private var model: java.security.MessageDigest = _
    def open(): Unit = { model = java.security.MessageDigest.getInstance("MD5") }
    def encode(docId: Long, contentMd5: String): MediaFeatures = {
      require(model != null, "encoder used before open()")
      val fs = (0 until dims).map { j =>
        model.reset()
        val d = model.digest(s"$contentMd5:$j".getBytes("UTF-8"))
        val hex = d.take(6).map(b => f"$b%02x").mkString // first 12 hex chars
        (java.lang.Long.parseLong(hex, 16) % 100000L) / 100000.0
      }
      MediaFeatures(docId, fs)
    }
  }

  /** (id, content-md5) rows → feature vectors, one encoder per partition. */
  def extractFeatures(df: DataFrame, idCol: String, md5Col: String,
      dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(md5Col).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val enc = new FakeEncoder(dims) // once per PARTITION, not per row
        enc.open()
        rows.map { case (id, m) => enc.encode(id, m) }
      }
  }
}
