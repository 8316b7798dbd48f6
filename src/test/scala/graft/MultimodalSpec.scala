package graft

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._
import graft.functions.MultimodalStub
import graft.ops.MultimodalQueries
import graft.tables.Tables

/** Multimodal binary-column plumbing: the decode is a stub, the plumbing
  * (binary schema, per-partition codec, batching, determinism) is real. */
class MultimodalSpec extends SparkSpec {

  test("blob meta byte length equals UTF-8 length and decode is bounded") {
    val rows = MultimodalQueries.blobMeta(spark, sf).collect()
    rows.length shouldBe Tables(spark, sf).documents.count()
    val texts = Tables(spark, sf).documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      r.getAs[Long]("n_bytes") shouldBe
        texts(r.getAs[Long]("doc_id")).getBytes(StandardCharsets.UTF_8).length
      val (w, h, c) = (r.getAs[Long]("width"), r.getAs[Long]("height"), r.getAs[Long]("channels"))
      assert(w >= 64 && w < 64 + 1857)
      assert(h >= 64 && h < 64 + 1017)
      assert(c >= 1 && c <= 4)
    }
  }

  test("frame sampling covers frame 0 and respects the step") {
    MultimodalQueries.frameSample(spark, sf).collect().foreach { r =>
      val (n, step, sampled) =
        (r.getAs[Long]("n_frames"), r.getAs[Long]("frame_step"), r.getAs[Long]("n_sampled"))
      sampled shouldBe (n - 1) / step + 1 // inclusive 0, spacing = step
    }
  }

  test("mapPartitions decoder: same result at any parallelism, one codec per partition") {
    val payloads = Tables(spark, sf).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val one = MultimodalStub.decodeMeta(payloads.coalesce(1), "doc_id", "payload")
      .collect().sortBy(_.doc_id).toSeq
    val many = MultimodalStub.decodeMeta(payloads.repartition(7), "doc_id", "payload")
      .collect().sortBy(_.doc_id).toSeq
    many shouldBe one
    one.foreach { m =>
      assert(m.width >= 64 && m.height >= 64 && m.channels >= 1 && m.channels <= 4)
    }
  }
}
