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

  test("feature encoder: parallelism-invariant, dims argument live, range [0,1)") {
    val base = Tables(spark, sf).documents
      .select(col("doc_id"), md5(col("text").cast("binary")).as("cm"))
    val one = MultimodalStub.extractFeatures(base.coalesce(1), "doc_id", "cm")
      .collect().sortBy(_.doc_id).toSeq
    val many = MultimodalStub.extractFeatures(base.repartition(7), "doc_id", "cm")
      .collect().sortBy(_.doc_id).toSeq
    many shouldBe one
    one.foreach { f =>
      f.features should have size 8
      f.features.foreach(v => assert(v >= 0.0 && v < 1.0))
    }
    MultimodalStub.extractFeatures(base, "doc_id", "cm", dims = 3)
      .collect().foreach(_.features should have size 3)
  }

  test("resize plan: fits the square, preserves aspect, never upscales") {
    MultimodalQueries.mediaResize(spark, sf).collect().foreach { r =>
      val (w, h, ow, oh) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      ow should be <= math.max(w, 224L)
      oh should be <= math.max(h, 224L)
      math.max(ow, oh) should be <= 224L
      if (math.max(w, h) <= 224) { ow shouldBe w; oh shouldBe h } // no upscale
      else { // long side hits the target; aspect kept within integer rounding
        math.max(ow, oh) shouldBe 224L
        val aspectIn = w.toDouble / h
        val aspectOut = ow.toDouble / oh
        // floor-division rounds the SHORT side by < 1 pixel, so the aspect
        // distortion is bounded by (s+1)/s at output short side s
        val s = math.min(ow, oh).toDouble
        (math.max(aspectIn, aspectOut) / math.min(aspectIn, aspectOut)) should
          be <= (s + 1.0) / s
      }
    }
  }
}
