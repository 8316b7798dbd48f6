package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.functions.CdcChunks
import graft.ops.MultimodalQueries
import graft.tables.Tables

/** Correctness of the content-defined chunking kernel — the no-oracle
  * operator class: an independent driver-side walker, the shift-invariance
  * property that motivates CDC over fixed-width chunking, and the engine
  * query over the kernel. */
class CdcChunksSpec extends SparkSpec {

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  /** Independent chunker: walks [[CdcChunks.cutPoints]]'s RULE (re-stated
    * here, not calling compute) and hashes slices with the JDK directly. */
  private def chunkHashes(text: String): Seq[String] = {
    val bytes = text.getBytes("UTF-8")
    val mask = (1L << CdcChunks.MaskBits) - 1
    var start = 0
    var h = 0L
    val out = Seq.newBuilder[String]
    for (i <- bytes.indices) {
      h = (h << 1) + CdcChunks.gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= CdcChunks.MinChunk && (h & mask) == 0L) || len == CdcChunks.MaxChunk) {
        out += md5hex(bytes.slice(start, i + 1))
        start = i + 1
        h = 0L
      }
    }
    if (start < bytes.length) out += md5hex(bytes.slice(start, bytes.length))
    out.result()
  }

  private lazy val docs: Seq[(Long, String)] =
    Tables(spark, sf).documents.select("doc_id", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1)))

  test("kernel chunks match an independent driver-side walker on the corpus") {
    val got = Tables(spark, sf).documents
      .select(col("doc_id"), expr("graft_cdc_chunks(text)").as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    docs.foreach { case (id, text) =>
      got(id) shouldBe chunkHashes(text).toList
    }
    // chunk sizes respect the [Min, Max] contract (reconstruct from cuts)
    docs.foreach { case (_, text) =>
      val bytes = text.getBytes("UTF-8")
      val cuts = CdcChunks.cutPoints(bytes)
      val bounds = (0 +: cuts).sliding(2).map { case Seq(a, b) => b - a }.toSeq
      // every chunk except possibly the trailing remainder is >= MinChunk
      bounds.dropRight(1).foreach(_ should be >= CdcChunks.MinChunk)
      bounds.foreach(_ should be <= CdcChunks.MaxChunk)
    }
  }

  test("shift invariance: a prefix edit leaves most chunk hashes intact") {
    val long = docs.filter(_._2.length >= 400).take(50)
    assert(long.nonEmpty, "fixture lacks long docs")
    val overlaps = long.map { case (_, text) =>
      val before = chunkHashes(text)
      val after = chunkHashes("inserted prefix edit " + text)
      before.toSet.intersect(after.toSet).size.toDouble / before.size
    }
    // boundaries resynchronize after the edit, so most of each doc's tail
    // survives — the property fixed-width chunking (chunkCensus) lacks
    // entirely (there, a prefix insertion shifts every boundary: 0 reuse).
    // Degenerate docs whose gear stream never hits the mask fall back to
    // positional MaxChunk cuts and may share nothing (see the MaxChunk
    // scaladoc) — tolerated as a small tail, never the norm:
    (overlaps.sum / overlaps.size) should be >= 0.5
    overlaps.count(_ == 0.0).toDouble / overlaps.size should be <= 0.1
  }

  test("cdc census query runs and reports genuinely shared chunks") {
    val rows = MultimodalQueries.chunkCensusCdc(spark, sf).collect()
    rows.length should be > 0 // duplicated docs share ALL their chunks
    rows.foreach { r =>
      r.getLong(2) should be >= 2L
      r.getLong(2) should be >= r.getLong(1)
    }
  }
}
