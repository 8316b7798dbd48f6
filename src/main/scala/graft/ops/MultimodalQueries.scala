package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata (north-star extension).
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stub ([[fakeDecodeExpr]] /
  * [[graft.functions.MultimodalStub]]); everything around it — the binary
  * column type, byte-level functions (length/hash/header slicing), the
  * metadata schema, partitioning, and the batched per-partition UDF shape —
  * is real Spark plumbing, which is the part that matters at 100 TB:
  *
  *   - payload stays a single `BinaryType` column (parquet BYTE_ARRAY) —
  *     scanned lazily, prunable, never driver-collected;
  *   - byte ops are codegen'd expressions (`length`, `md5`, `substring` on
  *     binary), not UDFs;
  *   - real decoding belongs in a batched per-partition map with one decoder
  *     instance per partition (see [[graft.functions.MultimodalStub]]) — the
  *     Scala analog of `mapInPandas` — never a per-row lambda that would
  *     re-initialize a codec per record (the reference's producer-per-record
  *     anti-pattern, StreamProcessor.java:118, applied to codecs).
  *
  * The testdata has no real media bytes, so `documents.text` UTF-8 bytes
  * stand in for the payload; the plumbing is payload-agnostic.
  */
object MultimodalQueries {

  /** Deterministic fake "image decode": dimensions derived from the payload
    * hash. STUB — stands in for a real codec (not available offline); the
    * derivation is engine-portable so the oracle can verify the plumbing. */
  private def fakeDecodeExpr(h: String): Map[String, String] = Map(
    "width" -> s"64 + $h % 1857",
    "height" -> s"64 + ($h div 1857) % 1017",
    "channels" -> s"1 + $h % 4")

  /** 48-bit value from the hex digest itself (the payload is already hashed
    * — no second md5, unlike [[TextQueries.hash48]] which hashes its input). */
  private val hFromMd5 = "cast(conv(substr(content_md5, 1, 12), 16, 10) as bigint)"

  /** Byte-level metadata + stub-decoded dimensions for every payload. */
  def blobMeta(spark: SparkSession, dir: String): DataFrame = {
    val d = fakeDecodeExpr("h")
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_md5"),
        // first-8-CHARACTERS header, encoded: byte-slicing the payload would
        // split a multi-byte UTF-8 sequence where the oracle's text slice
        // cannot (review finding; latent on the ASCII testdata)
        lower(hex(substring(col("text"), 1, 8).cast("binary"))).as("header_hex"))
      .withColumn("h", expr(hFromMd5))
      .select(col("doc_id"), col("n_bytes"), col("content_md5"), col("header_hex"),
        expr(d("width")).cast("long").as("width"),
        expr(d("height")).cast("long").as("height"),
        expr(d("channels")).cast("long").as("channels"))
      .orderBy(col("doc_id"))
  }

  /** Chunk width (payload characters ≡ bytes on the ASCII testdata) for
    * [[chunkCensus]]. Real media dedup uses content-defined boundaries
    * (rolling-hash cut points) so an insertion doesn't shift every
    * downstream chunk; fixed-width keeps the oracle exact while exercising
    * the identical plan shape. Shared with the oracle. */
  val ChunkChars = 64

  /** Fixed-width payload chunking + corpus-level shared-chunk census: every
    * payload is cut into [[ChunkChars]]-wide chunks, and chunks occurring in
    * ≥ 2 places are reported with their payload count and occurrence count —
    * the block-level dedup opportunity a media store acts on (and how
    * partial overlap between payloads is detected without any pairwise
    * comparison).
    *
    * Shape at scale: explode is linear in payload bytes; the census is one
    * partial-agg shuffle keyed by chunk hash. Honest cost note: the shuffle
    * carries one partial row per DISTINCT chunk per task — singletons
    * included — which is the inherent price of an exact census (identical
    * to any exact distinct-count); the ≥2 filter prunes only after the
    * final agg. A 100 TB deployment that only wants the shared tail runs
    * the standard two-pass trim (cheap approximate pre-pass — e.g. a
    * count-min or bloom of chunk hashes — to pre-filter candidates, then
    * this exact plan over the survivors). Top-k via
    * TakeOrderedAndProject. */
  def chunkCensus(spark: SparkSession, dir: String, topK: Int = 50): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("text"),
        // integer `div`, not `/` (Column./ is double division); empty
        // payloads still get one (empty) chunk so they stay observable
        expr(s"greatest((length(text) + ${ChunkChars - 1}) div $ChunkChars, 1)")
          .cast("long").as("nc"))
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(cast(0 as bigint), nc - 1)")).as("ci"))
      .select(col("doc_id"),
        md5(expr(s"cast(substring(text, cast(ci * $ChunkChars + 1 as int), $ChunkChars) as binary)"))
          .as("chunk_md5"))
      .groupBy(col("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_total"))
      .filter(col("n_total") >= 2)
      .orderBy(col("n_total").desc, col("chunk_md5"))
      .limit(topK)

  /** Shared-chunk census over CONTENT-DEFINED chunks
    * ([[graft.functions.CdcChunks]], `graft_cdc_chunks`): same census shape
    * as [[chunkCensus]], but boundaries come from the gear rolling hash, so
    * payloads differing by an insertion still share their tail chunks —
    * the production media-dedup chunking. No SQL oracle (the rolling
    * recurrence is sequential per payload — not reasonably expressible in
    * DuckDB); CdcChunksSpec holds a driver-side reimplementation check plus
    * the shift-invariance property, and the census arithmetic downstream of
    * the kernel is the oracle-proven [[chunkCensus]] shape. */
  def chunkCensusCdc(spark: SparkSession, dir: String, topK: Int = 50): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), explode(expr("graft_cdc_chunks(text)")).as("chunk_md5"))
      .groupBy(col("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_total"))
      .filter(col("n_total") >= 2)
      .orderBy(col("n_total").desc, col("chunk_md5"))
      .limit(topK)

  /** Mean-chunk-length band [[cdcChunkAudit]] holds the gear kernel to.
    * The mask geometry targets ≈ MinChunk + 2^MaskBits = 80 bytes; the band
    * is ±2.5× so it is robust to corpus regeneration, while a broken mask
    * (every byte cuts → 16, or never cuts → 256) still fails. */
  val CdcMeanLenLo = 24.0
  val CdcMeanLenHi = 200.0

  /** Structural audit of the content-defined chunker — the ORACLE-CHECKABLE
    * face of [[chunkCensusCdc]]'s kernel (round-6 advice: emit claims, not
    * engine-specific hashes). The gear recurrence is sequential per payload
    * and not reasonably expressible in SQL, but its structural INVARIANTS
    * are: chunk lengths partition the payload (coverage), every chunk ≤
    * MaxChunk with every non-tail chunk ≥ MinChunk (bounds), and the mean
    * chunk length sits in the mask-geometry band. The oracle computes the
    * exact doc/byte totals from `documents` and asserts the claims TRUE, so
    * a broken kernel fails the driver hash gate; CdcChunksSpec keeps the
    * byte-exact reimplementation + shift-invariance checks.
    *
    * Shape at scale: one projection pass (the kernel is a codegen'd static
    * call) + a single global agg — no shuffle of chunk rows at all. */
  def cdcChunkAudit(spark: SparkSession, dir: String): DataFrame = {
    val min = graft.functions.CdcChunks.MinChunk
    val max = graft.functions.CdcChunks.MaxChunk
    Tables(spark, dir).documents
      .select(octet_length(col("text")).cast("long").as("bytes"),
        expr("graft_cdc_chunk_lens(text)").as("lens"))
      .filter(col("bytes") > 0)
      .select(col("bytes"),
        expr("aggregate(lens, 0L, (a, x) -> a + x)").as("chunk_bytes"),
        expr("size(lens)").cast("long").as("n_chunks"),
        (expr("array_max(lens)") <= max &&
          expr(s"forall(slice(lens, 1, size(lens) - 1), x -> x >= $min)"))
          .as("doc_bounds_ok"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bytes")).as("total_bytes"),
        expr("bool_and(chunk_bytes = bytes)").as("coverage_ok"),
        expr("bool_and(doc_bounds_ok)").as("bounds_ok"),
        (sum(col("bytes")).cast("double") / sum(col("n_chunks"))
          between(CdcMeanLenLo, CdcMeanLenHi)).as("mean_len_ok"))
  }

  /** Frame-sampling plan for "video" payloads: per payload, the frame count
    * (stub-derived) and the evenly-spaced sample positions a real pipeline
    * would hand to the decoder — array logic in codegen-friendly expressions. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
      .withColumn("h", expr(hFromMd5))
      .select(
        col("doc_id"),
        expr("1 + h % 240").cast("long").as("n_frames"),
        expr("greatest(1, (1 + h % 240) div 4)").cast("long").as("frame_step"))
      .withColumn("n_sampled",
        expr("size(sequence(cast(0 as bigint), n_frames - 1, frame_step))").cast("long"))
      .select(col("doc_id"), col("n_frames"), col("frame_step"), col("n_sampled"))
      .orderBy(col("doc_id"))

  /** Resize plan for "image" payloads: the aspect-preserving fit of each
    * stub-decoded (width, height) into a `target`² training square — the
    * geometry a real resize kernel receives. Integer arithmetic end to end
    * (floor-division scaling, the convention both engines share), so the
    * plan is oracle-checkable; the pixel work itself is the stubbed codec
    * stage. Upscaling is clamped (scale ≤ 1): training pipelines letterbox
    * small images rather than invent pixels. */
  def mediaResize(spark: SparkSession, dir: String,
      target: Int = 224): DataFrame = {
    val d = fakeDecodeExpr("h")
    Tables(spark, dir).documents
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
      .withColumn("h", expr(hFromMd5))
      .select(col("doc_id"),
        expr(d("width")).cast("long").as("width"),
        expr(d("height")).cast("long").as("height"))
      .withColumn("long_side", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        when(col("long_side") <= target, col("width"))
          .otherwise(greatest(lit(1L),
            expr(s"(width * $target) div long_side"))).as("out_w"),
        when(col("long_side") <= target, col("height"))
          .otherwise(greatest(lit(1L),
            expr(s"(height * $target) div long_side"))).as("out_h"))
      .orderBy(col("doc_id"))
  }

  /** Feature extraction through the batched per-partition encoder stub
    * ([[graft.functions.MultimodalStub.extractFeatures]] — the
    * `mapInPandas` model-inference seam): one encoder per partition, rows
    * streamed through it, typed vectors out, then ordinary relational ops
    * over the result. The ONLY imperative stage in the oracle-gated
    * inventory — the fake encoder is digest-deterministic, so the driver's
    * DuckDB gate verifies the partitioning/batching plumbing end to end.
    * Norm computed in fixed dimension order (both engines fold j = 0..7
    * identically). */
  def mediaFeatures(spark: SparkSession, dir: String,
      dims: Int = 8): DataFrame = {
    val base = Tables(spark, dir).documents
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
    val feats = graft.functions.MultimodalStub
      .extractFeatures(base, "doc_id", "content_md5", dims).toDF()
    feats.select(
        col("doc_id") +:
          (0 until dims).map(j => col("features")(j).as(s"f$j")) :+
          round((0 until dims).map(j =>
            col("features")(j) * col("features")(j)).reduce(_ + _), 6)
            .as("norm2"): _*)
      .orderBy(col("doc_id"))
  }

  /** Pair thresholds for [[blobChunkDedup]] (shared with the oracle SQL;
    * the chunk width is the census's [[ChunkChars]]). */
  val ChunkPairMinShared = 2
  val ChunkDfCap = 100

  /** Chunk-overlap near-dup pairs — the modality-agnostic dedup: fixed-size
    * payload chunks hashed, documents paired by SHARED chunk hashes (the
    * backup/CAS-store dedup model, and how near-identical media files are
    * found without decoding them — a re-encoded tail leaves the leading
    * chunks identical). Output: pairs with ≥ [[ChunkPairMinShared]] shared
    * chunks and their chunk-set Jaccard.
    *
    * Chunk boundaries are CHARACTER offsets with the chunk's UTF-8 bytes
    * hashed ([[blobMeta]]'s header_hex convention): byte-offset chunking of
    * a true binary payload is the same expression over `payload` instead of
    * `text`, but cannot be DuckDB-gated (no blob substring) and WOULD split
    * multi-byte sequences on text. Scale shape: chunk df capped at
    * [[ChunkDfCap]] (boilerplate chunks — headers, padding — would
    * otherwise quadratically pair everything, the same degenerate-bucket
    * economics as the LSH caps), pair generation is a self-join ON the
    * chunk hash, and the Jaccard denominator uses TRUE uncapped set sizes. */
  def blobChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
    val sets = d
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(1, n, $ChunkChars)")).as("off"))
      .select(col("doc_id"),
        md5(expr(s"cast(substring(text, off, $ChunkChars) as binary)")).as("ch"))
      .distinct()
    val sizes = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("nc"))
    val ok = sets.groupBy(col("ch")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= ChunkDfCap).select(col("ch"))
    val capped = sets.join(ok, Seq("ch"))
    capped.as("a").join(capped.as("b"),
        col("a.ch") === col("b.ch") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= ChunkPairMinShared)
      .join(sizes.select(col("doc_id").as("doc_a"), col("nc").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nc").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
