package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Deduplication operators over `documents` — the core of a training-data
  * pipeline (north-star extension; absent from the reference).
  *
  * Four escalating strategies, each the standard industrial shape:
  *
  *   1. **Exact**: hash-groupBy on content MD5. One shuffle keyed by hash,
  *      map-side partial agg; the only exact-dedup plan that scales to 100 TB
  *      (no sort, no pairwise compare).
  *   2. **N-gram Jaccard**: inverted-index self-join on 3-word shingles with
  *      a document-frequency cap. The df cap is the scale lever: dropping
  *      shingles shared by >100 docs bounds every posting list, making the
  *      worst-case join output linear instead of quadratic (stop-shingles
  *      otherwise produce O(df²) pairs — the classic similarity-join blowup).
  *   3. **MinHash + LSH**: 16 MD5-derived min-hashes per doc, banded 4×4;
  *      candidate pairs share a banded signature hash, so the self-join key
  *      is the band hash — no pairwise enumeration ever happens. Signature
  *      agreement estimates Jaccard without touching the original text.
  *   4. **SimHash**: one 48-bit signature per doc (narrow, zero-shuffle map),
  *      then near-dup pairs via 12-bit chunk banding + Hamming verification —
  *      the Charikar scheme; candidates again come from an equi-join, never
  *      from a cross product.
  *
  * All hashing is MD5-derived (see [[TextQueries.hash48]]) so the DuckDB
  * oracle reproduces every signature bit-for-bit.
  */
object DedupQueries {

  import TextQueries.{shinglesExpr, hash48, wordsExpr}

  /** Distinct 3-word shingle set per document (set semantics for Jaccard). */
  private val shingleSet = s"array_distinct(${shinglesExpr(3)})"

  /** Fan a narrow scan out across all cores before a CPU-dense hashing stage.
    *
    * Shingling + MD5 signatures cost orders of magnitude more CPU than the
    * scan that feeds them, so their parallelism must not be inherited from the
    * input split count (locally: one small parquet file = ONE task doing all
    * the hashing; on a cluster: a few large splits bottleneck the same way).
    * An explicit-width hash repartition on the primary key rebalances at the
    * cost of shuffling only the raw text — kilobytes against seconds of CPU.
    * Width is pinned (not left to AQE) because AQE's coalescing targets
    * shuffle *bytes*, which are tiny here precisely when the CPU cost is not. */
  private def fanout(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** Exact dedup: group by content hash, keep the smallest doc_id. */
  def dedupDocExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keeper_id"))

  /** Shingle posting list (doc_id, set size, shingle), df-capped at 100. */
  private def postings(spark: SparkSession, dir: String): DataFrame = {
    val docs = fanout(Tables(spark, dir).documents.select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), expr(shingleSet).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("s"))
    val rare = docs.groupBy(col("s"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= 100).select(col("s"))
    docs.join(rare, Seq("s"))
  }

  /** N-gram Jaccard near-dup pairs (threshold 0.5; the planted testdata dups
    * sit at ≥0.97, noise below 0.08 — the threshold is not load-bearing). */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val p = postings(spark, dir)
    val a = p.select(col("doc_id").as("doc_a"), col("nsh").as("na"), col("s"))
    val b = p.select(col("doc_id").as("doc_b"), col("nsh").as("nb"), col("s"))
    a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (col("na") + col("nb") - col("n_common")), 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 16-permutation MinHash signature: perm p's hash of a doc is the minimum
    * `md5(p ++ ":" ++ shingle)` over its shingle set — pure column
    * expressions, computed in one narrow pass over the scan. */
  private val sigExpr =
    s"""transform(sequence(0, 15),
       |  p -> array_min(transform(sh, x -> md5(concat(cast(p as string), ':', x)))))""".stripMargin

  /** MinHash LSH candidates: 4 bands × 4 rows; pairs sharing any band key,
    * with the signature-agreement Jaccard estimate. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = fanout(Tables(spark, dir).documents.select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), expr(shingleSet).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), expr(sigExpr).as("sig"))
    val bands = sig.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> md5(concat_ws('|', slice(sig, b * 4 + 1, 4))))")))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
    val a = bands.select(col("band_idx"), col("band_key"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = bands.select(col("band_idx"), col("band_key"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_key")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"))
      .withColumn("est_jaccard", round(
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))") / 16.0, 4))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 48-bit SimHash over the distinct-token set: bit b is the sign of the
    * token-vote sum for that bit of each token's 48-bit hash. Zero-shuffle:
    * the whole signature is one nested higher-order expression per row. */
  private val simhashExpr =
    s"""aggregate(sequence(0, 47), cast(0 as bigint), (acc, b) -> acc +
       |  case when aggregate(hs, cast(0 as bigint),
       |         (a2, h) -> a2 + case when shiftright(h, b) % 2 = 1 then 1 else -1 end) > 0
       |       then shiftleft(cast(1 as bigint), b) else cast(0 as bigint) end)""".stripMargin

  private def simhashed(spark: SparkSession, dir: String): DataFrame =
    fanout(Tables(spark, dir).documents.select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), expr(s"array_distinct($wordsExpr)").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        expr(s"transform(toks, t -> ${hash48("t")})").as("hs"))
      .select(col("doc_id"), col("n_tokens"), expr(simhashExpr).as("simhash"))

  /** SimHash signatures per document. */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashed(spark, dir).orderBy(col("doc_id"))

  /** SimHash near-dup pairs: band the 48-bit signature into 4 × 12-bit
    * chunks, equi-join on any equal chunk, keep candidates with Hamming ≤ 6.
    *
    * Recall contract (round-1 ADVICE): 4-chunk banding guarantees (pigeonhole)
    * that every Hamming-≤3 pair agrees on at least one chunk, so recall is
    * EXACT for Hamming ≤ 3. Pairs at Hamming 4–6 are best-effort candidates:
    * one whose differing bits spread across all four chunks is missed. The
    * oracle computes the identical banded candidate set, so the gate compares
    * like with like. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val s = simhashed(spark, dir)
    val chunks = s.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(simhash, c * 12) % 4096)")))
      .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "chunk")
    val a = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk_idx", "chunk")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sim_a ^ sim_b)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
