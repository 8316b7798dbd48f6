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
  *   2. **N-gram Jaccard**: inverted index on 3-word shingles with a
  *      document-frequency cap. The df cap is the scale lever: dropping
  *      shingles shared by >100 docs bounds every posting list, making the
  *      worst-case join output linear instead of quadratic (stop-shingles
  *      otherwise produce O(df²) pairs — the classic similarity-join blowup).
  *   3. **MinHash + LSH**: 16 minhash lanes per doc, banded 4×4; candidate
  *      pairs share a banded signature, so pairs materialize per bucket —
  *      no pairwise enumeration ever happens.
  *   4. **SimHash**: one 48-bit signature per doc (narrow, zero-shuffle map),
  *      then near-dup pairs via 12-bit chunk banding + Hamming verification —
  *      the Charikar scheme; candidates again come from banding, never from a
  *      cross product.
  *
  * Performance invariants (round-2 rework; all verified against the same
  * DuckDB oracles bit-for-bit):
  *
  *   - **Hash once, reuse everywhere.** Each shingle is hashed a constant
  *     number of times (2 sha256 calls for all 16 minhash lanes, via
  *     non-overlapping 32-bit windows of the digest — independent bits of a
  *     random oracle, so the lanes are genuinely independent permutations).
  *     The round-1 version paid 16 md5 calls per shingle, per join side.
  *   - **Candidates come from `groupBy(bucket) → collect_list → explode
  *     pairs`, not a self-join.** A self-join re-computes the whole signature
  *     pipeline for each side (Spark re-executes a non-cached subplan per
  *     reference); the bucket shape computes signatures exactly once and
  *     shuffles only (key, id, signature) rows. Bucket sizes are bounded —
  *     by the df cap (Jaccard) or by band selectivity (MinHash) — so the
  *     per-bucket pair expansion is small and the plan survives a 100×
  *     scale-up; a pathological mega-bucket is the same failure mode as a
  *     skewed join key and is bounded the same way (cap + document).
  *   - **Tokenize once per row.** Higher-order lambdas are CodegenFallback:
  *     an expression inside a lambda is re-evaluated per element, so
  *     `slice(split(text), i, n)` would re-split per shingle index —
  *     O(tokens²). [[TextQueries.shingled]] materializes the token array.
  *
  * ==Persist contract==
  * [[dedupNgramJaccard]] and [[simhashPairs]] `persist()` their signature /
  * set tables (a subplan feeding both sides of a self-join is otherwise
  * recomputed per side). A lazy builder cannot unpersist what the caller has
  * not yet executed, so the contract is the caller's: run the returned plan,
  * then drop the backing cache — per-table `unpersist()` or
  * `spark.sharedState.cacheManager.clearCache()` as `Verify`/`Bench` do after
  * every query. Long-lived sessions that skip this accumulate cached
  * partitions across invocations (MEMORY_AND_DISK: degraded, not fatal).
  */
object DedupQueries {

  import TextQueries.{hash48, shingled, wordsExpr}

  /** Fan a narrow scan out across all cores before a CPU-dense hashing stage.
    *
    * Shingling + digest signatures cost orders of magnitude more CPU than the
    * scan that feeds them, so their parallelism must not be inherited from the
    * input split count (locally: one small parquet file = ONE task doing all
    * the hashing; on a cluster: a few large splits bottleneck the same way).
    * An explicit-width hash repartition on the primary key rebalances at the
    * cost of shuffling only the raw text — kilobytes against seconds of CPU.
    * Width is pinned (not left to AQE) because AQE's coalescing targets
    * shuffle *bytes*, which are tiny here precisely when the CPU cost is not. */
  private def fanout(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** Width for the counting self-joins' pair-aggregation shuffle: cores at
    * test scale, 4× cores past the [[Tables.bigInputs]] gate. The ~127 M
    * pair rows at 100× hold ~190 MB of aggregate state per task at default
    * width (measured 13.1 GB spill); 4× splits it under the executor
    * budget. Explicit N, not AQE-advisory: the agg sits ABOVE this
    * exchange, so coalescing by shuffle bytes would re-fold exactly the
    * state the width exists to split (the same parallelismFirst finding as
    * [[graft.ops.GraphQueries]]'s stagedRepartition). */
  private def pairAggWidth(spark: SparkSession, dir: String): Int =
    spark.sparkContext.defaultParallelism *
      (if (Tables(spark, dir).bigInputs()) 4 else 1)

  /** Exact dedup: group by content hash, keep the smallest doc_id. */
  def dedupDocExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keeper_id"))

  /** Docs → (doc_id, sh): distinct 3-word shingle sets, hashing parallelism
    * decoupled from input splits.
    *
    * Deliberately NOT [[Staged]]: the shingle frame is the family's largest
    * intermediate (~10³ bytes/doc) and its recompute is pipelined CPU — an
    * A/B measured that materializing it for reuse costs MORE on the first
    * key than every later key saves (4.2 s → 11 s on the jaccard key
    * alone). Staging pays on SMALL-but-expensive derivatives (the verified
    * pair / candidate edge tables below), not on wide raw intermediates. */
  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    shingled(fanout(Tables(spark, dir).documents.select("doc_id", "text"), "doc_id"), 3)

  /** Shingles seen in more than this many documents are dropped entirely
    * (stop-shingles carry no near-dup signal and would otherwise produce
    * O(df²) candidate pairs). Shared with the oracle SQL via interpolation. */
  val JaccardDfCap = 100

  // Historical (rounds 3–13): a JaccardExactnessMaxShingles = 10⁴ tripwire
  // guarded the former prefix-filter plan, whose one-unit integer slack
  // absorbed round(j, 4) >= 0.5 borderline pairs only while na + nb < ~9·10⁴
  // and therefore had to raise_error on larger docs. The round-14 counting
  // self-join has no prune to protect, so the tripwire (and its conditional
  // riding every doc row) is gone and giant docs no longer abort this family.

  /** N-gram Jaccard near-dup pairs (threshold 0.5; the planted testdata dups
    * sit at ≥0.97, noise below 0.08 — the threshold is not load-bearing).
    *
    * Round-14 rework: **counting postings self-join** — `n_common(a, b)` is
    * the COUNT of df-capped shingles the pair shares, computed as one
    * equi-join of the capped posting table with itself on the shingle plus
    * one partial-aggregated pair shuffle; exact by construction (it is the
    * identical algebra the DuckDB oracle runs, distributed). This replaces
    * the round-3 prefix-filter plan (AllPairs/PPJoin candidates + an exact
    * `array_intersect` verify), whose verify join shipped both documents'
    * shingle-string ARRAYS to every candidate pair: a 100× stage profile
    * showed 16.8 M candidates dragging 11.7 GB of arrays through the
    * verify shuffle with 42 GB of spill — 73% of the key's wall — because
    * near-dup candidates are precisely the docs whose shingles are all
    * repeated, so the arrays never prune. The counting join ships ~30-byte
    * rows instead of arrays: at the same 100× corpus the pair stream is
    * 127 M × 32 B ≈ 4 GB, no arrays, no distinct.
    * It also deletes the prefix plan's ⌊na/2⌋-slack exactness tripwire
    * (JaccardExactnessMaxShingles) — counting has no prune to protect.
    *
    * Exactness: unique (df = 1) shingles exist in exactly one document and
    * can never be shared, so the inner join to the df ≥ 2 census drops them
    * from the posting table with zero effect on any pair count; the df cap
    * (> [[JaccardDfCap]]) is part of the query's published semantics,
    * mirrored by the oracle. The emitted jaccard uses FULL set sizes
    * (na + nb − o) with o over the capped sets — stop-shingles can't
    * manufacture similarity, exactly as before.
    *
    * At 100 TB: two shuffles keyed by shingle (df census; the self-join)
    * and one keyed by pair. Join rows are Σ_s C(df(s), 2) ≤ cap/2 × capped
    * postings — LINEAR in the corpus with the cap as the constant, the
    * same worst-case envelope the prefix plan had, without its array
    * payload. A pair sharing many shingles emits one row per shared
    * shingle; those rows live in DIFFERENT shingle partitions, so the pair
    * shuffle ships them raw and the aggregation collapses them post-
    * shuffle (round-16 correction: the old map-side partial agg measured
    * 125.47 M rows in → 125.47 M shuffle records out — zero collapse, pure
    * spill — so the agg now rides an explicit hash(doc_a) repartition
    * instead; see the impl). Per-pair fan-in is bounded by min(na, nb), so
    * no reduce-side skew. Posting lists are never collected into one
    * aggregation buffer. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    // The verified pair table doubles as q_text_lsh_recall's exhaustive
    // TRUTH set — stage it so the recall audit reads the pairs the key
    // already computed instead of replaying the O(df²) verify leg.
    Staged("jaccard_pairs", spark, dir)(dedupNgramJaccardImpl(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))

  private def dedupNgramJaccardImpl(spark: SparkSession, dir: String): DataFrame = {
    // Per-doc shingle ARRAYS are cached (one row per doc), not the exploded
    // postings (one row per posting): same bytes, ~500× fewer row headers —
    // measured 2× cheaper to materialize. Both consumers below re-explode
    // from the cache, which pipelines without materializing. (Caller clears
    // the cache; see the class-level persist contract note.)
    val docs = docShingles(spark, dir).persist()
    val postings = docs
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("s"))
    // Census of REPEATED shingles only (df >= 2) under the stop-shingle cap:
    // the join side stays small enough for AQE to broadcast at small SFs
    // while degrading to a plain shuffled join -- never a collect -- when a
    // 100x corpus outgrows it.
    val dfreq = postings.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, JaccardDfCap))
    // Capped posting table: only shingles that are repeated (shareable) and
    // under the cap survive. The doc's FULL size nsh rides along so the pair
    // aggregation below needs no join back to a per-doc table.
    // Capped posting table PERSISTED: AQE does not stage-reuse the two
    // textually-identical sides of a self-join (measured — each side
    // re-ran the explode + census shuffles), so the cache is what makes
    // the pipeline run once; it also preserves the hash(s) partitioning
    // from the census join, so the self-join below needs no exchange at
    // all (PlanShapeSpec). ~45 B/posting — two orders smaller than the
    // shingle-array cache above.
    val p = postings.join(dfreq, Seq("s"))
      .select(col("s"), col("doc_id"), col("nsh"))
      .persist()
    // One equi-join on the shingle + one pair shuffle = exact n_common for
    // every co-occurring pair (the oracle's algebra, distributed). The
    // aggregation RIDES an explicit hash(doc_a) repartition instead of
    // planning its own keyed exchange (round-16, from a 100× stage
    // profile): a pair's occurrences live in DIFFERENT shingle partitions,
    // so the map-side partial agg below the old exchange collapsed
    // nothing — measured 125.47 M rows in, 125.47 M shuffle records out —
    // while its hash map spilled 12.7 GB; and the final agg at default
    // width spilled 13.1 GB more. Shuffling the RAW pair rows costs the
    // same bytes, the partial+final aggs both run above the exchange on
    // each task's bounded share, and the explicit width (4× cores past the
    // scale gate; AQE never coalesces an explicit-N repartition) keeps
    // that share spill-free. hash(doc_a) satisfies the aggregate's
    // clustering (equal pairs share doc_a — the PlanShapeSpec-pinned
    // property), so no second exchange appears.
    p.as("a").join(p.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.nsh").as("na"), col("b.nsh").as("nb"))
      .repartition(pairAggWidth(spark, dir), col("doc_a"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (col("na") + col("nb") - col("n_common")), 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
  }

  /** Banded MinHash candidate pairs with their lane-agreement estimate —
    * the generator stage, shared by [[minhashLsh]] (which reports it) and
    * [[dedupVerified]] (which re-checks it exactly). Takes the `(doc_id,
    * sh)` shingle frame so a caller that needs the shingles for its OWN
    * stage (the verify join) shingles the corpus once, not twice. */
  private def minhashCandidates(shingles: DataFrame): DataFrame = {
    val sig = shingles
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), expr("graft_minhash(sh)").as("sig"))
    val bands = sig.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> concat_ws('|', slice(sig, b * 4 + 1, 4)))")))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
    bands.groupBy(col("band_idx"), col("band_key"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("xs"))
      // Bucket cap (same lever as SimhashBucketCap, review finding): a band
      // key shared by more than 1000 docs is a degenerate "everything looks
      // alike" bucket whose C(k,2) struct expansion would straggle one task;
      // skip it rather than materialize it. No current-SF bucket approaches
      // the cap, and the oracle applies the identical bound.
      .filter(size(col("xs")).between(2, SimhashBucketCap))
      // Pair expansion + lane scoring via the codegen'd kernels (round 19):
      // [[graft.functions.PairsExpand]] replaces the nested-HOF expansion,
      // [[graft.functions.LaneAgree]] the zip_with lane count — both were
      // CodegenFallback, interpreted once per candidate pair.
      // `/ cast(16 as double)`, not `/ 16.0`: a decimal literal in Spark
      // SQL text is DecimalType, which would propagate DECIMAL(16,4) to the
      // output where the oracle (and the DataFrame-DSL `lit(16.0)`) is DOUBLE.
      .select(explode(expr("graft_pairs(xs)")).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        expr("round(graft_lane_agree(p.a.sig, p.b.sig) / cast(16 as double), 4)")
          .as("est_jaccard"))
      .distinct()
  }

  /** MinHash LSH near-dup pairs: 4 bands × 4 lanes; pairs sharing any band,
    * with the signature-agreement Jaccard estimate. Signatures come from the
    * native one-pass [[graft.functions.MinHash16]] kernel (lane p = min over
    * the shingle set of the p-th 8-hex-char window of
    * `sha256('0:'+x) ++ sha256('1:'+x)`; fixed-width lowercase hex orders
    * lexicographically as its numeric value, so minima stay strings) —
    * bit-identical to the HOF composition it replaced (PropertySpec) and to
    * the DuckDB oracle spelling. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashScored(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Banded-LSH candidate pairs scored BOTH ways — the 16-lane signature
    * estimate next to the exact shingle-set Jaccard — STAGED once per
    * (process, dir) like [[dedupNgramJaccard]]'s truth pairs. SIX keys
    * consume slices of this one frame ([[minhashLsh]], [[dedupVerified]]
    * and through it `q_dedup_transitivity`/`q_simhash_recall`/
    * `q_lsh_band_sweep`, [[minhashEstError]], [[nearDupRateBySource]],
    * [[textLshRecall]]), so a sweep pays the shingle+banding+verify prefix
    * once instead of six times (round-7 verdict ask #1). Content is a
    * deterministic function of the input dir, so every consumer's oracle
    * hash is unchanged; consumers re-apply their own ordering and filters.
    * Columns: doc_a, doc_b, est_jaccard, exact_jaccard. */
  private def minhashScored(spark: SparkSession, dir: String): DataFrame =
    Staged("minhash_scored", spark, dir) {
      // ONE shingle frame feeds both the generator and the verify joins —
      // the shingling scan is the expensive part and must not repeat (its
      // fanout repartition is an exchange, so runtime exchange reuse also
      // dedupes the physical work across the three consumers)
      val sh = docShingles(spark, dir).filter(size(col("sh")) > 0)
      minhashCandidates(sh)
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
          (size(col("sh_a")) + size(col("sh_b"))).cast("long").as("sz"))
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
          round(col("inter").cast("double") /
            (col("sz") - col("inter")).cast("double"), 4).as("exact_jaccard"))
    }

  /** The PRODUCTION dedup composition at 100 TB (BASELINE.md's stated
    * intent): MinHash-LSH as the candidate GENERATOR, exact Jaccard as the
    * VERIFY stage on candidates only — never pairwise over the corpus.
    * Banding bounds the candidate count; each candidate costs one O(|sh|)
    * set intersection, so total verify work is candidates × doc length —
    * linear-ish, where the all-pairs generator ([[dedupNgramJaccard]],
    * kept as the exactness yardstick) is the documented O(df²) trade.
    *
    * Shape: the candidate pairs join BACK to the shingle-set table twice
    * (equi-joins on doc id; the pair side is the small one and AQE
    * broadcasts it at sane dup densities), then a codegen'd
    * `array_intersect` computes |A∩B| and inclusion–exclusion the union.
    * Output: verified pairs with TRUE Jaccard ≥ `minJaccard` — LSH's false
    * positives filtered, its estimate replaced by the exact value.
    *
    * Measured on the dup-heavy stress shape (DedupStressProbe, 50 k docs =
    * 10 near-copies each): full generate+verify 7.1 s / 242 k candidates,
    * where the all-pairs n-gram generator took ~90 s (BASELINE.md). */
  /** Verify threshold, shared with the oracle SQL via interpolation. */
  val VerifiedMinJaccard = 0.8
  /** Edit-distance threshold for [[fuzzyNameMatch]] (shared with oracle). */
  val FuzzyMaxDist = 2

  def dedupVerified(spark: SparkSession, dir: String,
      minJaccard: Double = VerifiedMinJaccard): DataFrame =
    // The verify-stage filter runs AFTER the staged scored frame, so the
    // same staged blocks serve any threshold (and the five audit keys
    // that re-read the verified truth set stop rebuilding the
    // shingle+banding+verify prefix per key — round-7 verdict ask #1).
    minhashScored(spark, dir)
      .filter(col("exact_jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("exact_jaccard").as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** 48-bit SimHash over the distinct-token set: bit b is the sign of the
    * token-vote sum for that bit of each token's 48-bit hash. Zero-shuffle,
    * and the vote loop is the native codegen'd
    * [[graft.functions.SimHash48]] kernel (a nested higher-order `aggregate`
    * here costs 48 × n_tokens interpreted lambda steps per row). */
  private def simhashed(spark: SparkSession, dir: String): DataFrame =
    fanout(Tables(spark, dir).documents.select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), expr(s"array_distinct($wordsExpr)").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        expr(s"transform(toks, t -> ${hash48("t")})").as("hs"))
      .select(col("doc_id"), col("n_tokens"), expr("graft_simhash(hs)").as("simhash"))

  /** SimHash signatures per document. */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashed(spark, dir).orderBy(col("doc_id"))

  /** Max docs per (chunk_idx, chunk) bucket before the bucket is declared
    * degenerate and skipped. Measured necessity, not paranoia: on a 50 k-doc
    * clustered corpus the uncapped banding produced 261 M candidate pairs
    * with a 13.5 k-doc mega bucket (quadratic in cluster size); the cap
    * bounds every bucket's pair contribution to C(cap, 2) — the same lever
    * as the Jaccard df cap, and the standard treatment for "everything looks
    * alike here" buckets in production simhash dedup. */
  val SimhashBucketCap = 1000

  /** SimHash near-dup pairs: band the 48-bit signature into 4 × 12-bit
    * chunks, bucket on any equal chunk, keep candidates with Hamming ≤ 6.
    *
    * Recall contract (round-1 ADVICE): 4-chunk banding guarantees (pigeonhole)
    * that every Hamming-≤3 pair agrees on at least one chunk, so recall is
    * EXACT for Hamming ≤ 3 — except through buckets larger than
    * [[SimhashBucketCap]], which are skipped (best-effort, like Hamming 4–6
    * pairs, whose recall is banding-limited anyway). The oracle computes the
    * identical capped candidate set, so the gate compares like with like. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    // Staged once per process: [[simhashRecall]] re-reads the full candidate
    // set, so a sweep otherwise pays the signature+banding+Hamming pass
    // twice (same amortization as minhash_scored; content is deterministic,
    // consumers re-apply ordering)
    Staged("simhash_pairs", spark, dir)(simhashPairsImpl(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))

  private def simhashPairsImpl(spark: SparkSession, dir: String): DataFrame = {
    // The signature table is tiny relative to the candidate-pair volume
    // (one 64-bit signature per doc vs millions of banded collisions on this
    // corpus), and it feeds BOTH sides of the candidate join — persist it so
    // the token hashing runs once, not once per join side. At 100 TB this is
    // the standard "materialize the signature table" step of a dedup pipeline
    // (signatures are ~16 B/doc; MEMORY_AND_DISK spills safely).
    val s = simhashed(spark, dir).persist()
    val allChunks = s.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(simhash, c * 12) % 4096)")))
      .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "chunk")
    // Degenerate-bucket cap: the bucket census is tiny (≤ 4 × 4096 rows) and
    // broadcast to filter both join sides before any pair materializes.
    val okBuckets = allChunks.groupBy(col("chunk_idx"), col("chunk"))
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= SimhashBucketCap)
      .select(col("chunk_idx"), col("chunk"))
    val chunksOk = allChunks.join(broadcast(okBuckets), Seq("chunk_idx", "chunk"))
    // Per-doc bitmask of which bands survived the cap, riding both join
    // sides so the min-band predicate below can see earlier bands' cap
    // state without a lookup (the embedding-LSH capped-bands-nulled
    // pattern, in 4 bits).
    val capm = chunksOk.groupBy(col("doc_id"))
      .agg(sum(expr("shiftleft(1, chunk_idx)")).cast("int").as("capmask"))
    val chunks = chunksOk.join(capm, Seq("doc_id"))
    // Banded candidates come from an equi-join, not per-bucket pair expansion:
    // this corpus produces heavily skewed chunk buckets (vocabulary overlap
    // clusters the signatures), and a shuffled hash join distributes a hot
    // bucket's pair explosion across tasks where a collect_list bucket would
    // serialize it on one straggler (measured 4× slower locally).
    val a = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"), col("capmask").as("cm_a"))
    val b = chunks.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    // Join width pinned past the scale gate (round-17, same explosive-join
    // lever as the embedding band join in [[VectorQueries]]): the chunk
    // rows are slim (4 per doc) but the join OUTPUT is the banded collision
    // stream whose per-bucket Hamming work is quadratic in bucket size, so
    // at core-count width a few hot-bucket tasks straggle the stage (100×
    // profile: 660 task-s across 32 tasks, 51.7 s wall). 8× cores of
    // REPARTITION_BY_NUM width spreads buckets across 8 waves.
    def pinned(df: DataFrame): DataFrame =
      if (Tables(spark, dir).bigInputs())
        df.repartition(spark.sparkContext.defaultParallelism * 8,
          col("chunk_idx"), col("chunk"))
      else df
    // Exactly-once pair emission (round-14, from a 100× stage profile where
    // the pair-volume distinct shuffled 106 M rows — 40% of the key's
    // wall): keep a pair only in its FIRST live colliding band. A band j
    // collides iff the 12-bit window of sim_a ^ sim_b is zero; it is live
    // iff the shared bucket survived the cap, which both docs agree on
    // (same bucket), so doc_a's capmask bit suffices. Unrolled over the 3
    // possible earlier bands — plain bitwise columns, stays in codegen.
    // The emitted pair SET is identical to the old distinct's output: a
    // pair survives some band iff it shares at least one uncapped bucket.
    val noEarlierLiveCollision = (0 until 3).map { j =>
      (col("chunk_idx") <= j) ||
        (shiftright(col("cm_a"), j).bitwiseAND(1) === 0) ||
        (shiftright(expr("sim_a ^ sim_b"), j * 12) % 4096 =!= 0)
    }.reduce(_ && _)
    pinned(a).join(pinned(b), Seq("chunk_idx", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(noEarlierLiveCollision)
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sim_a ^ sim_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= 6)
  }

  /** Entity resolution by edit distance over the part-name dictionary:
    * name pairs within `maxDist` Levenshtein edits, blocked on the noun
    * token, with carrier counts (how many part rows hold each name).
    *
    * Shape at scale — the two tricks every record-linkage pipeline uses:
    *
    *   1. **Dictionary collapse first.** Pairwise matching runs on DISTINCT
    *      names (one hash-groupBy that also picks up the carrier counts),
    *      never on rows: a 100 TB catalog has billions of rows but a name
    *      dictionary bounded by real-world string entropy (~millions), so
    *      the quadratic stage shrinks by the duplication factor squared.
    *   2. **Blocking.** Candidates must share the noun token, so the join
    *      is a plain equi-join on the block key — never a cross join. Block
    *      sizes are dictionary-side (distinct names per noun), not
    *      row-side, so a hot name cannot create a hot block.
    *
    * The distance itself uses Spark's 3-arg `levenshtein` (band-limited
    * O(len·maxDist) DP that bails to -1 past the threshold, vs O(len²)
    * full). Self-pairs and mirrored pairs are removed by `name_a < name_b`
    * BEFORE the distance evaluates, halving the DP work. */
  def fuzzyNameMatch(spark: SparkSession, dir: String,
      maxDist: Int = FuzzyMaxDist): DataFrame = {
    val t = Tables(spark, dir)
    val names = t.part.groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      // coalesce to '': a single-token name has no second token and Spark's
      // getItem yields NULL (NULL ≠ NULL would silently drop it from
      // matching), where the oracle's split_part yields '' and blocks
      // single-token names together — mirror that
      .withColumn("block",
        coalesce(split(col("p_name"), " ").getItem(1), lit("")))
    val a = names.select(col("block"), col("p_name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val b = names.select(col("block").as("block_b"),
      col("p_name").as("name_b"), col("n_parts").as("n_parts_b"))
    a.join(b, col("block") === col("block_b") && col("name_a") < col("name_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_parts_a"), col("n_parts_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Modulus of the deterministic delta/corpus split for
    * [[dedupIncremental]] (doc_id % mod == 0 ⇒ incoming). Shared with the
    * oracle SQL. */
  val DeltaMod = 5

  /** Incremental (delta-vs-corpus) dedup — the INGESTION-time shape: flag
    * each incoming document that near-duplicates the EXISTING corpus,
    * without ever pairing the corpus against itself. A production pipeline
    * runs this on every arriving batch: the corpus's banded signature table
    * is a persisted index that only gets probed, so per-batch work is
    * O(delta × bucket occupancy), not O(corpus²) and not even O(corpus) —
    * the asymmetry is the entire point, and it is what the symmetric
    * [[minhashCandidates]] path (new corpus, first build) cannot give you.
    *
    * Pipeline: shared MinHash banding (same [[graft.functions.MinHash16]]
    * lanes, bands and bucket cap as the symmetric path — the persisted index
    * serves both), delta bands equi-joined against corpus bands, candidates
    * verified with exact shingle-set Jaccard ≥ `minJaccard`, and each flagged
    * incoming doc labeled with its best corpus match (highest Jaccard, ties
    * to the smallest id — `row_number` = 1, which plans the WindowGroupLimit
    * pre-shuffle prune). */
  def dedupIncremental(spark: SparkSession, dir: String,
      minJaccard: Double = VerifiedMinJaccard): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docShingles(spark, dir).filter(size(col("sh")) > 0)
    val bands = sh
      .select(col("doc_id"), expr("graft_minhash(sh)").as("sig"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 3), b -> concat_ws('|', slice(sig, b * 4 + 1, 4)))")))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
    val capped = bands.join(
      bands.groupBy(col("band_idx"), col("band_key"))
        .agg(count(lit(1)).as("k")).filter(col("k") <= SimhashBucketCap)
        .select(col("band_idx"), col("band_key")),
      Seq("band_idx", "band_key"))
    val delta = capped.filter(col("doc_id") % DeltaMod === 0)
      .select(col("band_idx"), col("band_key"), col("doc_id").as("doc_new"))
    val corpus = capped.filter(col("doc_id") % DeltaMod =!= 0)
      .select(col("band_idx"), col("band_key"), col("doc_id").as("doc_old"))
    val cand = delta.join(corpus, Seq("band_idx", "band_key"))
      .select(col("doc_new"), col("doc_old")).distinct()
    val verified = cand
      .join(sh.select(col("doc_id").as("doc_new"), col("sh").as("sh_n")), Seq("doc_new"))
      .join(sh.select(col("doc_id").as("doc_old"), col("sh").as("sh_o")), Seq("doc_old"))
      .select(col("doc_new"), col("doc_old"),
        size(array_intersect(col("sh_n"), col("sh_o"))).cast("long").as("inter"),
        (size(col("sh_n")) + size(col("sh_o"))).cast("long").as("sz"))
      .select(col("doc_new"), col("doc_old"),
        round(col("inter").cast("double") /
          (col("sz") - col("inter")).cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
    val w = Window.partitionBy(col("doc_new"))
      .orderBy(col("jaccard").desc, col("doc_old"))
    verified.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_new"), col("doc_old").as("dup_of"), col("jaccard"))
      .orderBy(col("doc_new"))
  }

  /** Passage width (words) for [[passageDedup]]. */
  val PassageW = 20

  /** Cross-document passage-level dedup census — the hashed-passage
    * approximation of suffix-array substring dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"): whole-doc
    * dedup misses documents that share long spans without being near-copies
    * (boilerplate, quotations, licence blocks), and those shared spans are
    * what LMs memorize. Each doc is cut into consecutive non-overlapping
    * [[PassageW]]-word passages (tail remainder dropped — a partial passage
    * has no fixed-width identity); a passage is *duplicated* when its text
    * occurs in at least one OTHER document. Output per doc: passage count,
    * duplicated-passage count, and the duplicated fraction — the signal a
    * pipeline thresholds to route docs to span-level cleaning.
    *
    * Shape at scale: tokenize once ([[fanout]] ahead of the hashing stage),
    * explode to (doc, passage-hash) — linear in corpus tokens — then ONE
    * hash-keyed shuffle computing each passage-hash's distinct-doc spread
    * (partial agg map-side), a semi-join of the exploded rows against the
    * cross-doc hashes (a sliver — AQE broadcasts it), and a final per-doc
    * partial agg. No pairwise enumeration at any point, so unlike the
    * pair-generating near-dup family this census stays linear even on a
    * 100 % duplicated corpus. 48-bit passage hashes keep the shuffle narrow;
    * a collision can only overcount duplication (conservative direction)
    * and the oracle hashes identically so the gate is exact. */
  def passageDedup(spark: SparkSession, dir: String, w: Int = PassageW): DataFrame = {
    val toks = fanout(Tables(spark, dir).documents, "doc_id")
      .select(col("doc_id"), expr(wordsExpr).as("ws"))
    // Guard: Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty —
    // without the filter a doc shorter than one passage fabricates two.
    val passages = toks
      .filter(size(col("ws")) >= w)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(ws) div $w), i -> " +
          s"array_join(slice(ws, (i - 1) * $w + 1, $w), ' '))")).as("p"))
      .select(col("doc_id"), expr(hash48("p")).as("h"))
    val crossDoc = passages.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("h"))
    passages
      .join(crossDoc.withColumn("dup", lit(1L)), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dup_passages"))
      .withColumn("dup_frac",
        round(col("n_dup_passages").cast("double") /
          col("n_passages").cast("double"), 6))
      .orderBy(col("doc_id"))
  }

  /** Per-document n-gram novelty under doc_id arrival order: the fraction
    * of a doc's distinct shingles never seen in any EARLIER doc — the
    * marginal-information curve of a growing corpus. Summed over an
    * acquisition batch this is the diminishing-returns signal ("the last
    * crawl increment brought 3% new n-grams") that decides whether more of
    * the same source is worth ingesting. A shingle's first owner is its
    * minimum doc_id, so novelty needs no sequential scan: one shuffle
    * keyed by shingle for the min, one partial-agg back to the doc grain.
    * Ties are impossible (min is unique per shingle), so the curve is
    * deterministic under any parallelism. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val postings = docShingles(spark, dir)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val firstDoc = postings.groupBy(col("s")).agg(min(col("doc_id")).as("fd"))
    postings.join(firstDoc, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("doc_id") === col("fd"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 6))
      .orderBy(col("doc_id"))
  }

  /** Near-dup incidence per source: the fraction of each source's docs
    * that appear in at least one banded-MinHash candidate pair — the
    * "which feed is flooding us with near-copies" attribution report that
    * turns the corpus-level dedup census into a per-supplier quality
    * signal. One explode of the (bounded) candidate pair stream, one
    * distinct, one broadcast-sized join back to the doc table, one
    * source-grain rollup. */
  def nearDupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val involved = minhashScored(spark, dir)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    Tables(spark, dir).documents.select(col("doc_id"), col("source"))
      .join(involved.withColumn("nd", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("nd"), lit(0L))).as("n_near_dup"))
      .withColumn("nd_rate",
        round(col("n_near_dup").cast("double") / col("n_docs"), 6))
      .orderBy(col("source"))
  }

  /** Text-LSH recall monitor: for every TRUE near-dup pair (the exhaustive
    * [[dedupNgramJaccard]] frontier, jaccard ≥ 0.5), did the banded MinHash
    * generator ([[minhashCandidates]]) produce it as a candidate? Reported
    * per jaccard band (0.5–0.6, …, ≥ 1.0), because banding recall is a
    * steep function of true similarity — the 4×4 geometry is DESIGNED to
    * recall the ≥ 0.8 region (the [[dedupVerified]] threshold) and shed the
    * borderline band, and this query measures exactly that curve. The text
    * twin of [[VectorQueries.annRecall]]: `q_lsh_bucket_stats` watches the
    * vector generator's health, `q_ann_recall` its quality; this is the
    * quality monitor for the TEXT route. Exhaustive truth is the documented
    * O(df²) yardstick — run at audit cadence, never per-ingest.
    *
    * Determinism: band = ⌊10·round(j, 4)⌋ on the exact verified jaccard;
    * the hit join is a left semi on the (a < b)-canonical pair key. */
  def textLshRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = dedupNgramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val cand = minhashScored(spark, dir)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
    truth.join(cand, Seq("doc_a", "doc_b"), "left")
      .groupBy(floor(col("jaccard") * 10).cast("long").as("band"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_true"), 4))
      .orderBy(col("band"))
  }

  /** Containment threshold and minimum shingle count for
    * [[containmentDedup]] (shared with the oracle SQL). */
  val ContainmentMin = 0.9
  val ContainmentMinShingles = 5

  /** Near-SUBSET detection: ordered pairs (doc_a, doc_b) where at least
    * [[ContainmentMin]] of doc_a's shingles also occur in doc_b —
    * containment C(A→B) = |A∩B| / |A|. This is the duplication class
    * symmetric Jaccard structurally misses: a paragraph quoted inside a
    * 100× larger page has Jaccard ≈ 0.01 but containment 1.0, and it is
    * exactly how boilerplate, quotations, and syndicated excerpts hide from
    * whole-doc near-dup passes (the pairwise complement of the
    * [[passageDedup]] census). Sizes use the FULL shingle sets,
    * intersections the df-capped sets — the same convention as
    * [[dedupNgramJaccard]], so stop-shingles can't manufacture containment.
    *
    * Round-14 rework, same as [[dedupNgramJaccard]]: a counting postings
    * self-join replaces the one-sided prefix filter + `array_intersect`
    * verify. n_common(a, b) for every co-occurring pair is ONE equi-join of
    * the capped posting table with itself plus one partial-aggregated pair
    * shuffle (the oracle's algebra, distributed) — no arrays ever ride a
    * pair row, which at a 100× profile was 73% of the family's wall.
    * Containment is one-directional, so the unordered pair counts are
    * exploded into both orientations AFTER the aggregation (one extra
    * pipelined stage, no recompute of the join) and thresholded per side;
    * a pre-filter on round(n/min(na,nb), 4) — the larger of the two
    * orientations' containments, monotone under round — drops the explode
    * input to only pairs at least one of whose orientations can qualify. */
  def containmentDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = docShingles(spark, dir).persist()
    val postings = docs
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("s"))
      .filter(col("nsh") >= ContainmentMinShingles)
    val dfreq = postings.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, JaccardDfCap))
    val p = postings.join(dfreq, Seq("s"))
      .select(col("s"), col("doc_id"), col("nsh"))
      .persist() // self-join sides share one materialization, as above
    // pair agg rides an explicit hash(doc_x) repartition — same measured
    // rationale as [[dedupNgramJaccardImpl]] (the map-side partial agg
    // below a keyed exchange collapses nothing on shingle-partitioned
    // pair streams and only spills)
    val und = p.as("a").join(p.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_x"), col("b.doc_id").as("doc_y"),
        col("a.nsh").as("nx"), col("b.nsh").as("ny"))
      .repartition(pairAggWidth(spark, dir), col("doc_x"))
      .groupBy(col("doc_x"), col("doc_y"), col("nx"), col("ny"))
      .agg(count(lit(1)).as("n_common"))
      // best-case orientation prune (see scaladoc): round is monotone, so
      // neither orientation can reach the threshold if this one can't
      .filter(round(col("n_common").cast("double") /
        least(col("nx"), col("ny")), 4) >= ContainmentMin)
    und.select(explode(array(
        struct(col("doc_x").as("doc_a"), col("doc_y").as("doc_b"),
          col("nx").as("na"), col("ny").as("nb"), col("n_common")),
        struct(col("doc_y").as("doc_a"), col("doc_x").as("doc_b"),
          col("ny").as("na"), col("nx").as("nb"), col("n_common")))).as("r"))
      .select(col("r.doc_a").as("doc_a"), col("r.doc_b").as("doc_b"),
        col("r.na").cast("long").as("na"), col("r.nb").cast("long").as("nb"),
        col("r.n_common").as("n_common"))
      .withColumn("containment",
        round(col("n_common").cast("double") / col("na"), 4))
      .filter(col("containment") >= ContainmentMin)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Sketch-accuracy audit for the MinHash estimator: every banded LSH
    * candidate pair scored BOTH ways — the 16-lane signature-agreement
    * estimate next to the true shingle-set Jaccard — with the absolute
    * error. This is the observability row behind [[dedupVerified]]'s
    * design: it measures, on live data, how far the cheap estimate strays
    * from the exact verify it gates (expected σ ≈ √(J(1−J)/16) ≈ 0.1 —
    * lanes are Bernoulli(J)), and whether 16 lanes still justify the
    * verify stage or could drive thresholds directly.
    *
    * Shape at scale: identical to [[dedupVerified]] (candidates from
    * capped banding, two equi-joins back to the shingle table, codegen'd
    * intersection) — the audit costs the same as the production path it
    * audits, never more. */
  def minhashEstError(spark: SparkSession, dir: String): DataFrame =
    minhashScored(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"), col("exact_jaccard"),
        round(abs(col("est_jaccard") - col("exact_jaccard")), 4).as("abs_err"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Near-dup transitivity audit over the VERIFIED pair graph: wedge
    * closure rate (a~b ∧ b~c ⇒ a~c?). Jaccard ≥ τ is not transitive, and
    * the closure rate is exactly the number that says how much damage
    * cluster-level canonicalization (CC over these edges — [[q_curation_cc]])
    * does by merging a-c pairs no verifier ever approved: closure ≈ 1
    * means clusters are honest cliques; low closure means CC is chaining.
    *
    * Shape at scale: the verified pair set is the SMALL output of the
    * banded generator (candidates × verify), so the wedge join is a
    * self-join of a near-dup edge list on its center node — bounded by
    * Σ deg², the same budget [[q_link_predict]] documents — and closure is
    * one more equi-join against the edges. Output is one row. */
  def dedupTransitivity(spark: SparkSession, dir: String): DataFrame = {
    val e = dedupVerified(spark, dir).select(col("doc_a"), col("doc_b"))
    val und = e.unionByName(
      e.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val wedges = und.select(col("doc_a").as("a"), col("doc_b").as("ctr"))
      .join(und.select(col("doc_a").as("ctr"), col("doc_b").as("c")), Seq("ctr"))
      .filter(col("a") < col("c"))
      .select(col("a"), col("c"))
    val closed = wedges
      .join(e.select(col("doc_a").as("a"), col("doc_b").as("c"))
        .withColumn("closed", lit(1L)), Seq("a", "c"), "left")
      .agg(count(lit(1)).as("n_wedges"),
        sum(coalesce(col("closed"), lit(0L))).as("n_closed"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    closed.crossJoin(broadcast(edges))
      .select(col("n_edges"), col("n_wedges"), col("n_closed"),
        when(col("n_wedges") > 0,
          round(col("n_closed").cast("double") / col("n_wedges").cast("double"), 6))
          .as("closure_rate"))
  }

  /** SimHash-route quality monitor: the banded-Hamming candidate pairs
    * ([[simhashPairs]]) scored against the verified near-dup truth
    * ([[dedupVerified]], exact Jaccard ≥ τ) — recall says how much real
    * duplication the cheap 48-bit route misses, precision how much of its
    * candidate volume is noise. The MinHash route has [[q_text_lsh_recall]];
    * with this, BOTH sketch routes carry a live quality row, which is what
    * lets an operator pick a route per corpus instead of by folklore.
    *
    * Shape at scale: both pair sets are SMALL outputs of capped banded
    * generators; the intersection is one semi-join on the pair key and the
    * readout is three 1-row aggregates broadcast together. */
  def simhashRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = dedupVerified(spark, dir).select(col("doc_a"), col("doc_b"))
    val cand = simhashPairs(spark, dir).select(col("doc_a"), col("doc_b"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    // n_cand and n_hit in ONE exchange-free pass over the candidate table
    // (round-17, from a 100× profile): the old truth-LEFT-SEMI-candidates
    // spelling put the 92.7 M-row candidate table on the RIGHT of a semi
    // join, which BroadcastHashJoin can only build — so Spark shuffled the
    // whole candidate set (92.7 M-row exchange + 3 GB spill) to probe a
    // 25 k-row truth side. Flipped, the truth set broadcasts and the
    // candidates stream map-side. Counts are identical because BOTH pair
    // tables are duplicate-free on (doc_a, doc_b) (min-band exactly-once
    // emission / verified-pair distinctness), so |truth ⋉ cand| =
    // |cand ⋈ truth|. The broadcast is sized by REAL near-dup density
    // (truth = exact-Jaccard ≥ τ pairs), the quantity this audit exists to
    // measure — a corpus whose truth set outgrows the driver needs its dup
    // explosion fixed, not a bigger audit join.
    // coalesce the SUM, not (only) the per-row term: with an EMPTY candidate
    // table the global agg returns n_cand=0 but sum(...)=NULL, and n_hit /
    // recall would go NULL where the pre-r17 left-semi spelling returned 0
    // (round-17 ADVICE).
    val counted = cand.join(
        broadcast(truth.withColumn("t", lit(1L))), Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_cand"),
        coalesce(sum(coalesce(col("t"), lit(0L))), lit(0L)).as("n_hit"))
    nTruth.crossJoin(broadcast(counted))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") > 0,
          round(col("n_hit").cast("double") / col("n_truth").cast("double"), 6))
          .as("recall"),
        when(col("n_cand") > 0,
          round(col("n_hit").cast("double") / col("n_cand").cast("double"), 6))
          .as("precision"))
  }

  /** Band configurations for [[lshBandSweep]]: (name, bands, lanes/band)
    * over the SAME 16-lane signature. Shared with the oracle SQL. */
  val BandConfigs: Seq[(String, Int, Int)] =
    Seq(("b2x8", 2, 8), ("b4x4", 4, 4), ("b8x2", 8, 2))

  /** LSH banding-geometry sweep: the 16-lane MinHash signatures banded
    * three ways — 2×8 (high precision), the production 4×4, 8×2 (high
    * recall) — each candidate set scored against the verified truth
    * (exact J ≥ τ). The S-curve P(candidate) = 1 − (1 − J^lanes)^bands
    * says 8×2 catches weaker pairs at a candidate-volume price and 2×8
    * the reverse; this table MEASURES that trade on the live corpus,
    * which is how the 4×4 default gets justified (or revised) per corpus
    * instead of by folklore.
    *
    * Shape at scale: ONE signature pass feeds all three arms; each arm is
    * the standard capped-bucket pair enumeration (never a cross product),
    * and the scoring is a pair-key semi-join against the small verified
    * set. Output: 3 rows. */
  def lshBandSweep(spark: SparkSession, dir: String): DataFrame = {
    val sig = docShingles(spark, dir).filter(size(col("sh")) > 0)
      .select(col("doc_id"), expr("graft_minhash(sh)").as("sig"))
      .persist()
    val truth = dedupVerified(spark, dir).select(col("doc_a"), col("doc_b"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val arms = BandConfigs.map { case (name, nb, lpb) =>
      val cand = sig
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, ${nb - 1}), b -> concat_ws('|', slice(sig, b * $lpb + 1, $lpb)))")))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
        .groupBy(col("band_idx"), col("band_key"))
        .agg(collect_list(col("doc_id")).as("xs"))
        .filter(size(col("xs")).between(2, SimhashBucketCap))
        // codegen'd pair kernel, same semantics as the HOF it replaces
        .select(explode(expr("graft_pairs(xs)")).as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
        .distinct()
      val nCand = cand.agg(count(lit(1)).as("n_cand"))
      val nHit = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      nCand.crossJoin(broadcast(nHit)).crossJoin(broadcast(nTruth))
        .select(lit(name).as("config"), col("n_cand"), col("n_hit"), col("n_truth"),
          when(col("n_truth") > 0,
            round(col("n_hit").cast("double") / col("n_truth").cast("double"), 6))
            .as("recall"),
          when(col("n_cand") > 0,
            round(col("n_hit").cast("double") / col("n_cand").cast("double"), 6))
            .as("precision"))
    }
    arms.reduce(_ unionByName _).orderBy(col("config"))
  }

  /** Token length of the prefix [[dedupPrefix]] keys on. */
  val PrefixTokens = 8

  /** Boilerplate-head census: documents sharing the same first
    * [[PrefixTokens]]-token prefix — the cheap detector for templated
    * openings (scraped nav bars, license headers, form letters) that exact
    * dedup misses because the TAILS differ. Groups with ≥ 2 docs are
    * reported with their source spread; a high `n_sources` group is
    * boilerplate (same template everywhere), a 1-source group is a
    * crawler-trap signature.
    *
    * Shape at scale: a pure narrow projection (slice + join + md5 — all
    * codegen'd) followed by ONE partial-agg shuffle on the 48-bit prefix
    * hash. The distinct-source count is Spark's exact two-phase
    * count-distinct over the same shuffle. No pair enumeration at any
    * point: this is the hash-groupBy economics of [[dedupDocExact]] applied
    * to a key that near-dup families share by construction. */
  def dedupPrefix(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      // non-null guard: prefix_hash is the ORDER BY key, and a NULL text
      // would make it NULL — Spark sorts NULLS FIRST, DuckDB NULLS LAST
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        expr(s"${TextQueries.hash48(s"array_join(slice($wordsExpr, 1, $PrefixTokens), ' ')")}")
          .as("prefix_hash"))
      .groupBy(col("prefix_hash"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc_id"))
      .where(col("n_docs") >= 2)
      .orderBy(col("prefix_hash"))
}
