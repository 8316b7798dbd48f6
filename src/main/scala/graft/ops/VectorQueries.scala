package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Similarity search over the `embeddings` table (`embedding: array<float>`,
  * 64-dim ~unit vectors) — the vector half of a training-data pipeline
  * (north-star extension; the reference has no vector operations).
  *
  * Three escalating search strategies plus the dedup + clustering building
  * blocks, each the standard industrial shape re-expressed Spark-first:
  *
  *   1. **Brute force** ([[similarVectors]]): exact cosine top-k via a
  *      broadcast single-row probe — the correctness baseline. The scan is
  *      embarrassingly parallel; `ORDER BY sim LIMIT k` compiles to
  *      `TakeOrderedAndProject` (per-partition heap + driver merge of k rows,
  *      never a full sort shuffle), so it scales to any corpus the scan scales
  *      to: at 100 TB it is one pass, zero shuffles.
  *   2. **Random-hyperplane LSH** ([[annLsh]], [[dedupEmbedding]]): 64 sign
  *      bits (Charikar SimHash for angles), banded 8×8; candidates share at
  *      least one 8-bit band. Signatures come from a broadcast join against a
  *      64-row plane table, so the per-vector cost is 64 dot products and the
  *      pair enumeration is an equi-join on (band, value) — never a cross
  *      product. The geometry is a function of corpus size (see
  *      [[VectorQueries.EmbeddingLsh]] for the recall formula, the
  *      `geometryFor` sizing knob, and the worked n = 10⁹ example), with
  *      [[lshBucketStats]] as the cap-skip monitor.
  *   3. **IVF** ([[ivfSearch]]): coarse-quantize every vector to its nearest
  *      centroid (inverted lists), search only the `nprobe` lists nearest the
  *      probe. Centroids here are deterministically seeded (vec_id < 10) so
  *      the DuckDB oracle can replay them; a production pipeline would refine
  *      them with Lloyd iterations built from [[vectorCentroids]] — the
  *      M-step — but the *serving* path (assign → invert → nprobe → exact
  *      rerank) is exactly this shape. At 100 TB the assignment becomes the
  *      partitioning key, so a probe touches nprobe/nlists of the data.
  *
  * Determinism contract shared with the DuckDB oracle: all arithmetic is
  * double-precision with the same left-fold summation order (`aggregate` in
  * Spark, `list_sum`/`list_reduce` in DuckDB — verified bit-identical), so
  * similarity values, sign bits, and argmax assignments agree exactly; every
  * emitted double is `round`ed once at the output.
  *
  * Persist contract: [[annLsh]] `persist()`s the banded signature table, and
  * [[dedupEmbedding]]/[[mutualKnn]] persist the band rows JOINED with their
  * vectors + norms + full per-band signature (n × bands rows × ~640 B — the
  * arrays deliberately ride this linear relation so they never shuffle at
  * pair volume; round-10. The signature column is what lets the pair join
  * emit exactly-once via `graft_min_band`, so no pair-volume distinct
  * exists either; round-14).
  * The caller runs the plan and then clears the cache — see the identical
  * contract note on [[DedupQueries]].
  */
object VectorQueries {

  /** Sequential-fold dot product of two array<double> columns — the native
    * codegen'd [[graft.functions.DotProduct]] kernel (registered by
    * GraftExtensions), bit-identical to both the `aggregate(zip_with(...))`
    * composition it replaced and DuckDB's `list_sum(list_transform(...))`
    * oracle spelling (same left-fold order). */
  private[ops] def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  private[ops] def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Embeddings with the float vector cast to array<double> once. */
  private[ops] def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("e"))

  /** Single-row probe vector (vec_id = `id`), for broadcasting. */
  private def probe(spark: SparkSession, dir: String, id: Long): DataFrame =
    emb(spark, dir).filter(col("vec_id") === id).select(col("e").as("pe"))

  /** Brute-force exact cosine top-`k` neighbors of vec `probeId` (SURVEY
    * §2.4 `q_similar_vectors`; registry runs probe 0 / k = 20). One narrow
    * pass + TakeOrderedAndProject. */
  def similarVectors(spark: SparkSession, dir: String,
      probeId: Long = 0L, k: Int = 20): DataFrame =
    emb(spark, dir)
      .crossJoin(broadcast(probe(spark, dir, probeId)))
      .filter(col("vec_id") =!= probeId)
      .select(col("vec_id"), col("label"),
        round(cosine(col("e"), col("pe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)

  /** Constants shared with the oracle SQL via interpolation. */
  val AnnBatchProbes = 8
  val AnnBatchK = 5
  /** Near-dup edge threshold for the demo corpus (random unit vectors). */
  val EmbeddingMinCos = 0.25
  /** Dims reported by vectorCentroids (shared with the oracle SQL). */
  val CentroidDims = 8

  /** Batch exact ANN: cosine top-`k` for a whole PROBE SET in one corpus
    * pass (vec_id < `nProbes` here; production passes any small probe
    * table). This is the serving shape for "embed a query batch, retrieve
    * per-query neighbors": the probe set is driver-bounded metadata, so it
    * ships broadcast and the corpus is scanned ONCE for all probes —
    * vs [[similarVectors]] × nProbes, which is nProbes full scans.
    *
    * The per-probe top-k is `row_number() ≤ k` over the probe partition,
    * which Spark plans as WindowGroupLimit (asserted in PlanShapeSpec):
    * every map task pre-prunes to its local k per probe BEFORE the
    * shuffle, so the exchange carries ≤ tasks×probes×k rows — never the
    * corpus×probes score stream. Ranking is on the ROUNDED similarity
    * (ties broken by vec_id), same contract as the oracle. */
  def annBatch(spark: SparkSession, dir: String,
      nProbes: Int = AnnBatchProbes, k: Int = AnnBatchK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = emb(spark, dir).filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    emb(spark, dir)
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine(col("e"), col("pe")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy(col("probe_id"), col("rn"))
  }

  /** Hard negatives returned per probe (shared with the oracle SQL). */
  val HardNegK = 3

  /** Hard-negative mining — the contrastive-training prep query: for each
    * probe, the most-similar corpus vectors with a DIFFERENT label. "Near
    * but wrong" examples are what give a triplet/InfoNCE loss its gradient
    * signal (random negatives are trivially separable); this is the batch
    * that builds them. Identical plan shape to [[annBatch]] — broadcast
    * probe set, ONE corpus pass, WindowGroupLimit pre-shuffle prune — with
    * the label-mismatch predicate applied before scoring, so same-label
    * vectors never enter the ranking. At 100 TB the exact scan swaps for
    * the [[EmbeddingLsh]] candidate generator exactly as ANN does; the
    * ranking contract stays. */
  def hardNegatives(spark: SparkSession, dir: String,
      nProbes: Int = AnnBatchProbes, k: Int = HardNegK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = emb(spark, dir).filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("label").as("probe_label"),
        col("e").as("pe"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    emb(spark, dir)
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id") &&
        col("label") =!= col("probe_label"))
      .select(col("probe_id"), col("vec_id"), col("label"),
        round(cosine(col("e"), col("pe")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy(col("probe_id"), col("rn"))
  }

  /** Random-hyperplane LSH geometry — the scale dial the round-2 review
    * flagged as missing. Candidate recall for a pair at angle θ under
    * `bands` bands of `bits` bits each is
    *
    *   recall(θ) = 1 − (1 − (1 − θ/π)^bits)^bands
    *
    * and the expected bucket size on an unclustered corpus of n vectors is
    * n / 2^bits, so `bits` must grow with log₂(n) to keep buckets under the
    * skip cap and `bands` must grow to buy the recall back. The defaults
    * (8 × 8 = 64-bit signatures, 256 buckets/band) replace round 2's fixed
    * 4 × 4 geometry, whose 16 buckets/band meant every bucket blew past the
    * cap once n ≈ 16 k — silent recall collapse. [[geometryFor]] is the
    * production knob; [[VectorQueries.lshBucketStats]] is the monitor that
    * makes cap-skips visible instead of silent.
    *
    * Worked example at n = 10⁹, cap = 1000, dedup at cosine ≥ 0.95
    * (per-bit agreement p = 1 − acos(0.95)/π ≈ 0.899): bits = 22 keeps
    * expected buckets at n/2²² ≈ 240 < cap; a band matches with
    * p²² ≈ 0.096, so 30 bands give recall 1 − (1 − 0.096)³⁰ ≈ 0.95 — that
    * is what `geometryFor(1e9.toLong)` returns. Signature cost is
    * bands × bits = 660 dot products per vector, amortized once at
    * signature-build time (the standard accuracy/cost trade at that scale). */
  object EmbeddingLsh {
    val Bands = 8
    val BitsPerBand = 8

    /** (bands, bits) sized for corpus size n: bits from the bucket-size
      * bound 2^bits ≥ 4n/cap, bands from inverting the recall formula at
      * `minCosine`/`targetRecall`. */
    def geometryFor(n: Long, cap: Int = DedupQueries.SimhashBucketCap,
        minCosine: Double = 0.95, targetRecall: Double = 0.95): (Int, Int) = {
      val bits = math.max(8,
        math.ceil(math.log(4.0 * n / cap) / math.log(2.0)).toInt)
      val pBand = math.pow(1.0 - math.acos(minCosine) / math.Pi, bits)
      val bands = math.max(4,
        math.ceil(math.log1p(-targetRecall) / math.log1p(-pBand)).toInt)
      (bands, bits)
    }

    /** Production sizing knob (round-3 review): set this session conf to
      * the (approximate) corpus vector count and every auto-sizer derives
      * from it — the LSH queries in this file plan their banding via
      * [[geometryFor]] instead of the fixed defaults (e.g.
      * `spark.conf.set(CorpusSizeConf, "1000000000")` plans 30 bands × 22
      * bits), and since round 12 `ClusterQueries.resolveK` derives
      * SemDeDup/clusterStats auto-k from the same count (one sizing knob,
      * every auto-sizer). For LSH banding an estimate is fine — recall
      * degrades gradually with n (the cap-skip monitor
      * [[VectorQueries.lshBucketStats]] is the alarm for a stale value).
      * Auto-k is NOT gradual: k steps discretely with the count and
      * cluster ids / keep-drop decisions shift at each step, so pin
      * SemDeDup's k explicitly when this conf carries a rough estimate. */
    val CorpusSizeConf = "spark.graft.lsh.corpusSize"

    /** Parse a sizing knob's corpus row count, failing with the knob's
      * NAME — a bare `toLong` would surface a malformed value as a
      * contextless NumberFormatException deep inside a sizing rule (or,
      * for the registry-init path, an opaque ExceptionInInitializerError).
      * Non-positive counts are rejected here too: a negative n would flow
      * through [[geometryFor]]'s log as NaN and silently yield the MINIMUM
      * geometry instead of a loud config error (round-12 review). ONE
      * parser for both knobs so they cannot drift. */
    private def parseCount(raw: String, name: String): Long = {
      val n =
        try raw.trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$name must be a corpus row count, got '$raw'")
        }
      require(n > 0, s"$name must be a POSITIVE corpus row count, got '$raw'")
      n
    }

    /** [[CorpusSizeConf]]'s pinned count (see [[parseCount]]). */
    def pinnedCorpus(spark: org.apache.spark.sql.SparkSession): Option[Long] =
      spark.conf.getOption(CorpusSizeConf).map(parseCount(_, CorpusSizeConf))

    /** Defaults stop being `geometryFor`'s own answer above this corpus
      * size; past it the geometry derives from the MEASURED count.
      * Derived from the cap (E[bucket] = n/2^bits ≤ cap at n = 64 · cap
      * under the 8-bit default) so the two constants cannot silently
      * decouple (round-10 review). */
    val AutoThreshold: Long = 64L * DedupQueries.SimhashBucketCap

    /** Corpus count the ORACLE SQL should size for (round-12): set the
      * `SPARK_GRAFT_ORACLE_CORPUS` env var and every registry oracle that
      * interpolates LSH geometry or SemDeDup k renders with
      * [[geometryFor]]/auto-k of THIS count — the same sizing rule the
      * engine applies when [[CorpusSizeConf]] is pinned to the same value
      * (graft.Verify pins it automatically from the env var). This is how
      * the auto-sized keys get HASH-checked at blown-up scale instead of
      * merely running without errors: one count, two engines, same rule. */
    def oracleCorpus: Option[Long] =
      sys.env.get("SPARK_GRAFT_ORACLE_CORPUS")
        .map(parseCount(_, "SPARK_GRAFT_ORACLE_CORPUS"))

    /** (bands, bits) the registry oracle SQL renders with: mirrors the
      * engine's [[CorpusSizeConf]] path (geometryFor, unconditionally)
      * when [[oracleCorpus]] is set, else the fixed test-scale defaults. */
    def oracleGeometry: (Int, Int) =
      oracleCorpus.map(geometryFor(_)).getOrElse((Bands, BitsPerBand))

    /** Effective (bands, bits) for this corpus: [[CorpusSizeConf]] wins
      * when set; otherwise the geometry AUTO-SIZES from the corpus's
      * actual vector count (a cached zero-column scan) once it
      * exceeds [[AutoThreshold]] — the same measure-then-encode pattern as
      * `SensorPipeline.autoStatePartitions`. Round-10's 100× full-sweep
      * probe is why this stopped being conf-only: at 200 k vectors the
      * n ≲ 64 k defaults put ~780 vectors in every bucket and the pair
      * stage exploded ~600 M candidates — the documented knob existed and
      * nothing applied it. Below the threshold the fixed defaults keep the
      * static DuckDB oracle geometry-stable at test scale. */
    def geometry(spark: SparkSession, dir: String): (Int, Int) =
      pinnedCorpus(spark)
        .map(geometryFor(_))
        .getOrElse {
          val n = corpusSize(spark, dir)
          if (n <= AutoThreshold) (Bands, BitsPerBand)
          else {
            val g = geometryFor(n)
            // candidate sets change with the geometry, as they must — log
            // the flip once instead of changing silently (round-10 review)
            if (!loggedAuto.getAndSet(true))
              System.err.println(s"[graft-lsh] auto geometry " +
                s"(bands=${g._1}, bits=${g._2}) for $n vectors; set " +
                s"$CorpusSizeConf to pin")
            g
          }
        }
    private val loggedAuto = new java.util.concurrent.atomic.AtomicBoolean(false)
  }

  /** Corpus vector count per data dir, cached for the process under the
    * CANONICAL path (same normalization as `Staged`): drives LSH
    * auto-geometry and SemDeDup auto-k. The count is ONE distributed
    * zero-column scan (Catalyst prunes every column for a bare count, so
    * tasks read parquet page headers, not data) — cheap and, unlike a
    * driver-side footer walk, it stays cheap when the dir holds thousands
    * of files. The cache assumes data dirs are immutable inputs (true of
    * the testdata and blow-up dirs); a pipeline that rewrites a dir
    * in-process should pin sizing via the explicit conf/k knobs instead. */
  private val corpusCounts = scala.collection.concurrent.TrieMap.empty[String, Long]
  private[ops] def corpusSize(spark: SparkSession, dir: String): Long = {
    val key = new java.io.File(dir).getCanonicalPath
    corpusCounts.getOrElseUpdate(key, emb(spark, dir).count())
  }
  /** TEST HOOK: run `body` with the corpus-count cache seeded to `n` for
    * `dir` (so the measured-count auto branch is exercisable without
    * manufacturing a 64 k-vector dir), restoring the prior entry — or its
    * absence — on the way out. The cache is process-global; a seed that
    * outlived its suite would poison every later auto-sizing decision for
    * that dir in the same JVM. */
  private[graft] def withCorpusCount[A](dir: String, n: Long)(body: => A): A = {
    val key = new java.io.File(dir).getCanonicalPath
    val prev = corpusCounts.get(key)
    corpusCounts.put(key, n)
    try body
    finally prev match {
      case Some(v) => corpusCounts.put(key, v)
      case None => corpusCounts.remove(key)
    }
  }

  /** (bands × bits)-row hyperplane table: plane p's component d is ±1 by MD5
    * parity of "p:d" — deterministic, engine-portable pseudo-randomness (the
    * same [[TextQueries.hash48]] trick as the text dedup family). */
  private def planes(spark: SparkSession, nPlanes: Int): DataFrame = {
    val parity = TextQueries.hash48("concat(cast(p as string), ':', cast(d as string))")
    spark.range(nPlanes).select(col("id").as("p"))
      .select(col("p"),
        expr(s"transform(sequence(0, 63), d -> cast(1 - 2 * ($parity % 2) as double))")
          .as("signs"))
  }

  /** Raw banded signature (vec_id, band_idx, band_val): band b's value packs
    * the sign bits of planes [b·bits, (b+1)·bits). Band values are aggregated
    * directly per (vec_id, band) — never packed through one 64-bit signature
    * word — so `bits × bands` can exceed 64 and no arithmetic-shift sign trap
    * exists in either engine. Broadcast join (plane table is tiny) → one dot
    * per (vector, plane) → map-side-combined groupBy. Geometry comes from
    * [[EmbeddingLsh.geometry]]: the [[EmbeddingLsh.CorpusSizeConf]] knob
    * when set, else AUTO-derived from the measured corpus count past
    * [[EmbeddingLsh.AutoThreshold]], else the fixed defaults (round-10). */
  private def rawBands(spark: SparkSession, dir: String): DataFrame = {
    val (nBands, bits) = EmbeddingLsh.geometry(spark, dir)
    emb(spark, dir)
      .crossJoin(broadcast(planes(spark, nBands * bits)))
      .select(col("vec_id"), col("p"), dot(col("e"), col("signs")).as("proj"))
      .groupBy(col("vec_id"), floor(col("p") / bits).as("band_idx"))
      .agg(sum(when(col("proj") >= 0,
          expr(s"shiftleft(cast(1 as bigint), cast(p % $bits as int))")).otherwise(lit(0L)))
        .as("band_val"))
  }

  /** Banded signature with degenerate buckets (> [[DedupQueries.SimhashBucketCap]]
    * vectors sharing one band value) dropped before any candidate join — the
    * same quadratic-bucket guard as the text-dedup family. Skipped buckets
    * are observable via [[lshBucketStats]] (`q_lsh_bucket_stats`), not silent. */
  private def bands(spark: SparkSession, dir: String): DataFrame = {
    val all = rawBands(spark, dir)
    // anti-join against the OVER-cap bucket list, not an inner join on the
    // under-cap allowlist: the allowlist grows with bands × min(n, 2^bits)
    // (~10⁸ rows at the geometryFor(10⁹) regime — pinning broadcast on it
    // was a guaranteed OOM exactly where the corpus-size knob applies;
    // round-7 advice), while over-cap buckets number ≤ n / cap and each
    // kills a quadratic straggler. No pinned broadcast either way — AQE
    // picks the strategy from the measured size (the decontaminateKeepList
    // rule: never pin broadcast on a side that scales with the data).
    val over = all.groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > DedupQueries.SimhashBucketCap)
      .select(col("band_idx"), col("band_val"))
    all.join(over, Seq("band_idx", "band_val"), "left_anti")
  }

  /** Per-band bucket census for the embedding LSH: bucket count, the largest
    * bucket, and how many buckets/vectors the [[DedupQueries.SimhashBucketCap]]
    * guard skips. This is the recall monitor a production pipeline alerts on
    * (skips > 0 on an unclustered corpus means the geometry is undersized —
    * re-run [[EmbeddingLsh.geometryFor]]); kept oracle-checked like every
    * other operator. */
  def lshBucketStats(spark: SparkSession, dir: String): DataFrame =
    rawBands(spark, dir)
      .groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("bn"))
      .groupBy(col("band_idx").cast("long").as("band_idx"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("bn")).as("max_bucket"),
        sum(when(col("bn") > DedupQueries.SimhashBucketCap, 1L).otherwise(0L))
          .as("n_skipped"),
        sum(when(col("bn") > DedupQueries.SimhashBucketCap, col("bn")).otherwise(0L))
          .as("vecs_in_skipped"))
      .orderBy(col("band_idx"))

  /** ANN via LSH: candidates sharing ≥1 band with probe vec `probeId`,
    * exact-cosine reranked, top `k` (registry runs probe 0 / k = 10). The
    * candidate set is an equi-join on (band_idx, band_val) against the
    * probe's `bands` rows (8 at the defaults) — O(collisions), not O(n). */
  def annLsh(spark: SparkSession, dir: String,
      probeId: Long = 0L, k: Int = 10): DataFrame = {
    val b = bands(spark, dir).persist() // probe side + candidate side share it
    val probeBands = b.filter(col("vec_id") === probeId)
      .select(col("band_idx"), col("band_val"))
    val candidates = b.join(broadcast(probeBands), Seq("band_idx", "band_val"))
      .filter(col("vec_id") =!= probeId)
      .select(col("vec_id")).distinct()
    candidates
      .join(emb(spark, dir), Seq("vec_id"))
      .crossJoin(broadcast(probe(spark, dir, probeId)))
      .select(col("vec_id"), col("label"),
        round(cosine(col("e"), col("pe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Neighbors per probe scored by the recall monitor (shared with the
    * oracle SQL). */
  val RecallK = 10

  /** ANN recall@k — the acceptance metric for the LSH path: for each probe
    * in the batch, how many of the EXACT cosine top-k does the LSH
    * candidate route recover? Output per probe: candidate-set size, hits,
    * recall. This is the number a 100 TB deployment tracks when it swaps
    * the exact scan for [[EmbeddingLsh]]; `q_lsh_bucket_stats` monitors the
    * generator's health, this query monitors its QUALITY.
    *
    * Shape at scale: the exact arm is one corpus pass with the broadcast
    * probe set and a WindowGroupLimit pre-shuffle prune ([[annBatch]]'s
    * plan); the LSH arm joins the band table against the probes' bands
    * (broadcast — nProbes×16 rows) so its cost is O(collisions). The final
    * recall join runs over probes×k rows — metadata.
    *
    * Determinism: both arms rank by (rounded cos, vec_id) — a total order
    * — so top-k sets and therefore hit counts are exact in both engines. */
  def annRecall(spark: SparkSession, dir: String,
      nProbes: Int = AnnBatchProbes, k: Int = RecallK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = bands(spark, dir).persist()
    val pb = b.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("band_idx"), col("band_val"))
    val cand = b.join(broadcast(pb), Seq("band_idx", "band_val"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id")).distinct()
    val probes = emb(spark, dir).filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    def topk(scored: DataFrame) = scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id"))
    val lsh = topk(cand.join(emb(spark, dir), Seq("vec_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine(col("e"), col("pe")), 6).as("cos_sim")))
    val exact = topk(emb(spark, dir).crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine(col("e"), col("pe")), 6).as("cos_sim")))
    val nCand = cand.groupBy(col("probe_id")).agg(count(lit(1)).as("n_cand"))
    exact.join(lsh.withColumn("hit", lit(1L)), Seq("probe_id", "vec_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("hit")).as("hits"))
      .join(nCand, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"), col("hits"),
        round(col("hits").cast("double") / k, 6).as("recall"))
      .orderBy(col("probe_id"))
  }

  /** nprobe for the IVF recall monitor (matches [[ivfSearch]]'s demo). */
  val IvfNprobe = 3
  /** Centroid count for the IVF demo index (vectors 0..9, fixed seed). */
  val IvfCentroids = 10

  /** IVF recall@k — the quality monitor for the IVF route, completing the
    * per-route symmetry: `q_lsh_bucket_stats` + `q_ann_recall` watch the
    * hyperplane-LSH generator, `q_text_lsh_recall` the MinHash generator,
    * and this watches the inverted-list route: for each probe, how many of
    * the exact top-k live in the `nprobe` lists the probe actually scans?
    * Low recall here is the signal to raise nprobe or retrain centroids —
    * THE operational dial of an IVF deployment.
    *
    * Shape at scale: assignment is the [[ivfSearchWith]] map-side `max_by`
    * argmax over broadcast centroids (one partial-agg row per vector
    * reaches the shuffle); the probe×centroid list table is metadata and
    * ships broadcast; both ranking arms are WindowGroupLimit top-k. */
  def ivfRecall(spark: SparkSession, dir: String,
      nProbes: Int = AnnBatchProbes, k: Int = RecallK,
      nprobe: Int = IvfNprobe): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val cents = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("ce"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("e"), col("cent_id"),
        dot(col("e"), col("ce")).as("cdot"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("e"), col("cent_id")),
        struct(col("cdot"), (-col("cent_id")).as("tb"))).as("m"))
      .select(col("vec_id"), col("m.e").as("e"), col("m.cent_id").as("cent_id"))
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"))
    val wpl = Window.partitionBy(col("probe_id"))
      .orderBy(col("pdot").desc, col("cent_id"))
    val lists = cents.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("cent_id"),
        dot(col("ce"), col("pe")).as("pdot"))
      .withColumn("rn", row_number().over(wpl)).filter(col("rn") <= nprobe)
      .select(col("probe_id"), col("cent_id"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    def topk(scored: DataFrame) = scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id"))
    val scanned = assigned.join(broadcast(lists), Seq("cent_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine(col("e"), col("pe")), 6).as("cos_sim"))
    val ivf = topk(scanned)
    val exact = topk(e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine(col("e"), col("pe")), 6).as("cos_sim")))
    val nCand = scanned.groupBy(col("probe_id")).agg(count(lit(1)).as("n_cand"))
    exact.join(ivf.withColumn("hit", lit(1L)), Seq("probe_id", "vec_id"), "left")
      .groupBy(col("probe_id"))
      .agg(count(col("hit")).as("hits"))
      .join(nCand, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"), col("hits"),
        round(col("hits").cast("double") / k, 6).as("recall"))
      .orderBy(col("probe_id"))
  }

  /** Embedding near-dup pairs: LSH band-join candidates, exact-cosine
    * verified at ≥ 0.25. (The testdata vectors are random unit vectors — max
    * pairwise cosine ≈0.5 — so the demo threshold is low; a production dedup
    * runs the identical plan at ≥0.9 where banding recall is ≈95%.) The
    * band self-join + distinct bounds the verify stage to actual collisions;
    * no O(n²) pair enumeration exists anywhere in the plan. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    embeddingPairs(spark, dir).orderBy(col("vec_a"), col("vec_b"))

  /** Unordered embedding near-dup pair stream `(vec_a < vec_b, cos_sim)` at
    * `minCos` — the body of [[dedupEmbedding]] without the presentation
    * sort, so composing pipelines (multimodal curation CC) don't inherit a
    * range shuffle they immediately discard. */
  private[ops] def embeddingPairs(spark: SparkSession, dir: String,
      minCos: Double = EmbeddingMinCos): DataFrame =
    // Thresholds ≥ the dedup default share one [[Staged]] table (the
    // ≥ 0.25 pair set is small — dedup 0.25 and multimodal CC 0.5 both
    // filter it); the sub-threshold stream (mutual-kNN's −1 keeps EVERY
    // banded collision) stays inline — staging it was measured net-negative
    // (millions of scored pairs: the checkpoint serialize cost more than
    // the one re-score it saved, the wide-intermediate lesson again).
    {
    // pre-warm the corpus-count cache OUTSIDE Staged's global build lock —
    // the auto-geometry count is milliseconds, but nothing that runs a
    // Spark action belongs under the lock every other staged build waits
    // on (round-10 review)
    corpusSize(spark, dir)
    if (minCos >= EmbeddingMinCos)
      Staged("embedding_pairs_dedup", spark, dir) {
        scoredEmbeddingPairs(spark, dir).filter(col("cos_sim") >= EmbeddingMinCos)
      }.filter(col("cos_sim") >= minCos)
    else scoredEmbeddingPairs(spark, dir).filter(col("cos_sim") >= minCos)
    }

  private[graft] def scoredEmbeddingPairs(spark: SparkSession, dir: String): DataFrame = {
    // Arrays ride the BAND rows (n × bands — linear in the corpus), never
    // the pair stream: both sides of the candidate self-join carry their
    // vector + norm, the cosine is projected INSIDE the join's codegen
    // pipeline, and the arrays are dropped before anything shuffles again.
    // The pre-round-12 shape joined slim pairs back to the embedding table
    // and shuffled/sorted the array-attached intermediate for the second
    // join: ~560 B per CANDIDATE of spill, which filled the disk at the
    // round-10 100× full-sweep probe (200 k vectors → ~10⁸ banded
    // collisions → tens-of-GB sorts in q_dedup_embedding / q_mutual_knn /
    // q_curation_multimodal). This shape's array-bearing relation is
    // n × bands × ~560 B — ~100× smaller there, and the gap widens with n
    // (at n = 10⁹ / 30 bands: ~17 TB vs ~2 PB of shuffle).
    //
    // Exactly-once emission (round 14): each pair is emitted from its
    // MINIMAL live colliding band only — graft_min_band evaluates inside
    // the join over the full signatures the band rows carry — so there is
    // NO pair-volume shuffle left at all. The round-12→13 shape scored a
    // j-band collision j times and collapsed the duplicates with a
    // (vec_a, vec_b) distinct: one full exchange + dedup aggregate of the
    // candidate stream (~156 M rows × 32 B at the 100× probe scale), spent
    // removing a ~4% duplicate fraction on an unclustered corpus — and on
    // a DUP-HEAVY production corpus the duplicate fraction is bands×, so
    // both the exchange and the duplicate scoring grow exactly when the
    // data gets hard. min-band deletes both: the candidate stream flows
    // straight from the join into whatever consumes it. Emitted values are
    // identical (same deterministic cosine expression, same pair set), so
    // oracle results are byte-for-byte what the distinct plan produced.
    // Norms are still per-vector, computed once before the fan-out.
    val e = emb(spark, dir)
      .select(col("vec_id"), col("e"), sqrt(dot(col("e"), col("e"))).as("nrm"))
    val be = sigBandRows(spark, dir).join(e, Seq("vec_id")).persist()
    val a = be.select(col("band_idx"), col("band_val"), col("sig").as("sig_a"),
      col("vec_id").as("vec_a"), col("e").as("ea"), col("nrm").as("na"))
    val c = be.select(col("band_idx"), col("band_val"), col("sig").as("sig_b"),
      col("vec_id").as("vec_b"), col("e").as("eb"), col("nrm").as("nb"))
    // Join width PINNED past the scale gate (round-17, from the r16 100×
    // q_mutual_knn stage attribution): the band-join shuffle carries the
    // LINEAR n × bands relation (slim bytes), so AQE's byte-targeted
    // coalescing folds the join to few partitions — but the join OUTPUT is
    // the candidate-pair stream (~156 M rows at 100×), and everything
    // pipelined above it (cosine, min-band filter, a consumer window's
    // map-side top-k sort) runs at that folded width. That mismatch is the
    // classic explosive-join trap: per-task sort/agg state scales with
    // candidates-per-task, and q_mutual_knn's WindowGroupLimit sort spilled
    // 17.4 GB deterministically. 16× cores of REPARTITION_BY_NUM width
    // (exempt from coalescing — PlanShapeSpec) divides the pipelined state
    // to ~0.6 M candidates/task: measured same-window at 100× (one JVM per
    // reading), 8×/16×/32× walls 59.1/48.0/106.0 s with spill
    // 11.8 GB/1.2 GB/0 — 16× leaves only the bucket-skew residual (a hot
    // bucket's C(cap,2) pairs are indivisible by ANY width on the join
    // keys), while 32× fragments the slim exchange into mapTasks×1024
    // ~40 KB blocks and the stage goes IO-bound (task 2475 s vs cpu 969 s).
    // Below the gate AQE's fold is the right call for tiny inputs, so the
    // pin stays off.
    def pinned(df: DataFrame): DataFrame =
      if (Tables(spark, dir).bigInputs())
        df.repartition(spark.sparkContext.defaultParallelism * 16,
          col("band_idx"), col("band_val"))
      else df
    pinned(a).join(pinned(c), Seq("band_idx", "band_val"))
      .filter(col("vec_a") < col("vec_b") &&
        call_function("graft_min_band", col("band_idx"), col("sig_a"), col("sig_b")))
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("cos_sim"))
  }

  /** Band rows for the PAIR generator: like [[bands]], but each row also
    * carries its vector's full per-band signature `sig` (array indexed by
    * band_idx; a band whose bucket the cap guard drops holds NULL — see
    * [[graft.functions.MinBandEmit]] for why null-in-place makes the
    * dropped-bucket verdict pair-symmetric with no separate mask). The
    * extra column is what lets the self-join emit each colliding pair
    * exactly once (min-band filter) so no pair-volume `distinct()` exchange
    * exists downstream; the price is one additional exchange of the LINEAR
    * n × bands relation (the per-vector groupBy below) and ~bands × 8 B of
    * persist width per band row — both vanish against the candidate
    * stream's volume (156 M rows at the 100× probe scale vs 1.6 M band
    * rows). Cap semantics are IDENTICAL to [[bands]]: a dropped (vec, band)
    * never joins (its exploded row is filtered on null), so pair recall and
    * [[lshBucketStats]]'s census are unchanged. */
  private def sigBandRows(spark: SparkSession, dir: String): DataFrame = {
    val all = rawBands(spark, dir)
    // over-cap bucket list: same anti-join-not-allowlist reasoning as
    // [[bands]] (the list is ≤ n / cap rows), except the mark must KEEP the
    // dropped row (nulled) to preserve array positions, so it is a left
    // join + null-out instead of a left_anti.
    val over = all.groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > DedupQueries.SimhashBucketCap)
      .select(col("band_idx"), col("band_val"), lit(true).as("dropped"))
    all.join(over, Seq("band_idx", "band_val"), "left")
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("band_idx"),
          when(col("dropped").isNull, col("band_val")).as("bv")))),
        x => x.getField("bv")).as("sig"))
      .select(col("vec_id"), col("sig"),
        posexplode(col("sig")).as(Seq("band_idx", "band_val")))
      .filter(col("band_val").isNotNull)
      .select(col("vec_id"), col("sig"),
        col("band_idx").cast("long").as("band_idx"), col("band_val"))
  }

  /** Neighbors kept per node in the mutual-kNN graph (shared with the
    * oracle SQL). */
  val MutualK = 5

  /** Mutual-kNN graph over the embedding corpus: edge (a, b) survives iff b
    * is in a's top-k AND a is in b's top-k among the LSH candidate pairs.
    * The mutuality filter is the standard noise cut for similarity graphs
    * (one-directional "nearest" edges from outliers to cluster cores
    * vanish, cores keep each other) — this is the graph SemDeDup-style
    * semantic clustering and kNN-based label propagation consume.
    *
    * Shape at scale: candidates come from the banded-LSH generator (bucket
    * cap bounds the pair volume; `q_lsh_bucket_stats` is the health
    * monitor), never an all-pairs scan. The per-node top-k is row_number ≤ k
    * over the directed pair stream — WindowGroupLimit prunes to k per node
    * per map task BEFORE the shuffle (a measured round-14 A/B kept this
    * over a bounded-buffer aggregate; see [[knnFrame]]) — and mutuality is
    * a self-equi-join of that k·n-row frame on the reversed key, reading a
    * localCheckpoint so the candidate pipeline materializes ONCE, not once
    * per join side. Ranking is on the ROUNDED cosine with dst as the
    * tiebreak (a total order), so both engines pick identical neighbor
    * sets. */
  def mutualKnn(spark: SparkSession, dir: String, k: Int = MutualK): DataFrame = {
    // localCheckpoint (eager), NOT a plan reference used twice: the
    // mutuality self-join would otherwise materialize the ENTIRE candidate
    // pipeline — band join, scoring, union, top-k aggregation — once per
    // join side (the 100× plan showed two complete copies; AQE's stage
    // reuse does not collapse them). The knn frame is k·n skinny rows
    // (~1 M × 32 B at the 100× probe scale) — checkpointing it is the
    // same linear-relation trade the iterative graph queries make, and the
    // Bench/Verify cache-clear contract reclaims it between queries.
    val knn = knnFrame(spark, dir, k).localCheckpoint()
    knn.as("f")
      .join(knn.select(col("src").as("dst"), col("dst").as("src"),
        col("rn").as("rn_rev")).as("r"), Seq("src", "dst"))
      .filter(col("src") < col("dst"))
      .select(col("src").as("vec_a"), col("dst").as("vec_b"),
        col("cos_sim"), col("rn").as("rank_a"), col("rn_rev").as("rank_b"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** The per-node top-k frame `(src, dst, cos_sim, rn)` [[mutualKnn]]
    * checkpoints before its mutuality self-join — exposed pre-checkpoint so
    * plan-shape specs can assert on the live plan (the WindowGroupLimit
    * prune, the min-band join predicate); the checkpointed frame is just a
    * Scan ExistingRDD.
    *
    * The top-k is the row_number window, DELIBERATELY, after a measured
    * round-14 detour through a bounded-buffer aggregate
    * ([[graft.functions.TopKPairs]]): the aggregate's codegen'd update
    * cascade crosses the JVM JIT's silent huge-method bytecode limit at
    * k = 5 and runs interpreted — 100× interleaved same-JVM A/B read the
    * aggregate spelling at 480–502 s vs 77–115 s for this window spelling
    * (same row counts; `-XX:-DontCompileHugeMethods` recovers 7.4× of the
    * gap, confirming the mechanism, but a library cannot ship a JVM flag).
    * WindowGroupLimit's sort-based map-side prune IS Spark's optimized
    * native top-k on binary rows; see TopKPairs' scaladoc for the full
    * measurement record. */
  private[graft] def knnFrame(spark: SparkSession, dir: String,
      k: Int = MutualK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // threshold −1: keep every scored LSH candidate pair — the graph keeps
    // rank structure, not an absolute similarity cut
    val und = embeddingPairs(spark, dir, minCos = -1.0)
    // Symmetrize by EXPLODE, not union (round-17): the two union branches
    // were two complete physical copies of the candidate pipeline — the
    // band self-join and the cosine dot product each ran TWICE (exchange
    // reuse dedupes the join's input shuffles, not the join/scoring stage
    // itself). A 2-element inline array explode emits the same two directed
    // rows per pair from ONE scoring pass, pipelined in the same stage —
    // identical row set, half the join/cosine work.
    val directed = und.select(explode(array(
        struct(col("vec_a").as("src"), col("vec_b").as("dst"), col("cos_sim")),
        struct(col("vec_b").as("src"), col("vec_a").as("dst"), col("cos_sim"))))
        .as("d"))
      .select(col("d.src").as("src"), col("d.dst").as("dst"),
        col("d.cos_sim").as("cos_sim"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos_sim").desc, col("dst"))
    directed
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** IVF search: centroids = vectors 0..9 (deterministic seed), every vector
    * assigned to its argmax-cosine centroid (inverted lists), probe vec
    * `probeId` scans the `nprobe` nearest lists, exact top-`k` rerank
    * (registry runs probe 42 / nprobe 3 / k 10). */
  def ivfSearch(spark: SparkSession, dir: String,
      probeId: Long = 42L, k: Int = 10, nprobe: Int = 3): DataFrame = {
    val e = emb(spark, dir)
    val cents = e.filter(col("vec_id") < 10L)
      .select(col("vec_id").as("cent_id"), col("e").as("ce"))
    ivfSearchWith(spark, dir, cents, probeId, k, nprobe)
  }

  /** IVF serving path over a CALLER-SUPPLIED centroid table (cent_id, ce) —
    * how the production index plugs trained centroids in: pass
    * `ClusterQueries.kmeans(...).centroids` (renamed cluster → cent_id) and
    * the identical assign → invert → nprobe → exact-rerank plan serves it.
    * Invariant (spec-checked): with nprobe = |cents| every list is probed,
    * so the result equals brute-force [[similarVectors]] exactly. */
  def ivfSearchWith(spark: SparkSession, dir: String, cents: DataFrame,
      probeId: Long, k: Int, nprobe: Int): DataFrame = {
    // Assignment: argmax over the broadcast centroid table, as a map-side
    // combinable `max_by` aggregate — one partial-agg row per vector reaches
    // the shuffle, where a window argmax would shuffle and sort the whole
    // 10×-exploded assignment table (round-2 review). The ordering struct
    // (cdot, -cent_id) reproduces the oracle's ORDER BY cdot DESC, cent_id.
    // The agg carries SCALARS only, with (label, e) joined back on the same
    // hash(vec_id) exchange (round-17, the ClusterQueries.assignTo finding):
    // a max_by payload holding the embedding array plans as SortAggregate
    // (non-fixed-width buffer) and physically sorts the whole exploded
    // stream with the vector on every row.
    val e = emb(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    val winners = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"), dot(col("e"), col("ce")).as("cdot"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("cdot"), (-col("cent_id")).as("tb"))).as("cent_id"))
    val assigned = winners.join(e, Seq("vec_id"))
      .select(col("vec_id"), col("label"), col("e"), col("cent_id"))
    // nprobe centroid lists nearest the probe.
    val probeLists = cents
      .crossJoin(broadcast(probe(spark, dir, probeId)))
      .select(col("cent_id"), dot(col("ce"), col("pe")).as("pdot"))
      .orderBy(col("pdot").desc, col("cent_id"))
      .limit(nprobe)
      .select(col("cent_id"))
    assigned
      .join(broadcast(probeLists), Seq("cent_id"))
      .filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe(spark, dir, probeId)))
      .select(col("vec_id"), col("cent_id"),
        round(cosine(col("e"), col("pe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-label mean vector, one row per (label, dim) — the Lloyd M-step /
    * class-prototype computation. Componentwise means use an exact
    * DECIMAL(38,12) sum (order-independent: a parallel double sum is not
    * reproducible across partitionings) divided by the count, in double. */
  def vectorCentroids(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("label"), posexplode(col("e")))
      .filter(col("pos") < CentroidDims) // low dims only: filter BEFORE the shuffle
      .groupBy(col("label"), col("pos").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        round((sum(col("col").cast("decimal(38,12)")).cast("double") / count(lit(1))), 6)
          .as("mean_c"))
      .orderBy(col("label"), col("dim"))

  /** Embedding-norm audit per label: count and the min/avg/max L2 norm —
    * the first data-quality check on any embedding drop (zero or wildly
    * off-scale norms mean a broken encoder run or an unnormalized batch
    * mixed into a normalized corpus). Norms are sqrt of the sequential-fold
    * dot (bit-identical to the oracle's), rounded 6dp; the average sums the
    * rounded norms through DECIMAL(18,6) so it is order-independent. One
    * narrow pass + one label-grain partial agg. */
  def embNormAudit(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("label"),
        round(sqrt(dot(col("e"), col("e"))), 6).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("nrm")).as("norm_min"),
        round(sum(col("nrm").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("norm_avg"),
        max(col("nrm")).as("norm_max"))
      .orderBy(col("label"))

  /** Outliers reported per label by [[oodEmbeddings]] (shared with the
    * oracle SQL). */
  val OodK = 5

  /** Out-of-distribution screening: each embedding's L2 distance to its own
    * label's centroid, reporting the [[OodK]] farthest vectors per label —
    * the curation pass that flags mislabeled or off-manifold examples
    * before they enter a training mix (the per-class complement of
    * [[ClusterQueries.semDedup]], which flags the TOO-CLOSE ones).
    *
    * Shape at scale: centroids are one (label, dim) partial-agg shuffle
    * over the exploded dim stream (order-independent DECIMAL(38,12) sums,
    * the [[vectorCentroids]] discipline, here over all dims); the distance
    * pass re-explodes once, joins the metadata-scale centroid table, and
    * partial-aggs the 64 squared terms back to a row per vector — two
    * narrow shuffles, both map-side combinable. The per-label top-k is
    * row_number ≤ k on (rounded dist DESC, vec_id) — a total order, and
    * WindowGroupLimit prunes map-side. Centroid means are 6dp-rounded
    * doubles, each squared term is the same double expression tree in both
    * engines, and the term sum is decimal-exact — so distances hash-match
    * bit-for-bit. */
  def oodEmbeddings(spark: SparkSession, dir: String, k: Int = OodK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = emb(spark, dir)
      .select(col("vec_id"), col("label"), posexplode(col("e")))
      .select(col("vec_id"), col("label"), col("pos").as("dim"), col("col").as("x"))
    val cent = ex.groupBy(col("label"), col("dim"))
      .agg(round(sum(col("x").cast("decimal(38,12)")).cast("double") /
        count(lit(1)), 6).as("mean_c"))
    val term = (col("x") - col("mean_c")) * (col("x") - col("mean_c"))
    val dist = ex.join(broadcast(cent), Seq("label", "dim"))
      .groupBy(col("vec_id"), col("label"))
      .agg(round(sqrt(sum(term.cast("decimal(38,12)")).cast("double")), 6)
        .as("dist"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("dist").desc, col("vec_id"))
    dist.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("label"), col("rn"), col("vec_id"), col("dist"))
      .orderBy(col("label"), col("rn"))
  }

  /** Product quantization (PQ) encoding: split each 64-dim embedding into
    * `SubSpaces` 16-dim chunks, assign every chunk its nearest codeword
    * (L2) from that subspace's codebook, and emit the per-vector code tuple
    * plus the total quantization error — the compression step of a
    * PQ/IVF-PQ vector index (each vector stored as 4 bytes of codes instead
    * of 256 bytes of floats, distances served from lookup tables).
    *
    * Codebook here = the chunks of the first `CodebookSize` corpus vectors
    * (same fixed-seed convention as [[ivfSearch]]'s demo centroids; a
    * production index trains per-subspace k-means and plugs it in — the
    * encoding plan is identical). Shape at scale: the codebook is
    * metadata-sized (m × k chunks) and ships BROADCAST; encoding is one
    * corpus pass — explode to (vec, subspace) chunks, broadcast-join the
    * matching subspace's codewords, `min_by` partial agg for the argmin
    * (never a window over the exploded stream), then one pivot agg back to
    * a row per vector. Two narrow shuffles keyed by vec_id, both
    * map-side-combinable. L2² via the three-dot identity |a|² − 2a·b + |b|²
    * with [[dot]]'s sequential fold, so assignments and errors are
    * bit-identical to the oracle's. */
  /** Per-(vector, subspace) nearest-codeword assignment — the shared
    * front of [[pqEncode]] and [[pqSearch]]. */
  private def pqAssignments(spark: SparkSession, dir: String): DataFrame = {
    val m = PqCodec.SubSpaces
    val dims = PqCodec.SubDim
    val chunked = emb(spark, dir).select(col("vec_id"), posexplode(
      array((0 until m).map(s =>
        slice(col("e"), s * dims + 1, dims)): _*)).as(Seq("s", "chunk")))
    val d2 = dot(col("chunk"), col("chunk")) -
      lit(2.0) * dot(col("chunk"), col("cw")) + dot(col("cw"), col("cw"))
    chunked
      .join(broadcast(pqCodebook(spark, dir)), col("s") === col("cs"))
      .select(col("vec_id"), col("s"), col("code"), d2.as("d2"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min_by(struct(col("code"), col("d2")),
        struct(col("d2"), col("code"))).as("m"))
      .select(col("vec_id"), col("s"), col("m.code").as("code"),
        col("m.d2").as("d2"))
  }

  /** The (subspace, code) → codeword table (codebook = leading vectors'
    * chunks, deterministically seeded — the [[ivfSearch]] convention). */
  private def pqCodebook(spark: SparkSession, dir: String): DataFrame = {
    val m = PqCodec.SubSpaces
    val dims = PqCodec.SubDim
    emb(spark, dir)
      .filter(col("vec_id") < PqCodec.CodebookSize).select(posexplode(
        array((0 until m).map(s =>
          struct(lit(s).as("cs"), col("vec_id").as("code"),
            slice(col("e"), s * dims + 1, dims).as("cw"))): _*)))
      .select(col("col.cs").as("cs"), col("col.code"), col("col.cw"))
  }

  def pqEncode(spark: SparkSession, dir: String): DataFrame = {
    val m = PqCodec.SubSpaces
    val assigned = pqAssignments(spark, dir)
    val pivots = (0 until m).map(s =>
      max(when(col("s") === s, col("code"))).as(s"code_$s")) ++
      (0 until m).map(s =>
        max(when(col("s") === s, col("d2"))).as(s"e_$s"))
    assigned.groupBy(col("vec_id"))
      .agg(pivots.head, pivots.tail: _*)
      .select(col("vec_id") +: (0 until m).map(s => col(s"code_$s")) :+
        round((0 until m).map(s => col(s"e_$s")).reduce(_ + _), 6).as("q_err"): _*)
      .orderBy(col("vec_id"))
  }

  object PqCodec {
    val SubSpaces = 4
    val SubDim = 16
    val CodebookSize = 8
  }

  /** Output depth for [[pqSearch]]. */
  val PqSearchK = 10

  /** PQ serving path — asymmetric distance computation (ADC): the probe
    * builds a (subspace × codeword) distance table (SubSpaces·CodebookSize
    * = 32 rows of metadata), and each corpus vector's approximate distance
    * is the SUM of table lookups at its stored codes — the vector itself
    * is never touched at query time, which is the whole point of PQ
    * compression (the index reads codes, ~1/64th of the float payload).
    * Each hit carries its exact L2² next to the ADC value, so the
    * approximation error of the compressed route is visible per row (the
    * [[q_minhash_est_error]] discipline applied to vectors).
    *
    * Shape at scale: codes come from the [[pqEncode]] assignment (in a
    * real index they are STORED — the recompute here stands in for the
    * code column); ADC is one equi-join against the broadcast 32-row
    * table + a partial-agg sum of [[PqCodec.SubSpaces]] decimal terms per
    * vector; top-k is TakeOrderedAndProject on the rounded key. */
  def pqSearch(spark: SparkSession, dir: String,
      probeId: Long = 0L, k: Int = PqSearchK): DataFrame = {
    val adc = pqAssignments(spark, dir)
      .join(broadcast(adcTable(spark, dir, probeId)), Seq("s", "code"))
      .groupBy(col("vec_id"))
      .agg(sum(col("pd2").cast("decimal(38,12)")).cast("double").as("adc_raw"))
    exactRider(spark, dir, probeId,
      adc.filter(col("vec_id") =!= probeId)
        .orderBy(round(col("adc_raw"), 6), col("vec_id"))
        .limit(k))
      .select(col("vec_id"), round(col("adc_raw"), 6).as("adc_d2"),
        round(col("exact_raw"), 6).as("exact_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
  }

  /** ADC probe-distance table: (subspace, code) → partial L2² between the
    * probe's subvector and that codeword. SubSpaces·CodebookSize = 32 rows
    * of broadcast metadata — built once here for [[pqSearch]] and
    * [[ivfPqSearch]] (round-7 verdict ask #8: one builder, zero drift). */
  private def adcTable(spark: SparkSession, dir: String, probeId: Long): DataFrame = {
    val probeChunks = emb(spark, dir).filter(col("vec_id") === probeId)
      .select(posexplode(array((0 until PqCodec.SubSpaces).map(s =>
        slice(col("e"), s * PqCodec.SubDim + 1, PqCodec.SubDim)): _*))
        .as(Seq("ps", "pchunk")))
    val pd2 = dot(col("pchunk"), col("pchunk")) -
      lit(2.0) * dot(col("pchunk"), col("cw")) + dot(col("cw"), col("cw"))
    pqCodebook(spark, dir)
      .join(broadcast(probeChunks), col("cs") === col("ps"))
      .select(col("cs").as("s"), col("code"), pd2.as("pd2"))
  }

  /** Exact-L2² audit rider, priced at k rows: joins the corpus to the
    * ALREADY-RANKED ADC winner set (broadcast, ≤ k rows) and computes the
    * exact distance only for those survivors — the serving-honest shape
    * the round-7 verdict asked for (#3). The corpus scan reads only
    * (vec_id, e) and evaluates zero dot products for non-winners; at 10⁹
    * vectors the exact leg costs k float reads, not a corpus pass. */
  private def exactRider(spark: SparkSession, dir: String, probeId: Long,
      winners: DataFrame): DataFrame =
    emb(spark, dir)
      .join(broadcast(winners), Seq("vec_id"))
      .crossJoin(broadcast(probe(spark, dir, probeId)))
      .withColumn("exact_raw",
        dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("pe")) +
          dot(col("pe"), col("pe")))
      .drop("e", "pe")

  /** IVF+PQ — the standard industrial vector-index composition: the IVF
    * coarse quantizer restricts the search to the `nprobe` inverted lists
    * nearest the probe (touching nprobe/nlists of the corpus), and within
    * them ranking runs on PQ CODES via the [[pqSearch]] ADC table — so
    * query-time work is (corpus/nlists)·nprobe code lookups, no float
    * vector ever read. Exact L2² rides along per hit, keeping the
    * compression error observable. This is the serving plan a
    * billion-vector index runs; here every stage is the oracle-gated
    * building block it composes ([[ivfSearch]] lists, [[pqEncode]] codes,
    * [[pqSearch]] table).
    *
    * Shape at scale: centroid/probe/ADC tables are all broadcast
    * metadata; the only corpus-scale work is the assignment partial-agg
    * (stored in a real index) and the list-restricted code join. */
  def ivfPqSearch(spark: SparkSession, dir: String,
      probeId: Long = 42L, k: Int = PqSearchK, nprobe: Int = IvfNprobe): DataFrame = {
    val e = emb(spark, dir)
    val cents = e.filter(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("e").as("ce"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"), dot(col("e"), col("ce")).as("cdot"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("cdot"), (-col("cent_id")).as("tb")))
        .as("cent_id"))
    val probeLists = cents
      .crossJoin(broadcast(probe(spark, dir, probeId)))
      .select(col("cent_id"), dot(col("ce"), col("pe")).as("pdot"))
      .orderBy(col("pdot").desc, col("cent_id"))
      .limit(nprobe)
      .select(col("cent_id"))
    val adc = pqAssignments(spark, dir)
      .join(assigned.join(broadcast(probeLists), Seq("cent_id")), Seq("vec_id"))
      .join(broadcast(adcTable(spark, dir, probeId)), Seq("s", "code"))
      .groupBy(col("vec_id"), col("cent_id"))
      .agg(sum(col("pd2").cast("decimal(38,12)")).cast("double").as("adc_raw"))
    exactRider(spark, dir, probeId,
      adc.filter(col("vec_id") =!= probeId)
        .orderBy(round(col("adc_raw"), 6), col("vec_id"))
        .limit(k))
      .select(col("vec_id"), col("cent_id"),
        round(col("adc_raw"), 6).as("adc_d2"),
        round(col("exact_raw"), 6).as("exact_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
  }

  /** Quantization range for [[quantizeInt8]] (signed-byte code space). */
  val QuantLevels = 255

  /** Scalar int8 quantization audit: per-dimension min/max over the corpus
    * define a linear 8-bit grid; every component is encoded to its nearest
    * level and the per-label reconstruction error is reported — the
    * memory-4x-compression screen run before switching an ANN index to
    * int8 storage (acceptable MSE ⇒ quantize; outlier dims show up as
    * max_abs_err).
    *
    * Determinism: the per-dim ranges are exact min/max of the SAME double
    * set in both engines; encode (`round((v−mn)·255/(mx−mn))`) and decode
    * (`mn + q·(mx−mn)/255`) are written with identical association on both
    * sides, so every reconstructed value is bit-identical; the squared
    * errors aggregate through the decimal-sum contract.
    *
    * Shape at scale: the range table is dims-sized metadata (one
    * partial-agg shuffle over the exploded corpus, 64 rows out) and
    * broadcasts back onto a second narrow pass — no vector ever shuffles;
    * both passes are map-side-combinable aggregates. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val comps = emb(spark, dir)
      .select(col("vec_id"), col("label"), posexplode(col("e")))
      .select(col("vec_id"), col("label"), col("pos"), col("col").as("v"))
    val ranges = comps.groupBy(col("pos"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val q = when(col("mx") > col("mn"),
      round((col("v") - col("mn")) * lit(QuantLevels.toDouble) /
        (col("mx") - col("mn")), 0)).otherwise(lit(0.0))
    val deq = col("mn") +
      col("q") * (col("mx") - col("mn")) / lit(QuantLevels.toDouble)
    val err = col("v") - col("deq")
    comps.join(broadcast(ranges), Seq("pos"))
      .withColumn("q", q)
      .withColumn("deq", deq)
      .groupBy(col("label"))
      .agg(countDistinct(col("vec_id")).as("n_vecs"),
        round(sum((err * err).cast("decimal(38,12)")).cast("double") /
          count(lit(1)), 9).as("mse"),
        round(max(abs(err)), 6).as("max_abs_err"))
      .orderBy(col("label"))
  }

  /** Radius threshold for [[rangeSearch]] (random-unit-vector demo corpus:
    * cos ≥ 0.2 is a genuinely-close tail, a few matches per probe). */
  val RangeSearchCos = 0.2

  /** Range (radius) similarity search: ALL corpus vectors within a cosine
    * radius of each probe — the retrieval shape top-k cannot express
    * ("everything at least this similar", e.g. near-duplicate candidate
    * pull or recall-oriented RAG retrieval where the neighbor COUNT is the
    * signal). Same serving skeleton as [[annBatch]] — probe set broadcast,
    * corpus scanned once for all probes — but the per-probe result is
    * filter-bounded, not rank-bounded, so there is NO window/top-k operator
    * at all: the radius predicate is a codegen'd filter evaluated in the
    * scan stage, the cheapest possible post-score shape (an unselective
    * radius is a data-size problem, not a plan problem). The filter tests
    * the ROUNDED similarity, same contract as the oracle. */
  def rangeSearch(spark: SparkSession, dir: String,
      nProbes: Int = AnnBatchProbes, minCos: Double = RangeSearchCos): DataFrame = {
    val probes = emb(spark, dir).filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"))
    emb(spark, dir)
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine(col("e"), col("pe")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
      .orderBy(col("probe_id"), col("vec_id"))
  }

  /** RRF constant (the standard k = 60 from the Cormack/Clarke/Buettcher
    * fusion formula) and arm depth, shared with the oracle SQL. */
  val RrfK = 60
  val RrfArmDepth = 20

  /** Hybrid retrieval via reciprocal-rank fusion: the BM25 keyword arm
    * ([[TextQueries.bm25Search]]) and the vector-similarity arm
    * ([[similarVectors]], probe 0) each produce a top-[[RrfArmDepth]]
    * ranking; RRF combines them as Σ 1/([[RrfK]] + rank) — the standard
    * hybrid-search scorer in front of a RAG stack, robust to the two arms'
    * incomparable score scales because only RANKS cross the boundary.
    *
    * Shape at scale: each arm ends in its own `TakeOrderedAndProject`
    * (corpus-scale work stays inside the arms, which scale as documented on
    * each); everything after is a full-outer join of two ≤[[RrfArmDepth]]-row
    * frames — metadata. The rank windows also run on those tiny frames.
    * Determinism: ranks are integers with unique tiebreaks (score desc,
    * id asc); the fused score is a fixed two-term double sum — the same
    * expression tree in DuckDB — rounded once. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byText = Window.orderBy(col("bm25").desc, col("doc_id"))
    val byVec = Window.orderBy(col("cos_sim").desc, col("vec_id"))
    val textArm = TextQueries.bm25Search(spark, dir, k = RrfArmDepth)
      .withColumn("rank_text", row_number().over(byText).cast("long"))
      .select(col("doc_id"), col("rank_text"))
    val vecArm = similarVectors(spark, dir, probeId = 0L, k = RrfArmDepth)
      .withColumn("rank_vec", row_number().over(byVec).cast("long"))
      .select(col("vec_id").as("doc_id"), col("rank_vec"))
    textArm.join(vecArm, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_text"), col("rank_vec"),
        round(
          coalesce(lit(1.0) / (lit(RrfK.toDouble) + col("rank_text")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK.toDouble) + col("rank_vec")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(RrfArmDepth)
  }

  /** Leading-dimension count for [[embeddingCov]] and its quantization
    * grid (values land on integer multiples of 1e-6 before any sum). */
  val CovDims = 16
  val CovQuant = 1000000L

  /** Covariance block of the leading [[CovDims]] embedding dimensions —
    * the input to a PCA/whitening step (dimensionality reduction before
    * IVF/PQ training) and the redundant-dimension screen: a near-singular
    * block means the index can run on fewer dims.
    *
    * Shape at scale: each row explodes to its d'(d'+1)/2 = 136 upper-
    * triangle products (a constant factor on the NARROW pre-shuffle stage,
    * all codegen'd), and map-side combine collapses them to ≤136 rows per
    * task before the ONE shuffle to the (i, j) grid. Per-dimension sums
    * ride the same explosion (j = i diagonal carries them), so the corpus
    * is scanned exactly once. The full-d alternative (64² via a
    * per-partition Gram in `mapPartitions`) buys a 30× constant at the
    * price of leaving codegen — the declarative spelling wins until d' is
    * in the hundreds.
    *
    * Determinism: floats are widened to double (exact) and quantized to an
    * integer grid (`floor(x·1e6)` — identical IEEE ops both engines), so
    * every sum is an exact integer and the covariance is one shared double
    * expression tree: cov = (Σab/n − (Σa/n)(Σb/n)) / 1e12. */
  def embeddingCov(spark: SparkSession, dir: String, dims: Int = CovDims): DataFrame = {
    val q = emb(spark, dir)
      .select(expr(
        s"transform(sequence(0, ${dims - 1}), i -> cast(floor(e[i] * $CovQuant) as bigint))")
        .as("qv"))
    val pairs = q.select(explode(expr(
      s"""flatten(transform(sequence(0, ${dims - 1}), i ->
         |  transform(sequence(i, ${dims - 1}), j ->
         |    named_struct('i', i, 'j', j,
         |      'ab', qv[i] * qv[j], 'a', qv[i], 'b', qv[j]))))""".stripMargin))
      .as("p"))
    val g = lit(CovQuant.toDouble * CovQuant.toDouble)
    pairs
      .groupBy(col("p.i").cast("long").as("i"), col("p.j").cast("long").as("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("p.ab").cast("decimal(38,0)")).cast("double").as("sab"),
        sum(col("p.a").cast("decimal(38,0)")).cast("double").as("sa"),
        sum(col("p.b").cast("decimal(38,0)")).cast("double").as("sb"))
      .select(col("i"), col("j"), col("n"),
        round((col("sab") / col("n") - (col("sa") / col("n")) * (col("sb") / col("n"))) / g,
          8).as("cov"))
      .orderBy(col("i"), col("j"))
  }
}
