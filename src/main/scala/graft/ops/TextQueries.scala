package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline half of the engine (north-star extensions; the reference has no
  * text analytics, so these are designed Spark-first from scratch).
  *
  * Design rules shared by every query here:
  *
  *   - **Pure column expressions, no UDFs.** Tokenization, shingling, hashing
  *     and scoring are built from `split`/`transform`/`filter`/`aggregate`
  *     higher-order functions plus `md5` — all codegen'd by Catalyst, all
  *     executable verbatim at 100 TB with no serialization cliff.
  *   - **Engine-portable hashing.** The only hash both Spark and the DuckDB
  *     oracle compute identically is MD5 over UTF-8 bytes; integer hashes are
  *     derived from a hex prefix of it (48 bits so a BIGINT never overflows
  *     and sign never flips). See [[TextQueries.hash48]].
  *   - **Determinism.** Every output ends with ORDER BY on a unique key;
  *     double-valued scores are `round`ed so both engines agree bitwise.
  *
  * At scale: all queries are embarrassingly parallel per document (narrow,
  * no shuffle) except the final ORDER BY (needed only for the oracle compare;
  * a production caller drops it) and the per-lang aggregate in `textStats`
  * (map-side partial agg → tiny shuffle keyed by lang).
  */
object TextQueries {

  /** Whitespace tokens of `text` (single-space word salad in the testdata;
    * the regex split matches DuckDB's `string_split(text, ' ')` exactly). */
  val wordsExpr = "split(text, ' ')"

  /** 48-bit integer hash of a string expression, identical in DuckDB as
    * `('0x' || substr(md5(e), 1, 12))::BIGINT`. */
  def hash48(e: String): String = s"cast(conv(substr(md5($e), 1, 12), 16, 10) as bigint)"

  /** Word n-gram shingles as space-joined strings; empty array when the doc
    * has fewer than n tokens (Spark's `sequence(1, stop)` with stop < 1 would
    * count *down*, so the guard is semantic, not cosmetic).
    *
    * `words` MUST be a bound column/attribute name, not an expression:
    * higher-order functions are CodegenFallback in Spark, so an expression
    * inside the lambda (e.g. `split(text, ' ')`) would be RE-EVALUATED once
    * per shingle index — O(tokens²) per document. Materialize the token array
    * into a column first (see [[shingled]]). */
  def shinglesExpr(n: Int, words: String = "w"): String =
    s"""case when size($words) >= $n
       |  then transform(sequence(1, size($words) - ${n - 1}),
       |                 i -> concat_ws(' ', slice($words, i, $n)))
       |  else array() end""".stripMargin

  /** (doc_id, sh) with `sh` = distinct n-word shingles, tokenized once.
    * Uses the native one-pass [[graft.functions.Shingles]] kernel
    * (element-identical to `array_distinct(shinglesExpr)`, PropertySpec). */
  def shingled(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"), expr(wordsExpr).as("w"))
      .select(col("doc_id"), expr(s"graft_shingles(w, $n)").as("sh"))

  /** Stopword markers for the language-ID heuristic (shared with the oracle
    * SQL in [[TextRegistry]] — keep in sync). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is", "it")
  def stopwordsSqlList: String = Stopwords.map(s => s"'$s'").mkString(", ")

  /** Per-language corpus statistics: doc counts, char/token totals, exact
    * order-independent average length (SUM/COUNT decomposition per Out). */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("n_tokens", size(expr(wordsExpr)).cast("long"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"))

  /** Token counting: whitespace tokens vs a BPE-ish regex token stream
    * (runs of letters, runs of digits, or single other non-space chars) —
    * the standard pre-tokenizer shape for LLM token estimation. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(
        col("doc_id"),
        col("n_chars"),
        size(expr(wordsExpr)).cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("re_tokens"))
      .orderBy(col("doc_id"))

  /** Tokenizer fertility per language: regex-token count over
    * whitespace-word count — the standard "how many subwords per word does
    * this tokenizer spend on this language" metric. Fertility far above
    * the corpus band on some language means its text fragments into
    * character soup (the compute-cost and quality complaint against
    * under-trained vocabularies); tracking it per lang is how a tokenizer
    * budget review starts.
    *
    * Shape at scale: the two token counts are codegen'd per-doc
    * projections (the [[tokenCount]] expressions) collapsed by ONE
    * partial-agg shuffle to the ≤langs grid; exact integer sums, one
    * division. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .where(col("lang").isNotNull)
      .select(col("lang"),
        size(expr(wordsExpr)).cast("long").as("ws"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("re"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("re")).as("re_tokens"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("re_tokens"),
        round(col("re_tokens").cast("double") / col("ws_tokens").cast("double"), 6)
          .as("fertility"))
      .orderBy(col("lang"))

  /** Language-ID heuristic: stopword-marker ratio over whitespace tokens.
    * (The testdata's `lang` column is a label with no textual signal — all
    * langs share one vocabulary — so the heuristic's value is the pipeline
    * shape: a pure, portable scoring expression any marker table plugs into.) */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("n_tokens", size(expr(wordsExpr)).cast("long"))
      .withColumn("n_stop",
        size(expr(s"filter($wordsExpr, t -> t in ($stopwordsSqlList))")).cast("long"))
      .withColumn("stop_ratio",
        round(col("n_stop").cast("double") / col("n_tokens"), 4))
      .withColumn("pred_lang",
        when(col("stop_ratio") >= 0.08, lit("en")).otherwise(lit("und")))
      .select(col("doc_id"), col("n_tokens"), col("n_stop"),
        col("stop_ratio"), col("pred_lang"))
      .orderBy(col("doc_id"))

  /** Confusion census for the [[langId]] heuristic against the labeled
    * `lang` column — the evaluation table a language-ID gate ships with:
    * per (true lang, predicted) doc counts and the within-lang share. The
    * current heuristic only separates en/und, so the census is exactly
    * where its miss pattern (non-en languages predicted 'en' via shared
    * stopwords, en docs under the ratio floor) becomes visible — the
    * evidence for choosing the next heuristic.
    *
    * Shape at scale: the prediction is the same codegen'd projection
    * [[langId]] runs, collapsed by ONE partial-agg shuffle to the
    * ≤ langs×preds grid; shares join the per-lang totals back on that
    * metadata frame. */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val pred = Tables(spark, dir).documents
      // lang is the leading ORDER BY key — NULLS FIRST/LAST divergence guard
      .where(col("lang").isNotNull)
      .select(col("lang"),
        (size(expr(s"filter($wordsExpr, t -> t in ($stopwordsSqlList))"))
          .cast("double") / size(expr(wordsExpr)).cast("double")).as("ratio"))
      .select(col("lang"),
        when(round(col("ratio"), 4) >= 0.08, lit("en")).otherwise(lit("und"))
          .as("pred_lang"))
    val grid = pred.groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = grid.groupBy(col("lang")).agg(sum(col("n_docs")).as("n_lang"))
    grid.join(broadcast(tot), Seq("lang"))
      .select(col("lang"), col("pred_lang"), col("n_docs"),
        round(col("n_docs").cast("double") / col("n_lang").cast("double"), 6)
          .as("share"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Quality scoring: length saturation × lexical diversity — the standard
    * cheap pre-filter a training-data pipeline runs before dedup. All terms
    * are exact integer ratios rounded once at the end. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("n_tokens", size(expr(wordsExpr)).cast("long"))
      .withColumn("uniq_tokens",
        size(expr(s"array_distinct($wordsExpr)")).cast("long"))
      .withColumn("uniq_ratio",
        round(col("uniq_tokens").cast("double") / col("n_tokens"), 4))
      .withColumn("len_score",
        round(least(col("n_tokens").cast("double") / 100.0, lit(1.0)), 4))
      // 0.4/0.6 weights (not 0.5/0.5): with 4-decimal inputs the 5th decimal
      // of 4a+6b is always even, so round(_, 4) never lands on a .5 tie —
      // engines disagree on tie-breaking, not on clean rounding.
      .withColumn("quality",
        round(col("len_score") * 0.4 + col("uniq_ratio") * 0.6, 4))
      .select(col("doc_id"), col("n_tokens"), col("uniq_tokens"),
        col("uniq_ratio"), col("len_score"), col("quality"))
      .orderBy(col("doc_id"))

  /** Per-document top-`topK` TF-IDF keywords — the classic relevance/topic
    * signal a curation pipeline attaches to every doc before domain mixing.
    * The registry runs it at topK = 3.
    *
    * Shape at scale: one shuffle to (doc, term) for tf; df reuses the tf
    * table (already one row per (doc, term)) with a map-side-combinable
    * count; the corpus size joins in as a broadcast single row; top-k per
    * doc is the window-rank idiom partitioned by doc_id. Vocabulary is
    * Zipf-bounded, so the df table stays small relative to the corpus.
    * Determinism: ties in score (common: equal tf × equal df) break on term
    * order in BOTH engines. */
  def tfidfKeywords(spark: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
    val tf = docs.select(col("doc_id"), explode(expr(wordsExpr)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("doc_id"), col("rk"), col("term"), round(col("score"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Fixed keyword set for the BM25 retrieval scorer (shared with the oracle
    * SQL — keep in sync). */
  val Bm25Terms: Seq[String] = Seq("join", "window", "hash")
  def bm25TermsSqlList: String = Bm25Terms.map(s => s"'$s'").mkString(", ")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 retrieval scoring of the corpus against the keyword query `terms`
    * (top `k` docs) — the standard quality-weighted term search a data
    * pipeline uses to mine domain-relevant documents at scale. The registry
    * runs it with [[Bm25Terms]] / k = 20.
    *
    * Shape at scale: the term filter lands on the exploded token stream
    * before any shuffle, so only rows for query terms (|q| small) survive to
    * the (doc, term) aggregate; df and the corpus stats (N, avgdl — exact
    * integer sums) are broadcast single-digit-row frames; the final top-k is
    * `TakeOrderedAndProject`. Per-doc score folds the ≤|q| term scores in
    * sorted term order (`aggregate` over `array_sort`) — the same left fold
    * DuckDB's `list_sum(list(s ORDER BY term))` computes, so the double sum
    * is bit-identical (a bare SUM's order is partition-dependent). */
  def bm25Search(spark: SparkSession, dir: String,
      terms: Seq[String] = Bm25Terms, k: Int = 20): DataFrame = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), size(expr(wordsExpr)).cast("long").as("dl"), col("text"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs.select(col("doc_id"), col("dl"), explode(expr(wordsExpr)).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("s", col("idf") * (col("tf") * (Bm25K1 + 1.0)) /
        (col("tf") + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        expr("aggregate(array_sort(collect_list(struct(term, s))), cast(0 as double), (acc, x) -> acc + x.s)").as("score"))
      .select(col("doc_id"), col("n_terms"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
  }

  /** Corpus-level `n`-gram frequencies (top `topK`) — LM-style n-gram
    * statistics over every occurrence (NOT per-doc distinct shingles; a
    * language-model count table wants multiplicity). The registry runs
    * bigrams / top 50. One explode → one partial-agg shuffle keyed by gram →
    * `TakeOrderedAndProject` top-k; the classic count-table shape that
    * scales to any corpus the groupBy scales to. */
  def ngramCounts(spark: SparkSession, dir: String,
      n: Int = 2, topK: Int = 50): DataFrame =
    Tables(spark, dir).documents
      .select(expr(wordsExpr).as("w"))
      .select(explode(expr(shinglesExpr(n))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram")).limit(topK)

  /** Minimum bigram occurrences for [[pmiCollocations]] — PMI of rare pairs
    * is noise (the classic sparse-count pathology). Shared with the oracle. */
  val PmiMinCount = 5

  /** Pointwise mutual information of adjacent word pairs (top `topK` by
    * PMI): ln( p(ab) / (p(a)·p(b)) ) with p(ab) over bigram occurrences and
    * p(·) over unigram occurrences — the standard collocation score an
    * LM-data pipeline uses to find multiword expressions worth preserving
    * through tokenization.
    *
    * Shape at scale: unigram and bigram count tables are the same
    * partial-agg shuffle as [[ngramCounts]]; the min-count filter prunes the
    * bigram side BEFORE its two joins against the (Zipf-bounded) unigram
    * table; the two corpus totals are broadcast single rows. The PMI
    * arithmetic is spelled as an explicit parenthesized ratio-of-ratios so
    * both engines evaluate the identical IEEE expression tree. */
  def pmiCollocations(spark: SparkSession, dir: String,
      minCount: Int = PmiMinCount, topK: Int = 50): DataFrame = {
    val docs = Tables(spark, dir).documents.select(expr(wordsExpr).as("w"))
    val uni = docs.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    val nu = uni.agg(sum(col("n")).as("nu"))
    val nb = docs.agg(sum(greatest(size(col("w")) - 1, lit(0))).cast("long").as("nb"))
    docs.select(explode(expr(shinglesExpr(2))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .withColumn("a", expr("split(bigram, ' ')[0]"))
      .withColumn("b", expr("split(bigram, ' ')[1]"))
      .join(uni.select(col("t").as("a"), col("n").as("n_a")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("n").as("n_b")), Seq("b"))
      .crossJoin(broadcast(nu))
      .crossJoin(broadcast(nb))
      .withColumn("pmi", round(log(
        (col("n_ab").cast("double") / col("nb")) /
          ((col("n_a").cast("double") / col("nu")) *
            (col("n_b").cast("double") / col("nu")))), 6))
      .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"), col("pmi"))
      .orderBy(col("pmi").desc, col("bigram")).limit(topK)
  }

  /** Unigram-LM cross-entropy scoring — the self-contained core of the
    * CCNet/KenLM-style perplexity quality filter: train unigram
    * probabilities p(t) = count(t)/N on the corpus itself, score each doc
    * by its mean negative log-likelihood (1/n)·Σ −ln p(tᵢ). Degenerate and
    * boilerplate docs score LOW (their tokens are corpus-frequent), rare-
    * garbage docs score HIGH — both tails are what a quality gate trims. A
    * production pipeline swaps in an external LM's scores; the plan shape
    * (score table join + per-doc mean) is identical.
    *
    * Shape at scale: one (token) partial-agg shuffle for the vocab
    * (Zipf-bounded), one (doc, token)-keyed join of the exploded stream
    * against it — AQE broadcasts the vocab when it fits — then a per-doc
    * partial agg. The per-doc Σ −ln p is summed in DECIMAL(38,12): the ln
    * values are IEEE-identical in both engines (one libm call on the same
    * double ratio), and the decimal cast makes the SUM order-independent —
    * the same exactness discipline as the centroid means. */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val tok = docs.select(col("doc_id"), explode(expr(wordsExpr)).as("t"))
    val vocab = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("n_total"))
    tok.join(vocab, Seq("t"))
      .crossJoin(broadcast(total))
      .withColumn("nll",
        (-log(col("c").cast("double") / col("n_total"))).cast("decimal(38,12)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("nll")).cast("double") / count(lit(1))).as("avg_nll"))
      .select(col("doc_id"), col("n_tokens"), round(col("avg_nll"), 6).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Bigram-LM cross-entropy per doc with add-one (Laplace) smoothing:
    * P(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁) + V), avg −ln P over the doc's
    * bigrams. The bigram companion to [[lmScore]]'s unigram model — it
    * penalizes scrambled or template-stitched text that unigram perplexity
    * cannot see (same words, wrong order), which is exactly the failure
    * mode of low-effort spun content. Self-trained on the corpus, so no
    * external model ships.
    *
    * Shape at scale: the bigram stream is a narrow positional transform;
    * the two count tables are partial-agg shuffles bounded by bigram/
    * unigram type counts, equi-joined back; V is a 1-row broadcast. NLL
    * sums ride the DECIMAL(38,12) order-independence contract. */
  def bigramLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val bg = docs
      .select(col("doc_id"), expr(wordsExpr).as("ws"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
          |  i -> struct(element_at(ws, i) as w1, element_at(ws, i + 1) as w2))"""
          .stripMargin)).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val tok = docs.select(explode(expr(wordsExpr)).as("t"))
    val c1 = tok.groupBy(col("t").as("w1")).agg(count(lit(1)).as("c1"))
    val v = tok.agg(countDistinct(col("t")).as("vsz"))
    bg.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("nll",
        (-log((col("c12") + lit(1.0)) / (col("c1") + col("vsz"))))
          .cast("decimal(38,12)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprinting: whole-doc MD5 plus a 1-permutation MinHash over
    * 5-word shingles (the min MD5 of any shingle) — a content-defined
    * fingerprint stable under document reordering of *other* docs and cheap
    * enough to compute inline in a scan. Falls back to the doc hash for
    * sub-5-token docs. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), md5(col("text")).as("doc_md5"), expr(wordsExpr).as("w"))
      .select(
        col("doc_id"),
        col("doc_md5"),
        coalesce(
          expr(s"array_min(transform(${shinglesExpr(5)}, s -> md5(s)))"),
          col("doc_md5")).as("min_shingle_md5"))
      .orderBy(col("doc_id"))

  /** Per-source vocabulary census — the tokenizer-training prep query:
    * token instances, distinct types, hapax count (types occurring exactly
    * once in that source) and type-token ratio. Hapax mass is what decides
    * a BPE vocabulary cutoff; TTR drift per source is a cheap corpus-mix
    * drift monitor.
    *
    * Shape at scale: explode → (source, token) partial-agg shuffle (the
    * map-side combine collapses each task's repeats, so the shuffle carries
    * per-task type counts, not token instances) → per-source rollup (second
    * tiny shuffle, one row per source). Same two-shuffle skeleton as
    * [[repetition stats|graft.ops.PipelineQueries]]; no driver paths. */
  def vocabStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("source"), explode(expr(wordsExpr)).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"))
      .orderBy(col("source"))

  /** Context-window geometry for [[chunkWindows]], shared with the oracle. */
  val WinTokens = 64
  val WinStride = 32

  /** Sliding-window token chunking — the context-length segmentation pass a
    * pretraining pipeline runs before packing: each document becomes
    * [[WinTokens]]-token windows starting every [[WinStride]] tokens
    * (stride < size ⇒ overlapping windows, the standard way to avoid
    * truncating cross-boundary context). Output per window: token count
    * (short final windows keep their true length) and the first/last token
    * as cheap hash-free content anchors.
    *
    * Shape at scale: tokenize ONCE into a materialized array column (the
    * HOF-lambda re-evaluation trap — file header), then one `explode` of a
    * `sequence` of window starts: purely narrow, no shuffle at all (the
    * ORDER BY is only for the oracle compare). Window count per doc is
    * ⌈tokens/stride⌉ — output scales with corpus token count, not doc
    * count². */
  def chunkWindows(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), split(col("text"), " ").as("raw"))
      .select(col("doc_id"), expr("filter(raw, x -> x <> '')").as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
        explode(expr(s"sequence(0, n - 1, $WinStride)")).as("s"))
      .select(
        col("doc_id"),
        expr(s"cast(s div $WinStride as bigint)").as("win_id"),
        least(lit(WinTokens), col("n") - col("s")).cast("long").as("n_tok"),
        element_at(col("toks"), col("s") + 1).as("first_tok"),
        element_at(col("toks"),
          col("s") + least(lit(WinTokens), col("n") - col("s"))).as("last_tok"))
      .orderBy(col("doc_id"), col("win_id"))

  /** PII patterns for [[piiScrub]] — deliberately simple character-class
    * regexes that mean the same thing in Java's regex engine and RE2
    * (DuckDB): no backrefs, no lookaround, no word boundaries, `-` last in
    * every class. A production scrubber would carry a larger battery
    * (SSNs, IPs, credit cards) — each added pattern is one more codegen'd
    * `regexp_replace` in the same narrow projection. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "555-[0-9]{4}"

  /** PII redaction over the corpus. The fixture text carries no PII, so the
    * query first plants a deterministic email + phone per document (derived
    * from `doc_id` — both engines construct the identical string), then
    * scrubs: emails → `<EMAIL>`, phones → `<PHONE>`. Output per doc: match
    * counts, scrubbed length, and a 48-bit hash of the scrubbed text — the
    * hash is the actual gate that redaction produced BYTE-IDENTICAL output
    * in both engines, not just equal counts.
    *
    * Shape at scale: a pure narrow projection — regex match + replace is
    * codegen'd per row, no shuffle at all (the ORDER BY is the gate's
    * determinism requirement, not part of the operator). This is the
    * pattern every PII pass at 100 TB wants: scan → replace → write, zero
    * exchanges. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or call 555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    Tables(spark, dir).documents
      .select(col("doc_id"), planted.as("aug"))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("aug"), lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_replace(regexp_replace(col("aug"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("scrubbed"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        length(col("scrubbed")).cast("long").as("scrubbed_len"),
        expr(hash48("scrubbed")).as("scrubbed_h48"))
      .orderBy(col("doc_id"))
  }

  /** Postings kept per term by [[invertedIndex]] (top docs by tf). */
  val IdxPostings = 10

  /** Inverted-index build: one row per vocabulary term with document
    * frequency, collection frequency, and the top-[[IdxPostings]] posting
    * list (doc ids ordered by term frequency, ties to the lower id) — the
    * search-engine index-construction pass, and the batch half of what
    * [[bm25Search]] consumes conceptually.
    *
    * Shape at scale: tokenize → explode → ONE partial-agg shuffle on
    * (term, doc) builds the tf table; df/cf are a second partial agg on the
    * term key (same partitioning — no extra exchange), and the posting cap
    * is a rank window PARTITIONED BY TERM — Spark plans it as
    * WindowGroupLimit, pruning to k rows per term BEFORE the window sort
    * materializes, so a stop-word's billion-row posting stream never
    * sorts. The capped postings aggregate via collect_list of
    * (-tf, doc_id) structs + sort_array — deterministic regardless of
    * partition arrival order (collect_list alone is not). Output is
    * vocabulary-sized, not corpus-sized.
    *
    * The posting list is emitted as a comma-joined STRING (not an array):
    * the values are identical, and a scalar column is hashable by any
    * row-comparator (the driver's pandas gate cannot sort array cells). */
  def invertedIndex(spark: SparkSession, dir: String,
      k: Int = IdxPostings): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables(spark, dir).documents
      .select(col("doc_id"), explode(expr(wordsExpr)).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val postings = tf
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("tf").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .groupBy(col("term"))
      .agg(sort_array(collect_list(struct((-col("tf")).as("ntf"),
        col("doc_id")))).as("p"))
      .select(col("term"),
        expr("array_join(transform(p, x -> cast(x.doc_id as string)), ',')")
          .as("postings"))
    stats.join(postings, Seq("term")).orderBy(col("term"))
  }

  /** Vocabulary head size for [[zipfFit]] (the fit runs over the top-V
    * types per source; the deep tail is hapax noise, not the power law). */
  val ZipfTopV = 100

  /** Zipf power-law fit per source: OLS of ln(freq) on ln(rank) over the
    * top-[[ZipfTopV]] vocabulary types — natural text slopes ≈ −1, so a
    * source whose slope collapses toward 0 (flat head: template spam) or
    * dives steep (near-single-token degenerate output) fails the
    * naturalness screen. Companion to [[vocabStats]]' type/token ratios.
    *
    * Determinism: ranks are a total order (count DESC, token); ln inputs
    * are identical integers in both engines, per-term products cast to
    * DECIMAL(38,12) before the sum ([[graft.ops.PipelineQueries.driftPsi]]
    * contract), and the slope/R² formulas are the
    * [[graft.ops.StatsQueries.trendOls]] double expressions.
    *
    * Shape at scale: explode → (source, token) partial-agg shuffle (type
    * counts, not instances); the rank window runs over the per-source
    * VOCABULARY (already aggregate), and everything past the top-V filter
    * is ≤ sources × V rows of metadata. */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables(spark, dir).documents
      .select(col("source"), explode(expr(wordsExpr)).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n"))
    val ranked = counts
      .withColumn("r", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n").desc, col("tok"))))
      .filter(col("r") <= ZipfTopV)
      .select(col("source"),
        log(col("r").cast("double")).as("x"),
        log(col("n").cast("double")).as("y"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,12)")
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("y"))).cast("double").as("sy"),
        sum(dec(col("x") * col("x"))).cast("double").as("sxx"),
        sum(dec(col("y") * col("y"))).cast("double").as("syy"),
        sum(dec(col("x") * col("y"))).cast("double").as("sxy"))
      .select(col("source"), col("n_terms"),
        round((col("n_terms") * col("sxy") - col("sx") * col("sy")) /
          (col("n_terms") * col("sxx") - col("sx") * col("sx")), 6)
          .as("zipf_slope"),
        round(((col("n_terms") * col("sxy") - col("sx") * col("sy")) *
            (col("n_terms") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n_terms") * col("sxx") - col("sx") * col("sx")) *
            (col("n_terms") * col("syy") - col("sy") * col("sy"))), 6)
          .as("r2"))
      .orderBy(col("source"))
  }

  /** Default phrase for [[phraseSearch]]: two DISTINCT tokens, so
    * token-level occurrences can never overlap (a self-adjacent phrase like
    * "value value" has overlapping matches that substring counters and the
    * positional join would count differently — distinctness removes the
    * ambiguity class entirely). */
  val PhraseTerms: Seq[String] = Seq("table", "value")

  /** Exact phrase search through a POSITIONAL index: every document
    * containing the terms of [[PhraseTerms]] consecutively, with the match
    * count and first match position — the query an inverted index with
    * position lists answers without ever re-reading source text.
    *
    * Shape at scale: tokenize → posexplode → filter to the PHRASE'S TERMS
    * ONLY before anything wide happens (the position stream that shuffles
    * is |postings of the two terms|, not the corpus token stream); the
    * adjacency test is ONE equi-join on (doc, pos+1) — both sides already
    * partition-pruned to single terms, so this is exactly the
    * posting-list-intersection a search engine runs, spelled as a join.
    * Output aggregates to matching docs only.
    *
    * At a real 100 TB deployment the per-term position lists come from the
    * persisted [[invertedIndex]] artifact instead of a re-tokenize; the
    * probe side of the join is unchanged — that artifact swap is the only
    * difference, which is why the plan shape here is the one that matters. */
  def phraseSearch(spark: SparkSession, dir: String,
      phrase: Seq[String] = PhraseTerms): DataFrame = {
    require(phrase.length == 2 && phrase(0) != phrase(1),
      "phraseSearch expects a 2-term phrase of distinct tokens")
    val pos = Tables(spark, dir).documents
      .select(col("doc_id"), posexplode(expr(wordsExpr)).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase: _*))
    val first = pos.filter(col("tok") === phrase(0))
      .select(col("doc_id"), col("pos"))
    val second = pos.filter(col("tok") === phrase(1))
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    first.join(second, Seq("doc_id", "pos"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("pos")).cast("long").as("first_pos"))
      .orderBy(col("doc_id"))
  }

  /** Vocabulary size for [[oovRate]] (top types by corpus frequency; the
    * deterministic stand-in for a fixed tokenizer vocabulary file). */
  val OovVocab = 40

  /** Out-of-vocabulary rate per source: the fraction of each source's
    * tokens not covered by the top-[[OovVocab]] corpus vocabulary — the
    * tokenizer-coverage screen a pretraining mix runs before committing to
    * a vocab (a source with a high OOV rate fragments into subword soup
    * and eats the token budget). In production the vocab side is the
    * tokenizer's published list; self-deriving the head here keeps the
    * query closed over the corpus with identical semantics.
    *
    * Shape at scale: the vocab is a count-agg → top-k (TakeOrdered on
    * (count DESC, token) — a total order) that BROADCASTS; the token
    * stream then left-joins it map-side, so the only wide shuffle is the
    * (source) rollup of already-combined partials. Nothing quadratic,
    * nothing driver-side but the k-row vocab.
    *
    * Determinism: counts are exact; the rate is one double division
    * rounded at 6 dp; the vocab cut is the total (count, token) order. */
  def oovRate(spark: SparkSession, dir: String,
      vocabSize: Int = OovVocab): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(col("source"), explode(expr(wordsExpr)).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6)
          .as("oov_rate"))
      .orderBy(col("source"))
  }

  /** Bucket width / cap for [[tokenLenDist]] (shared with the oracle). */
  val LenBucketWidth = 50L
  val LenBucketCap = 500L

  /** Token-length distribution per language: fixed-width length buckets
    * (capped tail bucket) with counts and exact average length — the
    * length histogram every corpus report leads with, and the input to
    * choosing packing/truncation lengths. One narrow projection + one
    * partial-agg shuffle to the (lang, bucket) grain. */
  def tokenLenDist(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("lang"), size(expr(wordsExpr)).cast("long").as("n_tokens"))
      .withColumn("bucket",
        least((col("n_tokens") / LenBucketWidth).cast("long") * LenBucketWidth,
          lit(LenBucketCap)))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(Out.davg(col("n_tokens")), 6).as("avg_tokens"))
      .orderBy(col("lang"), col("bucket"))

  /** RAKE phrase-length cap and report size (shared with the oracle SQL).
    * Runs longer than [[RakeMaxLen]] words are discarded — standard RAKE
    * practice, and the guard that keeps a stopword-free document from
    * becoming one degenerate whole-document "phrase". */
  val RakeMaxLen = 4
  val RakeTopK = 20

  /** RAKE keyword extraction (Rose et al., "Automatic keyword extraction
    * from individual documents"): candidate phrases are maximal stopword-free
    * word runs; each word scores deg/freq over the phrase corpus (deg = Σ
    * length of phrases containing it, freq = its occurrence count — the
    * ratio favors words that appear inside LONGER collocations); a phrase
    * scores the sum of its words' scores. The phrase-level complement of
    * [[tfidfKeywords]] (unigrams) and [[pmiCollocations]] (bigram lift):
    * RAKE surfaces multi-word terms without any document-frequency model.
    *
    * Shape at scale: run segmentation is a per-document prefix sum (window
    * partitioned by doc — each partition is one document's tokens, the
    * bounded regime); phrase assembly is one (doc, run) partial agg; word
    * scores are a vocabulary-sized agg; the phrase score re-join is keyed
    * by word against that broadcast-sized table; the report is a top-k
    * TakeOrdered. Word-score sums go through DECIMAL(38,12) so the
    * per-phrase sum is order-independent. */
  def rakePhrases(spark: SparkSession, dir: String, k: Int = RakeTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables(spark, dir).documents
      .select(col("doc_id"), posexplode(expr(wordsExpr)))
      .select(col("doc_id"), col("pos"), col("col").as("w"))
      .withColumn("stp", col("w").isin(Stopwords: _*))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = toks
      .withColumn("run", sum(when(col("stp"), 1L).otherwise(0L)).over(byDoc))
      .filter(!col("stp"))
    val phrases = runs.groupBy(col("doc_id"), col("run"))
      .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("ws"))
      .select(col("doc_id"), col("run"),
        expr("array_join(transform(ws, x -> x.w), ' ')").as("phrase"),
        size(col("ws")).cast("long").as("len"), col("ws"))
      .filter(col("len") <= RakeMaxLen)
    val wordInst = phrases
      .select(col("doc_id"), col("run"), col("phrase"), col("len"),
        explode(expr("transform(ws, x -> x.w)")).as("w"))
    val wordScore = wordInst.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      .select(col("w"),
        (col("deg").cast("double") / col("freq").cast("double")).as("wscore"))
    wordInst.join(wordScore, Seq("w"))
      .groupBy(col("doc_id"), col("run"), col("phrase"))
      .agg(round(sum(col("wscore").cast("decimal(38,12)")).cast("double"), 6)
        .as("pscore"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("pscore")).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(k)
  }

  /** Top-k output size for [[bpePairMerges]]. */
  val BpeTopK = 30

  /** Output size and sketch capacity for [[approxTopkTokens]]. */
  val TopkK = 10
  val TopkTracked = 100000

  /** Sketch heavy-hitters under the oracle gate: exact top-[[TopkK]]
    * tokens (oracle-computable) each paired with the claim that Spark's
    * `approx_top_k` sketch reports the SAME count for it. With
    * [[TopkTracked]] ≥ the vocabulary size the sketch is provably exact,
    * so the claim column must be uniformly TRUE — a drifting sketch
    * implementation fails the hash gate, which is the whole point (the
    * same bracketing discipline as `q_approx_distinct`). At 100 TB the
    * sketch arm is the production path: one pass, fixed memory, mergeable
    * partials; the exact arm is the audit.
    *
    * Shape at scale: both arms aggregate the same exploded token stream —
    * the exact arm a partial-agg census + TakeOrdered, the sketch arm a
    * single 1-row aggregate broadcast back onto the k-row result. */
  def approxTopkTokens(spark: SparkSession, dir: String,
      k: Int = TopkK, tracked: Int = TopkTracked): DataFrame = {
    val toks = Tables(spark, dir).documents
      .select(explode(expr(wordsExpr)).as("w"))
      .where(col("w") =!= "")
    val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(k)
    // the sketch arm asks for 10·k items: the k exact heads must appear in
    // the sketch's wider head even when counts tie at the k boundary (ties
    // make the sketch's own top-k selection order-free); a head token the
    // sketch has no row for yields NULL via get() → a FALSE claim, never a
    // crash
    val sketch = toks.agg(expr(s"approx_top_k(w, ${10 * k}, $tracked)").as("sk"))
    exact.crossJoin(broadcast(sketch))
      .select(col("w"), col("n"),
        coalesce(
          expr("get(filter(sk, x -> x.item = w), 0).count").cast("long") === col("n"),
          lit(false)).as("sketch_agrees"))
      .orderBy(col("n").desc, col("w"))
  }

  /** Character-level entropy screen per source — the compressibility /
    * gibberish detector: natural language sits ~4–4.5 bits/char over a
    * word-like alphabet, random hex ≫, boilerplate ≪. Sources whose
    * `entropy_bits` falls far from the corpus band are machine noise or
    * template spam and go to quarantine before tokenization. Runs with no
    * model at all — the cheapest quality signal after length.
    *
    * Shape at scale: the char explosion collapses to the (source, char)
    * census by map-side combine (alphabet-bounded — the [[vocabCoverage]]
    * economics one level down); the entropy fold rides the
    * [[StatsQueries.columnEntropy]] determinism contract (per-term doubles
    * truncated to DECIMAL(38,12), order-independent sum, one ÷ln 2). */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = Tables(spark, dir).documents
      // source is the ORDER BY key — NULLS FIRST/LAST divergence guard
      .where(col("source").isNotNull)
      .select(col("source"), explode(split(col("text"), "")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy(col("source"), col("ch")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("source"))))
    val p = col("c").cast("double") / col("n").cast("double")
    census.groupBy(col("source"))
      .agg(max(col("n")).as("n_chars"),
        count(lit(1)).as("alphabet_size"),
        round((-sum((p * log(p)).cast("decimal(38,12)")).cast("double")) /
          log(lit(2.0)), 6).as("entropy_bits"))
      .orderBy(col("source"))
  }

  /** Good–Turing vocabulary-coverage screen per source: token count, type
    * count, hapax/dis legomena, and the Turing unseen-mass estimate f1/N —
    * "how much of this source's vocabulary has my sample NOT seen yet".
    * The coverage answer decides whether a tokenizer/vocab trained on the
    * sample will hold on the full source (a high unseen mass means the
    * source is lexically open-ended and needs byte-fallback).
    *
    * Shape at scale: one partial-agg shuffle to the (source, token) census;
    * everything downstream (type counts, f1/f2, the mass formula) runs on
    * the vocabulary, not the token stream — the [[vocabStats]] economics.
    * All ratios are exact-integer divisions evaluated in double, the same
    * tree in the oracle. */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      // source is the ORDER BY key — NULLS FIRST/LAST divergence guard
      .where(col("source").isNotNull)
      .select(col("source"), explode(expr(wordsExpr)).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
      .groupBy(col("source"))
      .agg(sum(col("f")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("f") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("f1"), col("f2"),
        round(col("f1").cast("double") / col("n_tokens").cast("double"), 6)
          .as("gt_unseen_mass"),
        round(lit(1.0) - col("f1").cast("double") / col("n_tokens").cast("double"), 6)
          .as("coverage"))
      .orderBy(col("source"))

  /** BPE merge-candidate table: the frequency of every adjacent character
    * pair across the corpus, weighted by word frequency — exactly the
    * statistic the first byte-pair-encoding merge round maximizes when
    * training a tokenizer. Re-running this against a trained vocabulary is
    * the standard tokenizer-drift check on a new corpus.
    *
    * Shape at scale: the token stream collapses to the word census FIRST
    * (one partial-agg shuffle to vocabulary size — the [[vocabStats]]
    * move), so the pair explosion runs per TYPE, not per token: a word seen
    * 10⁹ times contributes its pairs once, weighted. The second shuffle
    * aggregates to the character-pair grid (≤ alphabet² rows — metadata)
    * and the top-k is a `TakeOrderedAndProject`. Tie-break on the pair
    * string makes the cut deterministic. */
  def bpePairMerges(spark: SparkSession, dir: String, k: Int = BpeTopK): DataFrame = {
    val vocab = Tables(spark, dir).documents
      .select(explode(expr(wordsExpr)).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    vocab
      .select(col("freq"),
        explode(expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"))
          .as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n_occ"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(k)
  }
}
