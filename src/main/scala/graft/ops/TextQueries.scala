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
}
