package graft.ops

import graft.QueryDef

/** Oracle SQL (DuckDB dialect, ANSI where possible) for [[TextQueries]].
  *
  * Every expression here is the DuckDB spelling of the exact Spark expression
  * in the query builder — same tokenization (`string_split` ≡ `split` on a
  * single space), same MD5-derived hashes, same rounding — so the driver's
  * row-hash compare is bit-exact.
  */
object TextRegistry {

  private val words = "string_split(text, ' ')"
  private val stop = TextQueries.stopwordsSqlList

  /** DuckDB 5-word shingles; `generate_series(1, stop)` is empty for
    * stop < 1 (unlike Spark's `sequence`, which needs a guard). */
  private val shingles5 =
    s"list_transform(generate_series(1, len($words) - 4), i -> array_to_string(($words)[i:i+4], ' '))"

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_text_stats",
      // CASTs: DuckDB's bare SUM(INTEGER) is HUGEINT (int128); Spark emits
      // BIGINT. Cast in the oracle so the driver's hash compare sees the same
      // type on both sides (round-1 ADVICE, CORRECTNESS_r01 hash_match=false).
      s"""SELECT lang,
         |  count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
         |  CAST(sum(len($words)) AS BIGINT) AS total_tokens
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)(TextQueries.textStats),

    QueryDef("q_token_count",
      s"""SELECT doc_id, n_chars,
         |  CAST(len($words) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
         |FROM documents ORDER BY doc_id""".stripMargin)(TextQueries.tokenCount),

    QueryDef("q_lang_id",
      s"""SELECT doc_id,
         |  CAST(len($words) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter($words, t -> t IN ($stop))) AS BIGINT) AS n_stop,
         |  round(CAST(len(list_filter($words, t -> t IN ($stop))) AS DOUBLE)
         |        / len($words), 4) AS stop_ratio,
         |  CASE WHEN round(CAST(len(list_filter($words, t -> t IN ($stop))) AS DOUBLE)
         |                  / len($words), 4) >= 0.08
         |       THEN 'en' ELSE 'und' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin)(TextQueries.langId),

    QueryDef("q_quality_score",
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len($words) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct($words)) AS BIGINT) AS uniq_tokens
         |  FROM documents)
         |SELECT doc_id, n_tokens, uniq_tokens,
         |  round(CAST(uniq_tokens AS DOUBLE) / n_tokens, 4) AS uniq_ratio,
         |  round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 4) AS len_score,
         |  round(round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0), 4) * 0.4
         |        + round(CAST(uniq_tokens AS DOUBLE) / n_tokens, 4) * 0.6, 4) AS quality
         |FROM t ORDER BY doc_id""".stripMargin)(TextQueries.qualityScore),

    QueryDef("q_fingerprint",
      s"""SELECT doc_id, md5(text) AS doc_md5,
         |  coalesce(list_min(list_transform($shingles5, s -> md5(s))), md5(text))
         |    AS min_shingle_md5
         |FROM documents ORDER BY doc_id""".stripMargin)(TextQueries.fingerprint)
  )
}
