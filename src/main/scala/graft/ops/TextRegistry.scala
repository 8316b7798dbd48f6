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
         |FROM documents ORDER BY doc_id""".stripMargin)(TextQueries.fingerprint),

    // tf is BIGINT in both engines (count); the score is a single multiply of
    // BIGINT by a natural log of a double ratio — one IEEE op each side, so
    // bit parity holds without a decimal detour. row_number casts to BIGINT
    // (Spark's is INT). Ties in score break on term in BOTH window orders.
    QueryDef("q_tfidf_keywords",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($words) AS term FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (
         |  SELECT tf.doc_id, tf.term,
         |    tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (
         |  SELECT doc_id, term, score,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY score DESC, term) AS BIGINT) AS rk
         |  FROM s)
         |SELECT doc_id, rk, term, round(score, 6) AS tfidf
         |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)((s, d) => TextQueries.tfidfKeywords(s, d, topK = 3)),

    // Every fractional constant is CAST(... AS DOUBLE): a bare 0.5 literal in
    // DuckDB is DECIMAL(1,1) and would drag the whole expression into decimal
    // arithmetic (memory: decimal-literal trap). k1/b are interpolated from
    // TextQueries.Bm25K1/Bm25B (single source of truth — changing the Scala
    // constants moves the oracle with them). k1+1 is spelled as the SUM of
    // two double casts, not 2.2 — the Scala side computes Bm25K1 + 1.0 at
    // runtime and the exact IEEE sum is a round-to-even tie, so both engines
    // must perform the same addition rather than parse a literal. The per-doc
    // fold is list_sum over a term-ordered list ≡ Spark's aggregate() over
    // array_sort(collect_list(struct(term, s))) — same left fold, bit-equal.
    QueryDef("q_bm25_search",
      s"""WITH docs AS (
         |  SELECT doc_id, CAST(len($words) AS BIGINT) AS dl, text FROM documents),
         |stats AS (
         |  SELECT count(*) AS n_docs,
         |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM docs),
         |tok AS (SELECT doc_id, dl, unnest($words) AS term FROM docs),
         |tf AS (
         |  SELECT doc_id, dl, term, count(*) AS tf FROM tok
         |  WHERE term IN (${TextQueries.bm25TermsSqlList})
         |  GROUP BY doc_id, dl, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |s AS (
         |  SELECT tf.doc_id, tf.term,
         |    ln(CAST(1.0 AS DOUBLE)
         |       + (n_docs - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
         |    * (tf * (CAST(${TextQueries.Bm25K1} AS DOUBLE) + CAST(1.0 AS DOUBLE)))
         |    / (tf + CAST(${TextQueries.Bm25K1} AS DOUBLE)
         |            * (CAST(${1.0 - TextQueries.Bm25B} AS DOUBLE)
         |               + CAST(${TextQueries.Bm25B} AS DOUBLE) * dl / avgdl)) AS s
         |  FROM tf JOIN df USING (term) CROSS JOIN stats)
         |SELECT doc_id, count(*) AS n_terms,
         |  round(list_sum(list(s ORDER BY term)), 6) AS bm25
         |FROM s GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)((s, d) => TextQueries.bm25Search(s, d, TextQueries.Bm25Terms, k = 20)),

    // Bigrams over every occurrence; DuckDB list slicing is inclusive so
    // [i:i+1] is the 2-token window, and generate_series(1, len-1) is empty
    // for 1-token docs (matching Spark's size >= 2 guard). (n, bigram) is a
    // total order, so LIMIT 50 cuts identically in both engines.
    QueryDef("q_ngram_counts",
      s"""WITH w AS (SELECT $words AS w FROM documents),
         |b AS (
         |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
         |                               i -> array_to_string(w[i:i+1], ' '))) AS bigram
         |  FROM w)
         |SELECT bigram, count(*) AS n FROM b
         |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""".stripMargin)((s, d) => TextQueries.ngramCounts(s, d, n = 2, topK = 50)),

    // ln is one libm call on the identical double ratio in both engines
    // (same agreement the BM25/TF-IDF oracles rely on); the per-doc sum is
    // DECIMAL(38,12)-cast so partition order can't move it.
    QueryDef("q_lm_score",
      s"""WITH tok AS (SELECT doc_id, unnest($words) AS t FROM documents),
         |vocab AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM vocab)
         |SELECT doc_id, count(*) AS n_tokens,
         |  round(CAST(sum(CAST(-ln(CAST(c AS DOUBLE) / n_total)
         |                      AS DECIMAL(38,12))) AS DOUBLE)
         |        / count(*), 6) AS avg_nll
         |FROM tok JOIN vocab USING (t) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)(TextQueries.lmScore),

    // PMI arithmetic parenthesized identically to the Spark expression tree:
    // (n_ab/nb) / ((n_a/nu) * (n_b/nu)), every numerator cast to DOUBLE first.
    // DuckDB list indexing is 1-based where Spark's split()[i] is 0-based.
    QueryDef("q_pmi_collocations",
      s"""WITH w AS (SELECT $words AS w FROM documents),
         |uni AS (SELECT t, count(*) AS n
         |        FROM (SELECT unnest(w) AS t FROM w) GROUP BY 1),
         |nu AS (SELECT CAST(sum(n) AS BIGINT) AS nu FROM uni),
         |nb AS (SELECT CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS nb FROM w),
         |bi AS (SELECT bigram, count(*) AS n_ab
         |       FROM (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
         |                    i -> array_to_string(w[i:i+1], ' '))) AS bigram
         |             FROM w)
         |       GROUP BY 1 HAVING count(*) >= ${TextQueries.PmiMinCount}),
         |j AS (SELECT bigram, n_ab,
         |        string_split(bigram, ' ')[1] AS a,
         |        string_split(bigram, ' ')[2] AS b
         |      FROM bi)
         |SELECT bigram, n_ab, ua.n AS n_a, ub.n AS n_b,
         |  round(ln((CAST(n_ab AS DOUBLE) / nb)
         |           / ((CAST(ua.n AS DOUBLE) / nu)
         |              * (CAST(ub.n AS DOUBLE) / nu))), 6) AS pmi
         |FROM j JOIN uni ua ON j.a = ua.t JOIN uni ub ON j.b = ub.t
         |CROSS JOIN nu CROSS JOIN nb
         |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin)(
      (s, d) => TextQueries.pmiCollocations(s, d,
        minCount = TextQueries.PmiMinCount, topK = 50)),

    QueryDef("q_vocab_stats",
      """WITH tt AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT source, tok, count(*) AS n FROM tt GROUP BY 1, 2)
        |SELECT source,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_types,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS BIGINT), 6) AS ttr
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)(
      TextQueries.vocabStats),

    // generate_series/sequence agree on inclusive stop + step semantics;
    // list indexing is 1-based in both engines.
    QueryDef("q_chunk_windows",
      s"""WITH d AS (SELECT doc_id,
        |        list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |      FROM documents),
        |t AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
        |w AS (SELECT doc_id, toks, n,
        |        unnest(generate_series(0, n - 1, ${TextQueries.WinStride})) AS s
        |      FROM t)
        |SELECT doc_id,
        |  s // ${TextQueries.WinStride} AS win_id,
        |  LEAST(${TextQueries.WinTokens}, n - s) AS n_tok,
        |  toks[s + 1] AS first_tok,
        |  toks[s + LEAST(${TextQueries.WinTokens}, n - s)] AS last_tok
        |FROM w ORDER BY doc_id, win_id""".stripMargin)(
      TextQueries.chunkWindows),

    // Same planted-PII construction, same two-stage replace; the scrubbed
    // text is compared via its 48-bit hash, so redaction must be
    // byte-identical across the engines, not merely count-equal.
    QueryDef("q_pii_scrub",
      s"""WITH aug AS (SELECT doc_id,
         |    text || ' contact user' || doc_id::VARCHAR ||
         |    '@example.com or call 555-' ||
         |    lpad((doc_id % 10000)::VARCHAR, 4, '0') AS aug
         |  FROM documents),
         |s AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(aug, '${TextQueries.EmailRe}')) AS BIGINT) AS n_emails,
         |    CAST(len(regexp_extract_all(aug, '${TextQueries.PhoneRe}')) AS BIGINT) AS n_phones,
         |    regexp_replace(regexp_replace(aug,
         |      '${TextQueries.EmailRe}', '<EMAIL>', 'g'),
         |      '${TextQueries.PhoneRe}', '<PHONE>', 'g') AS scrubbed
         |  FROM aug)
         |SELECT doc_id, n_emails, n_phones,
         |  CAST(length(scrubbed) AS BIGINT) AS scrubbed_len,
         |  ('0x' || substr(md5(scrubbed), 1, 12))::BIGINT AS scrubbed_h48
         |FROM s ORDER BY doc_id""".stripMargin)(
      TextQueries.piiScrub),

    // The rank-window + string_agg(... ORDER BY) spelling mirrors the Spark
    // side's WindowGroupLimit + sorted-struct aggregation; the explicit
    // ORDER BY makes the posting order deterministic rather than
    // arrival-dependent. Postings are comma-joined into a scalar string so
    // every row-comparator (including the driver's) can sort/hash the cell.
    QueryDef("q_inverted_index",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
         |       WHERE term <> '' GROUP BY 1, 2),
         |stats AS (SELECT term, count(*) AS df,
         |            CAST(SUM(tf) AS BIGINT) AS cf
         |          FROM tf GROUP BY 1),
         |rk AS (SELECT term, doc_id, tf,
         |         row_number() OVER (PARTITION BY term
         |                            ORDER BY tf DESC, doc_id) AS rk
         |       FROM tf),
         |post AS (SELECT term,
         |           string_agg(CAST(doc_id AS VARCHAR), ','
         |                      ORDER BY tf DESC, doc_id) AS postings
         |         FROM rk WHERE rk <= ${TextQueries.IdxPostings} GROUP BY 1)
         |SELECT s.term, s.df, s.cf, p.postings
         |FROM stats s JOIN post p USING (term) ORDER BY s.term""".stripMargin)(
      (s, d) => TextQueries.invertedIndex(s, d)),

    // Ranks are a (count DESC, token) total order; ln moments ride the
    // decimal-sum contract; slope/R² are the trendOls double formulas.
    QueryDef("q_zipf_fit",
      s"""WITH tt AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |c AS (SELECT source, tok, count(*) AS n FROM tt GROUP BY 1, 2),
         |rk AS (SELECT source, n, row_number() OVER (
         |         PARTITION BY source ORDER BY n DESC, tok) AS r
         |       FROM c),
         |t AS (SELECT source,
         |        ln(CAST(r AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
         |      FROM rk WHERE r <= ${TextQueries.ZipfTopV}),
         |m AS (SELECT source, count(*) AS n_terms,
         |        CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         |        CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         |        CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         |        CAST(sum(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy,
         |        CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy
         |      FROM t GROUP BY 1)
         |SELECT source, n_terms,
         |  round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6)
         |    AS zipf_slope,
         |  round(((n_terms * sxy - sx * sy) * (n_terms * sxy - sx * sy)) /
         |    ((n_terms * sxx - sx * sx) * (n_terms * syy - sy * sy)), 6)
         |    AS r2
         |FROM m ORDER BY source""".stripMargin)(TextQueries.zipfFit),

    // The oracle enumerates bigrams with their 0-based start position (the
    // ngram-oracle spelling plus struct_pack); the phrase's two terms are
    // distinct by contract, so matches can't overlap and both engines
    // count identically.
    QueryDef("q_phrase_search", {
      val phrase = TextQueries.PhraseTerms.mkString(" ")
      s"""WITH w AS (SELECT doc_id, $words AS w FROM documents),
         |b AS (SELECT doc_id,
         |        unnest(list_transform(generate_series(1, len(w) - 1),
         |          i -> struct_pack(pos := i - 1,
         |                 bg := array_to_string(w[i:i+1], ' ')))) AS s
         |      FROM w)
         |SELECT doc_id, count(*) AS n_matches,
         |  CAST(min(s.pos) AS BIGINT) AS first_pos
         |FROM b WHERE s.bg = '$phrase'
         |GROUP BY 1 ORDER BY doc_id""".stripMargin
    })((s, d) => TextQueries.phraseSearch(s, d)),

    // The vocab cut is the total (count DESC, token) order — LIMIT is
    // deterministic on ties in both engines.
    QueryDef("q_oov_rate",
      s"""WITH tok AS (SELECT source, unnest($words) AS tok FROM documents),
         |t AS (SELECT source, tok FROM tok WHERE tok <> ''),
         |v AS (SELECT tok, 1 AS in_vocab FROM
         |        (SELECT tok, count(*) AS n FROM t GROUP BY 1
         |         ORDER BY n DESC, tok LIMIT ${TextQueries.OovVocab})),
         |j AS (SELECT source, in_vocab FROM t LEFT JOIN v USING (tok))
         |SELECT source, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  round(CAST(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)
         |      AS DOUBLE) / count(*), 6) AS oov_rate
         |FROM j GROUP BY 1 ORDER BY source""".stripMargin)(
      (s, d) => TextQueries.oovRate(s, d)),

    // Fixed-width length buckets with a capped tail; exact decimal avg.
    QueryDef("q_token_len_dist", {
      val w = TextQueries.LenBucketWidth; val cap = TextQueries.LenBucketCap
      s"""WITH t AS (
         |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT)
         |    AS n_tokens
         |  FROM documents)
         |SELECT lang,
         |  LEAST((n_tokens // $w) * $w, $cap) AS bucket,
         |  count(*) AS n_docs,
         |  round(${Out.sql.davg("n_tokens")}, 6) AS avg_tokens
         |FROM t GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin
    })(TextQueries.tokenLenDist),

    // RAKE: stopword-split runs via a per-doc prefix sum, deg/freq word
    // scores, decimal-exact per-phrase sums, top-k on (score, phrase).
    QueryDef("q_rake_phrases", {
      val stop = TextQueries.stopwordsSqlList
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |wp AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, ws
         |       FROM t),
         |w AS (SELECT doc_id, pos, ws[pos] AS w FROM wp),
         |r AS (SELECT doc_id, pos, w,
         |        SUM(CASE WHEN w IN ($stop) THEN 1 ELSE 0 END)
         |          OVER (PARTITION BY doc_id ORDER BY pos) AS run
         |      FROM w),
         |runs AS (SELECT * FROM r WHERE w NOT IN ($stop)),
         |phr AS (SELECT doc_id, run,
         |          string_agg(w, ' ' ORDER BY pos) AS phrase,
         |          count(*) AS len
         |        FROM runs GROUP BY 1, 2
         |        HAVING count(*) <= ${TextQueries.RakeMaxLen}),
         |wi AS (SELECT runs.doc_id, runs.run, phr.phrase, phr.len, runs.w
         |       FROM runs JOIN phr USING (doc_id, run)),
         |wsc AS (SELECT w,
         |          CAST(SUM(len) AS DOUBLE) / count(*) AS wscore
         |        FROM wi GROUP BY 1),
         |ps AS (SELECT wi.doc_id, wi.run, wi.phrase,
         |         round(CAST(SUM(CAST(wscore AS DECIMAL(38,12))) AS DOUBLE), 6)
         |           AS pscore
         |       FROM wi JOIN wsc USING (w)
         |       GROUP BY 1, 2, 3)
         |SELECT phrase, count(*) AS n_occ, max(pscore) AS score
         |FROM ps GROUP BY 1
         |ORDER BY score DESC, phrase LIMIT ${TextQueries.RakeTopK}""".stripMargin
    })((s, d) => TextQueries.rakePhrases(s, d)),

    // Pair explosion runs over the word CENSUS (vocabulary-sized), never the
    // token stream; DuckDB range(a,b) is [a,b) = Spark sequence(a, b-1).
    QueryDef("q_bpe_pair_merges",
      s"""WITH vocab AS (
         |  SELECT w, count(*) AS freq FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) >= 2 GROUP BY 1),
         |pos AS (
         |  SELECT w, freq, unnest(range(1, length(w))) AS i FROM vocab),
         |pairs AS (
         |  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq FROM pos)
         |SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occ
         |FROM pairs GROUP BY 1
         |ORDER BY n_occ DESC, pair LIMIT ${TextQueries.BpeTopK}""".stripMargin)(
      (s, d) => TextQueries.bpePairMerges(s, d)),

    // Census-then-rollup: the mass formula never touches the token stream.
    QueryDef("q_vocab_coverage",
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
        |  WHERE source IS NOT NULL),
        |census AS (
        |  SELECT source, w, count(*) AS f FROM tok WHERE w <> '' GROUP BY 1, 2)
        |SELECT source,
        |  CAST(SUM(f) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |  CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        |  round(CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(f) AS DOUBLE), 6) AS gt_unseen_mass,
        |  round(1.0 - CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(f) AS DOUBLE), 6) AS coverage
        |FROM census GROUP BY 1 ORDER BY source""".stripMargin)(
      TextQueries.vocabCoverage),

    // Chars via the unnest(range) positional trick (range is [a,b));
    // entropy fold on the q_entropy DECIMAL(38,12) contract.
    QueryDef("q_char_entropy",
      """WITH pos AS (
        |  SELECT source, text, unnest(range(1, length(text) + 1)) AS i
        |  FROM documents WHERE source IS NOT NULL),
        |ch AS (SELECT source, substr(text, CAST(i AS INTEGER), 1) AS ch FROM pos),
        |census AS (
        |  SELECT source, ch, count(*) AS c FROM ch WHERE ch <> '' GROUP BY 1, 2),
        |w AS (SELECT source, c, sum(c) OVER (PARTITION BY source) AS n FROM census)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_chars,
        |  count(*) AS alphabet_size,
        |  round(CAST(-sum(CAST((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS DECIMAL(38,12))) AS DOUBLE) / ln(2.0), 6) AS entropy_bits
        |FROM w GROUP BY 1 ORDER BY source""".stripMargin)(
      TextQueries.charEntropy),

    // The oracle computes the EXACT top-k and asserts the sketch claim
    // TRUE (tracked >= vocabulary => the sketch is exact by construction).
    QueryDef("q_approx_topk",
      s"""WITH toks AS (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |census AS (
         |  SELECT w, count(*) AS n FROM toks WHERE w <> '' GROUP BY 1)
         |SELECT w, n, TRUE AS sketch_agrees
         |FROM census ORDER BY n DESC, w
         |LIMIT ${TextQueries.TopkK}""".stripMargin)(
      (s, d) => TextQueries.approxTopkTokens(s, d)),

    // Laplace bigram model trained on the corpus itself; NLL terms on the
    // DECIMAL(38,12) contract. (c12 + 1.0) is DOUBLE in both engines;
    // (c1 + vsz) stays integral until the one division.
    QueryDef("q_bigram_lm",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |pos AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w),
        |bg AS (SELECT doc_id, ws[CAST(i AS INTEGER)] AS w1,
        |         ws[CAST(i + 1 AS INTEGER)] AS w2 FROM pos),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |c1 AS (SELECT t AS w1, count(*) AS c1 FROM tok GROUP BY 1),
        |v AS (SELECT count(DISTINCT t) AS vsz FROM tok)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(SUM(CAST(-ln((c12.c12 + 1.0) / (c1.c1 + vsz))
        |      AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS avg_nll
        |FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)(
      TextQueries.bigramLm),

    // Same rounded stop-ratio rule as q_lang_id, collapsed to the
    // (lang, pred) grid with within-lang shares.
    QueryDef("q_langid_confusion",
      s"""WITH p AS (
         |  SELECT lang,
         |    CASE WHEN round(CAST(len(list_filter($words, t -> t IN ($stop)))
         |                    AS DOUBLE) / len($words), 4) >= 0.08
         |         THEN 'en' ELSE 'und' END AS pred_lang
         |  FROM documents WHERE lang IS NOT NULL),
         |grid AS (
         |  SELECT lang, pred_lang, count(*) AS n_docs FROM p GROUP BY 1, 2),
         |t AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_lang
         |      FROM grid GROUP BY 1)
         |SELECT lang, pred_lang, n_docs,
         |  round(CAST(n_docs AS DOUBLE) / n_lang, 6) AS share
         |FROM grid JOIN t USING (lang)
         |ORDER BY lang, pred_lang""".stripMargin)(TextQueries.langidConfusion),

    // The q_token_count expressions rolled up to the lang grid.
    QueryDef("q_tokenizer_fertility",
      s"""WITH d AS (
         |  SELECT lang,
         |    CAST(len($words) AS BIGINT) AS ws,
         |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
         |      AS BIGINT) AS re
         |  FROM documents WHERE lang IS NOT NULL)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(SUM(ws) AS BIGINT) AS ws_tokens,
         |  CAST(SUM(re) AS BIGINT) AS re_tokens,
         |  round(CAST(SUM(re) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE), 6)
         |    AS fertility
         |FROM d GROUP BY 1 ORDER BY lang""".stripMargin)(
      TextQueries.tokenizerFertility))
}
