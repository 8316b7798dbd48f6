package graft.ops

import graft.QueryDef

/** DuckDB oracle SQL mirroring [[MultimodalQueries]] — the payload is
  * `encode(text)` (UTF-8 bytes, same bytes Spark's `cast(text as binary)`
  * produces), so byte lengths, MD5s, and header slices agree exactly. */
object MultimodalRegistry {

  private val h = "('0x' || substr(content_md5, 1, 12))::BIGINT"

  def all: Seq[QueryDef] = Seq(
    QueryDef("q_blob_meta",
      s"""WITH b AS (SELECT doc_id, text, encode(text) AS payload, md5(text) AS content_md5
         |           FROM documents)
         |SELECT doc_id,
         |  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
         |  content_md5,
         |  lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
         |  64 + $h % 1857 AS width,
         |  64 + ($h // 1857) % 1017 AS height,
         |  1 + $h % 4 AS channels
         |FROM b ORDER BY doc_id""".stripMargin)(MultimodalQueries.blobMeta),

    QueryDef("q_frame_sample",
      s"""WITH b AS (SELECT doc_id, md5(text) AS content_md5 FROM documents),
         |f AS (SELECT doc_id, 1 + $h % 240 AS n_frames,
         |        greatest(1, (1 + $h % 240) // 4) AS frame_step
         |      FROM b)
         |SELECT doc_id, n_frames, frame_step,
         |  CAST(len(range(0, n_frames, frame_step)) AS BIGINT) AS n_sampled
         |FROM f ORDER BY doc_id""".stripMargin)(MultimodalQueries.frameSample),

    // md5 over the chunk string ≡ Spark's md5(cast(chunk AS BINARY)) — both
    // hash the UTF-8 bytes; substr is 1-based in both engines.
    QueryDef("q_chunk_census",
      s"""WITH d AS (SELECT doc_id, text,
         |        greatest((len(text) + ${MultimodalQueries.ChunkChars - 1})
         |                   // ${MultimodalQueries.ChunkChars}, 1) AS nc
         |      FROM documents),
         |c AS (SELECT doc_id,
         |        md5(substr(text, CAST(ci * ${MultimodalQueries.ChunkChars} + 1 AS INT),
         |                   ${MultimodalQueries.ChunkChars})) AS chunk_md5
         |      FROM (SELECT doc_id, text, unnest(range(0, nc)) AS ci FROM d)),
         |g AS (SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs,
         |        count(*) AS n_total
         |      FROM c GROUP BY 1 HAVING count(*) >= 2)
         |SELECT chunk_md5, n_docs, n_total FROM g
         |ORDER BY n_total DESC, chunk_md5 LIMIT 50""".stripMargin)(
      (s, d) => MultimodalQueries.chunkCensus(s, d, topK = 50)),

    // The gear rolling hash is a sequential per-payload recurrence DuckDB
    // can't replay, so the key emits the kernel's structural CLAIMS
    // (coverage / bounds / mean-length band) + oracle-computable doc/byte
    // totals; the oracle asserts the claims TRUE (round-6 advice).
    // CdcChunksSpec holds the byte-exact reimplementation + shift-invariance
    // checks, and the census shape itself is the oracle-proven
    // q_chunk_census arithmetic.
    QueryDef("q_chunk_census_cdc",
      """SELECT count(*) AS n_docs,
        |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |  TRUE AS coverage_ok, TRUE AS bounds_ok, TRUE AS mean_len_ok
        |FROM documents WHERE strlen(text) > 0""".stripMargin)(
      MultimodalQueries.cdcChunkAudit),

    QueryDef("q_media_resize",
      s"""WITH b AS (SELECT doc_id, md5(text) AS content_md5 FROM documents),
         |g AS (SELECT doc_id,
         |        64 + $h % 1857 AS width,
         |        64 + ($h // 1857) % 1017 AS height
         |      FROM b),
         |s AS (SELECT *, greatest(width, height) AS long_side FROM g)
         |SELECT doc_id, width, height,
         |  CASE WHEN long_side <= 224 THEN width
         |       ELSE greatest(1, (width * 224) // long_side) END AS out_w,
         |  CASE WHEN long_side <= 224 THEN height
         |       ELSE greatest(1, (height * 224) // long_side) END AS out_h
         |FROM s ORDER BY doc_id""".stripMargin)(
      (s, d) => MultimodalQueries.mediaResize(s, d)),

    // DuckDB spelling of the FakeEncoder: feature j =
    // hash48(md5 || ':' || j) % 1e5 / 1e5 — digest-deterministic, so the
    // imperative mapPartitions stage hash-matches a declarative oracle.
    QueryDef("q_media_features", {
      val fCols = (0 until 8).map(j => s"fs[${j + 1}] AS f$j").mkString(", ")
      val norm = (0 until 8).map(j => s"fs[${j + 1}] * fs[${j + 1}]")
        .mkString(" + ")
      s"""WITH b AS (SELECT doc_id, md5(text) AS cm FROM documents),
         |f AS (SELECT doc_id, list_transform(range(0, 8), j ->
         |        ((('0x' || substr(md5(cm || ':' || j), 1, 12))::BIGINT % 100000)
         |         ) / 100000.0) AS fs
         |      FROM b)
         |SELECT doc_id, $fCols, round($norm, 6) AS norm2
         |FROM f ORDER BY doc_id""".stripMargin
    })((s, d) => MultimodalQueries.mediaFeatures(s, d)),

    QueryDef("q_blob_chunk_dedup",
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
         |           WHERE length(text) > 0),
         |ch AS (SELECT DISTINCT doc_id,
         |         md5(substring(text, off, ${MultimodalQueries.ChunkChars})) AS ch
         |       FROM (SELECT doc_id, text,
         |               unnest(generate_series(1, n, ${MultimodalQueries.ChunkChars})) AS off
         |             FROM d)),
         |sz AS (SELECT doc_id, count(*) AS nc FROM ch GROUP BY 1),
         |ok AS (SELECT ch FROM (SELECT ch, count(*) AS df FROM ch GROUP BY 1)
         |       WHERE df <= ${MultimodalQueries.ChunkDfCap}),
         |cc AS (SELECT ch.* FROM ch JOIN ok USING (ch)),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |      FROM cc a JOIN cc b ON a.ch = b.ch AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2
         |      HAVING count(*) >= ${MultimodalQueries.ChunkPairMinShared})
         |SELECT doc_a, doc_b, n_shared,
         |  round(CAST(n_shared AS DOUBLE) / (sa.nc + sb.nc - n_shared), 6) AS jaccard
         |FROM p JOIN sz sa ON sa.doc_id = doc_a
         |       JOIN sz sb ON sb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin)(
      (s, d) => MultimodalQueries.blobChunkDedup(s, d))
  )
}
