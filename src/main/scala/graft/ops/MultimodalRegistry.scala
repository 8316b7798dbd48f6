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

    // no oracle: the gear rolling hash is a sequential per-payload
    // recurrence DuckDB can't reasonably replay; CdcChunksSpec holds the
    // independent reimplementation + shift-invariance checks
    graft.QueryDef.noOracle("q_chunk_census_cdc")(
      (s, d) => MultimodalQueries.chunkCensusCdc(s, d, topK = 50))
  )
}
