import json, math, os, sys, shutil, time
import duckdb

os.makedirs('/tmp/duck_spill', exist_ok=True)
con = duckdb.connect()
con.sql("PRAGMA memory_limit='90GB'")
con.sql("PRAGMA threads=16")
con.sql("PRAGMA temp_directory='/tmp/duck_spill'")

sf = '/tmp/graft100x/sfx100'
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet/*.parquet')")

work = '/tmp/duck_mknn'
shutil.rmtree(work, ignore_errors=True)
os.makedirs(work)

PLANES = """planes AS (SELECT p, list_transform(range(0, 64), d ->
  CAST(1 - 2 * ((('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 12))::BIGINT) % 2) AS DOUBLE)) AS signs
FROM (SELECT unnest(range(0, 80)) AS p))"""

# Phase 1: per-vector band signatures, chunked by vec_id hash (independent per vector).
NCH = 16
t0 = time.time()
for i in range(NCH):
    con.sql(f"""COPY (
      WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE hash(vec_id) % {NCH} = {i}),
      {PLANES},
      proj AS (SELECT vec_id, p, list_sum(list_transform(range(1, len(e) + 1), i -> (e)[i] * (signs)[i])) AS proj
               FROM emb CROSS JOIN planes)
      SELECT vec_id, p // 10 AS band_idx,
             CAST(sum(CASE WHEN proj >= 0
                           THEN (1::BIGINT << CAST(p % 10 AS INT))
                           ELSE 0::BIGINT END) AS BIGINT) AS band_val
      FROM proj GROUP BY 1, 2
    ) TO '{work}/bands_{i}.parquet' (FORMAT PARQUET)""")
    print(f"bands chunk {i+1}/{NCH} done {time.time()-t0:.0f}s", flush=True)

con.sql(f"CREATE VIEW bands0 AS SELECT * FROM read_parquet('{work}/bands_*.parquet')")

# Phase 2: df-capped buckets -> distinct candidate pairs (slim: two BIGINTs).
con.sql(f"""COPY (
  WITH okband AS (SELECT band_idx, band_val FROM bands0
                  GROUP BY 1, 2 HAVING count(*) <= 1000),
  bands AS (SELECT bands0.* FROM bands0 JOIN okband USING (band_idx, band_val))
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id
) TO '{work}/pairs.parquet' (FORMAT PARQUET)""")
npairs = con.sql(f"SELECT count(*) FROM read_parquet('{work}/pairs.parquet')").fetchone()[0]
print(f"pairs: {npairs} ({time.time()-t0:.0f}s)", flush=True)

# Phase 3: cosine scoring, chunked by pair hash so the list-carrying join stays bounded.
NSC = 8
for i in range(NSC):
    con.sql(f"""COPY (
      WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      pairs AS (SELECT * FROM read_parquet('{work}/pairs.parquet') WHERE hash(vec_a) % {NSC} = {i})
      SELECT vec_a, vec_b,
        round((list_sum(list_transform(range(1, len(ea.e) + 1), i -> (ea.e)[i] * (eb.e)[i])) /
          (sqrt(list_sum(list_transform(range(1, len(ea.e) + 1), i -> (ea.e)[i] * (ea.e)[i]))) *
           sqrt(list_sum(list_transform(range(1, len(eb.e) + 1), i -> (eb.e)[i] * (eb.e)[i]))))), 6) AS cos_sim
      FROM pairs JOIN emb ea ON ea.vec_id = vec_a JOIN emb eb ON eb.vec_id = vec_b
    ) TO '{work}/scored_{i}.parquet' (FORMAT PARQUET)""")
    print(f"scored chunk {i+1}/{NSC} done {time.time()-t0:.0f}s", flush=True)

# Phase 4: mutual top-5 over slim (src, dst, cos_sim) rows.
final_sql = f"""
WITH scored AS (SELECT * FROM read_parquet('{work}/scored_*.parquet')),
directed AS (
  SELECT vec_a AS src, vec_b AS dst, cos_sim FROM scored
  UNION ALL
  SELECT vec_b AS src, vec_a AS dst, cos_sim FROM scored),
knn AS (SELECT src, dst, cos_sim, rn FROM (
    SELECT src, dst, cos_sim,
      CAST(row_number() OVER (PARTITION BY src
        ORDER BY cos_sim DESC, dst) AS BIGINT) AS rn
    FROM directed)
  WHERE rn <= 5)
SELECT f.src AS vec_a, f.dst AS vec_b, f.cos_sim,
  f.rn AS rank_a, r.rn AS rank_b
FROM knn f JOIN knn r ON f.src = r.dst AND f.dst = r.src
WHERE f.src < f.dst
ORDER BY vec_a, vec_b
"""

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    return v

exp = con.sql(final_sql)
cols = sorted(exp.columns)
exp_rows = [tuple(norm(r[exp.columns.index(c)]) for c in cols) for r in exp.fetchall()]
got = con.sql("SELECT * FROM read_parquet('/tmp/v100x/q_mutual_knn/*.parquet')")
gcols = sorted(got.columns)
got_rows = [tuple(norm(r[got.columns.index(c)]) for c in gcols) for r in got.fetchall()]
if cols != gcols:
    print("FAIL cols", cols, gcols); sys.exit(1)
if exp_rows != got_rows:
    if sorted(exp_rows) == sorted(got_rows):
        print("NOTE: row sets identical, physical order differs")
    else:
        print(f"FAIL rows oracle={len(exp_rows)} spark={len(got_rows)}")
        for i, (a, b) in enumerate(zip(exp_rows, got_rows)):
            if a != b:
                print("first diff", i, a, b); break
        sys.exit(1)
print(f"ok q_mutual_knn ({len(got_rows)} rows) total {time.time()-t0:.0f}s")
