#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<query>/ parquet dirs + <outDir>/oracle_sql.json. Runs each oracle
SQL in DuckDB over views named after the parquet tables and compares
row-by-row (column order normalized by name, rows compared in result order).
"""
import json, os, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def table_glob(path):
    """Blow-up dirs hold Spark-written DIRECTORY tables (<t>.parquet/
    part-*.parquet); the driver testdata holds single files. Glob the dir
    form so the 10x/100x oracle sweeps read the same views."""
    return f"{path}/*.parquet" if os.path.isdir(path) else path

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_glob(f'{sf_dir}/{t}.parquet')}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_types = {c: str(t) for c, t in zip(exp.columns, exp.types)}
            exp_rows = [tuple(norm(r[exp.columns.index(c)]) for c in exp_cols)
                        for r in exp.fetchall()]
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_types = {c: str(t) for c, t in zip(got.columns, got.types)}
            got_rows = [tuple(norm(r[got.columns.index(c)]) for c in got_cols)
                        for r in got.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_bad += 1
            continue
        # The driver's hash compare is type-sensitive: a DuckDB HUGEINT vs a
        # Spark BIGINT hashes differently even when values agree (round-1
        # q_text_stats). Compare oracle result types against the types DuckDB
        # assigns to Spark's parquet output — they must be identical.
        type_bad = [c for c in exp_cols
                    if c in got_types and exp_types[c] != got_types[c]]
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns oracle={exp_cols} spark={got_cols}")
            n_bad += 1
        elif type_bad:
            n_bad += 1
            print(f"FAIL {name}: type drift " + ", ".join(
                f"{c}: oracle={exp_types[c]} spark={got_types[c]}" for c in type_bad))
        elif exp_rows != got_rows:
            n_bad += 1
            print(f"FAIL {name}: rows oracle={len(exp_rows)} spark={len(got_rows)}")
            for i, (a, b) in enumerate(zip(exp_rows, got_rows)):
                if a != b:
                    print(f"  first diff at row {i}:\n    oracle: {a}\n    spark : {b}")
                    break
        else:
            n_ok += 1
            print(f"ok   {name} ({len(got_rows)} rows)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
