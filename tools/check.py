#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Loads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables
as DuckDB views, runs each oracle SQL, and compares against the Spark
parquet dump written by graft.Verify: columns sorted by name, rows sorted,
values stringified. Prints PASS/FAIL per query.
"""
import duckdb, glob, json, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        duck_df = con.execute(oracle[name]).fetchdf()
        s_cols = {c: str(spark_df[c].dtype) for c in sorted(spark_df.columns)}
        d_cols = {c: str(duck_df[c].dtype) for c in sorted(duck_df.columns)}
        s, d = norm(spark_df), norm(duck_df)
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
            fails += 1
        elif s != d:
            diff_a = [r for r in s if r not in d][:3]
            diff_b = [r for r in d if r not in s][:3]
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            print(f"  spark-only: {diff_a}")
            print(f"  duck-only : {diff_b}")
            if s_cols != d_cols:
                print(f"  dtypes spark={s_cols}")
                print(f"  dtypes duck ={d_cols}")
            fails += 1
        else:
            note = "" if s_cols == d_cols else f"  (dtype note: {s_cols} vs {d_cols})"
            print(f"PASS {name} ({len(s)} rows){note}")
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1
sys.exit(1 if fails else 0)
