#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate — strict variant.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Loads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables
as DuckDB views, runs each oracle SQL, and compares against the Spark
parquet dump written by graft.Verify.

Round-1 lesson: the driver's compare is representation-sensitive. A
pandas-based compare (fetchdf) coerces DECIMAL to float64 on both sides
and masks scale differences ("901.00" vs "901.0") that fail the driver's
hash. So this version compares NATIVE values: the Spark side is read with
pyarrow (decimals stay decimal.Decimal, ints stay ints), the oracle side
via duckdb fetchall (same), and every value is stringified with str().
If the two engines produce the same logical value in different lexical
forms, that is a FAIL here — queries must emit only types whose str()
is engine-invariant (double/bigint/varchar/date/timestamp; no DECIMAL).
"""
import datetime
import decimal
import duckdb, glob, json, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

import pyarrow.parquet as pq

con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")


def sval(v):
    return str(v)


def spark_rows(path):
    """Read the Spark result with pyarrow, preserving native types."""
    tbl = pq.read_table(path)
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = [tuple(sval(v) for v in row)
            for row in zip(*[c.to_pylist() for c in tbl.columns])]
    types = {c: str(tbl.schema.field(c).type) for c in cols}
    return cols, sorted(rows), types


def duck_rows(sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(sval(r[i]) for i in order) for r in cur.fetchall()]
    types = {cols[i]: str(cur.description[i][1]) for i in order}
    return sorted(cols), sorted(rows), types


oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    try:
        files = glob.glob(f"{out}/{name}/*.parquet")
        s_cols, s, s_types = spark_rows(files)
        d_cols, d, d_types = duck_rows(oracle[name])
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
            fails += 1
        elif s != d:
            diff_a = [r for r in s if r not in d][:3]
            diff_b = [r for r in d if r not in s][:3]
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            print(f"  spark-only: {diff_a}")
            print(f"  duck-only : {diff_b}")
            print(f"  types spark={s_types}")
            print(f"  types duck ={d_types}")
            fails += 1
        else:
            bad = [c for c, t in s_types.items() if "decimal" in t.lower()]
            note = f"  (WARN decimal output cols {bad})" if bad else ""
            print(f"PASS {name} ({len(s)} rows){note}")
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1
sys.exit(1 if fails else 0)
