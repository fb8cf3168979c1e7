#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB against the
parquet tables in <sf_dir>, sorts columns by name and rows by value, and
compares cell-by-cell (exact equality, NaN==NaN). Reports per-query
row-count / schema / value match.
"""
import json
import math
import sys

import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
tables = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in tables:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    return (sorted(out, key=key), [cols[i] for i in order],
            [types[i] for i in order])

# The driver's hash is dtype-sensitive: DuckDB promotes SUM(BIGINT) to
# HUGEINT while Spark writes BIGINT, and those hash differently even when
# every value is identical. Mirror that here by comparing column types
# between the Spark parquet result and the DuckDB oracle result, modulo
# representational equivalences that the driver's hash does NOT distinguish
# (timestamp tz-ness, varchar spellings).
def canon_type(t):
    t = str(t).upper()
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "VARCHAR"
    return t

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

fails = 0
for name in sorted(oracle):
    try:
        res = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_types_raw = [str(t) for t in res.types]
        got_rows, got_cols, got_types = norm(res.fetchall(), res.columns,
                                             got_types_raw)
        ora = con.sql(oracle[name])
        ora_types_raw = [str(t) for t in ora.types]
        ora_rows, ora_cols, ora_types = norm(ora.fetchall(), ora.columns,
                                             ora_types_raw)
    except Exception as e:
        print(f"FAIL {name}: error {e}")
        fails += 1
        continue
    if got_cols != ora_cols:
        print(f"FAIL {name}: columns {got_cols} vs {ora_cols}")
        fails += 1
        continue
    type_drift = [
        f"{c}: spark={g} oracle={o}"
        for c, g, o in zip(got_cols, got_types, ora_types)
        if canon_type(g) != canon_type(o)
    ]
    if type_drift:
        print(f"FAIL {name}: dtype drift {type_drift}")
        fails += 1
        continue
    if len(got_rows) != len(ora_rows):
        print(f"FAIL {name}: rows {len(got_rows)} vs {len(ora_rows)}")
        fails += 1
        continue
    bad = 0
    for g, o in zip(got_rows, ora_rows):
        if not all(eq(x, y) for x, y in zip(g, o)):
            if bad < 3:
                print(f"  diff {name}: {g} vs {o}")
            bad += 1
    if bad:
        print(f"FAIL {name}: {bad}/{len(got_rows)} mismatched rows")
        fails += 1
    else:
        print(f"OK   {name}: {len(got_rows)} rows")

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
