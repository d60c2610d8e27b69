#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <name>.parquet result dir in verifyOutDir, runs the matching SQL
from oracle_sql.json in DuckDB (with every <sfDir>/*.parquet registered as a
view named by basename), sorts columns by name, sorts rows, and compares
values cell-by-cell (floats to 1e-9 rel tol). Dev tooling only — not part of
the shipped library.
"""
import json, math, os, sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in os.listdir(sf_dir):
    if f.endswith(".parquet"):
        name = f[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{f}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# optional argv[3:]: compare only the named queries (pairs with Verify's
# query-name filter for fast local iteration)
only = set(sys.argv[3:])
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = os.path.join(out_dir, name)
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        want = con.sql(sql)
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if [c.lower() for c in gcols] != [c.lower() for c in wcols]:
        print(f"FAIL {name}: columns {gcols} vs {wcols}"); fails += 1; continue
    grows = sorted(got.select(", ".join(f'"{c}"' for c in gcols)).fetchall(),
                   key=lambda r: tuple(str(x) for x in r))
    wrows = sorted(want.select(", ".join(f'"{c}"' for c in wcols)).fetchall(),
                   key=lambda r: tuple(str(x) for x in r))
    if len(grows) != len(wrows):
        print(f"FAIL {name}: rows {len(grows)} vs {len(wrows)}"); fails += 1; continue
    bad = None
    for i, (g, w) in enumerate(zip(grows, wrows)):
        for j, (a, b) in enumerate(zip(g, w)):
            if isinstance(a, float) and isinstance(b, float):
                if not (math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
                        or (math.isnan(a) and math.isnan(b))):
                    bad = (i, gcols[j], a, b); break
            elif a != b:
                bad = (i, gcols[j], a, b); break
        if bad: break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(grows)} rows")
sys.exit(1 if fails else 0)
