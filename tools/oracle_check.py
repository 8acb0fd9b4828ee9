#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each
oracle_sql.json query in DuckDB against the sf parquet tables and
compare to the Verify parquet dumps (columns aligned by sorted name,
rows sorted, exact values)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    try:
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    except Exception as e:
        bad.append((name, f"no output parquet: {e}"))
        continue
    if name not in oracle:
        ok.append((name, f"rows-only ({len(got)} rows)"))
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"oracle SQL failed: {e}"))
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        bad.append((name, f"schema mismatch: got {gcols} vs oracle {ecols}"))
        continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        bad.append((name, f"row count: got {len(g)} vs oracle {len(e)}"))
        continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        ok.append((name, f"MATCH ({len(g)} rows)"))
    except AssertionError as ex:
        msg = str(ex).split("\n")[0:3]
        bad.append((name, "value mismatch: " + " | ".join(msg)))

for n, m in ok:
    print(f"OK   {n}: {m}")
for n, m in bad:
    print(f"FAIL {n}: {m}")
print(f"\n{len(ok)} ok, {len(bad)} fail")
sys.exit(1 if bad else 0)
