#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sfDir parquet tables and compare against the parquet dumps
produced by graft.Verify. Usage: check.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if len(sys.argv) > 3:  # optional: restrict to named queries
    keep = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}
fails = 0
for name, sql in sorted(oracle.items()):
    spath = f"{outdir}/{name}"
    try:
        spark_df = pd.read_parquet(spath)
    except Exception as e:
        print(f"FAIL {name}: no spark result ({e})"); fails += 1; continue
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    # driver-style compare: sort columns by name, sort rows, compare values
    sp = spark_df[sorted(spark_df.columns)]
    du = duck_df[sorted(duck_df.columns)]
    if list(sp.columns) != list(du.columns):
        print(f"FAIL {name}: schema {list(sp.columns)} vs {list(du.columns)}"); fails += 1; continue
    sp = sp.sort_values(by=list(sp.columns)).reset_index(drop=True)
    du = du.sort_values(by=list(du.columns)).reset_index(drop=True)
    if len(sp) != len(du):
        print(f"FAIL {name}: rows {len(sp)} vs {len(du)}"); fails += 1; continue
    try:
        du2 = du.astype(sp.dtypes.to_dict())
    except Exception:
        du2 = du
    eq = sp.equals(du2)
    if not eq:
        diff = (sp != du2).any(axis=1)
        print(f"FAIL {name}: {int(diff.sum())}/{len(sp)} rows differ; first:")
        print(pd.concat([sp[diff].head(3).add_suffix('_spark'),
                         du2[diff].head(3).add_suffix('_duck')], axis=1))
        fails += 1
    else:
        print(f"OK   {name}: {len(sp)} rows")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
