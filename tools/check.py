#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results (column-name-sorted, row-sorted,
exact values). Usage: python3 tools/check.py <sfDir> <outDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, rows_only = [], [], []
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    try:
        got = pd.read_parquet(d)
    except Exception as e:
        fails.append((name, f"read spark result: {e}")); continue
    if name not in oracle:
        rows_only.append((name, len(got))); continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: {list(got.columns)} vs {list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rowcount {len(got)} vs {len(exp)}")); continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True)
    # Normalize widths only (int32->int64, float32->float64, datetime->us).
    # The driver's hash compare is value-KIND sensitive: DuckDB HUGEINT
    # arriving as float64 vs Spark BIGINT must FAIL here too, so after
    # normalization the dtype kinds must match exactly.
    def norm(df):
        for c in df.columns:
            k = df[c].dtype.kind
            if k == "M":
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            elif k in "iu":
                df[c] = df[c].astype("int64")
            elif k == "f":
                df[c] = df[c].astype("float64")
        return df
    gs, es = norm(gs), norm(es)
    kinds_g = [gs[c].dtype.kind for c in gs.columns]
    kinds_e = [es[c].dtype.kind for c in es.columns]
    if kinds_g != kinds_e:
        fails.append((name, f"dtype kinds differ (driver hash would mismatch): "
                      f"spark={list(zip(gs.columns, kinds_g))} oracle={list(zip(es.columns, kinds_e))}"))
        continue
    try:
        pd.testing.assert_frame_equal(gs, es, check_dtype=False, check_exact=True)
        passes.append(name)
    except AssertionError as e:
        fails.append((name, str(e).split("\n")[0] + " | " + "\n".join(str(e).split("\n")[1:6])))

print(f"PASS ({len(passes)}): {passes}")
print(f"ROWS-ONLY ({len(rows_only)}): {rows_only}")
if fails:
    print(f"FAIL ({len(fails)}):")
    for n, m in fails:
        print(f"  {n}: {m[:500]}")
    sys.exit(1)
print("ALL MATCH")
