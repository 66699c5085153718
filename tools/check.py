#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results (column-name-sorted, row-sorted,
exact values). Usage: python3 tools/check.py <sfDir> <outDir> [oracleTimeoutSec]

The optional per-oracle timeout exists for large SFs: a handful of
oracles are INTENTIONALLY brute-force all-pairs formulations (they pin
the bucketed Spark path exactly), and DuckDB's cost for them is
quadratic — at sf0.1 one can run for hours. A timed-out oracle is
recorded under ORACLE-TIMEOUT (with the Spark row count), which is an
oracle COST limit, not a Spark failure: the same oracle passes exactly
at the smaller SFs. No timeout given = original unbounded behavior.
Each oracle runs in its own worker process so a timeout can be enforced
(DuckDB holds the GIL mid-query; a thread can't be interrupted)."""
import sys, json, glob, os
import multiprocessing as mp
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle_timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None

VIEWS = ["region","nation","customer","supplier","part","orders",
         "lineitem","events","documents","embeddings"]


def _eval_oracle(sfdir, sql, out_path):
    con = duckdb.connect()
    for t in VIEWS:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    con.sql(sql).df().to_parquet(out_path)


def run_oracle(con, name, sql):
    """Returns (df, err, timed_out)."""
    if oracle_timeout is None:
        try:
            return con.sql(sql).df(), None, False
        except Exception as e:
            return None, str(e), False
    out_path = f"/tmp/graft_oracle_{os.getpid()}_{name}.parquet"
    p = mp.Process(target=_eval_oracle, args=(sfdir, sql, out_path))
    p.start()
    p.join(oracle_timeout)
    if p.is_alive():
        p.terminate(); p.join(10)
        if p.is_alive(): p.kill(); p.join()
        return None, None, True
    if p.exitcode != 0:
        return None, f"oracle worker exited {p.exitcode}", False
    try:
        df = pd.read_parquet(out_path)
        os.remove(out_path)
        return df, None, False
    except Exception as e:
        return None, f"read oracle result: {e}", False


con = duckdb.connect()
for t in VIEWS:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, rows_only, timeouts = [], [], [], []
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    try:
        got = pd.read_parquet(d)
    except Exception as e:
        fails.append((name, f"read spark result: {e}")); continue
    if name not in oracle:
        rows_only.append((name, len(got))); continue
    exp, err, timed_out = run_oracle(con, name, oracle[name])
    if timed_out:
        timeouts.append((name, len(got))); continue
    if err is not None:
        fails.append((name, f"oracle sql error: {err}")); continue
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
if timeouts:
    print(f"ORACLE-TIMEOUT ({len(timeouts)}, cap {oracle_timeout}s): {timeouts}")
if fails:
    print(f"FAIL ({len(fails)}):")
    for n, m in fails:
        print(f"  {n}: {m[:500]}")
    sys.exit(1)
print("ALL MATCH")
