#!/usr/bin/env python3
"""Measure a REAL per-query baseline: time every SparkEntry.oracleSql in
DuckDB against the same parquet tables (same machine, same SF as the
Spark bench), so the "within 2x of baseline" criterion is falsifiable
instead of a placeholder.

Usage: python3 tools/baseline_times.py <sfDir> <oracle_sql.json> <out.json>
       [spark_bench.json]

Per query: min-of-3 wall seconds (1 rep if the first run exceeds 10 s —
several oracles are intentionally brute-force all-pairs formulations
that pin the bucketed Spark path, and quadratic at sf0.1). Each query
runs in a subprocess with a hard TIMEOUT_SEC cap: a brute-force oracle
that cannot finish inside the cap is recorded as {"timeout": cap} —
the baseline is ">cap", which already settles the within-2x question
in Spark's favor for that query. If a Spark bench JSON is given,
per-query spark/duckdb ratios are included.

Caveat recorded in the output: the oracle is a CORRECTNESS pin, not a
tuned DuckDB port — for the dedup/similarity family the oracle is the
O(n^2) definition while the Spark side is the bucketed production
algorithm, so those ratios compare different algorithms by design.
"""
import sys, json, time, queue
import multiprocessing as mp
import duckdb

TIMEOUT_SEC = 120

sfdir, oracle_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
bench_path = sys.argv[4] if len(sys.argv) > 4 else None


def run_one(sfdir, sql, q):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    try:
        times = []
        t0 = time.monotonic()
        n = len(con.sql(sql).fetchall())
        times.append(time.monotonic() - t0)
        reps = 1 if times[0] > 10.0 else 3
        for _ in range(reps - 1):
            t0 = time.monotonic()
            con.sql(sql).fetchall()
            times.append(time.monotonic() - t0)
        q.put({"duckdb_sec": round(min(times), 6), "rows": n,
               "reps": len(times)})
    except Exception as e:
        q.put({"error": str(e)[:300]})


oracle = json.load(open(oracle_path))
results, errors = {}, {}
for i, (name, sql) in enumerate(sorted(oracle.items())):
    q = mp.Queue()
    p = mp.Process(target=run_one, args=(sfdir, sql, q))
    p.start()
    p.join(TIMEOUT_SEC)
    if p.is_alive():
        p.terminate()
        p.join()
        results[name] = {"timeout": TIMEOUT_SEC}
    else:
        # q.empty() can transiently be True while the child's feeder
        # thread is still flushing — a timed get never misrecords a
        # successful query as 'worker died'
        try:
            r = q.get(timeout=5)
        except queue.Empty:
            r = {"error": "worker died"}
        if "error" in r:
            errors[name] = r["error"]
        else:
            results[name] = r
    print(f"[{i+1}/{len(oracle)}] {name}: "
          f"{results.get(name, {}).get('duckdb_sec', errors.get(name, 'TIMEOUT'))}",
          flush=True)

out = {"sf": sfdir, "engine": f"duckdb {duckdb.__version__}",
       "note": ("oracle SQL is the correctness pin, not a tuned DuckDB "
                "port; dedup/similarity oracles are brute-force all-pairs "
                "definitions by design"),
       "queries": results, "errors": errors}

if bench_path:
    bench = json.load(open(bench_path))
    spark = {}
    for k in ("queries", "queries_gate", "queries_stream"):
        spark.update(bench.get(k, {}))
    ratios, timeouts = {}, {}
    for name, r in results.items():
        if name not in spark:
            continue
        if "timeout" in r:
            # oracle couldn't finish inside the cap: the ratio bound
            # spark/cap is an OVERestimate of spark/duckdb's true value
            timeouts[name] = {"spark_sec": round(spark[name], 3),
                              "duckdb_sec_gt": r["timeout"]}
        elif r["duckdb_sec"] > 0:
            ratios[name] = round(spark[name] / r["duckdb_sec"], 3)
    common = sorted(ratios)
    out["spark_bench"] = bench_path
    out["ratio_spark_over_duckdb"] = ratios
    out["oracle_timeouts"] = timeouts
    if common:
        vals = sorted(ratios[c] for c in common)
        out["summary"] = {
            "n_common": len(common),
            "n_oracle_timeouts": len(timeouts),
            "spark_total_sec": round(sum(spark[c] for c in common), 3),
            "duckdb_total_sec": round(sum(results[c]["duckdb_sec"]
                                          for c in common), 3),
            "ratio_median": vals[len(vals) // 2],
            "ratio_p25": vals[len(vals) // 4],
            "ratio_p75": vals[(3 * len(vals)) // 4],
            "worst_10": sorted(ratios.items(), key=lambda kv: -kv[1])[:10],
            "best_10": sorted(ratios.items(), key=lambda kv: kv[1])[:10],
        }

json.dump(out, open(out_path, "w"), indent=1)
print(f"wrote {out_path}: {len(results)} timed, {len(errors)} errors")
