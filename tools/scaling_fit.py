#!/usr/bin/env python3
"""Scale-slope audit (VERDICT r12 item 2): fit per-query scaling
exponents from bench runs at several scale factors and flag anything
superlinear.

Usage: python3 tools/scaling_fit.py out.json sf1=bench1.json sf2=bench2.json ...

Each sfN is the RELATIVE data size (e.g. 1, 2, 5, 10). Per query the
log-log slope of the min-of-reps time against relative size is fitted
by least squares. Fixed per-query overhead (JVM, planning, small-file
constants) DEFLATES the fitted slope, so a query that still fits
superlinear is genuinely superlinear in its data-dependent work — the
flag threshold errs toward false negatives on cheap queries, which is
why only queries above MIN_SEC at the largest SF are flagged.
"""
import sys, json, math

MIN_SEC = 0.5     # ignore queries whose largest-SF floor is noise-level
FLAG_SLOPE = 1.3  # superlinear threshold (VERDICT r12's criterion)

out_path = sys.argv[1]
runs = []  # (relsize, {query: min_sec})
for arg in sys.argv[2:]:
    sf, path = arg.split("=", 1)
    b = json.load(open(path))
    t = dict(b.get("queries_min") or b["queries"])
    for k in ("queries_gate", "queries_stream"):
        t.update(b.get(k, {}))
    runs.append((float(sf), t))
runs.sort()

common = set(runs[0][1])
for _, t in runs[1:]:
    common &= set(t)

def slope(xs, ys):
    lx = [math.log(x) for x in xs]
    ly = [math.log(y) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    den = sum((x - mx) ** 2 for x in lx)
    return sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / den if den else 0.0

queries, flagged = {}, []
for q in sorted(common):
    pts = [(s, t[q]) for s, t in runs if isinstance(t.get(q), (int, float)) and t[q] > 0]
    if len(pts) < 3:
        continue
    e = slope([p[0] for p in pts], [p[1] for p in pts])
    big = pts[-1][1]
    small = pts[0][1]
    queries[q] = {"slope": round(e, 3),
                  "t_small": round(small, 3), "t_large": round(big, 3),
                  "ratio_largest_over_smallest": round(big / small, 2)}
    if e > FLAG_SLOPE and big > MIN_SEC:
        flagged.append(q)

out = {"relsizes": [r[0] for r in runs],
       "n_queries": len(queries),
       "flag_criteria": {"slope_gt": FLAG_SLOPE, "t_large_gt_sec": MIN_SEC},
       "flagged_superlinear": sorted(flagged,
                                     key=lambda q: -queries[q]["slope"]),
       "top_slopes": sorted(queries.items(),
                            key=lambda kv: -kv[1]["slope"])[:20],
       "queries": queries}
json.dump(out, open(out_path, "w"), indent=1)
print(f"fitted {len(queries)} queries over {len(runs)} SFs; "
      f"flagged {len(flagged)}: {sorted(flagged)}")
