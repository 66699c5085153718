#!/usr/bin/env python3
"""Fold per-SF check.py outputs into the CORRECTNESS_MULTI_SF artifact.

Usage: python3 tools/multi_sf_summary.py out.json note "sf0.001=check1.txt" ...

Each check file is the stdout of tools/check.py: PASS (N): [...] /
ROWS-ONLY (N): [...] / FAIL lines / final ALL MATCH or FAILURES verdict.
"""
import ast
import json
import re
import sys

out, note = sys.argv[1], sys.argv[2]
doc = {"note": note}
for spec in sys.argv[3:]:
    sf, path = spec.split("=", 1)
    txt = open(path).read()
    sec = {}
    m = re.search(r"PASS \((\d+)\)", txt)
    sec["pass"] = int(m.group(1)) if m else 0
    m = re.search(r"ROWS-ONLY \(\d+\): (\[.*?\])\n", txt, re.S)
    sec["rows_only"] = ast.literal_eval(m.group(1)) if m else []
    # oracles that never ran to completion (brute-force definitions
    # exceeding the cap at large SF) — these queries were NOT compared,
    # and the artifact must say so rather than fold them into ALL MATCH
    m = re.search(r"ORACLE-TIMEOUT \(\d+, cap ([\d.]+)s\): (\[.*?\])\n", txt, re.S)
    if m:
        sec["oracle_timeout_cap_sec"] = float(m.group(1))
        sec["oracle_timeouts"] = [
            {"query": q, "spark_rows": n} for q, n in ast.literal_eval(m.group(2))]
    else:
        sec["oracle_timeouts"] = []
    fails = re.findall(r"^FAIL.*$", txt, re.M)
    sec["fails"] = fails
    sec["verdict"] = "ALL MATCH" if "ALL MATCH" in txt else "FAILURES"
    doc[sf] = sec
json.dump(doc, open(out, "w"), indent=1)
bad = [k for k, v in doc.items() if isinstance(v, dict) and v["verdict"] != "ALL MATCH"]
print("wrote", out, "| sections:", [k for k in doc if k != "note"],
      "| failures:", bad or "none")
