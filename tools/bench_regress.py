#!/usr/bin/env python3
"""Attribute bench movement between two rounds.

Usage:
  python3 tools/bench_regress.py \
      BENCH_FULL_r11.json BENCH_FULL_r12.json [PLANS_r11.json PLANS_r12.json]

Joins per-query min-of-reps floors (the load-resistant signal) across two
BENCH_FULL files and, when the PLANS fingerprints are given, splits movers
into:
  PLAN-CHANGED  — floor moved AND the physical-plan fingerprint differs:
                  a named, attributable cause; investigate the diff.
  ENV-ONLY      — floor moved with an IDENTICAL plan: environment (load,
                  GC, page cache); do not chase it without a quiet rerun.
This is the r11 lesson as a tool: a regression without a plan diff is
noise until a quiet machine says otherwise.
"""
import json
import sys

THRESHOLD = 1.2  # flag floors that moved by >20% either way


def main() -> int:
    if len(sys.argv) not in (3, 5):
        print(__doc__)
        return 2
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    plans_a = json.load(open(sys.argv[3])) if len(sys.argv) == 5 else None
    plans_b = json.load(open(sys.argv[4])) if len(sys.argv) == 5 else None

    fa, fb = a.get("queries_min", {}), b.get("queries_min", {})
    common = sorted(k for k in fa if k in fb and fa[k] and fb[k])

    # Machine-calibration normalization (r14 lesson: cross-round ratios
    # shifted 1.24-1.44x uniformly with unchanged plans — pure host
    # drift). When BOTH artifacts carry the bench's fixed-probe
    # "calibration" block, divide B's floors by the machine factor
    # (geometric mean of the cpu and scan probe ratios, each taken as
    # min(start, end) — the probe's own load-independent floor) before
    # flagging movers, so only code-attributable movement survives.
    machine = 1.0
    ca, cb = a.get("calibration"), b.get("calibration")
    if ca and cb:
        def floor(c, probe):
            vals = [c.get(f"{probe}_start"), c.get(f"{probe}_end")]
            vals = [v for v in vals if v]
            return min(vals) if vals else None
        ratios = []
        for probe in ("cpu", "scan"):
            va, vb = floor(ca, probe), floor(cb, probe)
            if va and vb:
                ratios.append(vb / va)
        if ratios:
            prod = 1.0
            for r in ratios:
                prod *= r
            machine = prod ** (1.0 / len(ratios))
            print(f"machine factor (B/A from calibration probes): "
                  f"{machine:.3f} — B floors normalized by it")
    else:
        print("no calibration block in one/both artifacts; "
              "comparing raw floors (pre-r15 artifact?)")

    fbn = {k: v / machine for k, v in fb.items() if v}
    med_common = sorted(fbn[k] / fa[k] for k in common)
    if med_common:
        med = med_common[len(med_common) // 2]
        print(f"normalized min-to-min median ratio over {len(common)} "
              f"common queries: {med:.3f}")
    movers = [(k, fa[k], fbn[k], fbn[k] / fa[k]) for k in common
              if fbn[k] / fa[k] > THRESHOLD or fa[k] / fbn[k] > THRESHOLD]
    movers.sort(key=lambda t: -t[3])

    if not movers:
        print(f"no query floor moved >{(THRESHOLD - 1) * 100:.0f}% "
              f"across {len(common)} common queries")
        return 0

    def plan_changed(q):
        if plans_a is None or q not in plans_a or q not in plans_b:
            return None
        return plans_a[q] != plans_b[q]

    for label, want in (("PLAN-CHANGED", True), ("ENV-ONLY", False),
                        ("NO-FINGERPRINT", None)):
        rows = [m for m in movers if plan_changed(m[0]) is want]
        if not rows:
            continue
        print(f"{label} ({len(rows)}):")
        for q, x, y, r in rows:
            print(f"  {q:30s} {x:6.2f}s -> {y:6.2f}s  ({r:.2f}x)")
        if want is True and plans_a is not None:
            print("  (run tools/plandiff.py on the PLANS files for the "
                  "operator-level delta)")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # output piped into head — not an error
        sys.exit(0)
