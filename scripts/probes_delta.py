#!/usr/bin/env python3
"""Per-gate scale-probe comparison that refuses not-comparable rows.

Usage: python3 scripts/probes_delta.py <old PROBES.json> <new PROBES.json> [min_ratio_delta]

The probe artifact (PROBES_rNN.json, written by graft.ScaleProbe as
PROBES.json) records gate -> {t1x, tNx, ratioNx} plus the run's base
corpus and copy factors. Two artifacts are only comparable per-gate when
BOTH runs probed the same base and the same factor set; everything else
is refused loudly (the bench_delta.py convention) instead of quoted as
probe movement. Ratio deltas below `min_ratio_delta` (default 0.5) are
noise — the probe shares the bench host's +/-7% steal band, amplified by
the division.
"""
import json
import sys


def main(old_path, new_path, min_delta=0.5):
    old, new = json.load(open(old_path)), json.load(open(new_path))
    refusals = []
    if old.get("base") != new.get("base"):
        refusals.append(f"base corpus differs: {old.get('base')} vs {new.get('base')}")
    if old.get("factors") != new.get("factors"):
        refusals.append(f"factor sets differ: {old.get('factors')} vs {new.get('factors')}")
    if refusals:
        for r in refusals:
            print(f"!! NOT COMPARABLE: {r}")
        sys.exit(1)
    factors = new.get("factors", [])
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    movers = []
    for q in common:
        for f in factors:
            key = f"ratio{f}x"
            if key not in qo[q] or key not in qn[q]:
                print(f"!! {q}: UNQUOTABLE ({key} missing in one round)")
                continue
            d = qn[q][key] - qo[q][key]
            if abs(d) >= min_delta:
                movers.append((abs(d), q, f, qo[q][key], qn[q][key],
                               qo[q].get("t1x"), qn[q].get("t1x")))
    for _, q, f, r_old, r_new, t1_old, t1_new in sorted(movers, reverse=True):
        # a ratio can move because the NUMERATOR moved or because the 1x
        # base did — print both so a sub-second base artifact is visible
        # (the r8 s16 lesson: 0.30s bases manufacture phantom ratio moves)
        note = " [sub-second 1x base: ratio is noise-amplified]" \
            if min(t1_old or 9e9, t1_new or 9e9) < 0.5 else ""
        fmt = lambda t: f"{t:.2f}s" if t is not None else "?"
        print(f"   {q} @{f}x: {r_old:.2f} -> {r_new:.2f} "
              f"(1x base {fmt(t1_old)} -> {fmt(t1_new)}){note}")
    only_old, only_new = sorted(set(qo) - set(qn)), sorted(set(qn) - set(qo))
    if only_old or only_new:
        print(f"   (not comparable: {len(only_old)} only-old, {len(only_new)} only-new)")
    if not movers:
        print(f"   no ratio moved >= {min_delta} across {len(common)} comparable gates")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 0.5)
