#!/usr/bin/env python3
"""Per-query bench comparison that refuses to quote phantom wins.

Usage: python3 scripts/bench_delta.py <old BENCH_DETAIL.json> <new BENCH_DETAIL.json> [min_delta_sec]

The round-4/5 lesson (q89): a query that FAILED in a round records its
fast-fail elapsed time, which then reads as a massive "win" against any
round where it ran for real. This script is the only sanctioned way to
quote per-query deltas in round reports: a query present in either
round's `failed` list is printed as UNQUOTABLE, never as a delta.
"""
import json
import sys


def main(old_path, new_path, min_delta=0.25):
    old, new = json.load(open(old_path)), json.load(open(new_path))
    f_old, f_new = set(old.get("failed", [])), set(new.get("failed", []))
    # retried = the targeted third pass fired (slow or wildly-disagreeing
    # passes) — a mover that retried in either round is flagged so a
    # systematic slow-start isn't mistaken for a code regression
    r_old, r_new = set(old.get("retried_queries", [])), set(new.get("retried_queries", []))
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    quotable = []
    for q in common:
        if q in f_old or q in f_new:
            where = "+".join(w for w, s in (("old", f_old), ("new", f_new)) if q in s)
            print(f"!! {q}: UNQUOTABLE (failed in {where}; elapsed is a fast-fail, not a time)")
        elif abs(qo[q] - qn[q]) >= min_delta:
            quotable.append((qo[q] - qn[q], q))
    for d, q in sorted(quotable, reverse=True):
        where = "+".join(w for w, s in (("old", r_old), ("new", r_new)) if q in s)
        note = f"  [retried in {where}]" if where else ""
        print(f"   {q}: {qo[q]:.2f} -> {qn[q]:.2f} ({'-' if d > 0 else '+'}{abs(d):.2f}s){note}")
    only_old, only_new = sorted(set(qo) - set(qn)), sorted(set(qn) - set(qo))
    if only_old or only_new:
        print(f"   (not comparable: {len(only_old)} only-old, {len(only_new)} only-new)")
    t_old = sum(v for k, v in qo.items() if k in common and k not in f_old | f_new)
    t_new = sum(v for k, v in qn.items() if k in common and k not in f_old | f_new)
    print(f"   comparable-gate totals (both-round, never-failed): "
          f"{t_old:.1f}s -> {t_new:.1f}s ({t_new / t_old:.2f}x)" if t_old else "")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 0.25)
