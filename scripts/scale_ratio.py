#!/usr/bin/env python3
"""Compare per-query bench times between two bench_full-style JSON lines
(e.g. sf0.1 vs sf1) and flag super-linear growth.

With a 10x row-count scale-up, time ratios well above 10x indicate a
scaling cliff (after discounting sub-100ms baselines where constant
overhead dominates). Dev tooling only — not part of the shipped library.

Usage: python3 scripts/scale_ratio.py bench_full.json BENCH_sf1.json [scale]
"""
import json
import sys


def main(base_path: str, scaled_path: str, scale: float = 10.0) -> None:
    base = json.load(open(base_path))["queries"]
    big = json.load(open(scaled_path))["queries"]
    rows = []
    for name, t1 in sorted(big.items()):
        t0 = base.get(name)
        if t0 is None or t1 is None:
            rows.append((float("inf"), name, t0, t1, "FAILED/MISSING"))
            continue
        ratio = t1 / t0 if t0 > 0 else float("inf")
        # Sub-100ms baselines are dominated by per-query constant overhead
        # (plan compile, task launch) — ratios there are not scaling signal.
        flag = ""
        if t0 >= 0.1 and ratio > 1.5 * scale:
            flag = "SUPER-LINEAR"
        elif t0 >= 0.1 and ratio > scale:
            flag = "above-linear"
        rows.append((ratio, name, t0, t1, flag))
    rows.sort(reverse=True)
    print(f"{'query':38s} {'base':>7s} {'scaled':>8s} {'ratio':>7s}  flag")
    for ratio, name, t0, t1, flag in rows:
        t0s = f"{t0:.2f}" if t0 is not None else "-"
        t1s = f"{t1:.2f}" if t1 is not None else "-"
        rs = f"{ratio:.1f}x" if ratio != float("inf") else "inf"
        print(f"{name:38s} {t0s:>7s} {t1s:>8s} {rs:>7s}  {flag}")
    # Totals over the INTERSECTION of queries timed on both sides —
    # summing each side's own successes would compare mismatched query
    # sets whenever either run has failures.
    both = [n for n in big if big[n] is not None and base.get(n) is not None]
    skipped = [n for n in set(base) | set(big) if n not in both]
    tot0 = sum(base[n] for n in both)
    tot1 = sum(big[n] for n in both)
    if skipped:
        print(f"\n(totals cover {len(both)} queries timed in BOTH runs; "
              f"excluded: {', '.join(sorted(skipped))})")
    if tot0 > 0:
        print(f"\ntotal: base {tot0:.1f}s -> scaled {tot1:.1f}s "
              f"({tot1 / tot0:.1f}x at {scale:.0f}x data)")
    else:
        print("\ntotal: no query timed in both runs — no ratio")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
