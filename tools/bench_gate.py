#!/usr/bin/env python3
"""Bench gate report: geomean + per-query deltas of a fresh bench run vs
the operative baseline, over their common queries.

Usage: python3 tools/bench_gate.py <bench.json> <baseline.json> [threshold]

Prints geomean ratio, counts over 1.5x/2x, and the worst offenders.
Exit 1 if any common query exceeds the threshold (default 2.0).
"""
import json
import math
import sys


def main() -> None:
    bench = json.load(open(sys.argv[1]))["queries"]
    base = json.load(open(sys.argv[2]))["queries"]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    common = sorted(set(bench) & set(base))
    only_new = sorted(set(bench) - set(base))
    ratios = {q: bench[q] / base[q] for q in common if base[q] > 0}
    if not ratios:
        print("GATE ERROR: the two runs share no (nonzero-baseline) queries "
              "— nothing to compare")
        sys.exit(2)
    geomean = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    over15 = {q: r for q, r in ratios.items() if r > 1.5}
    over2 = {q: r for q, r in ratios.items() if r > threshold}
    print(f"common queries: {len(common)}   new (ungated): {only_new}")
    print(f"geomean ratio: {geomean:.3f}")
    print(f">1.5x: {len(over15)}   >{threshold}x: {len(over2)}")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    for q, r in worst:
        print(f"  {q}: {r:.2f}x  ({base[q]:.3f}s -> {bench[q]:.3f}s)")
    if over2:
        print(f"GATE FAIL: {sorted(over2)}")
        sys.exit(1)
    print("GATE PASS")


if __name__ == "__main__":
    main()
