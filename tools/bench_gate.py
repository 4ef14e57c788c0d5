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

# Known seesaw cohorts (VERDICT r10 item 5): queries sharing a heavy
# physical leaf where a materialization trade moves time between the
# twins run-to-run while the pair total stays flat. A member over the
# threshold does NOT fail the gate if its cohort's summed time ratio is
# <= 1.5 (a tighter bar than the individual 2.0) -- the cohort sum is
# the honest signal for these. The cohort line is always printed.
COHORTS = {
    "weighted_ppjoin": ["q93_weighted_jaccard", "q139_weighted_maxdf"],
}
COHORT_SUM_BAR = 1.5


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
    exempt = set()
    for name, members in COHORTS.items():
        present = [q for q in members if q in ratios]
        if len(present) < 2:
            continue
        bsum = sum(base[q] for q in present)
        nsum = sum(bench[q] for q in present)
        csum = nsum / bsum if bsum > 0 else float("inf")
        print(f"cohort {name} ({'+'.join(present)}): "
              f"sum {bsum:.2f}s -> {nsum:.2f}s = {csum:.2f}x")
        if csum <= COHORT_SUM_BAR:
            exempt.update(q for q in present if q in over2)
    fail = sorted(set(over2) - exempt)
    if exempt:
        print(f"cohort-exempt (member >{threshold}x but cohort sum <= "
              f"{COHORT_SUM_BAR}x): {sorted(exempt)}")
    if fail:
        print(f"GATE FAIL: {fail}")
        sys.exit(1)
    print("GATE PASS")


if __name__ == "__main__":
    main()
