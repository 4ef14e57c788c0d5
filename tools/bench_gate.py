#!/usr/bin/env python3
"""Bench gate report: geomean + per-query deltas of a fresh bench run vs
the operative baseline, over their common queries.

Usage: python3 tools/bench_gate.py <bench.json> <baseline.json>
           [threshold] [--normalize <hostcheck.json>]

Prints geomean ratio, counts over 1.5x/2x, and the worst offenders.
Exit 1 if any common query exceeds the threshold (default 2.0).

--normalize (round 12, VERDICT r11 item 4): divide every ratio by the
host multiplier measured by tools/hostcheck_ab.sh — the old-code leg of
its interleaved A/B re-runs the EXACT commit whose recording is the
baseline, so old_code_today / recorded is pure host drift (zero code
delta). Both raw and normalized columns are printed; the gate fails on
the NORMALIZED ratio (r11's measured 1.30x drift cost a day of
forensics that this column replaces). Normalization uses the hostcheck
SUITE-LEVEL SUBSET GEOMEAN only, applied uniformly to every query — a
per-query multiplier would conflate host drift with query-level
run-to-run noise (tried and reverted in round 12: q93's seesaw
recording read as a 0.52x "host multiplier").
The rule is documented in BASELINE.md.
"""
import json
import math
import sys

# Known seesaw cohorts (VERDICT r10 item 5): queries sharing a heavy
# physical leaf where a materialization trade moves time between the
# twins run-to-run while the pair total stays flat. A member over the
# threshold does NOT fail the gate if its cohort's summed time ratio is
# within the cohort bar -- the cohort sum is the honest signal for
# these. The cohort line is always printed. The effective cohort bar is
# min(COHORT_SUM_BAR, threshold): the exemption must stay TIGHTER than
# the individual bar even under a custom low threshold (ADVICE r11).
COHORTS = {
    "weighted_ppjoin": ["q93_weighted_jaccard", "q139_weighted_maxdf"],
}
COHORT_SUM_BAR = 1.5

# Documented-bimodal single-query exemptions (VERDICT r12 item 4):
# query -> absolute ceiling in seconds. q24_range_chunks (a 5-row,
# ~100 ms result, RangePlan.scala:24) alternates between ~0.13 s and
# ~0.25 s across rounds r9-r12 with ZERO code delta — scheduler jitter
# on a query too short to amortize it. Its ratio against whichever mode
# the baseline happened to record flaps the gate (three rounds of manual
# adjudication). A flagged member is exempt ONLY while its measured
# absolute time stays under the ceiling (2x the slow mode) — a real
# regression blows past the ceiling and still fails. The exemption line
# is always printed so the artifact shows what was waived.
BIMODAL_ABS = {
    "q24_range_chunks": 0.50,
}


def geomean(xs):
    return math.exp(sum(math.log(x) for x in xs) / len(xs))


def main() -> None:
    args = list(sys.argv[1:])
    hostcheck = None
    if "--normalize" in args:
        i = args.index("--normalize")
        hostcheck = json.load(open(args[i + 1]))
        del args[i:i + 2]
    bench = json.load(open(args[0]))["queries"]
    base = json.load(open(args[1]))["queries"]
    threshold = float(args[2]) if len(args) > 2 else 2.0
    common = sorted(set(bench) & set(base))
    only_new = sorted(set(bench) - set(base))
    raw = {q: bench[q] / base[q] for q in common if base[q] > 0}
    if not raw:
        print("GATE ERROR: the two runs share no (nonzero-baseline) queries "
              "— nothing to compare")
        sys.exit(2)

    # host normalization: the SUITE-level multiplier only. A per-query
    # old_vs_recorded conflates host drift with query-level run-to-run
    # noise (q93's seesaw recording read as a 0.52x "host multiplier" and
    # corrupted the cohort line when tried) — host drift is a host-wide
    # property, so the subset geomean is the honest estimator; the
    # per-query rows stay in the hostcheck artifact for diagnosis.
    if hostcheck is not None:
        suite_mult = hostcheck.get("geomean_old_vs_recorded")
        if not suite_mult:
            # Fail loudly (ADVICE r12): silently defaulting to 1.0 would
            # print rows labeled "normalized" that are actually raw —
            # defeating the forensics the flag exists for (e.g. an
            # r11-format hostcheck file keys this geomean differently).
            print("GATE ERROR: hostcheck file lacks a usable "
                  "geomean_old_vs_recorded — refusing to print raw ratios "
                  "under a 'normalized' label")
            sys.exit(2)
        print(f"host multiplier (suite geomean): {suite_mult:.3f}")
        ratios = {q: raw[q] / suite_mult for q in raw}
        mult = {q: suite_mult for q in raw}
    else:
        ratios = raw

    over15 = {q: r for q, r in ratios.items() if r > 1.5}
    over2 = {q: r for q, r in ratios.items() if r > threshold}
    label = "normalized" if hostcheck is not None else "raw"
    print(f"common queries: {len(common)}   new (ungated): {only_new}")
    print(f"geomean ratio (raw): {geomean(list(raw.values())):.3f}")
    if hostcheck is not None:
        print(f"geomean ratio (normalized): {geomean(list(ratios.values())):.3f}")
    print(f">1.5x ({label}): {len(over15)}   >{threshold}x ({label}): {len(over2)}")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    for q, r in worst:
        extra = f"  raw {raw[q]:.2f}x" if hostcheck is not None else ""
        print(f"  {q}: {r:.2f}x  ({base[q]:.3f}s -> {bench[q]:.3f}s){extra}")
    exempt = set()
    cohort_bar = min(COHORT_SUM_BAR, threshold)
    for name, members in COHORTS.items():
        present = [q for q in members if q in ratios]
        if len(present) < 2:
            continue
        bsum = sum(base[q] for q in present)
        nsum = sum(bench[q] for q in present)
        csum = nsum / bsum if bsum > 0 else float("inf")
        if hostcheck is not None:
            csum /= geomean([mult[q] for q in present])
        print(f"cohort {name} ({'+'.join(present)}): "
              f"sum {bsum:.2f}s -> {nsum:.2f}s = {csum:.2f}x ({label})")
        if csum <= cohort_bar:
            exempt.update(q for q in present if q in over2)
    if exempt:
        print(f"cohort-exempt (member >{threshold}x but cohort sum <= "
              f"{cohort_bar}x): {sorted(exempt)}")
    for q, ceiling in BIMODAL_ABS.items():
        if q in over2 and bench[q] <= ceiling:
            print(f"bimodal-exempt: {q} {ratios[q]:.2f}x but abs "
                  f"{bench[q]:.3f}s <= documented ceiling {ceiling}s")
            exempt.add(q)
    fail = sorted(set(over2) - exempt)
    if fail:
        print(f"GATE FAIL ({label}): {fail}")
        sys.exit(1)
    print(f"GATE PASS ({label})")


if __name__ == "__main__":
    main()
