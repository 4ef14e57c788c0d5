#!/bin/bash
# Host-drift A/B (round 11, hardened + parametrized in round 12): bench an
# identical query subset on HEAD and on the EXACT commit whose recorded
# numbers form the operative baseline, interleaved old->new->old->new on
# the same host within the same hour. If the old code now runs at ratio R
# vs its own recording with zero code delta, R is the host multiplier —
# feed the output to `bench_gate.py --normalize` so the gate grades code,
# not the VM (r11 measured a 1.30x drift this way).
#
# Usage: tools/hostcheck_ab.sh <old_commit> <recorded_baseline.json> \
#            <out.json> [touched_csv] [subset_csv]
#   touched_csv: queries this round's diff deliberately changed — reported
#     in a separate geomean so the "code is flat" claim is computed only
#     over untouched queries (ADVICE r11).
#
# Robustness (ADVICE r11): the worktree is created here (not assumed),
# every cd is guarded, a failed or empty leg aborts instead of feeding
# the aggregation garbage, and the aggregation intersects query keys.
set -uo pipefail

OLD_COMMIT=${1:?usage: hostcheck_ab.sh <old_commit> <recorded.json> <out.json> [touched_csv] [subset_csv]}
RECORDED=${2:?recorded baseline json}
OUT=${3:?output json path}
TOUCHED=${4:-}
SUBSET=${5:-q03_global_stats,q27_dedup_exact,q71_kmeans_iter,q82_jaccard_join,q93_weighted_jaccard,q102_hist_median,q109_semantic_dedup,q139_weighted_maxdf,q150_bm25_topk,q214_novelty_quality,q246_ivf_persist,q257_context_reuse,q263_text_index_build,q264_text_index_query}
WT=/tmp/hc_oldcode

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a /tmp/hostcheck.status; }

# preflight: fresh worktree at the exact baseline commit
git -C /root/repo worktree remove --force "$WT" 2>/dev/null
rm -rf "$WT"
git -C /root/repo worktree add --force --detach "$WT" "$OLD_COMMIT" \
  || { log "worktree add $OLD_COMMIT failed"; exit 1; }
at=$(git -C "$WT" rev-parse HEAD)
case "$at" in "$OLD_COMMIT"*) ;; *) log "worktree at $at, wanted $OLD_COMMIT"; exit 1;; esac

log "compiling old worktree ($OLD_COMMIT)"
( cd "$WT" || exit 1; sbt -batch compile > /tmp/hc_compile.log 2>&1 ) \
  || { log "old-worktree compile failed (see /tmp/hc_compile.log)"; exit 1; }

run() { # $1=dir $2=tag $3=leg
  ( cd "$1" || exit 1
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY="$SUBSET" \
      sbt -batch "runMain graft.Bench" > "/tmp/hc_${2}_${3}.log" 2>&1 )
  rc=$?
  log "leg $2/$3 rc=$rc"
  [ $rc -eq 0 ] || { log "leg $2/$3 failed — aborting"; exit 1; }
  grep -o '{"metric".*' "/tmp/hc_${2}_${3}.log" | tail -1 > "/tmp/hc_${2}_${3}.json"
  [ -s "/tmp/hc_${2}_${3}.json" ] \
    || { log "leg $2/$3 produced no bench JSON — aborting"; exit 1; }
}

run "$WT"       old 1
run /root/repo  new 1
run "$WT"       old 2
run /root/repo  new 2

cd /root/repo || exit 1
RECORDED="$RECORDED" OUT="$OUT" OLD_COMMIT="$OLD_COMMIT" TOUCHED="$TOUCHED" \
python3 - <<'EOF'
import json, math, os

def best(tag):
    runs = [json.load(open(f"/tmp/hc_{tag}_{i}.json"))["queries"] for i in (1, 2)]
    keys = set(runs[0]) & set(runs[1])          # intersect: a query that
    return {q: min(r[q] for r in runs) for q in keys}  # failed one leg drops

old, new = best("old"), best("new")
rec = json.load(open(os.environ["RECORDED"]))["queries"]
touched = {t for t in os.environ.get("TOUCHED", "").split(",") if t}
common = sorted(set(old) & set(new) & set(rec))
if not common:
    raise SystemExit("no common queries across old/new/recorded — nothing to report")
rows = {q: {
    "recorded": round(rec[q], 3),
    "old_code_today": round(old[q], 3),
    "head_today": round(new[q], 3),
    "old_vs_recorded": round(old[q] / rec[q], 3),
    "head_vs_old": round(new[q] / old[q], 3),
} for q in common}
g = lambda xs: round(math.exp(sum(math.log(x) for x in xs) / len(xs)), 3) if xs else None
untouched = [q for q in common if q not in touched]
doc = {
    "method": ("min-of-2 interleaved legs (old,new,old,new) of graft.Bench "
               "SPARK_GRAFT_ONLY subset on the same host/hour; old = commit "
               f"{os.environ['OLD_COMMIT']}, the code whose recording IS "
               f"{os.environ['RECORDED']}"),
    "touched_queries": sorted(touched & set(common)),
    "geomean_old_vs_recorded": g([old[q] / rec[q] for q in common]),
    "geomean_head_vs_old_today": g([new[q] / old[q] for q in common]),
    "geomean_head_vs_old_untouched": g([new[q] / old[q] for q in untouched]),
    "queries": rows,
}
with open(os.environ["OUT"], "w") as f:
    json.dump(doc, f, indent=2)
print(json.dumps({k: v for k, v in doc.items() if k != "queries"}, indent=2))
EOF
rc=$?
log "DONE rc=$rc"
exit $rc
