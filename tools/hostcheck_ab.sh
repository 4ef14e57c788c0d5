#!/bin/bash
# Host-drift A/B (round 11): bench an identical query subset on HEAD and on
# the EXACT commit whose recorded numbers form BASELINE_r10 (a1b6b24,
# checked out at /tmp/r10code), interleaved old->new->old->new on the same
# host within the same hour. If the old code now runs at the same ratio vs
# its own r10-recorded numbers as HEAD does, the r11-vs-r10 bench gap is
# environmental (host drift), not a code regression — r11 changed no shared
# hot path (the diff is new queries + CLI + a bootstrap-only Snapshots
# probe).
#
# Subset = the 10 queries the r11-vs-r10 gate flagged >2x, plus three
# stable heavies as references.
set -uo pipefail
SUBSET="q03_global_stats,q04_filtered_count,q44_stratified_sample,q65_resize_stub,q66_frame_sample,q71_kmeans_iter,q102_hist_median,q165_batch_plan,q167_quality_auc,q246_ivf_persist,q82_jaccard_join,q27_dedup_exact,q150_bm25_topk,q263_text_index_build,q264_text_index_query,q214_novelty_quality"
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/hostcheck.status; }

run() { # $1=dir $2=tag $3=leg
  cd "$1"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY="$SUBSET" \
    sbt -batch "runMain graft.Bench" > "/tmp/hc_${2}_${3}.log" 2>&1
  log "leg $2/$3 rc=$?"
  grep -o '{"metric".*' "/tmp/hc_${2}_${3}.log" | tail -1 > "/tmp/hc_${2}_${3}.json"
}

log "compiling old worktree"
cd /tmp/r10code && sbt -batch compile > /tmp/hc_compile.log 2>&1
log "compile rc=$?"

run /tmp/r10code old 1
run /root/repo   new 1
run /tmp/r10code old 2
run /root/repo   new 2

cd /root/repo
python3 - <<'EOF'
import json
def best(tag):
    runs = [json.load(open(f"/tmp/hc_{tag}_{i}.json"))["queries"] for i in (1, 2)]
    return {q: min(r[q] for r in runs) for q in runs[0]}
old, new = best("old"), best("new")
r10 = json.load(open("/root/repo/BASELINE_r10.json"))["queries"]
rows = {}
for q in sorted(old):
    rows[q] = {
        "r10_recorded": round(r10[q], 3),
        "old_code_today": round(old[q], 3),
        "head_today": round(new[q], 3),
        "old_vs_r10": round(old[q] / r10[q], 2),
        "head_vs_old": round(new[q] / old[q], 2),
    }
import math
g = lambda xs: round(math.exp(sum(math.log(x) for x in xs) / len(xs)), 3)
doc = {
    "method": ("min-of-2 interleaved legs (old,new,old,new) of graft.Bench "
               "SPARK_GRAFT_ONLY subset on the same host/hour; old = commit "
               "a1b6b24, the code whose recording IS BASELINE_r10"),
    "geomean_old_vs_r10_recorded": g([old[q] / r10[q] for q in old]),
    "geomean_head_vs_old_today": g([new[q] / old[q] for q in old]),
    "queries": rows,
}
with open("HOSTCHECK_r11.json", "w") as f:
    json.dump(doc, f, indent=2)
print(json.dumps({k: v for k, v in doc.items() if k != "queries"}, indent=2))
EOF
log "DONE"
