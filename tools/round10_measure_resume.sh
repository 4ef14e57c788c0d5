#!/bin/bash
# Resume of round10_measure.sh after bench B was killed mid-run: re-runs
# bench B (BASELINE_r10, the second independent full recording) and the
# scaling curve. Bench A (BENCH_local_r10) already completed with rc=0.
set -uo pipefail
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/r10measure.status; }

log "bench run B (BASELINE_r10) RESTART"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r10_benchB.log 2>&1
rc=$?
log "bench B rc=$rc"
grep -o '{"metric".*' /tmp/r10_benchB.log | tail -1 > /root/repo/BASELINE_r10.json
log "bench B bytes: $(wc -c < /root/repo/BASELINE_r10.json)"

log "scaling curve starting"
python3 tools/scaling_curve.py SCALING_r10.json > /tmp/r10_scaling.log 2>&1
rc=$?
log "scaling rc=$rc"
log "DONE"
exit 0
