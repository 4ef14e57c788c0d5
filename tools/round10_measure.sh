#!/bin/bash
# Round-10 measurement chain (tests + full correctness already green this
# round before this runs): fresh BENCH_local_r10 vs BASELINE_r09 (verdict
# r9 item 4: the gate must compare two DISTINCT runs), a SECOND
# independent full recording as BASELINE_r10 (so round 11's gate is also
# never a self-compare), then the measured scale curve with the round-10
# additions (q259 + the @sqrt_labels IVF geometry).
set -uo pipefail
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/r10measure.status; }

log "bench run A (BENCH_local_r10) starting"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r10_benchA.log 2>&1
rc=$?
log "bench A rc=$rc"
grep -o '{"metric".*' /tmp/r10_benchA.log | tail -1 > /root/repo/BENCH_local_r10.json
log "bench A bytes: $(wc -c < /root/repo/BENCH_local_r10.json)"

log "bench run B (BASELINE_r10) starting"
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
