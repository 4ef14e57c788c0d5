#!/bin/bash
# Round-12 measurement chain (tests + both-SF correctness already green
# this round before this runs): fresh BENCH_local_r12 vs BASELINE_r11
# under the NEW adaptive-pass methodology (wall-clock recorded — the
# round's top verdict item is that the bench fits the driver budget
# again), a SECOND independent full recording as BASELINE_r12 (round
# 13's gate is never a self-compare), then the measured scale curve with
# the round-12 additions (q264 build/serve legs, q109 grid path).
set -uo pipefail
cd /root/repo || exit 1
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/r12measure.status; }

log "bench run A (BENCH_local_r12) starting"
t0=$SECONDS
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r12_benchA.log 2>&1
rc=$?
log "bench A rc=$rc wall=$((SECONDS-t0))s"
grep -o '{"metric".*' /tmp/r12_benchA.log | tail -1 > /root/repo/BENCH_local_r12.json
log "bench A bytes: $(wc -c < /root/repo/BENCH_local_r12.json)"

log "bench run B (BASELINE_r12) starting"
t0=$SECONDS
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r12_benchB.log 2>&1
rc=$?
log "bench B rc=$rc wall=$((SECONDS-t0))s"
grep -o '{"metric".*' /tmp/r12_benchB.log | tail -1 > /root/repo/BASELINE_r12.json
log "bench B bytes: $(wc -c < /root/repo/BASELINE_r12.json)"

log "scaling curve starting"
python3 tools/scaling_curve.py SCALING_r12.json > /tmp/r12_scaling.log 2>&1
rc=$?
log "scaling rc=$rc"
log "DONE"
exit 0
