#!/bin/bash
# Round-11 measurement chain (tests + full correctness already green this
# round before this runs): fresh BENCH_local_r11 vs BASELINE_r10 (two
# DISTINCT runs — the r9/r10 discipline), a SECOND independent full
# recording as BASELINE_r11 (so round 12's gate is never a self-compare),
# then the measured scale curve with the round-11 additions (q266/q269
# text lifecycle, the re-recorded post-fix q263, and the sqrt-labels
# geometry promoted to primary for the IVF-store families).
set -uo pipefail
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/r11measure.status; }

log "bench run A (BENCH_local_r11) starting"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r11_benchA.log 2>&1
rc=$?
log "bench A rc=$rc"
grep -o '{"metric".*' /tmp/r11_benchA.log | tail -1 > /root/repo/BENCH_local_r11.json
log "bench A bytes: $(wc -c < /root/repo/BENCH_local_r11.json)"

log "bench run B (BASELINE_r11) starting"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r11_benchB.log 2>&1
rc=$?
log "bench B rc=$rc"
grep -o '{"metric".*' /tmp/r11_benchB.log | tail -1 > /root/repo/BASELINE_r11.json
log "bench B bytes: $(wc -c < /root/repo/BASELINE_r11.json)"

log "scaling curve starting"
python3 tools/scaling_curve.py SCALING_r11.json > /tmp/r11_scaling.log 2>&1
rc=$?
log "scaling rc=$rc"
log "DONE"
exit 0
