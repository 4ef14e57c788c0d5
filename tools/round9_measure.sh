#!/bin/bash
# Round-9 measurement chain: full tests -> full correctness drive ->
# BASELINE_r09 bench recording (250-query surface, min-of-3 heavy rule)
# -> measured scale curve with the round-9 query additions.
set -uo pipefail
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/r9measure.status; }

log "sbt test starting"
sbt -batch test > /tmp/r9_test.log 2>&1
rc=$?
log "sbt test rc=$rc"
if [ $rc -ne 0 ]; then log "ABORT: tests failed"; exit 1; fi

log "full Verify sf0.01 starting"
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/r9_verify" > /tmp/r9_verify.log 2>&1
rc=$?
log "verify rc=$rc"
python3 tools/compare.py /root/testdata/sf0.01 /tmp/r9_verify > /tmp/r9_compare.log 2>&1
rc=$?
log "compare rc=$rc ($(tail -1 /tmp/r9_compare.log))"
if [ $rc -ne 0 ]; then log "ABORT: correctness drive failed"; exit 1; fi

log "bench sf0.1 starting (BASELINE_r09 recording)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" > /tmp/r9_bench.log 2>&1
rc=$?
log "bench rc=$rc"
grep -o '{"metric".*' /tmp/r9_bench.log | tail -1 > /root/repo/BASELINE_r09.json
cp /root/repo/BASELINE_r09.json /root/repo/BENCH_local_r09.json
log "baseline bytes: $(wc -c < /root/repo/BASELINE_r09.json)"

log "scaling curve starting"
python3 tools/scaling_curve.py SCALING_r09.json > /tmp/r9_scaling.log 2>&1
rc=$?
log "scaling rc=$rc"
log "DONE"
exit 0
