#!/bin/bash
# Round-13 measurement chain (tests + both-SF correctness already green
# this round before this runs): scale replicas + the NEW scale-equivalence
# audit (VERDICT r12 item 1), fresh BENCH_local_r13 vs BASELINE_r12, a
# SECOND independent full recording as BASELINE_r13 (round 14's gate is
# never a self-compare), then the measured scale curve.
#
# Unlike round12_measure.sh (ADVICE r12), every leg is GUARDED: a nonzero
# rc or an empty extracted artifact aborts the chain instead of silently
# recording an empty file as the operative baseline.
set -uo pipefail
cd /root/repo || exit 1
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/r13measure.status; }
die() { log "ABORT: $*"; echo "ABORT: $*" >&2; exit 1; }

# -- replicas (gitignored, regenerated each round) ---------------------
for spec in "3 scaledata/sf03" "10 scaledata/sf1"; do
  set -- $spec
  if [ ! -f "$2/documents.parquet" ]; then
    log "gen_scale $1 -> $2"
    mkdir -p "$2"
    python3 tools/gen_scale.py "$1" "$2" || die "gen_scale $2 rc=$?"
  fi
done
for spec in "3 scaledata/sf03s scaledata/sf03" "10 scaledata/sf1s scaledata/sf1"; do
  set -- $spec
  if [ ! -f "$2/embeddings.parquet" ]; then
    log "gen_scale $1 -> $2 (sqrt-labels)"
    mkdir -p "$2"
    python3 tools/gen_scale.py "$1" "$2" --sqrt-labels "$3" || die "gen_scale $2 rc=$?"
  fi
done

# -- scale-equivalence audit at 3x (VERDICT r12 item 1) ----------------
log "scale-equiv (3x replica) starting"
t0=$SECONDS
SPARK_GRAFT_CC_DRIVER_LIMIT=0 sbt -batch "Test/runMain graft.ScaleEquiv scaledata/sf03" \
  > /tmp/r13_scale_equiv.log 2>&1
rc=$?
log "scale-equiv rc=$rc wall=$((SECONDS-t0))s"
grep -o '{"scale_equiv".*' /tmp/r13_scale_equiv.log | tail -1 > /root/repo/SCALE_EQUIV_r13.json
[ $rc -eq 0 ] || die "scale-equiv rc=$rc (see /tmp/r13_scale_equiv.log)"
[ -s /root/repo/SCALE_EQUIV_r13.json ] || die "scale-equiv produced no JSON line"
log "scale-equiv bytes: $(wc -c < /root/repo/SCALE_EQUIV_r13.json)"

# -- two independent full bench recordings -----------------------------
run_bench() { # $1 = label, $2 = artifact path
  log "bench $1 starting"
  local t0=$SECONDS
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
    > "/tmp/r13_bench$1.log" 2>&1
  local rc=$?
  log "bench $1 rc=$rc wall=$((SECONDS-t0))s"
  grep -o '{"metric".*' "/tmp/r13_bench$1.log" | tail -1 > "$2"
  [ $rc -eq 0 ] || die "bench $1 rc=$rc (see /tmp/r13_bench$1.log)"
  [ -s "$2" ] || die "bench $1 produced no metric line"
  log "bench $1 bytes: $(wc -c < "$2")"
}
run_bench A /root/repo/BENCH_local_r13.json
run_bench B /root/repo/BASELINE_r13.json

# -- measured scale curve ----------------------------------------------
log "scaling curve starting"
t0=$SECONDS
python3 tools/scaling_curve.py SCALING_r13.json > /tmp/r13_scaling.log 2>&1
rc=$?
log "scaling rc=$rc wall=$((SECONDS-t0))s"
[ $rc -eq 0 ] || die "scaling curve rc=$rc (see /tmp/r13_scaling.log)"
[ -s /root/repo/SCALING_r13.json ] || die "scaling curve produced no artifact"
log "DONE"
