#!/bin/bash
# Round-4b on-chip A/B: flat-update optimizer path (optimizer.flat-update,
# train/step.py) vs the per-leaf pytree path, under the EXACT driver
# protocol. Run AFTER benchmarks/r4_onchip.sh finishes (one chip — never
# concurrently with a training run; timings contaminate).
#
# Stages:
#   0. plain bench at HEAD (bench contract re-validation, flat off)
#   1. flat-update=true
# Adoption rule: flip `optimizer: {flat-update: true}` into
# __graft_entry__._FLAGSHIP only if stage 1 beats stage 0 by >1%;
# re-validate with another plain `timeout 590 python bench.py`.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4b
mkdir -p "$OUT"

log() { echo "[r4b $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }

run_stage() {
    local name="$1"; shift
    log "stage $name: env: $* — timeout 590 python bench.py"
    env "$@" timeout 590 python bench.py > "$OUT/bench_$name.json" 2> "$OUT/bench_$name.err"
    local rc=$?
    log "stage $name: rc=$rc last-json=$(grep -o '{.*}' "$OUT/bench_$name.json" | tail -1)"
}

run_stage plain   DEEPLIO_BENCH_NOOP=1
run_stage flat    DEEPLIO_BENCH_OPT=flat-update=true
log "done — compare the two pairs/s values; adopt per the rule above"
