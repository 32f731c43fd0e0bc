#!/bin/bash
# Round-4c on-chip A/B: steps-per-call=3 vs the adopted default spc=2,
# under the EXACT driver protocol. Rationale: the round-4 battery showed
# spc4 at 3499.0 (+0.4% over spc2's 3484.4) but was not adopted because
# spc4 repeats a staged batch within one call (N_BATCHES=3). spc=3
# cycles exactly the 3 distinct buffers per call — the last dispatch-gap
# amortization available without weakening the distinct-buffers
# measurement rule. Adoption rule: flip bench.py's DEEPLIO_BENCH_SPC
# default to 3 only if stage spc3 beats stage spc2 by >0.5% (the gap is
# small; anything less is window noise), then re-validate with a plain
# `timeout 590 python bench.py`.
#
# One chip — NEVER run concurrently with a training run.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4c
mkdir -p "$OUT"

log() { echo "[r4c $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }

run_stage() {
    local name="$1"; shift
    log "stage $name: env: $* — timeout 590 python bench.py"
    env "$@" timeout 590 python bench.py > "$OUT/bench_$name.json" 2> "$OUT/bench_$name.err"
    local rc=$?
    log "stage $name: rc=$rc last-json=$(grep -o '{.*}' "$OUT/bench_$name.json" | tail -1)"
}

run_stage spc2 DEEPLIO_BENCH_SPC=2
run_stage spc3 DEEPLIO_BENCH_SPC=3
log "done — adopt per the rule in the header"
