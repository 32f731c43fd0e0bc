#!/bin/bash
# Round-4d on-chip A/B: the SLOT-ALIGNED direct projection route
# (ops/projection.py::project_batch_ring_aligned_planes) vs the Mosaic
# ring kernel, under the EXACT driver protocol. The route replaces the
# kernel's ~170 roll rounds (9.7 ms/step at the packed flagship) with a
# windowed min in pure XLA whenever the scan is a fixed ring/azimuth
# grid; "auto" keeps a runtime alignment predicate + lax.cond fallback
# to the kernel (bit-exact on any input), "trust" drops the predicate.
#
# Stages:
#   base     — current flagship pins (kernel route), same-window anchor
#   aligned  — kernel-aligned=auto (predicate + cond)
#   trust    — kernel-aligned=trust (no predicate; bounds the check cost)
#
# Adoption rule: flip `kernel-aligned` in __graft_entry__._FLAGSHIP to
# auto if the aligned stage beats base by >1%; prefer auto over trust
# unless trust wins by >1% on top (the predicate is the honest default —
# it keeps the bench result valid for arbitrary ring data). Re-validate
# with a plain `timeout 590 python bench.py` afterward.
#
# One chip — NEVER run concurrently with a training run.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4d
mkdir -p "$OUT"

log() { echo "[r4d $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }

run_stage() {
    local name="$1"; shift
    log "stage $name: env: $* — timeout 590 python bench.py"
    env "$@" timeout 590 python bench.py > "$OUT/bench_$name.json" 2> "$OUT/bench_$name.err"
    local rc=$?
    log "stage $name: rc=$rc last-json=$(grep -o '{.*}' "$OUT/bench_$name.json" | tail -1)"
}

run_stage base
run_stage aligned DEEPLIO_BENCH_DS="kernel-aligned=auto"
run_stage trust   DEEPLIO_BENCH_DS="kernel-aligned=trust"
log "done — adopt per the rule in the header"
