#!/bin/bash
# Round-4e on-chip A/B: dual-half plane layout (kernel-aligned=halves)
# vs the adopted trust route, driver protocol. halves removes the
# strided lane slices (XLA transpose fusions, ~2.2 ms/step), the
# key/f16 packing, and carries EXACT f32 payloads — expected win ~2-3
# ms/step over trust. Adoption rule: flip the flagship pin to halves if
# it beats trust by >1%, then re-validate with a plain bench.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4e
mkdir -p "$OUT"
log() { echo "[r4e $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }
run_stage() {
    local name="$1"; shift
    log "stage $name: env: $* — timeout 590 python bench.py"
    env "$@" timeout 590 python bench.py > "$OUT/bench_$name.json" 2> "$OUT/bench_$name.err"
    log "stage $name: rc=$? last-json=$(grep -o '{.*}' "$OUT/bench_$name.json" | tail -1)"
}
run_stage trust
run_stage halves DEEPLIO_BENCH_DS="kernel-aligned=halves"
log "done"
