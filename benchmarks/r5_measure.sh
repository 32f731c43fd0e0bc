#!/bin/bash
# Round-5 on-chip battery at the halves flagship (same-session anchor:
# plain bench 4743.0, 2026-08-19).
#
#   pair-split : stem input-split conv — deletes the pair-stack concat +
#                conv-input relayout copies (~1.8 ms/step of HBM traffic
#                at a 26.1 ms step). Adoption rule: flip _FLAGSHIP stem if
#                >1% over the anchor, then re-validate with a plain bench.
#   spc3       : steps-per-call=3 (3 distinct staged buffers, no repeat)
#                — shaves the residual ~0.9 ms/step dispatch gap.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r5
mkdir -p "$OUT"
log() { echo "[r5 $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }
run_stage() {
    local name="$1"; shift
    log "stage $name: env: $* — timeout 590 python bench.py"
    env "$@" timeout 590 python bench.py > "$OUT/bench_$name.json" 2> "$OUT/bench_$name.err"
    log "stage $name: rc=$? last-json=$(grep -o '{.*}' "$OUT/bench_$name.json" | tail -1)"
}
run_stage pair_split DEEPLIO_BENCH_LIDAR="stem=pair-split"
run_stage spc3 DEEPLIO_BENCH_SPC=3
log "done"
