#!/bin/bash
# Round-5 battery 2 (runs AFTER the accuracy arms; one chip):
#   plain    : validates the consecutive-combos SLICE pair assembly
#              (train/step.py) at the committed flagship — anchor 4892.7.
#   spc3     : steps-per-call=3 retry (relay ate the first attempt).
#   spc4nb4  : steps-per-call=4 with 4 DISTINCT device-side-rolled
#              buffers (DEEPLIO_BENCH_NB=4) — the r4 spc4 rejection was
#              about buffer repetition, not the amortization itself.
#   profile  : re-profile the step at whatever the final config is.
#   stream   : streaming per-tick budget at the adopted route
#              (VERDICT r4 item 8 — the 5.2x number predates halves).
#   pipeline : relay bandwidth probe + host-fed e2e stage.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r5b
mkdir -p "$OUT"
log() { echo "[r5b $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }
run_stage() {
    local name="$1"; shift
    log "stage $name: env: $* — timeout 590 python bench.py"
    env "$@" timeout 590 python bench.py > "$OUT/bench_$name.json" 2> "$OUT/bench_$name.err"
    log "stage $name: rc=$? last-json=$(grep -o '{.*}' "$OUT/bench_$name.json" | tail -1)"
}
run_stage plain
run_stage spc3 DEEPLIO_BENCH_SPC=3
run_stage spc4nb4 DEEPLIO_BENCH_SPC=4 DEEPLIO_BENCH_NB=4
log "profile_step at the flagship"
timeout 590 python benchmarks/profile_step.py > "$OUT/profile.out" 2> "$OUT/profile.err"
log "profile rc=$?"
log "bench_stream chunk=1"
timeout 590 python benchmarks/bench_stream.py > "$OUT/stream.out" 2> "$OUT/stream.err"
log "stream rc=$? tail=$(tail -2 "$OUT/stream.out" | head -1)"
log "pipeline relay+e2e"
timeout 590 python benchmarks/bench_pipeline.py --stages relay,e2e \
    --drives 2 --frames 64 --batches 6 --workers 1 \
    > "$OUT/pipeline.out" 2> "$OUT/pipeline.err"
log "pipeline rc=$? json=$(grep -o '^{.*}' "$OUT/pipeline.out" | tail -1)"
log "done"
