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
wait_relay() {
    # Data-plane probe; loops until healthy so a mid-battery wedge pauses
    # the battery instead of burning the remaining stages at rc=124.
    while true; do
        timeout 180 python - >> "$OUT/driver.log" 2>&1 <<'EOF'
import time, numpy as np, jax
t0 = time.time()
x = jax.device_put(np.ones((256, 131072), np.float32))
v = float(jax.device_get(jax.jit(lambda a: (a * 2.0).sum())(x)))
print(f"[probe] ok {time.time()-t0:.1f}s", flush=True)
EOF
        [ $? -eq 0 ] && return
        log "relay probe failed; sleeping 240"
        sleep 240
    done
}
run_stage() {
    local name="$1"; shift
    log "stage $name: env: $* — timeout 590 python bench.py"
    env "$@" timeout 590 python bench.py > "$OUT/bench_$name.json" 2> "$OUT/bench_$name.err"
    local rc=$?
    log "stage $name: rc=$rc last-json=$(grep -o '{.*}' "$OUT/bench_$name.json" | tail -1)"
    [ $rc -ne 0 ] && wait_relay
}
run_stage plain
run_stage spc3 DEEPLIO_BENCH_SPC=3
run_stage spc4nb4 DEEPLIO_BENCH_SPC=4 DEEPLIO_BENCH_NB=4
log "profile_step at the flagship"
timeout 590 python benchmarks/profile_step.py > "$OUT/profile.out" 2> "$OUT/profile.err"
rc=$?; log "profile rc=$rc"; [ $rc -ne 0 ] && wait_relay
log "bench_stream chunk=1"
timeout 590 python benchmarks/bench_stream.py > "$OUT/stream.out" 2> "$OUT/stream.err"
rc=$?; log "stream rc=$rc tail=$(tail -2 "$OUT/stream.out" | head -1)"
[ $rc -ne 0 ] && wait_relay
log "pipeline relay+e2e"
timeout 590 python benchmarks/bench_pipeline.py --stages relay,e2e \
    --drives 2 --frames 64 --batches 6 --workers 1 \
    > "$OUT/pipeline.out" 2> "$OUT/pipeline.err"
log "pipeline rc=$? json=$(grep -o '^{.*}' "$OUT/pipeline.out" | tail -1)"
log "done"
