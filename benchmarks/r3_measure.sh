#!/bin/bash
# Round-3 measurement blitz — run when the TPU relay recovers.
# Serializes everything (one chip). Logs under /tmp/r3_measure/.
# Order matters: bench.py first (re-warms .jax_cache with the packed-route
# step executable AND produces the contract number), then the op-level
# profile (answers the ~9 ms custom-call residual — see
# docs/performance.md), then the sweeps.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r3_measure
mkdir -p "$OUT"

log() { echo "[r3 $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }

log "probe: tiny jitted matmul"
timeout 300 python -c "
import jax, jax.numpy as jnp, time
t=time.time(); x=jnp.ones((256,256)); print('probe ok', float((x@x).sum()), time.time()-t)
" >> "$OUT/driver.log" 2>&1 || { log "PROBE FAILED — relay still down"; exit 1; }

log "stage 1/6: bench.py (contract + cache warm)"
timeout 900 python bench.py > "$OUT/bench.out" 2> "$OUT/bench.err"
log "bench rc=$? last: $(tail -1 "$OUT/bench.out")"

log "stage 1b: packed-route A/B (driver protocol, kernel-packed=on)"
DEEPLIO_BENCH_DS="kernel-packed=on" timeout 1500 python bench.py \
    > "$OUT/bench_packed.out" 2> "$OUT/bench_packed.err"
log "bench packed rc=$? last: $(tail -1 "$OUT/bench_packed.out")"

log "stage 1c: packed+spb2 A/B"
DEEPLIO_BENCH_DS="kernel-packed=on kernel-spb=2" timeout 1500 python bench.py \
    > "$OUT/bench_spb2.out" 2> "$OUT/bench_spb2.err"
log "bench spb2 rc=$? last: $(tail -1 "$OUT/bench_spb2.out")"

log "stage 1c2: packed+spb4 A/B (may fail scoped-VMEM at 64M — informative)"
DEEPLIO_BENCH_DS="kernel-packed=on kernel-spb=4" timeout 1500 python bench.py \
    > "$OUT/bench_spb4.out" 2> "$OUT/bench_spb4.err"
log "bench spb4 rc=$? last: $(tail -1 "$OUT/bench_spb4.out")"

log "stage 1d: combined candidate (packed+spb2, 2 steps/call)"
DEEPLIO_BENCH_DS="kernel-packed=on kernel-spb=2" DEEPLIO_BENCH_SPC=2 \
    timeout 1500 python bench.py \
    > "$OUT/bench_combo.out" 2> "$OUT/bench_combo.err"
log "bench combo rc=$? last: $(tail -1 "$OUT/bench_combo.out")"

log "stage 2/6: profile_step (custom-call enumeration)"
timeout 900 python benchmarks/profile_step.py > "$OUT/profile.out" 2> "$OUT/profile.err"
log "profile rc=$?"

log "stage 3/6: batch/steps-per-call sweep"
timeout 1800 python benchmarks/bench_batch_sweep.py 16 16:2 16:4 24 32 \
    > "$OUT/sweep.out" 2> "$OUT/sweep.err"
log "sweep rc=$?"

log "stage 4/6: projection shootout (packed A/B + lanes)"
timeout 1200 python benchmarks/bench_projection.py 32 \
    > "$OUT/proj.out" 2> "$OUT/proj.err"
log "proj rc=$?"

log "stage 5/6: streaming per-tick budget"
timeout 900 python benchmarks/bench_stream.py 1 --budget \
    > "$OUT/stream.out" 2> "$OUT/stream.err"
log "stream rc=$?"

log "stage 6/6: blitz done — inspect $OUT/*.out (rank with benchmarks/r3_adopt.py)"
# NOTE: the round-4 accuracy A/B (benchmarks/r4_onchip.sh) is launched
# separately, AFTER adoption + re-validation of the perf winners — the
# unattended auto-chain was only for the watcher scenario where no one
# is around to sequence the chip.
log "all stages done"
