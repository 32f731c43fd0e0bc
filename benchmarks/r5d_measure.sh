#!/bin/bash
# Round-5 battery 4 (fresh-VM continuation, 2026-08-20; one chip):
#   plain    : re-validate the committed flagship under the FIXED degraded
#              gate (budget-based, bench.py) — the 04:3x run chunked a
#              1.4 s window because elapsed>400 s and read 4,613 vs the
#              4,980.8 ledger number.
#   spc6nb6  : steps-per-call=6 with 6 distinct device-rolled buffers —
#              on a slow-relay day the per-call dispatch gap is ~6 ms
#              (vs ~1 ms healthy), so deeper amortization may cross 5,000.
#   stream   : streaming per-tick budget at the adopted halves/pair-split
#              route (VERDICT r4 item 8 — the 5.2x number predates it).
#   profile  : re-profile the step at the current flagship (the 26.1 ms
#              budget table predates pair-split stem + slice assembly).
#   accuracy : seed-43 gen2 arms (f32 + packed), 24 epochs each with
#              device-dataset staging, then the two-seed summary
#              (VERDICT r4 item 5; the 2026-08-19 runs died with the VM).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r5d
mkdir -p "$OUT"
log() { echo "[r5d $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }
wait_relay() {
    while true; do
        timeout 300 python - >> "$OUT/driver.log" 2>&1 <<'EOF'
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
run_bench() {
    local name="$1"; shift
    log "stage $name: env: $* — timeout 590 python bench.py"
    env "$@" timeout 590 python bench.py > "$OUT/bench_$name.json" 2> "$OUT/bench_$name.err"
    local rc=$?
    log "stage $name: rc=$rc last-json=$(grep -o '{.*}' "$OUT/bench_$name.json" | tail -1)"
    [ $rc -ne 0 ] && wait_relay
}
run_bench plain
run_bench spc6nb6 DEEPLIO_BENCH_SPC=6 DEEPLIO_BENCH_NB=6
log "bench_stream chunk=1 at the adopted flagship route"
timeout 590 python benchmarks/bench_stream.py > "$OUT/stream.out" 2> "$OUT/stream.err"
rc=$?; log "stream rc=$rc tail=$(tail -2 "$OUT/stream.out" | head -1)"
[ $rc -ne 0 ] && wait_relay
log "profile_step at the flagship"
timeout 590 python benchmarks/profile_step.py > "$OUT/profile.out" 2> "$OUT/profile.err"
rc=$?; log "profile rc=$rc"; [ $rc -ne 0 ] && wait_relay

run_arm() {
    local name="$1" cfg="$2" wd="runs/r5_gen2_$1_s43"
    log "arm $name seed43: train ($cfg -> $wd)"
    timeout 7200 python -m deeplio_tpu.cli.train -c "$cfg" --workdir "$wd" \
        --seed 43 > "$OUT/train_$name.out" 2>&1
    log "arm $name seed43: train rc=$?"
    log "arm $name seed43: eval (best-val snapshot, test split)"
    timeout 2700 python -m deeplio_tpu.cli.test -c "$cfg" --workdir "$wd" \
        --use-best --out "$wd/eval_test" > "$OUT/eval_$name.out" 2>&1
    log "arm $name seed43: eval rc=$?"
}
run_arm f32    configs/deeplio_synth_gen2.yaml
run_arm packed configs/deeplio_synth_gen2_packed.yaml

log "summary (seed-43 arms; seed-42 eval artifacts died with the VM — "
log "docs/results.md keeps the recorded seed-42 table)"
python - <<'EOF' 2>&1 | tee -a "$OUT/driver.log"
import json
import numpy as np
for arm in ("f32", "packed"):
    p = f"runs/r5_gen2_{arm}_s43/eval_test/scores.json"
    try:
        scores = json.load(open(p))
    except OSError as e:
        print(arm, "seed43 MISSING", e)
        continue
    t = [s["t_rel_pct"] for s in scores.values()]
    r = [s["r_rel_deg_per_100m"] for s in scores.values()]
    print(f"{arm:6s} seed43: t_rel per-drive {['%.2f' % x for x in t]} "
          f"mean {np.mean(t):.2f}% | r_rel mean {np.mean(r):.2f}")
EOF
log "done"
