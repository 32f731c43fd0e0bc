#!/bin/bash
# Round-5 accuracy continuation: the f32 seed-43 arm was interrupted at
# epoch 6 when the build session died (2026-08-19 18:51); Orbax checkpoints
# survive in runs/r5_gen2_f32_s43 (latest step 2500). Resume it, eval, then
# run the packed seed-43 arm fresh, then print the two-seed summary.
#
# One chip — NEVER run concurrently with a bench or another training run.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r5_accuracy
mkdir -p "$OUT"

log() { echo "[r5c $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }

run_arm() {
    local name="$1" cfg="$2" resume="$3" wd="runs/r5_gen2_$1_s43"
    log "arm $name seed43: train ($cfg -> $wd, resume=$resume)"
    timeout 9000 python -m deeplio_tpu.cli.train -c "$cfg" --workdir "$wd" \
        --seed 43 $resume > "$OUT/train_$name.out" 2>&1
    log "arm $name seed43: train rc=$?"
    log "arm $name seed43: eval (best-val snapshot, test split)"
    timeout 2700 python -m deeplio_tpu.cli.test -c "$cfg" --workdir "$wd" \
        --use-best --out "$wd/eval_test" > "$OUT/eval_$name.out" 2>&1
    log "arm $name seed43: eval rc=$?"
}

run_arm f32    configs/deeplio_synth_gen2.yaml        --resume
run_arm packed configs/deeplio_synth_gen2_packed.yaml ""

log "summary (seed 43 arms + the round-4 seed-42 arms):"
python - <<'EOF' 2>&1 | tee -a "$OUT/driver.log"
import json
import numpy as np
for arm in ("f32", "packed"):
    for run, seed in ((f"runs/r4_gen2_{arm}", 42),
                      (f"runs/r5_gen2_{arm}_s43", 43)):
        p = f"{run}/eval_test/scores.json"
        try:
            scores = json.load(open(p))
        except OSError as e:
            print(arm, seed, "MISSING", e)
            continue
        t = [s["t_rel_pct"] for s in scores.values()]
        r = [s["r_rel_deg_per_100m"] for s in scores.values()]
        print(f"{arm:6s} seed{seed}: t_rel per-drive "
              f"{['%.2f' % x for x in t]} mean {np.mean(t):.2f}% | "
              f"r_rel mean {np.mean(r):.2f}")
EOF
log "done — docs/results.md gets the two-seed table from the summary"
