#!/bin/bash
# Round-5 accuracy work (VERDICT r4 item 5): SECOND SEED for both corridor
# A/B arms, so "f16 quantization cost below training noise" gets a
# measured noise bar (per-arm mean±spread over >=2 seeds instead of one
# run per arm). Same configs/schedule as round 4 (seed 42); these arms
# run seed 43.
#
# One chip — NEVER run concurrently with a bench or another training run.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r5_accuracy
mkdir -p "$OUT"

log() { echo "[r5a $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }

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
