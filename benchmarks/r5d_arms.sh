#!/bin/bash
# Round-5 seed-43 accuracy arms (VERDICT r4 item 5), split out of
# r5d_measure.sh so the spc6 bench-default re-validation could take the
# chip first. One chip — never run concurrently with a bench.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r5d
mkdir -p "$OUT"
log() { echo "[r5d-arms $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }

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

log "seed-43 summary:"
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
log "arms done"
