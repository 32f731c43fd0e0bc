#!/bin/bash
# Round-4 on-chip accuracy work (VERDICT r3 items 4 + 8), chained after
# the r3 measurement blitz by benchmarks/r3_measure.sh (or run alone):
#
#   A/B: configs/deeplio_synth_gen2.yaml (exact f32 projection payloads)
#    vs  configs/deeplio_synth_gen2_packed.yaml (packed-f16 payloads +
#        quantized-range depth — the production Mosaic kernel route's
#        input semantics). Identical seeds/data/schedule otherwise.
#
#   Both arms evaluate the best-validation snapshot on 3 held-out
#   512-frame (~410 m) drives: n_segments ~82/drive over 3 KITTI length
#   buckets (vs 7/drive in the round-2 fixture).
#
# Logs + scores under /tmp/r4_accuracy/; run dirs under runs/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4_accuracy
mkdir -p "$OUT"

log() { echo "[r4 $(date +%H:%M:%S)] $*" | tee -a "$OUT/driver.log"; }

run_arm() {
    local name="$1" cfg="$2" wd="runs/r4_gen2_$1"
    log "arm $name: train ($cfg -> $wd)"
    timeout 7200 python -m deeplio_tpu.cli.train -c "$cfg" --workdir "$wd" \
        > "$OUT/train_$name.out" 2>&1
    log "arm $name: train rc=$?"
    log "arm $name: eval (best-val snapshot, test split)"
    timeout 2700 python -m deeplio_tpu.cli.test -c "$cfg" --workdir "$wd" \
        --use-best --out "$wd/eval_test" > "$OUT/eval_$name.out" 2>&1
    log "arm $name: eval rc=$?"
}

run_arm f32    configs/deeplio_synth_gen2.yaml
run_arm packed configs/deeplio_synth_gen2_packed.yaml

log "summary:"
python - <<'EOF' 2>&1 | tee -a "$OUT/driver.log"
import json
for arm in ("f32", "packed"):
    p = f"runs/r4_gen2_{arm}/eval_test/scores.json"
    try:
        scores = json.load(open(p))
    except OSError as e:
        print(arm, "MISSING", e)
        continue
    for drive, s in scores.items():
        print(f"{arm:6s} {drive}: ate={s['ate_m']:.3f}m "
              f"rpe={s['rpe_trans_m']:.3f}m/{s['rpe_rot_rad']:.5f}rad "
              f"t_rel={s['t_rel_pct']:.2f}% "
              f"r_rel={s['r_rel_deg_per_100m']:.2f} "
              f"n_seg={s.get('n_segments')}")
EOF
log "done — docs/results.md gets the table (and the f16-cost bound) from the summary above"
