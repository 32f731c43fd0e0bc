"""Evaluation CLI (reference: ``python test.py -c config.yaml`` — SURVEY.md
§2.5/§3.2): load a checkpoint, run the test drives sequentially, chain and
write trajectories (KITTI pose format), plot vs ground truth, and print
ATE/RPE + KITTI relative errors.

Usage:
    python -m deeplio_tpu.cli.test -c configs/deeplio_kitti.yaml \
        --workdir runs/x [--split test] [--out runs/x/eval]
"""

from __future__ import annotations

import argparse
import json
import os

from deeplio_tpu.config import load_config
from deeplio_tpu.data.dataset import build_drives
from deeplio_tpu.eval import evaluate_drive
from deeplio_tpu.train import Trainer
from deeplio_tpu.utils import get_app_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a trained model")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--workdir", default="runs/default",
                   help="run dir containing checkpoints/")
    p.add_argument("--split", default="test",
                   choices=["train", "validation", "test"])
    p.add_argument("--out", default=None, help="output dir (default <workdir>/eval)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--use-best", action="store_true",
                   help="evaluate the best-validation snapshot (<workdir>/best) "
                        "instead of the latest checkpoint")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config)
    log = get_app_logger()
    out = args.out or os.path.join(args.workdir, "eval")

    # Reuse the Trainer to build model/state/mesh and restore the latest
    # checkpoint (it is the reference's Tester bootstrap, minus an epoch loop).
    trainer = Trainer(cfg, workdir=args.workdir, resume=True,
                      eval_only=True)
    if trainer.ckpt.latest_step() is None:
        raise SystemExit(f"no checkpoint found under {args.workdir}")
    if args.use_best:
        import jax
        from deeplio_tpu.train import load_params
        best = os.path.join(args.workdir, "best")
        params = load_params(best, jax.device_get(trainer.state.params))
        trainer.state = trainer.state.replace(params=params)
        log.info("evaluating best-validation snapshot from %s", best)

    drives = build_drives(cfg, args.split)
    all_scores = {}
    for d in drives:
        scores = evaluate_drive(cfg, trainer.eval_step, trainer.state,
                                trainer.mesh, d, out_dir=out)
        all_scores[d.name] = scores
        log.info("%s: ATE %.3fm  RPE %.3fm/%.4frad  t_rel %.2f%%  r_rel %.3fdeg/100m",
                 d.name, scores["ate_m"], scores["rpe_trans_m"],
                 scores["rpe_rot_rad"], scores["t_rel_pct"],
                 scores["r_rel_deg_per_100m"])
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "scores.json"), "w") as f:
        json.dump(all_scores, f, indent=2)
    log.info("wrote %s", os.path.join(out, "scores.json"))
    trainer.close()


if __name__ == "__main__":
    main()
