"""Serving-export CLI: trained workdir -> self-contained deploy artifact.

The reference has no deployment surface (SURVEY.md §2.5: its ``test.py``
IS the inference story); this exports the compiled streaming-odometry
step — projection + model + pose composition with weights baked in — as a
serialized StableHLO artifact servable on TPU (or CPU) with no framework
code (see ``deeplio_tpu/eval/export.py``).

Usage:
    python -m deeplio_tpu.cli.export -c configs/deeplio_kitti.yaml \
        --workdir runs/x [--out runs/x/artifact] [--chunk 16] [--use-best]
"""

from __future__ import annotations

import argparse
import os

from deeplio_tpu.config import load_config
from deeplio_tpu.eval.export import export_streaming
from deeplio_tpu.train import Trainer
from deeplio_tpu.utils import get_app_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export a serving artifact")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--workdir", default="runs/default",
                   help="run dir containing checkpoints/")
    p.add_argument("--out", default=None,
                   help="artifact dir (default <workdir>/artifact)")
    p.add_argument("--chunk", type=int, default=16,
                   help="frames per exported step call")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--use-best", action="store_true",
                   help="export the best-validation snapshot")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config)
    log = get_app_logger()
    out = args.out or os.path.join(args.workdir, "artifact")

    import jax

    trainer = Trainer(cfg, workdir=args.workdir, resume=True, eval_only=True)
    if trainer.ckpt.latest_step() is None:
        raise SystemExit(f"no checkpoint found under {args.workdir}")
    if args.use_best:
        from deeplio_tpu.train import load_params
        best = os.path.join(args.workdir, "best")
        params = load_params(best, jax.device_get(trainer.state.params))
        trainer.state = trainer.state.replace(params=params)
        log.info("exporting best-validation snapshot from %s", best)

    variables = {"params": jax.device_get(trainer.state.params)}
    stats = jax.device_get(trainer.state.batch_stats)
    if stats:
        variables["batch_stats"] = stats
    art = export_streaming(cfg, trainer.model, variables, out,
                           chunk=args.chunk,
                           platforms=tuple(args.platforms.split(",")))
    trainer.close()
    log.info("wrote serving artifact to %s", art)
    return art


if __name__ == "__main__":
    main()
