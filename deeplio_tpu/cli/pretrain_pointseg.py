"""PointSeg backbone pretraining CLI (reference capability: pretrained
PointSeg weights consumed by ``lidar-feat-pointseg`` — SURVEY.md §2.5).

Usage:
    python -m deeplio_tpu.cli.pretrain_pointseg -c configs/deeplio_synth.yaml \
        --out runs/pointseg_pre [--steps 200] [--batch-size 4] [--lr 1e-3]

Then point the odometry config at it:
    lidar-feat-pointseg: {pretrained: true, model-path: runs/pointseg_pre}
"""

from __future__ import annotations

import argparse

from deeplio_tpu.config import load_config
from deeplio_tpu.train.pretrain import pretrain_pointseg
from deeplio_tpu.utils import get_app_logger


def main(argv=None):
    p = argparse.ArgumentParser(description="Pretrain the PointSeg backbone")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--out", required=True, help="directory for encoder params")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = load_config(args.config)
    out = pretrain_pointseg(cfg, args.out, steps=args.steps,
                            batch_size=args.batch_size, lr=args.lr,
                            seed=args.seed)
    get_app_logger().info("pretraining done: loss %.4f acc %.3f -> %s",
                          out["loss"], out["acc"], args.out)


if __name__ == "__main__":
    main()
