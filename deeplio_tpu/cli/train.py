"""Training CLI (reference: ``python train.py -c config.yaml [--device ...]
[--resume ckpt]`` — SURVEY.md §2.5). argv-compatible surface with the same
override semantics; device selection is mesh-based on TPU.

Usage:
    python -m deeplio_tpu.cli.train -c configs/deeplio_kitti.yaml \
        [--workdir runs/x] [--epochs N] [--batch-size B] [--lr F] [--resume]
"""

from __future__ import annotations

import argparse
import dataclasses

from deeplio_tpu.config import load_config
from deeplio_tpu.train import Trainer
from deeplio_tpu.utils import get_app_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train DeepIO/DeepLO/DeepLIO")
    p.add_argument("-c", "--config", required=True, help="YAML config path")
    p.add_argument("--workdir", default="runs/default")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--data-parallel", type=int, default=None,
                   help="-1 = all devices (default from config)")
    p.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint in workdir")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config)
    tr = cfg.train
    if args.epochs is not None:
        tr = dataclasses.replace(tr, epochs=args.epochs)
    if args.batch_size is not None:
        tr = dataclasses.replace(tr, batch_size=args.batch_size)
    if args.data_parallel is not None:
        tr = dataclasses.replace(tr, data_parallel=args.data_parallel)
    cfg = cfg.replace(train=tr)
    if args.lr is not None:
        cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, lr=args.lr))

    log = get_app_logger()
    log.info("arch=%s workdir=%s", cfg.model.arch, args.workdir)
    trainer = Trainer(cfg, workdir=args.workdir, resume=args.resume)
    try:
        trainer.fit()
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
