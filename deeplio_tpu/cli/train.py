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
    p.add_argument("--seed", type=int, default=None,
                   help="override train.seed (init/shuffle/dropout streams)")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="-1 = all devices (default from config)")
    p.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint in workdir")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (SURVEY.md §5 sanitizer row)")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="capture a jax.profiler trace of the first N steps "
                        "into <workdir>/profile")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator host:port (or set "
                        "DEEPLIO_COORDINATOR / JAX_COORDINATOR_ADDRESS)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
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
    if args.seed is not None:
        tr = dataclasses.replace(tr, seed=args.seed)
    cfg = cfg.replace(train=tr)
    if args.lr is not None:
        cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, lr=args.lr))

    import jax

    # Multi-host: connect BEFORE any backend use so the mesh sees global
    # devices (SURVEY.md §5 distributed row).
    from deeplio_tpu.parallel.multihost import maybe_initialize
    maybe_initialize(args.coordinator, args.num_processes, args.process_id)

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    log = get_app_logger()
    log.info("arch=%s workdir=%s", cfg.model.arch, args.workdir)
    trainer = Trainer(cfg, workdir=args.workdir, resume=args.resume)
    try:
        if args.profile_steps > 0:
            import os
            with jax.profiler.trace(os.path.join(args.workdir, "profile")):
                # One short epoch slice under the profiler, then continue.
                trainer.fit(epochs=1)
            log.info("profile trace written to %s/profile", args.workdir)
            trainer.fit(epochs=max(cfg.train.epochs - 1, 0))
        else:
            trainer.fit()
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
