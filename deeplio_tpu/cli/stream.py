"""Streaming odometry CLI (BASELINE.json config 5: real-time odometry over
all sequences with device-side projection).

Runs the compiled lax.scan streaming loop (eval/streaming.py) over every
drive of a split, reports per-drive trajectory scores and the real-time
factor, and writes KITTI-format trajectories.

Usage:
    python -m deeplio_tpu.cli.stream -c config.yaml --workdir runs/x \
        [--split test] [--chunk 16] [--out runs/x/stream]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from deeplio_tpu.config import load_config
from deeplio_tpu.data.dataset import build_drives
from deeplio_tpu.eval import StreamingOdometry, ate, rpe
from deeplio_tpu.eval.metrics import kitti_odometry_errors
from deeplio_tpu.eval.trajectory import gt_trajectory, write_kitti_poses
from deeplio_tpu.train import Trainer
from deeplio_tpu.utils import get_app_logger

LIDAR_HZ = 10.0


def main(argv=None):
    p = argparse.ArgumentParser(description="Streaming odometry inference")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--workdir", default="runs/default")
    p.add_argument("--split", default="test",
                   choices=["train", "validation", "test"])
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    cfg = load_config(args.config)
    log = get_app_logger()
    out = args.out or os.path.join(args.workdir, "stream")
    os.makedirs(out, exist_ok=True)

    trainer = Trainer(cfg, workdir=args.workdir, resume=True,
                      eval_only=True)
    if trainer.ckpt.latest_step() is None:
        raise SystemExit(f"no checkpoint found under {args.workdir}")
    variables = {"params": jax.device_get(trainer.state.params)}
    bs = jax.device_get(trainer.state.batch_stats)
    if bs:
        variables["batch_stats"] = bs

    so = StreamingOdometry(cfg, trainer.model, variables, chunk=args.chunk)
    scores = {}
    for drive in build_drives(cfg, args.split):
        t0 = time.time()
        poses, dx, dq = so.run(drive)
        dt = time.time() - t0
        gt = gt_trajectory(drive)
        gt = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
        pred = poses.astype(np.float64)
        s = {
            "frames": len(drive),
            "frames_per_sec": len(drive) / dt,
            "real_time_factor": len(drive) / dt / LIDAR_HZ,
            "ate_m": ate(pred, gt),
            "rpe_trans_m": rpe(pred, gt)[0],
        }
        s.update(kitti_odometry_errors(pred, gt))
        scores[drive.name] = s
        write_kitti_poses(os.path.join(out, f"{drive.name}_stream.txt"), pred)
        log.info("%s: %.1f fps (%.1fx RT)  ATE %.3fm  RPE %.3fm",
                 drive.name, s["frames_per_sec"], s["real_time_factor"],
                 s["ate_m"], s["rpe_trans_m"])
    with open(os.path.join(out, "scores.json"), "w") as f:
        json.dump(scores, f, indent=2)
    log.info("wrote %s", os.path.join(out, "scores.json"))
    trainer.close()


if __name__ == "__main__":
    main()
