"""KITTI-layout end-to-end: synthesized on-disk KITTI raw tree (devkit
layout) -> window dataset -> projection -> deeplio train CLI -> checkpoint
-> test CLI -> trajectory + scores. This is a reference user's first real
command path (SURVEY.md §3.1/§3.2 with `datasets.kitti` instead of the
synthetic fixture) — the reader, dataset, and CLIs are each tested alone
elsewhere; this covers their composition."""

import json
import os

import numpy as np
import pytest
import yaml

from deeplio_tpu.cli import test as test_cli
from deeplio_tpu.cli import train as train_cli

from .._kitti_tree import DATE, DRIVE, make_kitti_tree

pytestmark = [pytest.mark.integration, pytest.mark.slow]

N_FRAMES = 8


def _config(root):
    return {
        "arch": "deeplio",
        "compute-dtype": "float32",
        "datasets": {
            "kitti": {
                "root-path": root,
                # One tiny drive reused across splits — this is a plumbing
                # smoke, not a generalization claim.
                "train": {DATE: [DRIVE]},
                "validation": {DATE: [DRIVE]},
                "test": {DATE: [DRIVE]},
            },
            "sequence-size": 2,
            "combinations": [[0, 1]],
            "channels": ["x", "y", "z", "remission", "depth"],
            "image-height": 16,
            "image-width": 128,
            "max-points": 8192,
            "mean": [0.0, 0.0, -0.4, 0.5, 25.0],
            "std": [25.0, 25.0, 1.0, 0.3, 18.0],
            "max-imu-per-pair": 16,
        },
        "deeplio": {
            "dropout": 0.0,
            "lidar-feat-net": {"name": "lidar-feat-simple-0"},
            "imu-feat-net": {"name": "imu-feat-rnn"},
            "fusion-net": {"type": "soft"},
            "odom-feat-net": {"name": "odom-feat-rnn"},
        },
        "lidar-feat-simple-0": {"feature-size": 32, "base-channels": 8},
        "imu-feat-rnn": {"type": "lstm", "hidden-size": 16, "num-layers": 1},
        "odom-feat-rnn": {"type": "lstm", "hidden-size": 24, "num-layers": 1},
        "losses": {"active": "lws", "lws": {"sx": 0.0, "sq": -2.5}},
        "optimizer": {"name": "adam", "lr": 0.001},
        "train": {"batch-size": 2, "epochs": 1, "log-every": 1,
                  "data-parallel": 2},
    }


def test_kitti_tree_train_then_eval(tmp_path):
    root = tmp_path / "kitti_raw"
    root.mkdir()
    make_kitti_tree(root, n_frames=N_FRAMES)

    cfg_path = str(tmp_path / "kitti_e2e.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_config(str(root)), f)

    wd = str(tmp_path / "run")
    train_cli.main(["-c", cfg_path, "--workdir", wd])
    assert os.path.exists(os.path.join(wd, "metrics.jsonl"))
    steps = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
    assert any("loss" in s for s in steps)

    test_cli.main(["-c", cfg_path, "--workdir", wd, "--split", "test"])
    scores = json.load(open(os.path.join(wd, "eval", "scores.json")))
    assert len(scores) == 1
    (name, s), = scores.items()
    assert np.isfinite(s["ate_m"]) and np.isfinite(s["rpe_trans_m"])
    pred = np.loadtxt(os.path.join(wd, "eval", f"{name}_pred.txt"))
    gt = np.loadtxt(os.path.join(wd, "eval", f"{name}_gt.txt"))
    # KITTI pose format: one 3x4 row-major pose per frame of the drive.
    assert pred.shape == (N_FRAMES, 12) and gt.shape == (N_FRAMES, 12)
    # GT must reflect the fixture's ~(5, 2) m/s drive (frames span ~0.73 s)
    # — proves OXTS->pose->trajectory plumbing, not just file existence.
    dist = np.linalg.norm(gt[-1, [3, 7, 11]] - gt[0, [3, 7, 11]])
    expect = np.hypot(5.0, 2.0) * 0.1037 * (N_FRAMES - 1)
    np.testing.assert_allclose(dist, expect, rtol=0.15)
