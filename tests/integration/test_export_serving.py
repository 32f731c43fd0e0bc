"""Serving export round-trip: serialize the streaming step (weights baked
in) with jax.export, reload it WITHOUT the model zoo, and verify it
reproduces StreamingOdometry's outputs exactly. Also asserts the artifact
carries a TPU lowering (deployability), while the round-trip executes on
the CPU platform of this CI."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.config import load_config
from deeplio_tpu.data.drives import SyntheticDrive
from deeplio_tpu.eval import StreamingOdometry
from deeplio_tpu.eval.export import export_streaming, load_streaming_artifact
from deeplio_tpu.models import init_model

pytestmark = [pytest.mark.integration, pytest.mark.slow]

N_PTS, CHUNK, N_FRAMES = 2048, 4, 8


def _tiny_cfg():
    cfg = load_config("configs/deeplio_synth.yaml")
    proj = dataclasses.replace(cfg.datasets.projection, height=16,
                               width=128, max_points=N_PTS)
    ds = dataclasses.replace(cfg.datasets, projection=proj,
                             sequence_size=2, combinations=((0, 1),))
    cfg = cfg.replace(datasets=ds)
    return cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="float32", dropout=0.0))


def _chunks(cfg, drive):
    """Replicate StreamingOdometry.run's host chunk assembly."""
    t = cfg.datasets.max_imu_per_pair
    for c0 in range(0, len(drive), CHUNK):
        ks = list(range(c0, min(c0 + CHUNK, len(drive))))
        pts, vld, imu, im = [], [], [], []
        for k in ks:
            p, v = drive.points(k)
            pts.append(p)
            vld.append(v)
            w = (drive.imu_between(drive.frame_time(k - 1),
                                   drive.frame_time(k))
                 if k > 0 else np.zeros((0, 6), np.float32))
            buf = np.zeros((t, 6), np.float32)
            msk = np.zeros((t,), np.float32)
            m = min(len(w), t)
            buf[:m] = w[:m]
            msk[:m] = 1.0
            imu.append(buf)
            im.append(msk)
        while len(pts) < CHUNK:
            pts.append(pts[-1]); vld.append(vld[-1])
            imu.append(imu[-1]); im.append(im[-1])
        yield len(ks), {"points": jnp.asarray(np.stack(pts)),
                        "valid": jnp.asarray(np.stack(vld)),
                        "imu": jnp.asarray(np.stack(imu)),
                        "imu_mask": jnp.asarray(np.stack(im))}


def test_export_roundtrip_matches_streaming(tmp_path):
    cfg = _tiny_cfg()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    drive = SyntheticDrive(n_frames=N_FRAMES, max_points=N_PTS, seed=7)

    art = export_streaming(cfg, model, variables, str(tmp_path / "art"),
                           chunk=CHUNK, platforms=("tpu", "cpu"))
    step, init_carry, manifest = load_streaming_artifact(art)
    assert "tpu" in manifest["platforms"]          # deployable artifact
    assert manifest["arch"] == "deeplio"

    # Reference: the in-process streaming runner.
    ref_poses, ref_dx, ref_dq = StreamingOdometry(
        cfg, model, variables, chunk=CHUNK).run(drive)

    # Serving side: only the artifact (no model zoo objects touched).
    carry = init_carry()
    got_poses, got_dq = [], []
    for n_real, chunk in _chunks(cfg, drive):
        carry, (poses, dx, dq) = step(carry, chunk)
        got_poses.append(np.asarray(poses)[:n_real])
        got_dq.append(np.asarray(dq)[:n_real])
    got_poses = np.concatenate(got_poses)
    got_dq = np.concatenate(got_dq)

    assert got_poses.shape == ref_poses.shape
    np.testing.assert_allclose(got_dq, ref_dq, atol=1e-6)
    np.testing.assert_allclose(got_poses, ref_poses, atol=1e-5)


def test_export_cli_roundtrip(tmp_path):
    """train CLI -> export CLI -> load artifact -> run a chunk."""
    import yaml

    from deeplio_tpu.cli import export as export_cli
    from deeplio_tpu.cli import train as train_cli

    cfg_dict = {
        "arch": "deeplo",
        "compute-dtype": "float32",
        "datasets": {
            "synthetic": True, "synthetic-frames": 12,
            "sequence-size": 2, "combinations": [[0, 1]],
            "channels": ["x", "y", "z", "remission", "depth"],
            "image-height": 16, "image-width": 128, "max-points": N_PTS,
            "mean": [0.0, 0.0, -1.0, 0.5, 25.0],
            "std": [25.0, 25.0, 2.0, 0.3, 25.0],
            "max-imu-per-pair": 16,
        },
        "deeplo": {
            "dropout": 0.0,
            "lidar-feat-net": {"name": "lidar-feat-simple-0"},
            "odom-feat-net": {"name": "odom-feat-rnn"},
        },
        "lidar-feat-simple-0": {"feature-size": 32, "base-channels": 8},
        "odom-feat-rnn": {"type": "lstm", "hidden-size": 16,
                          "num-layers": 1},
        "losses": {"active": "hws"},
        "optimizer": {"name": "adam", "lr": 0.001},
        "train": {"batch-size": 2, "epochs": 1, "log-every": 1,
                  "data-parallel": 2},
    }
    cfg_path = str(tmp_path / "tiny_deeplo.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    wd = str(tmp_path / "run")
    train_cli.main(["-c", cfg_path, "--workdir", wd])
    art = export_cli.main(["-c", cfg_path, "--workdir", wd, "--chunk", "4"])

    step, init_carry, manifest = load_streaming_artifact(art)
    assert manifest["arch"] == "deeplo" and "tpu" in manifest["platforms"]
    carry = init_carry()
    drive = SyntheticDrive(n_frames=4, max_points=N_PTS, seed=9)
    pts = np.stack([drive.points(k)[0] for k in range(4)])
    vld = np.stack([drive.points(k)[1] for k in range(4)])
    carry, (poses, dx, dq) = step(
        carry, {"points": jnp.asarray(pts), "valid": jnp.asarray(vld)})
    assert np.isfinite(np.asarray(poses)).all()
    np.testing.assert_allclose(np.asarray(dq[0]), [1, 0, 0, 0], atol=1e-6)
