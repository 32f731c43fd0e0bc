"""PointSeg pretraining -> backbone graft round trip (SURVEY.md §5
checkpoint row: 'load PointSeg subtree only')."""

import dataclasses

import jax
import numpy as np
import pytest

from deeplio_tpu.config import load_config
from deeplio_tpu.models import init_model
from deeplio_tpu.train.checkpoint import load_pointseg_backbone
from deeplio_tpu.train.pretrain import pretrain_pointseg

pytestmark = [pytest.mark.integration, pytest.mark.slow]


def _tiny_pointseg_cfg():
    cfg = load_config("configs/deeplio_synth.yaml")
    proj = dataclasses.replace(cfg.datasets.projection, height=16, width=128,
                               max_points=2048)
    ds = dataclasses.replace(cfg.datasets, projection=proj, synthetic_frames=8)
    cfg = cfg.replace(datasets=ds)
    return cfg.replace(model=dataclasses.replace(cfg.model,
                                                 compute_dtype="float32"))


def test_pretrain_and_graft(tmp_path):
    cfg = _tiny_pointseg_cfg()
    out = pretrain_pointseg(cfg, str(tmp_path / "pre"), steps=12,
                            batch_size=2, lr=1e-3)
    # 12 steps is a smoke run: the loss must be finite and accuracy must be
    # a valid probability; learning quality is covered by longer runs.
    assert np.isfinite(out["loss"])
    assert 0.0 <= out["acc"] <= 1.0

    # Graft into a fresh DeepLIO model and verify the subtree changed.
    model, variables = init_model(cfg, jax.random.PRNGKey(7))
    before = variables["params"]["lidar_feat"]["pointseg"]["encoder"]
    grafted = load_pointseg_backbone(variables["params"], str(tmp_path / "pre"))
    after = grafted["lidar_feat"]["pointseg"]["encoder"]
    leaves_b = jax.tree_util.tree_leaves(before)
    leaves_a = jax.tree_util.tree_leaves(after)
    assert len(leaves_b) == len(leaves_a)
    changed = sum(not np.array_equal(a, b) for a, b in zip(leaves_a, leaves_b))
    assert changed > 0
    # Other subtrees untouched.
    np.testing.assert_array_equal(
        jax.tree_util.tree_leaves(grafted["heads"])[0],
        jax.tree_util.tree_leaves(variables["params"]["heads"])[0])
    # The grafted model still runs forward.
    from deeplio_tpu.models import example_batch
    new_vars = dict(variables, params=grafted)
    x, q = model.apply(new_vars, example_batch(cfg, 1), train=False)
    assert np.isfinite(np.asarray(x)).all()


# ---------------------------------------------------------------------------
# Real SemanticKITTI-format labels (datasets.labels-path)
# ---------------------------------------------------------------------------

def _make_kitti_tree_with_labels(root, n_frames=4, n_points=3000):
    """Minimal on-disk KITTI raw drive + SemanticKITTI .label files."""
    import datetime as dt
    import os

    date, drive = "2011_10_03", 27
    base = root / date / f"{date}_drive_{drive:04d}_sync"
    (base / "velodyne_points" / "data").mkdir(parents=True)
    (base / "oxts" / "data").mkdir(parents=True)
    labdir = root / "labels" / f"{date}_drive_{drive:04d}"
    labdir.mkdir(parents=True)

    def write_ts(path, times):
        t0 = dt.datetime(2011, 10, 3, 12, 0, 0)
        with open(path, "w") as f:
            for t in times:
                f.write((t0 + dt.timedelta(seconds=float(t)))
                        .strftime("%Y-%m-%d %H:%M:%S.%f") + "000\n")

    rng = np.random.default_rng(3)
    ft = np.arange(n_frames) * 0.1
    write_ts(base / "velodyne_points" / "timestamps.txt", ft)
    ot = np.arange(n_frames * 10) / 100.0
    write_ts(base / "oxts" / "timestamps.txt", ot)
    for k in range(len(ot)):
        rec = np.zeros(30)
        rec[0], rec[1], rec[2] = 48.98, 8.42, 116.0
        np.savetxt(base / "oxts" / "data" / f"{k:010d}.txt", rec[None],
                   fmt="%.9f")
    for i in range(n_frames):
        pts = np.zeros((n_points, 4), np.float32)
        rr = rng.uniform(2, 50, n_points)
        yaw = rng.uniform(-np.pi, np.pi, n_points)
        pts[:, 0] = rr * np.cos(yaw)
        pts[:, 1] = rr * np.sin(yaw)
        pts[:, 2] = rng.uniform(-1.8, 1.0, n_points)
        pts[:, 3] = rng.uniform(0, 1, n_points)
        pts.tofile(base / "velodyne_points" / "data" / f"{i:010d}.bin")
        # SemanticKITTI file contract: uint32, low 16 sem id, high 16 inst.
        sem = rng.integers(0, 260, n_points).astype(np.uint32)
        inst = rng.integers(0, 5, n_points).astype(np.uint32)
        (sem | (inst << 16)).tofile(labdir / f"{i:010d}.label")
    return str(root), date, drive


def test_pretrain_with_real_labels(tmp_path):
    import yaml

    from deeplio_tpu.config import load_config_dict

    root, date, drive = _make_kitti_tree_with_labels(tmp_path)
    cfg = load_config_dict(yaml.safe_load(f"""
arch: deeplo
compute-dtype: float32
datasets:
  kitti:
    root-path: {root}
    train: {{"{date}": [{drive}]}}
  labels-path: {root}/labels
  labels-num-classes: 8
  label-map: {{10: 1, 40: 2, 44: 2, 48: 3, 50: 4, 70: 5, 71: 5, 80: 6}}
  sequence-size: 2
  channels: [x, y, z, remission, depth]
  image-height: 16
  image-width: 128
  max-points: 4096
deeplo:
  dropout: 0.0
  lidar-feat-net: {{name: lidar-feat-pointseg}}
  odom-feat-net: {{name: odom-feat-fc}}
lidar-feat-pointseg: {{part: encoder, feature-size: 64}}
odom-feat-fc: {{hidden-size: 32}}
losses: {{active: hws}}
optimizer: {{name: adam, lr: 0.001}}
"""))
    out = pretrain_pointseg(cfg, str(tmp_path / "pre"), steps=6,
                            batch_size=2, lr=1e-3)
    assert np.isfinite(out["loss"])
    assert 0.0 <= out["acc"] <= 1.0


def test_labels_path_without_files_raises(tmp_path):
    import yaml

    from deeplio_tpu.config import load_config_dict

    root, date, drive = _make_kitti_tree_with_labels(tmp_path)
    import shutil
    shutil.rmtree(tmp_path / "labels")
    cfg = load_config_dict(yaml.safe_load(f"""
arch: deeplo
compute-dtype: float32
datasets:
  kitti:
    root-path: {root}
    train: {{"{date}": [{drive}]}}
  labels-path: {root}/labels
  sequence-size: 2
  channels: [x, y, z, remission, depth]
  image-height: 16
  image-width: 128
  max-points: 4096
deeplo:
  dropout: 0.0
  lidar-feat-net: {{name: lidar-feat-pointseg}}
  odom-feat-net: {{name: odom-feat-fc}}
lidar-feat-pointseg: {{part: encoder, feature-size: 64}}
odom-feat-fc: {{hidden-size: 32}}
losses: {{active: hws}}
optimizer: {{name: adam, lr: 0.001}}
"""))
    with pytest.raises(FileNotFoundError, match="label"):
        pretrain_pointseg(cfg, str(tmp_path / "pre"), steps=2, batch_size=1)


def test_label_image_is_winner_consistent(tmp_path):
    """Pixel labels must belong to exactly the winning (closest) points:
    project labels through the remission payload slot and compare with the
    sequential oracle run on label-as-remission points."""
    import jax.numpy as jnp

    from deeplio_tpu.ops.projection import project_batch, project_scan_np

    rng = np.random.default_rng(11)
    n, H, W = 4000, 16, 128
    pts = np.zeros((n, 4), np.float32)
    rr = rng.uniform(2, 50, n)
    yaw = rng.uniform(-np.pi, np.pi, n)
    pts[:, 0] = rr * np.cos(yaw)
    pts[:, 1] = rr * np.sin(yaw)
    pts[:, 2] = rng.uniform(-1.8, 1.0, n)
    labels = rng.integers(0, 20, n).astype(np.float32)
    pts_lab = pts.copy()
    pts_lab[:, 3] = labels
    valid = np.ones(n, bool)

    img, mask = project_batch(jnp.asarray(pts_lab[None]),
                              jnp.asarray(valid[None]),
                              H, W, 3.0, -25.0, packed=False)
    ref, ref_mask = project_scan_np(pts_lab, valid, H, W, 3.0, -25.0)
    np.testing.assert_array_equal(np.asarray(mask[0]), ref_mask)
    got = np.round(np.asarray(img[0, ..., 3])).astype(np.int32)
    want = np.round(ref[..., 3]).astype(np.int32)
    np.testing.assert_array_equal(got[ref_mask > 0], want[ref_mask > 0])
