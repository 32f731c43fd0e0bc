"""Golden regression tests (SURVEY.md §4 item 2): deterministic synthetic
inputs with frozen expected outputs, so pipeline semantics can't drift
silently across refactors. Regenerate with
``python -m tests.parity.test_golden`` AND justify the change in the
commit message.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from deeplio_tpu.data.drives import SyntheticDrive
from deeplio_tpu.data.dataset import WindowDataset
from deeplio_tpu.config import load_config_dict
from deeplio_tpu.ops import projection as proj
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden.json")

CFG = {
    "arch": "deeplio",
    # lidar/imu/fusion nets are declared explicitly: a lidar arch without
    # a lidar-feat-net key is now a loud ConfigError (round-2 review fix).
    "deeplio": {
        "lidar-feat-net": {"name": "lidar-feat-pointseg"},
        "imu-feat-net": {"name": "imu-feat-rnn"},
        "fusion-net": {"type": "soft"},
        "odom-feat-net": {"name": "odom-feat-rnn"},
    },
    "datasets": {
        "synthetic": True,
        "sequence-size": 3,
        "combinations": [[0, 1], [1, 2]],
        "image-height": 32,
        "image-width": 256,
        "max-points": 8192,
        "max-imu-per-pair": 16,
    },
}


def _compute():
    cfg = load_config_dict(CFG)
    drive = SyntheticDrive(n_frames=8, max_points=8192, seed=42)
    ds = WindowDataset(cfg.datasets, [drive], with_points=True)
    item = ds.get(2)
    # Dataset delivers SoA channel planes; the golden oracle takes AoS.
    pts = jnp.asarray(np.stack(
        [item[f"points_{k}"][0] for k in "x y z rem".split()], -1))[None]
    vld = jnp.asarray(item["points_valid"][0])[None]
    img, mask = proj.project_batch(pts, vld, 32, 256, 3.0, -25.0)
    img = np.asarray(img)[0]
    mask = np.asarray(mask)[0]
    return {
        "mask_sum": float(mask.sum()),
        "img_sum": float(np.round(img.sum(), 2)),
        "img_abs_sum": float(np.round(np.abs(img).sum(), 2)),
        "depth_mean": float(np.round(img[..., 4].sum() / max(mask.sum(), 1), 5)),
        "x_gt_0": [float(np.round(v, 6)) for v in item["x_gt"][0]],
        "q_gt_0": [float(np.round(v, 7)) for v in item["q_gt"][0]],
        "imu_sum": float(np.round(item["imu"].sum(), 4)),
        "imu_mask_sum": float(item["imu_mask"].sum()),
    }


@pytest.mark.slow
def test_golden_pipeline_values():
    got = _compute()
    want = json.load(open(GOLDEN))
    assert got["mask_sum"] == want["mask_sum"]
    assert got["imu_mask_sum"] == want["imu_mask_sum"]
    np.testing.assert_allclose(got["img_sum"], want["img_sum"], rtol=1e-6)
    np.testing.assert_allclose(got["img_abs_sum"], want["img_abs_sum"], rtol=1e-6)
    np.testing.assert_allclose(got["depth_mean"], want["depth_mean"], rtol=1e-5)
    np.testing.assert_allclose(got["x_gt_0"], want["x_gt_0"], atol=1e-5)
    np.testing.assert_allclose(got["q_gt_0"], want["q_gt_0"], atol=1e-6)
    np.testing.assert_allclose(got["imu_sum"], want["imu_sum"], atol=1e-3)


if __name__ == "__main__":
    with open(GOLDEN, "w") as f:
        json.dump(_compute(), f, indent=2)
    print("regenerated", GOLDEN)
