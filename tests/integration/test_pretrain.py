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

pytestmark = pytest.mark.integration


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
