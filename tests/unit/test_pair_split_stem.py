"""stem=pair-split exactness: conv(concat(a,b), W) == conv(a,W1)+conv(b,W2)
with the SAME parameter tree as the classic stem, through the full model
apply and the train-step batch assembly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.config import load_config_dict

BASE = {
    "arch": "deeplo",
    "compute-dtype": "float32",
    "datasets": {
        "synthetic": True, "synthetic-frames": 16,
        "sequence-size": 3, "combinations": [[0, 1], [1, 2]],
        "channels": ["x", "y", "z", "remission", "depth"],
        "image-height": 16, "image-width": 128, "max-points": 2048,
        "max-imu-per-pair": 8,
    },
    "deeplo": {"lidar-feat-net": {"name": "lidar-feat-pointseg"},
               "odom-feat-net": {"name": "odom-feat-fc"}},
    "lidar-feat-pointseg": {"part": "encoder", "feature-size": 64,
                            "h-stride": 2, "w-stride": 4,
                            "el-squeeze": 32, "pool": "stride-fold"},
    "losses": {"active": "lws"},
}


def _cfg(stem):
    import copy

    d = copy.deepcopy(BASE)
    d["lidar-feat-pointseg"]["stem"] = stem
    return load_config_dict(d)


def test_param_tree_identical_and_output_close():
    from deeplio_tpu.models import init_model
    from deeplio_tpu.models.zoo import example_batch

    cfg_c = _cfg("classic")
    cfg_s = _cfg("pair-split")
    model_c, vars_c = init_model(cfg_c, jax.random.PRNGKey(0))
    model_s, vars_s = init_model(cfg_s, jax.random.PRNGKey(0))

    flat_c = jax.tree_util.tree_leaves_with_path(vars_c["params"])
    flat_s = jax.tree_util.tree_leaves_with_path(vars_s["params"])
    paths_c = [jax.tree_util.keystr(p) for p, _ in flat_c]
    paths_s = [jax.tree_util.keystr(p) for p, _ in flat_s]
    assert paths_c == paths_s
    for (_, a), (_, b) in zip(flat_c, flat_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # same params, both stems, same underlying pair content
    rng = np.random.default_rng(0)
    b_c = example_batch(cfg_c, 2)
    imgs = rng.normal(size=(2, 3, 16, 128, 5)).astype(np.float32)
    combos = cfg_c.datasets.effective_combinations
    pair = np.stack([np.concatenate([imgs[:, i], imgs[:, j]], -1)
                     for i, j in combos], 1)
    b_c = dict(b_c, images=jnp.asarray(pair))
    b_s = dict(example_batch(cfg_s, 2),
               images=jnp.asarray(np.stack([imgs[:, i] for i, _ in combos], 1)),
               images2=jnp.asarray(np.stack([imgs[:, j] for _, j in combos], 1)))
    out_c = model_c.apply(vars_c, b_c, train=False)
    out_s = model_s.apply(vars_s, b_s, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(out_c),
                    jax.tree_util.tree_leaves(out_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_train_step_runs_and_matches_classic_loss():
    """Full jitted train step on the 8-device CPU mesh: first-step loss of
    pair-split equals classic to fp tolerance (same params, same data)."""
    from deeplio_tpu.data.dataset import build_dataset
    from deeplio_tpu.losses import init_loss_params
    from deeplio_tpu.models import init_model
    from deeplio_tpu.parallel import make_mesh, replicate, shard_batch
    from deeplio_tpu.train import (build_train_step, create_train_state,
                                   make_optimizer)

    losses = {}
    for stem in ("classic", "pair-split"):
        cfg = _cfg(stem)
        mesh = make_mesh(data=-1)
        model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                      axis_name="data")
        tx = make_optimizer(cfg.optim, 100)
        state = create_train_state(variables, init_loss_params(cfg.loss),
                                   tx, jax.random.PRNGKey(1))
        state = replicate(mesh, state)
        train_step, _ = build_train_step(cfg, model, tx, mesh)
        ds = build_dataset(cfg, "train")
        batch = next(ds.iter_batches(8, shuffle=False, workers=1))
        batch.pop("meta", None)
        state, m = train_step(state, shard_batch(mesh, batch))
        losses[stem] = float(m["loss"])
    assert np.isfinite(losses["classic"])
    np.testing.assert_allclose(losses["pair-split"], losses["classic"],
                               rtol=1e-4)


def test_pair_assembly_slice_fastpath_matches_gather():
    """make_model_batch's consecutive-combos SLICE fast path must produce
    exactly the per-combo gathers, and the general (non-consecutive) path
    must keep working."""
    import copy

    from deeplio_tpu.train.step import make_model_batch

    rng = np.random.default_rng(1)
    for combos in ([[0, 1], [1, 2]],          # consecutive -> slice path
                   [[0, 2], [1, 2]]):         # non-consecutive -> stack path
        d = copy.deepcopy(BASE)
        d["datasets"]["combinations"] = combos
        d["lidar-feat-pointseg"]["stem"] = "pair-split"
        cfg = load_config_dict(d)
        imgs = rng.normal(size=(2, 3, 16, 128, 5)).astype(np.float32)
        raw = {"images": jnp.asarray(imgs),
               "x_gt": jnp.zeros((2, len(combos), 3))}
        mb = make_model_batch(cfg, None, raw)
        np.testing.assert_array_equal(
            np.asarray(mb["images"]), np.stack([imgs[:, i] for i, _ in combos], 1))
        np.testing.assert_array_equal(
            np.asarray(mb["images2"]), np.stack([imgs[:, j] for _, j in combos], 1))


def test_pair_split_gates():
    from deeplio_tpu.config import ConfigError

    import copy

    d = copy.deepcopy(BASE)
    d["lidar-feat-pointseg"]["stem"] = "pair-split"
    d["lidar-feat-pointseg"]["part"] = "encoder+decoder"
    with pytest.raises(ConfigError, match="encoder-only"):
        load_config_dict(d)
    d = copy.deepcopy(BASE)
    d["lidar-feat-pointseg"]["stem"] = "bogus"
    with pytest.raises(ConfigError, match="stem"):
        load_config_dict(d)
