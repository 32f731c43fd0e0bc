"""Distributed-semantics tests on the fake 8-device CPU mesh (SURVEY.md §4
item 3): gradient psum equivalence, mesh shapes, sharded batch placement,
determinism across data-parallel widths."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.config import load_config
from deeplio_tpu.losses import init_loss_params
from deeplio_tpu.models import init_model
from deeplio_tpu.parallel import make_mesh, replicate, shard_batch
from deeplio_tpu.train import build_train_step, create_train_state, make_optimizer
from deeplio_tpu.train.state import TrainState

pytestmark = [pytest.mark.distributed, pytest.mark.slow]


def _setup(n_data: int, seed: int = 0, dropout: float | None = None):
    cfg = load_config("configs/deepio_synth.yaml")
    if dropout is not None:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, dropout=dropout))
    mesh = make_mesh(data=n_data, devices=jax.devices()[:n_data])
    tx = make_optimizer(cfg.optim, 100)
    model, variables = init_model(cfg, jax.random.PRNGKey(seed), axis_name="data")
    state = create_train_state(variables, init_loss_params(cfg.loss), tx,
                               jax.random.PRNGKey(seed + 1))
    state = replicate(mesh, state)
    train_step, eval_step = build_train_step(cfg, model, tx, mesh)
    return cfg, mesh, state, train_step, eval_step


def _batch(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    P = cfg.datasets.num_pairs
    T = cfg.datasets.max_imu_per_pair
    return {
        "imu": rng.normal(size=(B, P, T, 6)).astype(np.float32),
        "imu_mask": np.ones((B, P, T), np.float32),
        "x_gt": rng.normal(size=(B, P, 3)).astype(np.float32) * 0.5,
        "q_gt": np.tile([1.0, 0, 0, 0], (B, P, 1)).astype(np.float32),
        "valid": np.ones((B, P), np.float32),
    }


def test_mesh_shapes(devices8):
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_batch_is_sharded(devices8):
    mesh = make_mesh(data=8)
    cfg, *_ = _setup(8)[:1],
    cfg = load_config("configs/deepio_synth.yaml")
    b = shard_batch(mesh, _batch(cfg, 16))
    shards = b["imu"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == 2  # 16 / 8


def test_dp8_matches_dp1(devices8):
    """One train step on 8-way DP == same step on 1 device (same global
    batch, same init): the psum'd-gradient update must be identical."""
    B = 16
    # Dropout off: different shard counts fold different axis indices into
    # the dropout rng, which would (correctly) perturb the comparison.
    cfg1, mesh1, state1, step1, _ = _setup(1, seed=3, dropout=0.0)
    cfg8, mesh8, state8, step8, _ = _setup(8, seed=3, dropout=0.0)
    batch = _batch(cfg1, B, seed=11)

    s1, m1 = step1(state1, shard_batch(mesh1, batch))
    s8, m8 = step8(state8, shard_batch(mesh8, batch))
    # Loss is computed from identical params on the same global batch.
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["loss_x"]), float(m8["loss_x"]), rtol=1e-5)
    # LWS scalar params see the full-batch gradient -> identical updates.
    np.testing.assert_allclose(
        float(s1.loss_params["sx"]), float(s8.loss_params["sx"]), atol=1e-7)
    np.testing.assert_allclose(
        float(s1.loss_params["sq"]), float(s8.loss_params["sq"]), atol=1e-7)


def test_grad_norm_finite_and_params_in_sync(devices8):
    cfg, mesh, state, train_step, _ = _setup(8)
    batch = shard_batch(mesh, _batch(cfg, 16))
    state, m = train_step(state, batch)
    assert np.isfinite(float(m["grad_norm"]))
    # Params are replicated: every shard of a leaf must be identical.
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_eval_step_gathers_predictions(devices8):
    cfg, mesh, state, _, eval_step = _setup(8)
    batch = shard_batch(mesh, _batch(cfg, 16))
    x, q, m = eval_step(state, batch)
    assert x.shape == (16, cfg.datasets.num_pairs, 3)
    assert np.isfinite(float(m["loss"]))


def test_steps_per_call_matches_sequential(devices8):
    """steps-per-call k: one k-step program == k sequential train_step
    calls — same ops, same rng chain (train/step.py). Param agreement is
    up to last-ulp f32 rounding: the unrolled program is a DIFFERENT XLA
    program and fusion boundaries shift (measured max |d| ~1.5e-8)."""
    B = 16
    cfg, mesh, state_a, step1, _ = _setup(4, seed=5)
    _, _, state_b, _, _ = _setup(4, seed=5)
    step2, _ = build_train_step(cfg, *_rebuild_model_tx(cfg), mesh,
                                steps_per_call=2)
    b0 = shard_batch(mesh, _batch(cfg, B, seed=21))
    b1 = shard_batch(mesh, _batch(cfg, B, seed=22))

    sa, ma0 = step1(state_a, b0)
    sa, ma1 = step1(sa, b1)
    sb, (mb0, mb1) = step2(state_b, b0, b1)

    for ma, mb in ((ma0, mb0), (ma1, mb1)):
        for k in ma:
            np.testing.assert_allclose(np.asarray(ma[k]), np.asarray(mb[k]),
                                       rtol=1e-5, atol=1e-7, err_msg=k)
    flat_a = jax.tree_util.tree_leaves(sa.params)
    flat_b = jax.tree_util.tree_leaves(sb.params)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-4, atol=1e-6)
    # The rng chain IS bit-identical (pure integer ops).
    np.testing.assert_array_equal(np.asarray(sa.rng), np.asarray(sb.rng))
    assert int(sa.step) == int(sb.step) == 2


def _rebuild_model_tx(cfg):
    from deeplio_tpu.models import init_model
    tx = make_optimizer(cfg.optim, 100)
    model, _ = init_model(cfg, jax.random.PRNGKey(5), axis_name="data")
    return model, tx


def test_flat_update_matches_per_leaf(devices8):
    """optimizer.flat-update: Adam update + apply over one raveled vector
    == the per-leaf pytree path. The math is elementwise-identical (Adam
    and `w + u` are elementwise; ravel/unravel are value-preserving at
    uniform dtype) but the flat program is a DIFFERENT XLA program, so
    fusion boundaries shift rounding by last-ulp f32 (measured max |d|
    2.3e-10 after 3 steps) — same contract as steps-per-call."""
    B = 16
    cfg, mesh, state_a, step_a, _ = _setup(4, seed=7, dropout=0.0)
    cfg_f = cfg.replace(optim=dataclasses.replace(cfg.optim, flat_update=True))
    model, tx = _rebuild_model_tx(cfg_f)
    _, variables = init_model(cfg_f, jax.random.PRNGKey(7), axis_name="data")
    from deeplio_tpu.losses import init_loss_params
    state_b = create_train_state(variables, init_loss_params(cfg_f.loss), tx,
                                 jax.random.PRNGKey(8), flat=True)
    state_b = replicate(mesh, state_b)
    step_b, _ = build_train_step(cfg_f, model, tx, mesh)

    for seed in (31, 32, 33):
        b = shard_batch(mesh, _batch(cfg, B, seed=seed))
        state_a, ma = step_a(state_a, b)
        state_b, mb = step_b(state_b, b)
    for k in ma:
        np.testing.assert_allclose(np.asarray(ma[k]), np.asarray(mb[k]),
                                   rtol=1e-6, atol=1e-8, err_msg=k)
    leaves_a = jax.tree_util.tree_leaves(state_a.params)
    leaves_b = jax.tree_util.tree_leaves(state_b.params)
    for xa, xb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-6, atol=1e-9)
    for k in ("sx", "sq"):
        np.testing.assert_allclose(np.asarray(state_a.loss_params[k]),
                                   np.asarray(state_b.loss_params[k]),
                                   rtol=1e-6, atol=1e-9)


def test_flat_update_rejects_mixed_dtypes():
    from deeplio_tpu.train.state import ravel_trainables
    with pytest.raises(ValueError, match="flat-update"):
        ravel_trainables({"a": jnp.zeros(3, jnp.float32),
                          "b": jnp.zeros(2, jnp.bfloat16)})


def test_dp8_matches_dp1_mid_flagship_path(devices8):
    """dp8 == dp1 on the FLAGSHIP code path (PointSeg stride-fold tower
    with the pair-split stem, dual-half slot-aligned projection, LSTMs,
    soft fusion, LWS) at mid shapes — multi-chip correctness evidence for
    the program class the bench actually runs, not just the simple tower
    (VERDICT r4 item 7). Uses __graft_entry__._MID, the same config the
    driver's dryrun_multichip executes."""
    import yaml

    import __graft_entry__ as g
    from deeplio_tpu.config import load_config_dict

    d = yaml.safe_load(g._MID)
    d["deeplio"]["dropout"] = 0.0  # shard-count-dependent rng stream
    d["compute-dtype"] = "float32"  # bf16 noise would mask a psum bug
    cfg = load_config_dict(d)

    outs = {}
    for n in (1, 8):
        mesh = make_mesh(data=n, devices=jax.devices()[:n])
        tx = make_optimizer(cfg.optim, 100)
        model, variables = init_model(cfg, jax.random.PRNGKey(5),
                                      axis_name="data")
        state = create_train_state(variables, init_loss_params(cfg.loss),
                                   tx, jax.random.PRNGKey(6))
        state = replicate(mesh, state)
        train_step, _ = build_train_step(cfg, model, tx, mesh)
        batch = shard_batch(mesh, g._raw_batch(cfg, batch_size=8, seed=11))
        s, m = train_step(state, batch)
        outs[n] = (float(m["loss"]), float(s.loss_params["sx"]),
                   float(s.loss_params["sq"]))
    np.testing.assert_allclose(outs[1][0], outs[8][0], rtol=1e-5)
    np.testing.assert_allclose(outs[1][1], outs[8][1], atol=1e-7)
    np.testing.assert_allclose(outs[1][2], outs[8][2], atol=1e-7)
