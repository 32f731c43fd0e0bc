"""Pose loss tests: hand-computed values, sign invariance, LWS params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.config.schema import LossConfig
from deeplio_tpu.losses import init_loss_params, pose_loss

IDENT = np.array([1.0, 0, 0, 0], np.float32)


def test_hws_hand_computed():
    cfg = LossConfig(active="hws", x_norm="l2", q_norm="l2", beta=10.0)
    x_pred = jnp.asarray([[1.0, 0, 0]])
    x_gt = jnp.asarray([[0.0, 0, 0]])
    q = jnp.asarray([IDENT])
    total, m = pose_loss(cfg, {}, x_pred, q, x_gt, q)
    assert abs(float(m["loss_x"]) - 1.0) < 1e-6
    assert abs(float(m["loss_q"])) < 1e-6
    assert abs(float(total) - 1.0) < 1e-6


def test_hws_l1():
    cfg = LossConfig(active="hws", x_norm="l1", q_norm="l1", beta=2.0)
    x_pred = jnp.asarray([[1.0, -2.0, 0]])
    x_gt = jnp.zeros((1, 3))
    q_pred = jnp.asarray([IDENT])
    q_gt = jnp.asarray([[0.0, 1.0, 0, 0]])  # 180 deg apart
    total, m = pose_loss(cfg, {}, x_pred, q_pred, x_gt, q_gt)
    assert abs(float(m["loss_x"]) - 3.0) < 1e-6
    # |1-0| + |0-1| = 2 after sign disambiguation (dot=0, keeps +q_gt)
    assert abs(float(m["loss_q"]) - 2.0) < 1e-5
    assert abs(float(total) - 7.0) < 1e-4


def test_quaternion_sign_invariance():
    cfg = LossConfig(active="hws", q_norm="l2", beta=1.0)
    rng = np.random.default_rng(0)
    q = rng.normal(size=(8, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qt = rng.normal(size=(8, 4)).astype(np.float32)
    qt /= np.linalg.norm(qt, axis=-1, keepdims=True)
    x = jnp.zeros((8, 3))
    t1, _ = pose_loss(cfg, {}, x, jnp.asarray(q), x, jnp.asarray(qt))
    t2, _ = pose_loss(cfg, {}, x, jnp.asarray(q), x, jnp.asarray(-qt))
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)


def test_geodesic_mode():
    cfg = LossConfig(active="hws", q_norm="geodesic", beta=1.0)
    ang = 0.3
    q_gt = jnp.asarray([[np.cos(ang / 2), 0, 0, np.sin(ang / 2)]], jnp.float32)
    q_pred = jnp.asarray([IDENT])
    x = jnp.zeros((1, 3))
    _, m = pose_loss(cfg, {}, x, q_pred, x, q_gt)
    assert abs(float(m["loss_q"]) - ang) < 1e-3


def test_lws_params_and_formula():
    cfg = LossConfig(active="lws", x_norm="l2", q_norm="l2", sx=0.5, sq=-2.5)
    lp = init_loss_params(cfg)
    assert float(lp["sx"]) == 0.5 and float(lp["sq"]) == -2.5
    x_pred = jnp.asarray([[2.0, 0, 0]])
    x_gt = jnp.zeros((1, 3))
    q = jnp.asarray([IDENT])
    total, m = pose_loss(cfg, lp, x_pred, q, x_gt, q)
    expect = 4.0 * np.exp(-0.5) + 0.5 + 0.0 * np.exp(2.5) - 2.5
    assert abs(float(total) - expect) < 1e-5


def test_lws_grad_wrt_s_params():
    cfg = LossConfig(active="lws")
    lp = init_loss_params(cfg)
    x_pred = jnp.asarray([[1.0, 1, 1]])
    x_gt = jnp.zeros((1, 3))
    q = jnp.asarray([IDENT])
    g = jax.grad(lambda p: pose_loss(cfg, p, x_pred, q, x_gt, q)[0])(lp)
    # dL/dsx = -Lx exp(-sx) + 1 = -3 + 1 = -2 at sx=0
    assert abs(float(g["sx"]) + 2.0) < 1e-5
    # dL/dsq = -0 + 1
    assert abs(float(g["sq"]) - 1.0) < 1e-5


def test_valid_mask_excludes_pairs():
    cfg = LossConfig(active="hws", x_norm="l2", q_norm="l2", beta=0.0)
    x_pred = jnp.asarray([[[1.0, 0, 0], [100.0, 0, 0]]])  # [B=1,P=2,3]
    x_gt = jnp.zeros((1, 2, 3))
    q = jnp.broadcast_to(jnp.asarray(IDENT), (1, 2, 4))
    valid = jnp.asarray([[1.0, 0.0]])
    total, _ = pose_loss(cfg, {}, x_pred, q, x_gt, q, valid=valid)
    assert abs(float(total) - 1.0) < 1e-5


def test_nan_free_gradient_at_perfect_prediction():
    for qn in ["l1", "l2", "geodesic"]:
        cfg = LossConfig(active="hws", q_norm=qn, beta=1.0)
        q = jnp.asarray([IDENT])
        x = jnp.asarray([[0.1, 0.2, 0.3]])
        g = jax.grad(lambda qq: pose_loss(cfg, {}, x, qq, x, q)[0])(q)
        assert np.isfinite(np.asarray(g)).all(), qn
