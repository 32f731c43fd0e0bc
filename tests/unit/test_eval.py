"""Eval layer tests: trajectory chaining identities, metric values on
constructed cases, KITTI pose file round-trip."""

import numpy as np
import pytest

from deeplio_tpu.data import np_spatial as nsp
from deeplio_tpu.eval import (
    ate,
    chain_relative,
    chain_relative_np,
    kitti_odometry_errors,
    read_kitti_poses,
    rpe,
    write_kitti_poses,
)


def _random_rel(rng, m):
    dx = rng.normal(scale=0.5, size=(m, 3)).astype(np.float32)
    dq = rng.normal(size=(m, 4)).astype(np.float32)
    dq /= np.linalg.norm(dq, axis=-1, keepdims=True)
    dq[dq[:, 0] < 0] *= -1
    # keep rotations small-ish (realistic odometry)
    dq = 0.2 * dq + 0.8 * np.array([1.0, 0, 0, 0])
    dq /= np.linalg.norm(dq, axis=-1, keepdims=True)
    return dx, dq


@pytest.mark.slow
def test_chain_device_matches_np(rng):
    dx, dq = _random_rel(rng, 50)
    Td = np.asarray(chain_relative(dx, dq))
    Tn = chain_relative_np(dx, dq)
    np.testing.assert_allclose(Td, Tn, atol=1e-3)


def test_chain_then_relative_roundtrip(rng):
    dx, dq = _random_rel(rng, 20)
    T = chain_relative_np(dx, dq)
    for k in range(20):
        rx, rq = nsp.relative_pose(T[k], T[k + 1])
        np.testing.assert_allclose(rx, dx[k], atol=1e-5)
        assert abs(np.dot(rq, dq[k])) > 0.999999


def test_ate_zero_on_identical(rng):
    dx, dq = _random_rel(rng, 30)
    T = chain_relative_np(dx, dq)
    assert ate(T, T) < 1e-9
    t, r = rpe(T, T)
    assert t < 1e-9 and r < 1e-6


def test_ate_known_offset(rng):
    dx, dq = _random_rel(rng, 30)
    T = chain_relative_np(dx, dq)
    T2 = T.copy()
    T2[:, 2, 3] += 1.0  # constant z offset
    # With alignment a constant offset vanishes; without it's exactly 1.
    assert ate(T2, T, align=True) < 1e-6
    assert abs(ate(T2, T, align=False) - 1.0) < 1e-9


def test_kitti_errors_perfect_and_scaled():
    # Straight 1 m/frame trajectory, 1000 frames.
    n = 1001
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, 0, 3] = np.arange(n)
    out = kitti_odometry_errors(T, T)
    assert out["n_segments"] > 0
    assert out["t_rel_pct"] < 1e-9
    # 1% translation scale error -> ~1% t_rel.
    T2 = T.copy()
    T2[:, 0, 3] *= 1.01
    out2 = kitti_odometry_errors(T2, T)
    assert 0.5 < out2["t_rel_pct"] < 1.5


def test_kitti_pose_file_roundtrip(tmp_path, rng):
    dx, dq = _random_rel(rng, 10)
    T = chain_relative_np(dx, dq)
    path = str(tmp_path / "poses.txt")
    write_kitti_poses(path, T)
    T2 = read_kitti_poses(path)
    np.testing.assert_allclose(T, T2, atol=1e-7)
