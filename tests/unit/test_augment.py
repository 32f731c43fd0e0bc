"""Yaw augmentation: GT must transform exactly as the re-mounted sensor's
relative pose (conjugation identity), IMU vectors rotate, projection of
rotated points is a circular shift of the range image."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplio_tpu.data import np_spatial as nsp
from deeplio_tpu.ops.augment import yaw_augment


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]])


def test_gt_conjugation_identity(rng):
    # Random global poses Ti, Tj; augmented GT == relative of re-mounted poses.
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    Ti = nsp.se3(np.eye(3), rng.normal(size=3) * 5)
    Ti[:3, :3] = nsp.euler_to_rotmat(0.05, -0.02, 1.2)
    Tj = Ti @ nsp.se3(nsp.euler_to_rotmat(0.01, 0.0, 0.1), [0.8, 0.05, 0.01])
    dx, dq = nsp.relative_pose(Ti, Tj)

    raw = {
        "x_gt": jnp.asarray(dx, jnp.float32)[None, None],
        "q_gt": jnp.asarray(dq, jnp.float32)[None, None],
    }
    key = jax.random.PRNGKey(3)
    out = yaw_augment(raw, key)
    phi = float(jax.random.uniform(key, (1,), minval=-np.pi, maxval=np.pi)[0])

    Rz = _rotz(phi)
    Ti2 = Ti @ np.linalg.inv(Rz)
    Tj2 = Tj @ np.linalg.inv(Rz)
    dx2, dq2 = nsp.relative_pose(Ti2, Tj2)
    np.testing.assert_allclose(np.asarray(out["x_gt"])[0, 0], dx2, atol=1e-5)
    assert abs(np.dot(np.asarray(out["q_gt"])[0, 0], dq2)) > 0.999999


def test_points_and_imu_rotate_consistently(rng):
    pts = rng.normal(size=(1, 2, 64, 4)).astype(np.float32)
    imu = rng.normal(size=(1, 1, 5, 6)).astype(np.float32)
    raw = {
        "points": jnp.asarray(pts),
        "imu": jnp.asarray(imu),
        "x_gt": jnp.zeros((1, 1, 3)),
        "q_gt": jnp.asarray([[[1.0, 0, 0, 0]]]),
    }
    key = jax.random.PRNGKey(7)
    out = yaw_augment(raw, key)
    phi = float(jax.random.uniform(key, (1,), minval=-np.pi, maxval=np.pi)[0])
    R = _rotz(phi)[:3, :3]
    np.testing.assert_allclose(
        np.asarray(out["points"])[0, 0, :, :3], pts[0, 0, :, :3] @ R.T, atol=1e-5)
    # remission untouched
    np.testing.assert_array_equal(np.asarray(out["points"])[..., 3], pts[..., 3])
    np.testing.assert_allclose(
        np.asarray(out["imu"])[0, 0, :, :3], imu[0, 0, :, :3] @ R.T, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["imu"])[0, 0, :, 3:], imu[0, 0, :, 3:] @ R.T, atol=1e-5)


def test_identity_when_quaternion_identity(rng):
    # q_gt identity + dx forward: rotated dx has same norm.
    raw = {
        "x_gt": jnp.asarray([[[1.0, 0.0, 0.0]]]),
        "q_gt": jnp.asarray([[[1.0, 0, 0, 0]]]),
    }
    out = yaw_augment(raw, jax.random.PRNGKey(0))
    assert abs(np.linalg.norm(np.asarray(out["x_gt"])) - 1.0) < 1e-6
    # conjugating the identity quaternion stays identity
    np.testing.assert_allclose(np.abs(np.asarray(out["q_gt"])[0, 0, 0]), 1.0,
                               atol=1e-6)


def test_plane_rotation_matches_aos(rng):
    """FLAT SoA plane keys (points_x/y/z/rem [B*S,N], the train-step
    contract) rotate identically to the AoS path with the per-window
    angle repeated over each window's frames; z/rem pass untouched."""
    pts = rng.normal(size=(2, 2, 64, 4)).astype(np.float32)
    base = {
        "x_gt": jnp.zeros((2, 1, 3)),
        "q_gt": jnp.asarray([[[1.0, 0, 0, 0]]] * 2),
    }
    key = jax.random.PRNGKey(11)
    out_a = yaw_augment({**base, "points": jnp.asarray(pts)}, key)
    planes = {f"points_{k}": jnp.asarray(pts[..., i].reshape(4, 64))
              for i, k in enumerate("x y z rem".split())}
    out_p = yaw_augment({**base, **planes}, key)
    got = np.stack([np.asarray(out_p[f"points_{k}"]).reshape(2, 2, 64)
                    for k in "x y z rem".split()], axis=-1)
    np.testing.assert_allclose(got, np.asarray(out_a["points"]), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out_p["points_z"]).reshape(2, 2, 64), pts[..., 2])
