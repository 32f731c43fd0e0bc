"""Unit tests for SO3/SE3 math (SURVEY.md §4: quaternion<->rotmat
round-trips, relative-pose identities, mercator geodesy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.utils import spatial as sp


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternions:
    def test_normalize(self, rng):
        q = rng.normal(size=(32, 4)).astype(np.float32)
        out = sp.quat_normalize(jnp.asarray(q))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)

    def test_mul_identity(self, rng):
        q = random_quats(rng, 16)
        ident = jnp.asarray([1.0, 0, 0, 0])
        out = sp.quat_multiply(jnp.asarray(q), jnp.broadcast_to(ident, (16, 4)))
        np.testing.assert_allclose(out, q, atol=1e-6)

    def test_mul_inverse(self, rng):
        q = jnp.asarray(random_quats(rng, 16))
        out = sp.quat_multiply(q, sp.quat_inverse(q))
        expect = np.tile([1.0, 0, 0, 0], (16, 1))
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_rotate_matches_matrix(self, rng):
        q = jnp.asarray(random_quats(rng, 8))
        v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        R = sp.quat_to_rotmat(q)
        np.testing.assert_allclose(
            sp.quat_rotate(q, v), jnp.einsum("bij,bj->bi", R, v), atol=1e-5
        )

    def test_rotmat_roundtrip(self, rng):
        q = sp.quat_canonical(jnp.asarray(random_quats(rng, 256)))
        q2 = sp.rotmat_to_quat(sp.quat_to_rotmat(q))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_rotmat_roundtrip_edge_cases(self):
        # 180-degree rotations around each axis hit the non-trace branches.
        for axis in np.eye(3, dtype=np.float32):
            q = sp.quat_from_axis_angle(jnp.asarray(axis), jnp.asarray(np.pi))
            R = sp.quat_to_rotmat(q)
            q2 = sp.rotmat_to_quat(R)
            R2 = sp.quat_to_rotmat(q2)
            np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_geodesic_angle(self):
        q0 = jnp.asarray([1.0, 0, 0, 0])
        for ang in [0.0, 0.1, 1.0, np.pi / 2]:
            q1 = sp.quat_from_axis_angle(jnp.asarray([0.0, 0, 1.0]), jnp.asarray(ang))
            got = float(sp.quat_geodesic_angle(q0, q1))
            assert abs(got - ang) < 1e-3

    def test_geodesic_sign_invariant(self, rng):
        qa = jnp.asarray(random_quats(rng, 8))
        qb = jnp.asarray(random_quats(rng, 8))
        np.testing.assert_allclose(
            sp.quat_geodesic_angle(qa, qb), sp.quat_geodesic_angle(qa, -qb), atol=1e-6
        )

    def test_geodesic_grad_finite_at_zero(self):
        # d/dq acos must not blow up when prediction == target.
        q = jnp.asarray([1.0, 0.0, 0.0, 0.0])
        g = jax.grad(lambda x: sp.quat_geodesic_angle(x, q))(q)
        assert np.all(np.isfinite(np.asarray(g)))


class TestEulerSE3:
    def test_euler_roundtrip(self, rng):
        roll = jnp.asarray(rng.uniform(-1.2, 1.2, 16).astype(np.float32))
        pitch = jnp.asarray(rng.uniform(-1.2, 1.2, 16).astype(np.float32))
        yaw = jnp.asarray(rng.uniform(-np.pi, np.pi, 16).astype(np.float32))
        R = sp.euler_to_rotmat(roll, pitch, yaw)
        r2, p2, y2 = sp.rotmat_to_euler(R)
        np.testing.assert_allclose(r2, roll, atol=1e-5)
        np.testing.assert_allclose(p2, pitch, atol=1e-5)
        np.testing.assert_allclose(y2, yaw, atol=1e-5)

    def test_se3_inverse(self, rng):
        q = jnp.asarray(random_quats(rng, 8))
        t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        T = sp.se3_matrix(sp.quat_to_rotmat(q), t)
        eye = sp.se3_compose(T, sp.se3_inverse(T))
        np.testing.assert_allclose(eye, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)

    def test_relative_pose_identity(self, rng):
        q = jnp.asarray(random_quats(rng, 4))
        t = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        T = sp.se3_matrix(sp.quat_to_rotmat(q), t)
        dx, dq = sp.relative_pose(T, T)
        np.testing.assert_allclose(dx, np.zeros((4, 3)), atol=1e-5)
        np.testing.assert_allclose(dq, np.tile([1.0, 0, 0, 0], (4, 1)), atol=1e-4)

    def test_relative_then_apply_roundtrip(self, rng):
        qa, qb = (jnp.asarray(random_quats(rng, 4)) for _ in range(2))
        ta = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        tb = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        Ti = sp.se3_matrix(sp.quat_to_rotmat(qa), ta)
        Tj = sp.se3_matrix(sp.quat_to_rotmat(qb), tb)
        dx, dq = sp.relative_pose(Ti, Tj)
        Tj2 = sp.apply_relative(Ti, dx, dq)
        np.testing.assert_allclose(Tj2, Tj, atol=1e-4)

    def test_jit_traces(self, rng):
        # Everything must be jit-safe (no python branches on values).
        q = jnp.asarray(random_quats(rng, 4))
        f = jax.jit(lambda x: sp.rotmat_to_quat(sp.quat_to_rotmat(x)))
        np.testing.assert_allclose(f(q), sp.quat_canonical(q), atol=1e-5)


class TestGeodesy:
    def test_mercator_equator_lon(self):
        # At lat=0, x should be ~111.3km per degree of longitude.
        scale = sp.mercator_scale(jnp.asarray(0.0))
        x, y = sp.latlon_to_mercator(jnp.asarray(0.0), jnp.asarray(1.0), scale)
        assert abs(float(x) - 111319.49) < 1.0
        assert abs(float(y)) < 1e-3

    def test_oxts_pose_shape(self):
        T = sp.oxts_to_pose(
            jnp.asarray(49.0), jnp.asarray(8.43), jnp.asarray(112.0),
            jnp.asarray(0.01), jnp.asarray(0.005), jnp.asarray(1.2),
            sp.mercator_scale(jnp.asarray(49.0)),
        )
        assert T.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(T)[3], [0, 0, 0, 1], atol=0)
