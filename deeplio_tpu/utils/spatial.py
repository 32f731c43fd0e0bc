"""SO(3)/SE(3) math for poses, quaternions and OXTS geodesy — jit-safe jnp.

Rebuilds the capability of the reference's ``deeplio/common/spatial.py``
(rotation-matrix <-> quaternion conversion, euler angles, relative poses,
mercator projection for OXTS) as pure, branchless ``jax.numpy`` functions
that trace cleanly under ``jit``/``vmap`` and run on TPU.

Conventions
-----------
* Quaternions are **[w, x, y, z]** (scalar first), unit-norm unless noted.
* Rotation matrices are world-from-body (column-vector convention):
  ``p_world = R @ p_body + t``.
* Euler angles are intrinsic roll(x)-pitch(y)-yaw(z) as used by KITTI OXTS:
  ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``.
* All functions broadcast over leading batch dimensions.

Everything here is dtype-polymorphic; pose ground-truth computation should
run in float32 (TPU has no f64; accumulate trajectories in f32 and keep the
comparison tolerance protocol of SURVEY.md §6 in mind).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Earth radius used by the KITTI raw devkit's mercator conversion (meters).
EARTH_RADIUS = 6378137.0

# Pose math must not go through bf16 MXU passes: mercator/global coordinates
# are O(1e6) m and TPU's default matmul precision (bf16) quantises them to
# ~4 km. Verified empirically on v5e: relative_pose at default precision
# produced kilometre-scale errors. All SE(3) contractions pin f32 precision.
_PRECISION = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Quaternions  q = [w, x, y, z]
# ---------------------------------------------------------------------------

def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Return q / ||q||, guarding the zero quaternion."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_canonical(q: jax.Array) -> jax.Array:
    """Fix the double-cover sign ambiguity: force w >= 0.

    The reference disambiguates quaternion regression targets by sign; we
    canonicalise with a branchless ``where`` so targets and predictions live
    on the same hemisphere.
    """
    w = q[..., :1]
    return jnp.where(w < 0.0, -q, q)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse(q: jax.Array) -> jax.Array:
    """Inverse for possibly non-unit quaternions."""
    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    return quat_conjugate(q) / jnp.maximum(sq, 1e-12)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v by unit quaternion q (Rodrigues-style, no matmul)."""
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix."""
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> unit quaternion [w,x,y,z], branchless.

    Uses the four-candidate construction (one per largest diagonal element)
    selected with ``where`` so it is jit/vmap-safe and numerically stable for
    every rotation, unlike the single-branch trace formula.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Candidate 0: trace-dominant.
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    # Candidate 1: m00 dominant.
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    # Candidate 2: m11 dominant.
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    # Candidate 3: m22 dominant.
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)

    # Pick the candidate whose pivot (first stacked component magnitude
    # proxy) is largest: compare tr vs diagonal entries.
    c0 = tr
    c1 = m00 - m11 - m22
    c2 = m11 - m00 - m22
    c3 = m22 - m00 - m11
    cands = jnp.stack([c0, c1, c2, c3], -1)
    idx = jnp.argmax(cands, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4 candidates, 4]
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[..., 0, :]
    return quat_canonical(quat_normalize(q))


def quat_geodesic_angle(qa: jax.Array, qb: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Geodesic angle (radians) between two unit quaternions, sign-invariant.

    theta = 2*acos(|<qa,qb>|), clamped away from |dot|=1 so the gradient of
    acos stays finite near zero rotation error (SURVEY.md §7 hard-part 5).
    """
    dot = jnp.abs(jnp.sum(quat_normalize(qa) * quat_normalize(qb), axis=-1))
    dot = jnp.clip(dot, 0.0, 1.0 - eps)
    return 2.0 * jnp.arccos(dot)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    half = 0.5 * angle[..., None]
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


# ---------------------------------------------------------------------------
# Euler angles (KITTI OXTS convention: R = Rz(yaw) Ry(pitch) Rx(roll))
# ---------------------------------------------------------------------------

def euler_to_rotmat(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_euler(R: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Inverse of :func:`euler_to_rotmat` (gimbal-lock tolerant clamp)."""
    sp = -R[..., 2, 0]
    pitch = jnp.arcsin(jnp.clip(sp, -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


# ---------------------------------------------------------------------------
# SE(3): poses as (R [.,3,3], t [.,3]) or 4x4 homogeneous matrices
# ---------------------------------------------------------------------------

def se3_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """Pack (R, t) into a 4x4 homogeneous transform (batched)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_matrix(Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=_PRECISION))


def se3_compose(Ta: jax.Array, Tb: jax.Array) -> jax.Array:
    return jnp.einsum("...ij,...jk->...ik", Ta, Tb, precision=_PRECISION)


def relative_pose(Ti: jax.Array, Tj: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Ground-truth relative motion between two global poses.

    Returns ``(dx, dq)`` with ``T_i^{-1} @ T_j = [R(dq) | dx]`` — exactly the
    supervision signal the reference derives from consecutive OXTS poses
    (reference: ``deeplio/datasets/kitti.py`` GT computation via
    ``deeplio/common/spatial.py``).
    """
    Trel = se3_compose(se3_inverse(Ti), Tj)
    return Trel[..., :3, 3], rotmat_to_quat(Trel[..., :3, :3])


def apply_relative(T: jax.Array, dx: jax.Array, dq: jax.Array) -> jax.Array:
    """Chain one predicted relative motion onto a global pose.

    ``T_new = T @ [R(dq) | dx]`` — the trajectory integration used by the
    reference's ``test.py`` evaluator.
    """
    return se3_compose(T, se3_matrix(quat_to_rotmat(dq), dx))


# ---------------------------------------------------------------------------
# OXTS geodesy (KITTI raw devkit mercator trick)
# ---------------------------------------------------------------------------

def latlon_to_mercator(lat: jax.Array, lon: jax.Array, scale: jax.Array) -> tuple[jax.Array, jax.Array]:
    """lat/lon (degrees) -> local mercator XY meters at a fixed scale.

    ``scale = cos(lat0 * pi / 180)`` with lat0 the first frame's latitude,
    matching the KITTI raw devkit / pykitti convention the reference uses.
    """
    er = EARTH_RADIUS
    x = scale * lon * (jnp.pi / 180.0) * er
    y = scale * er * jnp.log(jnp.tan((90.0 + lat) * (jnp.pi / 360.0)))
    return x, y


def mercator_scale(lat0: jax.Array) -> jax.Array:
    return jnp.cos(lat0 * jnp.pi / 180.0)


def oxts_to_pose(lat, lon, alt, roll, pitch, yaw, scale) -> jax.Array:
    """One OXTS record -> global 4x4 pose (un-normalised origin).

    Inputs broadcast; callers typically subtract the first pose to get a
    drive-local trajectory, as the KITTI devkit does.
    """
    x, y = latlon_to_mercator(lat, lon, scale)
    t = jnp.stack([x, y, alt], axis=-1)
    R = euler_to_rotmat(roll, pitch, yaw)
    return se3_matrix(R, t)
