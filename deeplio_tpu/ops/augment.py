"""Device-side training augmentation (reference capability: torch
transforms in ``deeplio/datasets/transforms.py`` — SURVEY.md §2.2 lists
augmentation as [LOW]-confidence; we provide the geometrically sound one
for odometry and fuse it into the compiled step).

Global yaw rotation: rotate every frame's point cloud of a window by one
random yaw angle phi. The relative pose between frames transforms by
conjugation with Rz(phi): dx' = Rz(phi) @ dx, dq' = q_z(phi) * dq *
q_z(phi)^-1 — so the supervision stays exactly consistent. This both
augments the azimuth appearance (the range image shifts circularly with
sub-pixel resampling effects through the projection) and decorrelates the
dominant forward-motion direction.

"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from deeplio_tpu.utils.spatial import quat_multiply


def _rotz_points(pts: jax.Array, c: jax.Array, s: jax.Array) -> jax.Array:
    """Rotate [B, ..., N, 4] points (x,y,z,rem) by per-batch yaw cos/sin [B]."""
    x, y = pts[..., 0], pts[..., 1]
    # Expand cos/sin [B] -> [B, 1, ..., 1] to broadcast over [B, S, N].
    shape = (c.shape[0],) + (1,) * (x.ndim - 1)
    c = c.reshape(shape)
    s = s.reshape(shape)
    xr = c * x - s * y
    yr = s * x + c * y
    return jnp.stack([xr, yr, pts[..., 2], pts[..., 3]], axis=-1)


def yaw_augment(raw: Dict[str, jax.Array], rng: jax.Array
                ) -> Dict[str, jax.Array]:
    """Apply one random global yaw per batch item to points + GT.

    raw: the train-step batch — points as SoA channel planes
    ``points_x/points_y/points_z/points_rem`` [B*S,N] (the step contract;
    only the x/y planes are touched, z/rem pass through untouched) or
    legacy AoS ``points`` [B,S,N,4] — plus x_gt [B,P,3], q_gt [B,P,4],
    imu [B,P,T,6], ... Rotating the body points by Rz(phi)
    re-mounts the sensor: T_world_body' = T_world_body @ Rz^-1, so the
    relative pose conjugates (dx' = Rz dx, dq' = qz dq qz^-1) and the
    body-frame IMU vectors rotate too (a' = Rz a, w' = Rz w).
    """
    out = dict(raw)
    b = raw["x_gt"].shape[0]
    phi = jax.random.uniform(rng, (b,), minval=-jnp.pi, maxval=jnp.pi)
    c, s = jnp.cos(phi), jnp.sin(phi)

    if "points_x" in raw:
        x, y = raw["points_x"], raw["points_y"]
        rep = x.shape[0] // b          # frames per window (flat [B*S, N])
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        cP = jnp.repeat(c, rep).reshape(shape)
        sP = jnp.repeat(s, rep).reshape(shape)
        out["points_x"] = cP * x - sP * y
        out["points_y"] = sP * x + cP * y
    if "points" in raw:
        out["points"] = _rotz_points(raw["points"], c, s)

    # dx' = Rz(phi) dx  (per batch item, broadcast over pairs)
    x = raw["x_gt"]
    cB = c[:, None]
    sB = s[:, None]
    out["x_gt"] = jnp.stack(
        [cB * x[..., 0] - sB * x[..., 1],
         sB * x[..., 0] + cB * x[..., 1],
         x[..., 2]], axis=-1)

    # dq' = qz * dq * qz^-1
    half = phi / 2.0
    qz = jnp.stack([jnp.cos(half), jnp.zeros_like(half),
                    jnp.zeros_like(half), jnp.sin(half)], -1)  # [B,4]
    qz = qz[:, None, :]  # broadcast over pairs
    qz_inv = qz * jnp.asarray([1.0, -1.0, -1.0, -1.0])
    out["q_gt"] = quat_multiply(quat_multiply(qz, raw["q_gt"]), qz_inv)

    if "imu" in raw:
        imu = raw["imu"]  # [B, P, T, 6] body-frame (ax,ay,az,wx,wy,wz)
        cI = c[:, None, None]
        sI = s[:, None, None]

        def rot(v):
            return jnp.stack(
                [cI * v[..., 0] - sI * v[..., 1],
                 sI * v[..., 0] + cI * v[..., 1],
                 v[..., 2]], axis=-1)

        out["imu"] = jnp.concatenate([rot(imu[..., :3]), rot(imu[..., 3:])], -1)
    return out
