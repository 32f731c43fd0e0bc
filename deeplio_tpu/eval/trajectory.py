"""Trajectory integration from predicted relative poses (reference:
``test.py``'s sequential chaining of predictions into a global path —
SURVEY.md §3.2). Device version uses an associative scan over SE(3)
composition; a numpy twin serves the host/eval path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deeplio_tpu.data import np_spatial as nsp
from deeplio_tpu.utils import spatial as sp


def chain_relative(dx: jax.Array, dq: jax.Array) -> jax.Array:
    """[M,3] translations + [M,4] quaternions -> [M+1,4,4] global poses.

    T_0 = I; T_{k+1} = T_k @ [R(dq_k) | dx_k]. Uses an associative scan
    (O(log M) depth on device); SE(3) composition is associative.
    """
    rel = sp.se3_matrix(sp.quat_to_rotmat(dq), dx)          # [M,4,4]
    chained = jax.lax.associative_scan(
        lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b,
                                precision=jax.lax.Precision.HIGHEST),
        rel, axis=0)
    eye = jnp.eye(4, dtype=rel.dtype)[None]
    return jnp.concatenate([eye, chained], axis=0)


def chain_relative_np(dx: np.ndarray, dq: np.ndarray) -> np.ndarray:
    """Float64 host twin of :func:`chain_relative` (sequential)."""
    M = dx.shape[0]
    out = np.zeros((M + 1, 4, 4))
    out[0] = np.eye(4)
    for k in range(M):
        q = dq[k] / np.linalg.norm(dq[k])
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        out[k + 1] = out[k] @ nsp.se3(R, dx[k].astype(np.float64))
    return out


def gt_trajectory(drive) -> np.ndarray:
    """Drive's OXTS-derived global poses at frame times, [n,4,4] f64."""
    return np.stack([drive.pose(i) for i in range(len(drive))])


def write_kitti_poses(path: str, Ts: np.ndarray):
    """KITTI odometry pose format: 12 row-major floats of [R|t] per line."""
    with open(path, "w") as f:
        for T in Ts:
            f.write(" ".join(f"{v:.9e}" for v in T[:3, :4].reshape(-1)) + "\n")


def read_kitti_poses(path: str) -> np.ndarray:
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    out = np.tile(np.eye(4), (rows.shape[0], 1, 1))
    out[:, :3, :4] = rows
    return out
