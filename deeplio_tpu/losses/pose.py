"""6-DoF pose regression losses (reference: ``deeplio/losses/losses.py``
HWSLoss / LWSLoss — SURVEY.md §2.4).

Two weighting schemes:
  * HWS — fixed weighting:  L = Lx + beta * Lq
  * LWS — learnable Kendall-style uncertainty weighting:
        L = Lx * exp(-sx) + sx + Lq * exp(-sq) + sq
    with trainable scalars (sx, sq) that live in the train state and are
    optimised jointly with the model (the reference feeds
    ``criterion.parameters()`` into the same optimizer — SURVEY.md §3.1).

Translation norm: l1 | l2 (mean over valid pairs).
Rotation norm:    l1 | l2 on the sign-disambiguated quaternion residual, or
                  "geodesic" = mean geodesic angle in radians (numerically
                  safe near zero error — see utils.spatial.quat_geodesic_angle
                  and SURVEY.md §7 hard-part 5).

All math is f32 regardless of the model's compute dtype: heads emit f32.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deeplio_tpu.config.schema import LossConfig
from deeplio_tpu.utils.spatial import quat_geodesic_angle, quat_normalize


def init_loss_params(cfg: LossConfig) -> Dict[str, jax.Array]:
    """Trainable loss parameters ({} for HWS; sx/sq for LWS)."""
    if cfg.active == "lws":
        return {
            "sx": jnp.asarray(cfg.sx, jnp.float32),
            "sq": jnp.asarray(cfg.sq, jnp.float32),
        }
    return {}


def _norm(residual: jax.Array, kind: str) -> jax.Array:
    """Per-pair norm over the last axis -> [...]. kind: l1|l2."""
    if kind == "l1":
        return jnp.sum(jnp.abs(residual), axis=-1)
    if kind == "l2":
        return jnp.sum(residual * residual, axis=-1)
    raise ValueError(f"unknown norm '{kind}'")


def _masked_mean(x: jax.Array, valid: Optional[jax.Array]) -> jax.Array:
    if valid is None:
        return jnp.mean(x)
    v = valid.astype(x.dtype)
    return jnp.sum(x * v) / jnp.maximum(jnp.sum(v), 1.0)


def pose_loss(
    cfg: LossConfig,
    loss_params: Dict[str, jax.Array],
    x_pred: jax.Array,
    q_pred: jax.Array,
    x_gt: jax.Array,
    q_gt: jax.Array,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Scalar loss + metrics. Shapes: x [.., 3], q [.., 4], valid [..]."""
    x_pred = x_pred.astype(jnp.float32)
    q_pred = quat_normalize(q_pred.astype(jnp.float32))
    q_gt = quat_normalize(q_gt.astype(jnp.float32))

    lx = _masked_mean(_norm(x_pred - x_gt, cfg.x_norm), valid)

    if cfg.q_norm == "geodesic":
        lq = _masked_mean(quat_geodesic_angle(q_pred, q_gt), valid)
    else:
        # Sign-disambiguate: compare against the hemisphere-matched target.
        dot = jnp.sum(q_pred * q_gt, axis=-1, keepdims=True)
        q_tgt = jnp.where(dot < 0, -q_gt, q_gt)
        lq = _masked_mean(_norm(q_pred - q_tgt, cfg.q_norm), valid)

    if cfg.active == "hws":
        total = lx + cfg.beta * lq
        metrics = {"loss": total, "loss_x": lx, "loss_q": lq}
    elif cfg.active == "lws":
        sx, sq = loss_params["sx"], loss_params["sq"]
        total = lx * jnp.exp(-sx) + sx + lq * jnp.exp(-sq) + sq
        metrics = {"loss": total, "loss_x": lx, "loss_q": lq, "sx": sx, "sq": sq}
    else:
        raise ValueError(f"unknown loss '{cfg.active}' (want hws|lws)")
    return total, metrics
