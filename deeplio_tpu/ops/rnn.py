"""Masked multi-layer LSTM/GRU via ``lax.scan`` (TPU-native RNN).

Reference capability: ``torch.nn.LSTM``-based IMU and odometry feature
encoders (``deeplio/models/nets/imu_feat_nets.py`` / ``odom_feat_nets.py``,
SURVEY.md §2.3). The reference batches variable-length IMU windows as
Python lists; XLA needs static shapes, so sequences arrive padded to a
fixed length with a validity mask and masked steps pass the carry through
unchanged — the final state equals the state after the last valid step,
bit-for-bit (SURVEY.md §7 hard-part 2).

Gate layout matches torch's (i, f, g, o for LSTM; r, z, n for GRU) and the
default init is torch's uniform(-1/sqrt(H), 1/sqrt(H)), so reference
weights could be ported for validation (hard-part 4).

Performance notes: the input projection for ALL timesteps is hoisted out of
the scan into one big matmul (MXU-friendly); only the [B,H]x[H,4H]
recurrence runs per step. Matmuls run in the module dtype (bf16 on TPU by
default) with f32 params.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class LstmCellScan(nn.Module):
    """One LSTM layer scanned over time with mask pass-through."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, reverse: bool = False):
        """x: [B, T, D]; mask: [B, T] (1=valid). Returns (outputs [B,T,H],
        final hidden [B, H])."""
        B, T, D = x.shape
        H = self.hidden_size
        k = 1.0 / jnp.sqrt(H)
        w_ih = self.param("w_ih", _uniform_init(k), (D, 4 * H), self.param_dtype)
        w_hh = self.param("w_hh", _uniform_init(k), (H, 4 * H), self.param_dtype)
        b = self.param("b", _uniform_init(k), (4 * H,), self.param_dtype)

        dt = self.dtype
        # Hoist the input projection out of the scan: one MXU matmul.
        x_proj = jnp.einsum("btd,dh->bth", x.astype(dt), w_ih.astype(dt)) + b.astype(dt)

        if reverse:
            x_proj = jnp.flip(x_proj, axis=1)
            mask = jnp.flip(mask, axis=1)

        w_hh_c = w_hh.astype(dt)

        def step(carry, inp):
            h, c = carry
            xp, m = inp
            gates = xp + h @ w_hh_c
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            m = m[:, None].astype(dt)
            h = m * h_new + (1 - m) * h
            c = m * c_new + (1 - m) * c
            return (h, c), h

        h0 = jnp.zeros((B, H), dt)
        c0 = jnp.zeros((B, H), dt)
        (h_f, _), ys = jax.lax.scan(
            step, (h0, c0), (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask, 0, 1))
        )
        ys = jnp.swapaxes(ys, 0, 1)
        if reverse:
            ys = jnp.flip(ys, axis=1)
        return ys, h_f


class GruCellScan(nn.Module):
    """One GRU layer scanned over time with mask pass-through (torch r,z,n)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, reverse: bool = False):
        B, T, D = x.shape
        H = self.hidden_size
        k = 1.0 / jnp.sqrt(H)
        w_ih = self.param("w_ih", _uniform_init(k), (D, 3 * H), self.param_dtype)
        w_hh = self.param("w_hh", _uniform_init(k), (H, 3 * H), self.param_dtype)
        b_ih = self.param("b_ih", _uniform_init(k), (3 * H,), self.param_dtype)
        b_hh = self.param("b_hh", _uniform_init(k), (3 * H,), self.param_dtype)

        dt = self.dtype
        x_proj = jnp.einsum("btd,dh->bth", x.astype(dt), w_ih.astype(dt)) + b_ih.astype(dt)
        if reverse:
            x_proj = jnp.flip(x_proj, axis=1)
            mask = jnp.flip(mask, axis=1)
        w_hh_c = w_hh.astype(dt)
        b_hh_c = b_hh.astype(dt)

        def step(h, inp):
            xp, m = inp
            hp = h @ w_hh_c + b_hh_c
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1 - z) * n + z * h
            m = m[:, None].astype(dt)
            h = m * h_new + (1 - m) * h
            return h, h

        h0 = jnp.zeros((B, H), dt)
        h_f, ys = jax.lax.scan(
            step, h0, (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask, 0, 1))
        )
        ys = jnp.swapaxes(ys, 0, 1)
        if reverse:
            ys = jnp.flip(ys, axis=1)
        return ys, h_f


class MaskedRNN(nn.Module):
    """Multi-layer, optionally bidirectional masked LSTM/GRU stack.

    Mirrors ``torch.nn.LSTM(input, hidden, num_layers, bidirectional)``
    consumption in the reference nets; returns (outputs [B, T, H*dirs],
    final [B, H*dirs]) where final concatenates directions of the last
    layer (forward state after last valid step, backward state after first).
    """

    hidden_size: int
    num_layers: int = 1
    cell: str = "lstm"  # lstm | gru
    bidirectional: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        if mask is None:
            mask = jnp.ones(x.shape[:2], jnp.float32)
        Cell = {"lstm": LstmCellScan, "gru": GruCellScan}[self.cell]
        y = x
        final = None
        for layer in range(self.num_layers):
            fwd = Cell(self.hidden_size, self.dtype, self.param_dtype,
                       name=f"l{layer}_fwd")
            ys_f, h_f = fwd(y, mask, reverse=False)
            if self.bidirectional:
                bwd = Cell(self.hidden_size, self.dtype, self.param_dtype,
                           name=f"l{layer}_bwd")
                ys_b, h_b = bwd(y, mask, reverse=True)
                y = jnp.concatenate([ys_f, ys_b], axis=-1)
                final = jnp.concatenate([h_f, h_b], axis=-1)
            else:
                y = ys_f
                final = h_f
        return y, final
