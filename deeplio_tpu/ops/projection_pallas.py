"""Pallas TPU projection kernel — optional backend to the XLA two-sort.

Single fused pass: for every point, a read-modify-write of the (row, lane)
bin keeps the minimum key ``pixel<<RQ | range_cm`` together with the
point's channels packed as two f16 pairs. The image lives in VMEM as
[H*W/128, 128] planes (key, xy, zr); points stream through SMEM in chunks
via the grid.

Status (measured on v5e, 131k points -> 64x1024):
  * per-point RMW costs ~9.5 ns marginal (scalar-loop bound); the full
    kernel measures ~20 ms/scan (output bit-identical to the packed sort
    path on random scans).
  * the XLA two-sort path does ~0.93 ms/scan (packed) — it remains the
    production default. This kernel exists as (a) the fused
    scatter-style formulation the BASELINE north-star describes, (b) a
    correctness-tested baseline for future Mosaic improvements (a megacore
    or sparsecore scatter path would change the calculus), and (c) a
    latency option for tiny batches where the sort's fixed costs dominate.

Semantics are identical to ``projection.project_batch(packed=True)``:
closest-point-wins with 1cm quantized ties broken toward the smaller point
index (the RMW uses strict ``<`` and ascending index order).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeplio_tpu.ops.projection import (
    DEFAULT_RQ_BITS,
    _pack_f16x2,
    _rq_bits_for,
    _rq_to_depth,
    _unpack_f16x2,
    spherical_uv,
)

LANES = 128
CHUNK = 16384  # points per grid step (SMEM: 3 arrays x 64KB)


def _proj_kernel(n_pix_rows: int, rq_bits: int,
                 key_ref, xy_ref, zr_ref, kmin_ref, xyo_ref, zro_ref):
    """One grid step: RMW CHUNK points into the VMEM image planes."""
    step = pl.program_id(0)
    rq_mask = (1 << rq_bits) - 1

    @pl.when(step == 0)
    def _():
        kmin_ref[:] = jnp.full((n_pix_rows, LANES), jnp.int32(2**31 - 1))
        xyo_ref[:] = jnp.zeros((n_pix_rows, LANES), jnp.int32)
        zro_ref[:] = jnp.zeros((n_pix_rows, LANES), jnp.int32)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def body(i, _):
        k = key_ref[i]
        p = jax.lax.shift_right_logical(k, rq_bits)
        # Invalid/padding points carry key INT32_MAX whose pixel bits point
        # past the image; clamp the row — they can never win (strict <
        # against an initial INT32_MAX), so the clamped RMW is a no-op.
        row = jnp.minimum(jax.lax.shift_right_logical(p, 7), n_pix_rows - 1)
        lane = jax.lax.bitwise_and(p, LANES - 1)
        cur = kmin_ref[pl.ds(row, 1), :]
        hit = (lane_iota == lane) & (k < cur)

        @pl.when(jnp.any(hit))
        def _():
            kmin_ref[pl.ds(row, 1), :] = jnp.where(hit, k, cur)
            xy = xy_ref[i]
            zr = zr_ref[i]
            cxy = xyo_ref[pl.ds(row, 1), :]
            czr = zro_ref[pl.ds(row, 1), :]
            xyo_ref[pl.ds(row, 1), :] = jnp.where(hit, xy, cxy)
            zro_ref[pl.ds(row, 1), :] = jnp.where(hit, zr, czr)
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def project_batch_pallas(
    points: jax.Array,
    valid: jax.Array,
    H: int,
    W: int,
    fov_up_deg: float,
    fov_down_deg: float,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas-backend projection; same contract as projection.project_batch
    (packed semantics). points [B,N,4], valid [B,N] -> ([B,H,W,5], [B,H,W]).
    """
    b, n = points.shape[0], points.shape[1]
    n_pix = H * W
    if n_pix % LANES:
        raise ValueError("H*W must be a multiple of 128 for the Pallas backend")
    rq_bits = _rq_bits_for(n_pix)
    rq_max = (1 << rq_bits) - 1
    rq_scale = 100.0 if rq_bits >= DEFAULT_RQ_BITS else (1 << rq_bits) / 164.0

    u, v, r = spherical_uv(points[..., :3], H, W, fov_up_deg, fov_down_deg)
    ok = valid & (r > 1e-6)
    # Invalid points route to a key that can never win (max key at pixel
    # n_pix-1 is fine: real points there use rq <= rq_max-1 and win).
    pix = v * W + u
    rq = jnp.clip((r * rq_scale).astype(jnp.int32), 0, rq_max - 1)
    key = jnp.where(ok, (pix << rq_bits) | rq, jnp.int32(2**31 - 1))
    xy = _pack_f16x2(points[..., 0], points[..., 1])
    zr = _pack_f16x2(points[..., 2], points[..., 3])

    # Pad N to a CHUNK multiple with never-winning keys.
    n_pad = (-n) % CHUNK
    if n_pad:
        key = jnp.pad(key, ((0, 0), (0, n_pad)), constant_values=2**31 - 1)
        xy = jnp.pad(xy, ((0, 0), (0, n_pad)))
        zr = jnp.pad(zr, ((0, 0), (0, n_pad)))
    n_tot = key.shape[1]
    rows = n_pix // LANES

    kern = functools.partial(_proj_kernel, rows, rq_bits)
    grid_spec = pl.GridSpec(
        grid=(n_tot // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda s: (s,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK,), lambda s: (s,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK,), lambda s: (s,), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, LANES), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    call = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        grid_spec=grid_spec,
    )

    def one(args):
        k1, x1, z1 = args
        kmin, xyo, zro = call(k1, x1, z1)
        kflat = kmin.reshape(n_pix)
        mask = (kflat != 2**31 - 1).astype(jnp.float32)
        x, y = _unpack_f16x2(xyo.reshape(n_pix))
        z, rem = _unpack_f16x2(zro.reshape(n_pix))
        depth = _rq_to_depth(kflat & rq_max, rq_scale)
        img = jnp.stack([x, y, z, rem, depth], -1) * mask[:, None]
        return img.reshape(H, W, 5), mask.reshape(H, W)

    # Sequential map over batch (the kernel owns the whole chip anyway).
    imgs, masks = jax.lax.map(one, (key, xy, zr))
    return imgs, masks
