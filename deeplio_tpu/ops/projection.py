"""Device-side spherical ("range-image") projection of LiDAR scans.

Reference capability: the numpy projection inside the DataLoader workers
(``deeplio/datasets/kitti.py`` — SqueezeSeg-style spherical projection,
SURVEY.md §2.2), which is the reference's pipeline bottleneck. Here it runs
ON DEVICE inside the compiled step, and surface normals + per-channel
normalization fuse into the same graph (BASELINE.json north-star).

Projection convention (SqueezeSeg, documented because the reference mount
was unavailable to diff against):

    r     = ||p||_2                      (euclidean range)
    yaw   = atan2(y, x)            in [-pi, pi]
    pitch = asin(z / r)
    u     = floor(0.5 * (1 - yaw/pi) * W)            clamped to [0, W-1]
    v     = floor((1 - (pitch - fov_down)/fov) * H)  clamped to [0, H-1]

Conflict resolution: the point with the smallest range wins a pixel.

TPU implementation notes (measured on v5e):
  * XLA scatter is serialized on TPU: a straightforward ``.at[pix].min``
    projection runs at ~100-150 scans/s — unusable.
  * ``jax.lax.sort`` is fast. The production path is **sort + jump
    compaction**: append one sentinel row per pixel (so every pixel has at
    least one element), stable-sort everything by a single int32 key
    ``pixel << RQ_BITS | quantized_range`` (index breaks ties), mark
    run-starts (= per-pixel winners, already in pixel order), then route
    the winners to the front with LSB-first power-of-2 jumps
    (_jump_compact) — each winner's destination is its pixel id. Zero
    scatters, zero gathers: ~1374 scans/s (packed) for 131k-point/64x1024
    scans on one v5e chip vs ~100-150 for scatter. Range ties inside one
    quantization step (1 cm default) break toward the smaller point index.
  * vmap'ing scatter/gather lowers to slow batched ops — this module is
    written batch-explicit instead.

All shapes are static: scans are padded/truncated to ``max_points`` with a
validity mask, so the whole pipeline jits once.

Layout: images are NHWC (..., H, W, C) — channels-last for TPU convs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deeplio_tpu.config.schema import ProjectionConfig

# Range quantization for the combined sort key: 1cm steps. RQ_MAX is
# reserved for the per-pixel sentinel rows, real ranges clamp to RQ_MAX-1.
DEFAULT_RQ_BITS = 14


def _rq_bits_for(n_pix: int) -> int:
    """Largest quantization width so (n_pix << bits) | mask fits in int31."""
    bits = DEFAULT_RQ_BITS
    while bits > 8 and (n_pix + 1) << bits >= 2**31:
        bits -= 1
    if (n_pix + 1) << bits >= 2**31:
        raise ValueError(f"image with {n_pix} pixels too large for int32 sort key")
    return bits


def spherical_uv(
    xyz: jax.Array, H: int, W: int, fov_up_deg: float, fov_down_deg: float
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-point (u, v, range). xyz: [..., 3] -> int32 u, v and f32 r."""
    return spherical_uv_planes(xyz[..., 0], xyz[..., 1], xyz[..., 2],
                               H, W, fov_up_deg, fov_down_deg)


def spherical_uv_planes(
    x: jax.Array, y: jax.Array, z: jax.Array,
    H: int, W: int, fov_up_deg: float, fov_down_deg: float
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Plane-input spherical_uv (SoA hot path: no channel-minor slicing)."""
    r = jnp.sqrt(x * x + y * y + z * z)
    r_safe = jnp.maximum(r, 1e-9)
    yaw = jnp.arctan2(y, x)
    pitch = jnp.arcsin(jnp.clip(z / r_safe, -1.0, 1.0))
    fov_down = np.float32(np.deg2rad(fov_down_deg))
    fov = np.float32(np.deg2rad(fov_up_deg - fov_down_deg))
    u = jnp.floor(0.5 * (1.0 - yaw / np.float32(np.pi)) * W).astype(jnp.int32)
    v = jnp.floor((1.0 - (pitch - fov_down) / fov) * H).astype(jnp.int32)
    u = jnp.clip(u, 0, W - 1)
    v = jnp.clip(v, 0, H - 1)
    return u, v, r


def _pack_f16x2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Two f32 arrays -> one int32 array of (f16(a) | f16(b) << 16)."""
    ia = jax.lax.bitcast_convert_type(
        jax.lax.convert_element_type(a, jnp.float16), jnp.uint16).astype(jnp.uint32)
    ib = jax.lax.bitcast_convert_type(
        jax.lax.convert_element_type(b, jnp.float16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(ia | (ib << 16), jnp.int32)


def _unpack_f16x2(p: jax.Array) -> Tuple[jax.Array, jax.Array]:
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    a = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16), jnp.float16)
    b = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16), jnp.float16)
    return a.astype(jnp.float32), b.astype(jnp.float32)


def _jump_compact(keep, dest, arrays, out_len):
    """Stable compaction: move keep-marked elements of [B, M] arrays left to
    their ``dest`` positions (monotone over keeps, distinct) and return
    ``(arrays, live)`` — the first ``out_len`` columns of each array plus the
    occupancy mask (True where a routed element actually landed).

    LSB-first power-of-2 jump routing. Collision-freedom REQUIRES the
    displacement sequence (pos - dest) to be non-decreasing over keeps: two
    elements meeting at one slot at round k would need displacements that
    violate monotonicity (both are ==0 mod 2^k, differ in bit k, and the
    later one's displacement would have to be smaller). Callers guarantee
    this two ways: sentinel routing (one sentinel per pixel -> dest advances
    by exactly 1 per keep) or rank routing (dest = cumsum(keep)-1, which
    advances by exactly 1 by construction). (A sentinel-FREE variant routing
    winners rightward DIRECTLY to N+pixel is ~1.36x faster but WRONG — pixel
    gaps break monotonicity; measured and rejected, see docs/performance.md.
    The correct sentinel-free placement is rank-compact + _jump_expand.)
    log2(M) rounds of roll+select — no sort, no scatter, no gather.
    """
    b, m = keep.shape
    rounds = max(int(np.ceil(np.log2(max(m, 2)))), 1)
    pos = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m))
    delta = jnp.where(keep, pos - dest, 0)
    live = keep
    for k in range(rounds):
        d = 1 << k
        move = live & (((delta >> k) & 1) == 1)
        move_in = jnp.roll(move, -d, axis=1)
        arrays = [jnp.where(move_in, jnp.roll(a, -d, axis=1), a) for a in arrays]
        delta = jnp.where(move_in, jnp.roll(delta, -d, axis=1) - d, delta)
        live = (live & ~move) | move_in
    return [a[:, :out_len] for a in arrays], live[:, :out_len]


def _jump_expand(live, dest, arrays):
    """Inverse of :func:`_jump_compact`: scatter live elements of [B, M]
    arrays RIGHT to their ``dest`` positions (strictly increasing over
    lives, dest[i] >= i). Returns ``(arrays, landed)`` where ``landed``
    marks positions that received an element; other slots hold stale
    values the caller must mask.

    MSB-first power-of-2 jump routing — the exact time-reversal of the
    LSB-first compaction: an expansion with displacements (dest - pos)
    non-decreasing over lives is the round-reversed replay of a compaction
    with those same displacements (which are non-decreasing over its keeps,
    hence collision-free), so it is collision-free too. Strictly increasing
    integer dest gives dest[i+1]-(i+1) >= dest[i]-i, satisfying the
    invariant. No wraparound: delta <= M-1-pos, so pos+2^k never passes M.
    """
    b, m = live.shape
    rounds = max(int(np.ceil(np.log2(max(m, 2)))), 1)
    pos = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m))
    delta = jnp.where(live, dest - pos, 0)
    for k in reversed(range(rounds)):
        d = 1 << k
        move = live & (((delta >> k) & 1) == 1)
        move_in = jnp.roll(move, d, axis=1)
        arrays = [jnp.where(move_in, jnp.roll(a, d, axis=1), a) for a in arrays]
        delta = jnp.where(move_in, jnp.roll(delta, d, axis=1) - d, delta)
        live = (live & ~move) | move_in
    return arrays, live


def _seg_min_scan(boundary, val, payloads=()):
    """Forward inclusive SEGMENTED argmin-scan over [B, N] int32 values.

    ``boundary[i]`` True marks the start of a new segment at i. After the
    scan, position i holds min(val[seg_start..i]) and each payload holds the
    minimizing element's payload; a segment's LAST position holds the
    full-segment winner. Hillis-Steele doubling with the standard
    segmented-scan monoid (flag OR, value absorbed from the left only while
    no boundary has been crossed): log2(N) rounds of roll+min+select.
    Returns (mins, payloads_at_min).
    """
    b, n = val.shape
    rounds = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    big = jnp.int32(np.iinfo(np.int32).max)
    col = jnp.arange(n, dtype=jnp.int32)
    # f tracks "boundary inside the current (2^k)-window". The classic
    # extra origin-fill is unnecessary: positions j < 2^k get big-filled
    # m_prev (take false) and positions j >= 2^k can't see the origin.
    f = boundary
    m = val
    ps = list(payloads)
    for k in range(rounds):
        d = 1 << k
        in_range = col >= d
        m_prev = jnp.where(in_range, jnp.roll(m, d, axis=1), big)
        take_prev = ~f & (m_prev < m)
        m = jnp.where(take_prev, m_prev, m)
        ps = [jnp.where(take_prev, jnp.roll(p, d, axis=1), p) for p in ps]
        f = f | jnp.where(in_range, jnp.roll(f, d, axis=1), False)
    return m, ps


def project_batch(
    points: jax.Array,
    valid: jax.Array,
    H: int,
    W: int,
    fov_up_deg: float,
    fov_down_deg: float,
    packed: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Project a batch of padded scans to dense multi-channel range images.

    The production TPU path (two-sort compaction, see module docstring).

    Args:
      points: [B, N, 4] float32 (x, y, z, remission), padded.
      valid:  [B, N] bool validity mask.
      packed: carry (x,y) and (z,remission) as f16 pairs through the sorts
        and reconstruct range from the quantized key — 3 sorted arrays
        instead of 6, measured ~1.65x faster on v5e. Costs f16 rounding on
        the xyz/remission channels (<= 3cm below 64m range) and 1cm
        quantization on the range channel; the throughput/training configs
        use it, exact mode remains the default for parity.

    Returns:
      img:  [B, H, W, 5] float32 — channels (x, y, z, remission, range);
            empty pixels are 0.
      mask: [B, H, W] float32 — 1.0 where a point landed.
    """
    b, n = points.shape[0], points.shape[1]
    n_pix = H * W
    rq_bits = _rq_bits_for(n_pix)
    rq_max = (1 << rq_bits) - 1
    # 1cm steps unless the key budget forces coarser.
    rq_scale = 100.0 if rq_bits >= DEFAULT_RQ_BITS else (1 << rq_bits) / 164.0

    xyz = points[..., :3]
    u, v, r = spherical_uv(xyz, H, W, fov_up_deg, fov_down_deg)
    ok = valid & (r > 1e-6)
    pix = jnp.where(ok, v * W + u, n_pix)
    rq = jnp.clip((r * rq_scale).astype(jnp.int32), 0, rq_max - 1)
    key = (pix << rq_bits) | jnp.where(ok, rq, rq_max - 1)

    # Sentinel rows: one per pixel, guaranteed to lose to any real point
    # (rq == rq_max) and to make every pixel's run non-empty.
    sent = (jnp.arange(n_pix, dtype=jnp.int32) << rq_bits) | rq_max
    key_all = jnp.concatenate([key, jnp.broadcast_to(sent, (b, n_pix))], axis=1)
    if packed:
        zpad_i = jnp.zeros((b, n_pix), jnp.int32)
        ch_all = [
            jnp.concatenate([_pack_f16x2(points[..., 0], points[..., 1]), zpad_i], 1),
            jnp.concatenate([_pack_f16x2(points[..., 2], points[..., 3]), zpad_i], 1),
        ]
    else:
        ch = (points[..., 0], points[..., 1], points[..., 2], points[..., 3], r)
        zpad = jnp.zeros((b, n_pix), jnp.float32)
        ch_all = [jnp.concatenate([c, zpad], axis=1) for c in ch]

    outs = jax.lax.sort((key_all, *ch_all), num_keys=1, is_stable=True, dimension=-1)
    key_s, ch_s = outs[0], outs[1:]
    pix_s = key_s >> rq_bits

    # Run-starts are the per-pixel winners, already in pixel order.
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), pix_s[:, 1:] != pix_s[:, :-1]], axis=1
    )
    keep = first & (pix_s < n_pix)
    # Compaction: each winner's destination IS its pixel id (sentinels
    # guarantee exactly one winner per pixel). LSB-first jump routing is
    # ~1.36x faster than a second stable sort on v5e and bit-identical.
    compacted, _ = _jump_compact(keep, pix_s, [key_s, *ch_s], n_pix)
    key_c, ch_c = compacted[0], compacted[1:]

    # A pixel is empty iff its winner is the sentinel (low bits == rq_max).
    mask = ((key_c & rq_max) != rq_max).astype(jnp.float32)
    if packed:
        x, y = _unpack_f16x2(ch_c[0])
        z, rem = _unpack_f16x2(ch_c[1])
        depth = _rq_to_depth(key_c & rq_max, rq_scale)
        img = jnp.stack([x, y, z, rem, depth], -1) * mask[..., None]
    else:
        img = jnp.stack(ch_c, -1) * mask[..., None]
    return img.reshape(b, H, W, 5), mask.reshape(b, H, W)


def _pad_cols(width: int, *arrays):
    """Zero-pad [B, M] arrays on the column axis up to ``width`` (no-op when
    already wide enough). Expansion must run at the full pixel width even
    when the scan capacity is smaller."""
    m = arrays[0].shape[1]
    if m >= width:
        return arrays
    return tuple(jnp.pad(a, ((0, 0), (0, width - m))) for a in arrays)


def _rq_to_depth(rq: jax.Array, rq_scale: float) -> jax.Array:
    """Quantized range key -> metres. MULTIPLY by the f32 reciprocal,
    never divide: XLA rewrites fp division-by-constant into reciprocal
    multiplies inside large fusions but not in eager/small graphs, so a
    divide here is 1-ulp unstable ACROSS COMPILATION REGIMES (measured:
    1427/100 differs between the eager ring path and the same math
    compiled inside the aligned route's lax.cond). The multiply is one
    exact-rounded op in every regime, keeping all projection
    backends/routes bit-identical to each other."""
    return rq.astype(jnp.float32) * jnp.float32(1.0 / rq_scale)


def _idx_key_layout(n: int, n_pix: int) -> Tuple[int, int, float]:
    """(idx_bits, rq_bits, rq_scale) for keys that carry (range, index).

    The per-point key is ``rq << idx_bits | idx``; taking its min gives the
    closest point with ties broken toward the SMALLEST index — the oracle's
    first-point-wins rule. rq_bits shrinks below the 1cm default only when
    idx_bits eats the int31 budget.
    """
    idx_bits = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    rq_bits = min(DEFAULT_RQ_BITS, 30 - idx_bits)
    if rq_bits < 8:
        raise ValueError(f"scan capacity {n} too large for int32 (range, idx) keys")
    rq_scale = 100.0 if rq_bits >= DEFAULT_RQ_BITS else (1 << rq_bits) / 164.0
    return idx_bits, rq_bits, rq_scale


def _gather_winners(points, r, win_idx, landed, rq_ok, b, H, W):
    """Fetch winner payloads by index and assemble the dense 5ch image.

    One [B, n_pix] gather per channel from the ORIGINAL f32 points — the
    placement machinery only ever routes (key, index) pairs, so payloads
    stay exact f32 with no packing loss.
    """
    mask = (landed & rq_ok).astype(jnp.float32)
    safe = jnp.where(landed & rq_ok, win_idx, 0)
    pts = jnp.take_along_axis(points, safe[..., None], axis=1)      # [B,P,4]
    rr = jnp.take_along_axis(r, safe, axis=1)                        # [B,P]
    img = jnp.concatenate([pts, rr[..., None]], -1) * mask[..., None]
    return img.reshape(b, H, W, 5), mask.reshape(b, H, W)


def project_batch_sorted(
    points: jax.Array,
    valid: jax.Array,
    H: int,
    W: int,
    fov_up_deg: float,
    fov_down_deg: float,
    payload: str = "carry",
) -> Tuple[jax.Array, jax.Array]:
    """Sentinel-free sort projection: same semantics as :func:`project_batch`
    (exact mode), less work. Handles ARBITRARY point order.

    vs the sentinel path: the sort runs on N elements instead of N + H*W
    (-33% at 131k/64x1024); winners (run starts) are rank-compacted
    (dest = cumsum-1, displacement monotone by construction) then routed to
    their pixels with the MSB-first expansion (dest = pixel id, strictly
    increasing, monotone by construction). Winner selection is bit-identical
    to project_batch: same quantized-range key, same first-index tie-break.

    ``payload``: "carry" routes exact f32 channels through sort+routing
    (production; range recomputed from xyz), "carry-f16" packs channel
    pairs into int32 (less sort traffic, <=3cm rounding), "gather" routes
    the point index and take_along_axis-es the channels at the end (exact
    but the gather is ~6x the routing cost on v5e — decision record).
    """
    b, n = points.shape[0], points.shape[1]
    n_pix = H * W
    rq_bits = _rq_bits_for(n_pix)
    rq_max = (1 << rq_bits) - 1
    rq_scale = 100.0 if rq_bits >= DEFAULT_RQ_BITS else (1 << rq_bits) / 164.0

    xyz = points[..., :3]
    u, v, r = spherical_uv(xyz, H, W, fov_up_deg, fov_down_deg)
    ok = valid & (r > 1e-6)
    pix = jnp.where(ok, v * W + u, n_pix)
    rq = jnp.clip((r * rq_scale).astype(jnp.int32), 0, rq_max - 1)
    key = (pix << rq_bits) | jnp.where(ok, rq, rq_max - 1)

    if payload == "carry":
        chans = [points[..., 0], points[..., 1], points[..., 2],
                 points[..., 3]]
    elif payload == "carry-f16":
        chans = [_pack_f16x2(points[..., 0], points[..., 1]),
                 _pack_f16x2(points[..., 2], points[..., 3])]
    elif payload == "gather":
        chans = [jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))]
    else:
        raise ValueError(f"unknown sorted payload mode {payload!r}")

    key_s, *ch_s = jax.lax.sort((key, *chans), num_keys=1, is_stable=True,
                                dimension=-1)
    pix_s = key_s >> rq_bits
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), pix_s[:, 1:] != pix_s[:, :-1]], axis=1)
    keep = first & (pix_s < n_pix)

    rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    (wpix, wkey, *wch), wlive = _jump_compact(
        keep, rank, [pix_s, key_s, *ch_s], min(n, n_pix))
    padded = _pad_cols(n_pix, wpix, wkey, wlive, *wch)
    wpix, wkey, wlive, wch = padded[0], padded[1], padded[2], padded[3:]
    (ekey, *ech), landed = _jump_expand(wlive, wpix, [wkey, *wch])
    mask = landed.astype(jnp.float32)

    if payload == "gather":
        return _gather_winners(points, r, ech[0], landed, True, b, H, W)
    if payload == "carry-f16":
        x, y = _unpack_f16x2(ech[0])
        z, rem = _unpack_f16x2(ech[1])
        depth = _rq_to_depth(ekey & rq_max, rq_scale)
    else:
        x, y, z, rem = ech
        depth = jnp.sqrt(x * x + y * y + z * z)
    img = jnp.stack([x, y, z, rem, depth], -1) * mask[..., None]
    return img.reshape(b, H, W, 5), mask.reshape(b, H, W)


def _seg_min_scan_tiled(boundary, val, payloads=(), lane=512):
    """Two-level variant of :func:`_seg_min_scan` — same results, fewer
    full-width passes.

    Hillis-Steele over [B, N] costs log2(N)=17 rounds each touching all N
    elements. Reshaping to [B, N/lane, lane] splits the scan into
    (a) 9 intra-row rounds over the lane axis (the only full-width work),
    (b) an aggregate combine over the N/lane row summaries (negligible
    width) with the standard segmented-min monoid, and (c) one broadcast
    fixup pass applying each row's carry-in to its pre-first-boundary
    prefix. 10 full-width passes instead of 17 for N=131072.

    Requires N % lane == 0 (projection capacities are powers of two);
    falls back to the flat scan otherwise.
    """
    b, n = val.shape
    if n % lane or n // lane < 2:
        return _seg_min_scan(boundary, val, payloads)
    rrows = n // lane
    big = jnp.int32(np.iinfo(np.int32).max)
    shp = (b, rrows, lane)
    g = boundary.reshape(shp)              # boundary OR over the 2^k-window
    m = val.reshape(shp)
    ps = [p.reshape(shp) for p in payloads]
    col = jnp.arange(lane, dtype=jnp.int32)

    # (a) intra-row segmented min-scan. g alone suffices as the stop flag:
    # in-range positions (j >= 2^k) have windows that can't reach the row
    # origin, and out-of-range ones get big-filled m_prev anyway.
    for k in range(int(np.log2(lane))):
        d = 1 << k
        in_range = col >= d
        m_prev = jnp.where(in_range, jnp.roll(m, d, axis=-1), big)
        take = ~g & (m_prev < m)
        m = jnp.where(take, m_prev, m)
        ps = [jnp.where(take, jnp.roll(p, d, axis=-1), p) for p in ps]
        g = g | jnp.where(in_range, jnp.roll(g, d, axis=-1), False)

    # (b) row aggregates -> inclusive segmented scan over the row axis.
    F = g[..., -1]                              # row contains a boundary
    M = m[..., -1]                              # row suffix-min since last boundary
    Ps = [p[..., -1] for p in ps]
    S_m, S_ps = _seg_min_scan(F, M, Ps)
    # carry-in for row r = combine of rows < r (exclusive shift; row 0 none).
    cm = jnp.concatenate([jnp.full((b, 1), big), S_m[:, :-1]], axis=1)
    cps = [jnp.concatenate([jnp.zeros((b, 1), p.dtype), p[:, :-1]], axis=1)
           for p in S_ps]

    # (c) fixup: positions before their row's first REAL boundary absorb
    # the carry when it is strictly smaller (ties keep the later value,
    # impossible for idx-bearing keys).
    take = ~g & (cm[..., None] < m)
    m = jnp.where(take, cm[..., None], m)
    ps = [jnp.where(take, c[..., None], p) for p, c in zip(ps, cps)]
    return m.reshape(b, n), [p.reshape(b, n) for p in ps]


def project_batch_ring(
    points: jax.Array,
    valid: jax.Array,
    H: int,
    W: int,
    fov_up_deg: float,
    fov_down_deg: float,
    payload: str = "carry",
) -> Tuple[jax.Array, jax.Array]:
    """SORT-FREE projection for ring-ordered scans.

    Contract: over VALID points, the pixel index v*W+u is NON-DECREASING
    along the point axis. Real spinning LiDAR streams are ring-major with
    azimuth monotone inside each ring (the reference's KITTI .bin layout);
    when each ring maps to one image row top-to-bottom, the flattened pixel
    sequence is monotone and every pixel's candidates are CONTIGUOUS — so a
    segmented min-scan replaces the sort entirely. Use
    :func:`check_ring_order` / the loader's canonicalizer to establish the
    contract. Violations degrade GRACEFULLY, never corrupt: the running max
    below reassigns any backward-jumping point to the previous pixel, where
    it competes on range like any other candidate (so routing invariants
    hold unconditionally); only the offending points can land one pixel
    off. Heavily unordered scans should use the sort backends.

    Pipeline (all roll/min/select — no sort, no scatter):
      1. per-point (u, v, range); invalid points inherit the previous valid
         pixel via a running max (keeps runs contiguous) and carry an
         infinite range key (lose every contest),
      2. segmented argmin-scan of (rq << idx_bits | idx): each run's LAST
         slot holds its winner (closest, first-index tie-break = oracle
         rule) and the winner's channel payloads,
      3. rank-compact the run winners, MSB-expand to dest = pixel id
         (strictly increasing across runs by the contract).

    ``payload`` selects how winner channels reach their pixel:
      * "carry": x,y,z,remission ride the scan/routing as exact f32 arrays
        (range recomputed from xyz — bit-exact). Production default.
      * "carry-f16": channels ride as two packed-f16 int32 arrays (~40%
        less routed traffic; <=3cm xyz rounding, range from the quantized
        key).
      * "gather": route only (key, index), then take_along_axis the f32
        points. Exact but MEASURED SLOW: the [B, H*W] gather costs ~6x the
        whole scan+routing on v5e (1.13 of 1.32 ms/scan) — kept as the
        decision record and for parity cross-checks.
    """
    b, n = points.shape[0], points.shape[1]
    n_pix = H * W
    idx_bits, rq_bits, rq_scale = _idx_key_layout(n, n_pix)
    rq_max = (1 << rq_bits) - 1

    xyz = points[..., :3]
    u, v, r = spherical_uv(xyz, H, W, fov_up_deg, fov_down_deg)
    ok = valid & (r > 1e-6)
    pix = jnp.where(ok, v * W + u, -1)
    pix = jax.lax.cummax(pix, axis=1)          # carry last valid pixel
    pix = jnp.maximum(pix, 0)                  # leading-invalid prefix
    rq = jnp.clip((r * rq_scale).astype(jnp.int32), 0, rq_max - 1)
    rqv = jnp.where(ok, rq, rq_max)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    mkey = (rqv << idx_bits) | idx

    if payload == "carry":
        chans = [points[..., 0], points[..., 1], points[..., 2],
                 points[..., 3]]
    elif payload == "carry-f16":
        chans = [_pack_f16x2(points[..., 0], points[..., 1]),
                 _pack_f16x2(points[..., 2], points[..., 3])]
    elif payload == "gather":
        chans = []
    else:
        raise ValueError(f"unknown ring payload mode {payload!r}")

    start = jnp.concatenate(
        [jnp.ones((b, 1), bool), pix[:, 1:] != pix[:, :-1]], axis=1)
    mins, wch = _seg_min_scan_tiled(start, mkey, chans)
    end = jnp.concatenate(
        [pix[:, 1:] != pix[:, :-1], jnp.ones((b, 1), bool)], axis=1)

    rank = jnp.cumsum(end.astype(jnp.int32), axis=1) - 1
    (wpix, wkey, *wch), wlive = _jump_compact(
        end, rank, [pix, mins, *wch], min(n, n_pix))
    padded = _pad_cols(n_pix, wpix, wkey, wlive, *wch)
    wpix, wkey, wlive, wch = padded[0], padded[1], padded[2], padded[3:]
    (ekey, *ech), landed = _jump_expand(wlive, wpix, [wkey, *wch])
    rq_ok = (ekey >> idx_bits) < rq_max
    mask = (landed & rq_ok).astype(jnp.float32)

    if payload == "gather":
        return _gather_winners(points, r, ekey & ((1 << idx_bits) - 1),
                               landed, rq_ok, b, H, W)
    if payload == "carry-f16":
        x, y = _unpack_f16x2(ech[0])
        z, rem = _unpack_f16x2(ech[1])
        depth = _rq_to_depth(ekey >> idx_bits, rq_scale)
    else:
        x, y, z, rem = ech
        depth = jnp.sqrt(x * x + y * y + z * z)
    img = jnp.stack([x, y, z, rem, depth], -1) * mask[..., None]
    return img.reshape(b, H, W, 5), mask.reshape(b, H, W)


def check_ring_order(points: np.ndarray, valid: np.ndarray, H: int, W: int,
                     fov_up_deg: float, fov_down_deg: float) -> bool:
    """Host-side check of the :func:`project_batch_ring` contract: pixel
    index non-decreasing over valid points of one [N, 4] scan."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r = np.sqrt(x * x + y * y + z * z)
    yaw = np.arctan2(y, x)
    pitch = np.arcsin(np.clip(z / np.maximum(r, 1e-9), -1.0, 1.0))
    fov_down = np.float32(np.deg2rad(fov_down_deg))
    fov = np.float32(np.deg2rad(fov_up_deg - fov_down_deg))
    uu = np.clip(np.floor(0.5 * (1.0 - yaw / np.float32(np.pi)) * W), 0, W - 1)
    vv = np.clip(np.floor((1.0 - (pitch - fov_down) / fov) * H), 0, H - 1)
    pix = (vv * W + uu)[np.asarray(valid, bool) & (r > 1e-6)]
    return bool(np.all(np.diff(pix) >= 0))


def aligned_route_feasible(n: int, H: int, W: int) -> bool:
    """Static shape gate for :func:`project_batch_ring_aligned_planes`:
    the scan capacity must be a whole number of slots per pixel."""
    n_pix = H * W
    return n_pix > 0 and n % n_pix == 0 and n // n_pix >= 1


def _slot_pixel(n: int, H: int, W: int) -> jax.Array:
    """Pixel id each slot of an aligned ring grid belongs to: slot s of a
    [H rings x W*SPP azimuth-slots] row-major grid covers pixel
    (s // (W*SPP)) * W + (s % (W*SPP)) // SPP."""
    spp = n // (H * W)
    slot = jnp.arange(n, dtype=jnp.int32)
    return (slot // (W * spp)) * W + (slot % (W * spp)) // spp


def project_batch_ring_aligned_planes(
    x: jax.Array,
    y: jax.Array,
    z: jax.Array,
    rem: jax.Array,
    valid: jax.Array,
    H: int,
    W: int,
    fov_up_deg: float,
    fov_down_deg: float,
    check: str = "cond",
    fallback=None,
) -> Tuple[jax.Array, jax.Array]:
    """SLOT-ALIGNED direct projection — no scan, no sort, no routing.

    Contract (stronger than :func:`project_batch_ring`'s monotone order):
    the scan is a fixed ring/azimuth GRID of n = H*W*SPP slots, row-major
    by ring, and every VALID point's pixel equals its slot's pixel
    (v == ring row, u == azimuth_slot // SPP). Under that contract the
    candidates of pixel p are exactly its SPP consecutive slots, so the
    winner is a plain windowed min of the (rq << idx_bits | idx) key —
    a handful of fused XLA elementwise rounds instead of the Mosaic
    kernel's ~170 roll rounds (the whole placement problem is solved by
    the data layout). Invalid slots carry losing keys (rq_max), so
    dropped returns / padding need no special casing: an all-invalid
    pixel's "winner" keeps rq_max and is masked out, bit-identical to the
    ring paths' empty-pixel handling.

    The contract holds exactly for the synthetic ring fixture
    (data/synthetic.py::synthetic_ring_batch — u = floor(slot/SPP) for
    every jitter draw) and for any loader that bins real scans to the
    azimuth grid. ``check`` selects what happens elsewhere:

      * "cond" (default): an O(N) alignment predicate is computed and
        ``lax.cond`` dispatches to ``fallback`` (a (x,y,z,rem,valid) ->
        (img5, mask) fn, REQUIRED) whenever any valid point is off its
        slot pixel — exact for arbitrary inputs.
      * "assert-off": trust the contract, skip the predicate (saves one
        fused pass). Misaligned valid points land at their SLOT's pixel
        instead of their true pixel — same degradation class as
        project_batch_ring's backward-jump rule, never corrupting.

    Output contract identical to ``project_batch_ring(payload="carry-f16")``
    / the Mosaic kernel: channels round-trip f16, depth comes from the
    quantized range key.
    """
    b, n = x.shape[0], x.shape[1]
    n_pix = H * W
    if not aligned_route_feasible(n, H, W):
        raise ValueError(
            f"aligned ring route needs n % (H*W) == 0, got n={n}, "
            f"H*W={n_pix}")
    spp = n // n_pix
    if check not in ("cond", "assert-off"):
        raise ValueError(f"check must be cond|assert-off, got {check!r}")
    if check == "cond" and fallback is None:
        raise ValueError("check='cond' requires a fallback projector")
    idx_bits, rq_bits, rq_scale = _idx_key_layout(n, n_pix)
    rq_max = (1 << rq_bits) - 1

    def direct(x, y, z, rem, valid, r):
        ok = valid & (r > 1e-6)
        rq = jnp.clip((r * rq_scale).astype(jnp.int32), 0, rq_max - 1)
        rqv = jnp.where(ok, rq, rq_max)
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
        wk = (rqv << idx_bits) | idx
        wp1 = _pack_f16x2(x, y)
        wp2 = _pack_f16x2(z, rem)
        # Windowed min over each pixel's SPP consecutive slots. Doubling
        # rounds run while the window stays inside spp (after them slot s
        # holds the min over [s, s+d), d = largest power of two <= spp);
        # for non-power-of-two spp one final OVERLAPPING round at shift
        # spp-d merges [s, s+d) with [s+spp-d, s+spp), which covers
        # [s, s+spp) exactly because d > spp/2 — min is idempotent, so
        # the overlap is harmless. Group starts (s = p*SPP <= n - SPP)
        # never read wrapped lanes: s + spp - 1 <= n - 1.
        def contest(state, shift):
            wk, wp1, wp2 = state
            sk = jnp.roll(wk, -shift, axis=-1)
            take = sk < wk
            wk = jnp.where(take, sk, wk)
            wp1 = jnp.where(take, jnp.roll(wp1, -shift, axis=-1), wp1)
            wp2 = jnp.where(take, jnp.roll(wp2, -shift, axis=-1), wp2)
            return wk, wp1, wp2

        d = 1
        while d * 2 <= spp:
            wk, wp1, wp2 = contest((wk, wp1, wp2), d)
            d *= 2
        if d < spp:
            wk, wp1, wp2 = contest((wk, wp1, wp2), spp - d)
        wk = wk[:, ::spp]
        rq_out = wk >> idx_bits
        maskf = (rq_out < rq_max).astype(jnp.float32)
        # zero losing payloads: garbage bits at invalid slots unpack to
        # f16 NaN which the mask multiply (0 * NaN) cannot remove.
        live = rq_out < rq_max
        xw, yw = _unpack_f16x2(jnp.where(live, wp1[:, ::spp], 0))
        zw, rw = _unpack_f16x2(jnp.where(live, wp2[:, ::spp], 0))
        depth = _rq_to_depth(rq_out, rq_scale)
        img = jnp.stack([xw, yw, zw, rw, depth], -1) * maskf[..., None]
        return img.reshape(b, H, W, 5), maskf.reshape(b, H, W)

    u, v, r = spherical_uv_planes(x, y, z, H, W, fov_up_deg, fov_down_deg)
    if check == "assert-off":
        return direct(x, y, z, rem, valid, r)

    ok = valid & (r > 1e-6)
    aligned = jnp.all(jnp.where(ok, v * W + u == _slot_pixel(n, H, W)[None],
                                True))
    return jax.lax.cond(
        aligned,
        lambda ops: direct(*ops),
        lambda ops: fallback(*ops[:5]),
        (x, y, z, rem, valid, r))


def halves_permutation(n: int, H: int, W: int) -> np.ndarray:
    """HOST-side permutation taking an interleaved slot-aligned scan to the
    dual-half layout :func:`project_batch_ring_halves_planes` consumes:
    slot s (pixel s//spp, residue s%spp) moves to position
    (s % spp) * n_pix + s // spp — all residue-0 candidates first, then
    residue-1, ... Each residue block is pixel-major, so the device-side
    contest reads CONTIGUOUS [B, n_pix] blocks (no strided lane slices,
    which XLA lowers as transpose fusions — measured 2.2 ms/step at the
    flagship). Returns idx such that new_plane = plane[idx]."""
    spp = n // (H * W)
    s = np.arange(n, dtype=np.int64)
    inv = (s % spp) * (H * W) + s // spp
    out = np.empty(n, np.int64)
    out[inv] = s
    return out


def project_batch_ring_halves_planes(
    x: jax.Array,
    y: jax.Array,
    z: jax.Array,
    rem: jax.Array,
    valid: jax.Array,
    H: int,
    W: int,
    fov_up_deg: float,
    fov_down_deg: float,
) -> Tuple[jax.Array, jax.Array]:
    """Slot-aligned projection over DUAL-HALF planes — the fastest route
    measured on-chip (driver-protocol A/B 2026-08-19: 4767.0 vs trust's
    4075.2 pairs/s/chip at the flagship; docs/performance.md ledger).

    Data contract (:func:`halves_permutation` on top of the slot grid):
    plane position r*n_pix + p holds pixel p's residue-r candidate. The
    per-pixel contest is then a fold over spp CONTIGUOUS [B, n_pix]
    blocks: pure elementwise min/select, no scan, no routing, no strided
    slices, no f16 packing — and therefore EXACT f32 payloads with depth
    = the winner's true range, i.e. ``project_batch_ring(payload="carry")``
    output semantics (the winner itself is still picked by the quantized
    (range, earlier-candidate) key rule all backends share).

    There is no runtime predicate (the permutation destroys the ring
    order a fallback would need): config gates this route to data that is
    grid-aligned BY CONSTRUCTION, like kernel-aligned=trust.
    """
    b, n = x.shape[0], x.shape[1]
    n_pix = H * W
    if not aligned_route_feasible(n, H, W):
        raise ValueError(
            f"halves ring route needs n % (H*W) == 0, got n={n}, "
            f"H*W={n_pix}")
    spp = n // n_pix
    _, rq_bits, rq_scale = _idx_key_layout(n, n_pix)
    rq_max = (1 << rq_bits) - 1

    r = jnp.sqrt(x * x + y * y + z * z)
    ok = valid & (r > 1e-6)
    rq = jnp.clip((r * rq_scale).astype(jnp.int32), 0, rq_max - 1)
    rqv = jnp.where(ok, rq, rq_max)

    def blk(a, i):
        return a[:, i * n_pix:(i + 1) * n_pix]

    wk = blk(rqv, 0)
    wx, wy, wz, wrem, wr = (blk(a, 0) for a in (x, y, z, rem, r))
    wok = blk(ok, 0)
    for i in range(1, spp):
        ki = blk(rqv, i)
        take = ki < wk  # strict: earlier residue = smaller original
        wk = jnp.where(take, ki, wk)  # index, wins quantized-range ties
        wx = jnp.where(take, blk(x, i), wx)
        wy = jnp.where(take, blk(y, i), wy)
        wz = jnp.where(take, blk(z, i), wz)
        wrem = jnp.where(take, blk(rem, i), wrem)
        wr = jnp.where(take, blk(r, i), wr)
        wok = jnp.where(take, blk(ok, i), wok)
    maskf = wok.astype(jnp.float32)
    img = jnp.stack([wx, wy, wz, wrem, wr], -1) * maskf[..., None]
    return img.reshape(b, H, W, 5), maskf.reshape(b, H, W)


def project_scan(
    points: jax.Array,
    valid: jax.Array,
    H: int,
    W: int,
    fov_up_deg: float,
    fov_down_deg: float,
) -> Tuple[jax.Array, jax.Array]:
    """Single-scan wrapper around :func:`project_batch` ([N,4] -> [H,W,5])."""
    img, mask = project_batch(points[None], valid[None], H, W, fov_up_deg, fov_down_deg)
    return img[0], mask[0]


def compute_normals(img_xyz: jax.Array, mask: jax.Array) -> jax.Array:
    """Surface normals from the projected vertex map (batch-polymorphic).

    n(v,u) = normalize( (V[v,u+1]-V[v,u]) x (V[v+1,u]-V[v,u]) ), with
    wrap-around in azimuth (full revolution scan) and clamp at the last
    elevation row; pixels with an incomplete 3-point stencil get a zero
    normal. Matches the reference's range-image-neighbor cross-product
    normals (SURVEY.md §2.2) but runs fused on device.

    Args:
      img_xyz: [..., H, W, 3] vertex map; mask: [..., H, W].
    """
    V = img_xyz
    m = mask > 0.5
    V_right = jnp.roll(V, -1, axis=-2)
    m_right = jnp.roll(m, -1, axis=-1)
    V_down = jnp.concatenate([V[..., 1:, :, :], V[..., -1:, :, :]], axis=-3)
    m_down = jnp.concatenate(
        [m[..., 1:, :], jnp.zeros_like(m[..., -1:, :])], axis=-2
    )
    n = jnp.cross(V_right - V, V_down - V)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-9)
    ok = (m & m_right & m_down)[..., None]
    return jnp.where(ok, n, 0.0)


def assemble_channels(
    img5: jax.Array,
    mask: jax.Array,
    channels: Sequence[str],
) -> jax.Array:
    """Select/compose the configured channel stack from the 5-channel
    projection (+ optional normals). Static w.r.t. config."""
    chan_idx = {"x": 0, "y": 1, "z": 2, "remission": 3, "depth": 4}
    outs = []
    normals = None
    for c in channels:
        if c == "normals":
            if normals is None:
                normals = compute_normals(img5[..., :3], mask)
            outs.append(normals)
        else:
            outs.append(img5[..., chan_idx[c] : chan_idx[c] + 1])
    return jnp.concatenate(outs, axis=-1)


def normalize_channels(
    img: jax.Array, mask: jax.Array, mean: Sequence[float], std: Sequence[float]
) -> jax.Array:
    """Fused per-channel (x - mean)/std, zeroing empty pixels.

    The reference applies this as a separate torch transform
    (``deeplio/datasets/transforms.py``); here XLA fuses it into the
    projection graph for free.
    """
    if len(mean) == 0:
        return img * mask[..., None]
    mu = jnp.asarray(mean, jnp.float32)
    sd = jnp.asarray(std, jnp.float32)
    return (img - mu) / sd * mask[..., None]


def make_projector(cfg_proj: ProjectionConfig, channels: Sequence[str],
                   mean: Sequence[float] = (), std: Sequence[float] = (),
                   out_dtype=None, layout: str = "aos"):
    """Build the jit-ready batched scan->image function for a config.

    Returns fn(points [..., N, 4], valid [..., N]) ->
    (img [..., H, W, C], mask [..., H, W]). Leading dims are flattened into
    one batch for the sort-based kernel (batch-explicit beats vmap here).

    layout="planes": points arrive as a 4-TUPLE of channel-plane arrays
    (x, y, z, rem), each [..., N] (the training-step contract). Separate
    planes are natively (8,128)-tiled 2D slabs, so the Mosaic prologue
    reads them with NO relayout: both the AoS [..., N, 4] layout and a
    single [..., 4, N] array force a 0.9 ms/step copy at flagship scale
    (XLA tiles the (4, N) minor dims as T(4,128) and must re-tile each
    plane — measured, profile_step.py). Non-Mosaic backends stack back
    to AoS in-graph (bit-identical; not the production path).

    Large batches run as ``lax.map`` over ``cfg_proj.chunk``-scan chunks:
    one fused 144-scan program measured 2.3x worse PER SCAN than 32 (the
    scan/sort working set falls out of VMEM), while chunk=16-24 measured
    4x faster at the training batch size (docs/performance.md). Chunking
    changes scheduling only — winners are bit-identical.
    """
    H, W = cfg_proj.height, cfg_proj.width
    fu, fd = cfg_proj.fov_up_deg, cfg_proj.fov_down_deg
    packed = cfg_proj.packed
    backend = getattr(cfg_proj, "backend", "sort")
    chunk = int(getattr(cfg_proj, "chunk", 0) or 0)
    kernel_spb = int(getattr(cfg_proj, "kernel_spb", 1) or 1)
    kernel_packed = str(getattr(cfg_proj, "kernel_packed", "auto") or "auto")
    kernel_aligned = str(getattr(cfg_proj, "kernel_aligned", "off") or "off")
    if layout not in ("aos", "planes"):
        raise ValueError(f"layout must be aos|planes, got {layout!r}")
    if kernel_aligned not in ("auto", "on", "off", "trust", "halves"):
        # A typo silently disabling the route would void every A/B.
        raise ValueError(f"kernel-aligned must be auto|on|off|trust|halves, "
                         f"got {kernel_aligned!r}")

    def _aligned_check_mode(n: int):
        """None = use the scan/kernel path; "halves" = the dual-half
        contiguous route; else the `check` arg for the interleaved direct
        route (all pure XLA — live on every jax backend)."""
        if kernel_aligned == "off":
            return None
        if not aligned_route_feasible(n, H, W):
            if kernel_aligned in ("on", "trust", "halves"):
                raise ValueError(
                    f"kernel-aligned={kernel_aligned} infeasible: scan "
                    f"capacity {n} is not a multiple of H*W={H * W}")
            return None  # auto: shape can't satisfy the slot contract
        if kernel_aligned == "halves":
            return "halves"
        return "assert-off" if kernel_aligned == "trust" else "cond"

    if bool(mean) != bool(std):
        raise ValueError("normalization requires both mean and std (or neither)")
    for name, vals in (("mean", mean), ("std", std)):
        if vals and len(vals) != _num_ch(channels):
            raise ValueError(
                f"normalization {name} has {len(vals)} entries for "
                f"{_num_ch(channels)} channels {tuple(channels)}"
            )
    if std and any(v == 0 for v in std):
        raise ValueError("normalization std contains a zero")

    def kernel(pts: jax.Array, vld: jax.Array):
        pay = "carry-f16" if packed else "carry"
        if backend == "pallas":
            from deeplio_tpu.ops.projection_pallas import project_batch_pallas
            img5, mask = project_batch_pallas(pts, vld, H, W, fu, fd)
        elif backend == "pallas-ring":
            def _ring_fb(fx, fy, fz, fr, fv):
                fpts = jnp.stack((fx, fy, fz, fr), axis=-1)
                if jax.default_backend() != "tpu":
                    # Mosaic kernels need a TPU; CPU/GPU runs (tests,
                    # local dev) use the bit-identical XLA ring path.
                    return project_batch_ring(fpts, fv, H, W, fu, fd,
                                              payload="carry-f16")
                from deeplio_tpu.ops.projection_pallas_ring import (
                    project_batch_ring_pallas)
                return project_batch_ring_pallas(
                    fpts, fv, H, W, fu, fd, spb=kernel_spb,
                    packed_route=kernel_packed)

            amode = _aligned_check_mode(pts.shape[-2])
            if amode == "halves":
                img5, mask = project_batch_ring_halves_planes(
                    pts[..., 0], pts[..., 1], pts[..., 2], pts[..., 3],
                    vld, H, W, fu, fd)
            elif amode is not None:
                img5, mask = project_batch_ring_aligned_planes(
                    pts[..., 0], pts[..., 1], pts[..., 2], pts[..., 3],
                    vld, H, W, fu, fd, check=amode, fallback=_ring_fb)
            elif jax.default_backend() != "tpu":
                img5, mask = project_batch_ring(pts, vld, H, W, fu, fd,
                                                payload="carry-f16")
            else:
                from deeplio_tpu.ops.projection_pallas_ring import (
                    project_batch_ring_pallas)
                img5, mask = project_batch_ring_pallas(
                    pts, vld, H, W, fu, fd, spb=kernel_spb,
                    packed_route=kernel_packed)
        elif backend == "ring":
            img5, mask = project_batch_ring(pts, vld, H, W, fu, fd, payload=pay)
        elif backend == "sort":
            img5, mask = project_batch_sorted(pts, vld, H, W, fu, fd,
                                              payload=pay)
        elif backend == "sort-sentinel":
            img5, mask = project_batch(pts, vld, H, W, fu, fd, packed=packed)
        else:
            raise ValueError(f"unknown projection backend {backend!r}")
        img = assemble_channels(img5, mask, channels)
        img = normalize_channels(img, mask, mean, std)
        if out_dtype is not None:
            # Emit the training dtype straight out of the fused projection
            # graph (the model casts anyway; emitting bf16 halves the
            # image materialization + pair-concat traffic).
            img = img.astype(out_dtype)
        return img, mask

    def kernel_planes(planes, vld: jax.Array):
        # Planes fast path: only live for the Mosaic kernel on TPU (planes
        # feed the prologue directly); everything else rebuilds AoS
        # in-graph (bit-identical — the relayout XLA would insert anyway).
        from deeplio_tpu.ops.projection_pallas_ring import (
            project_batch_ring_pallas_planes)
        x, y, z, rem = planes

        def _planes_fb(fx, fy, fz, fr, fv):
            return project_batch_ring_pallas_planes(
                fx, fy, fz, fr, fv, H, W, fu, fd, spb=kernel_spb,
                packed_route=kernel_packed)

        amode = _aligned_check_mode(x.shape[-1])
        if amode == "halves":
            img5, mask = project_batch_ring_halves_planes(
                x, y, z, rem, vld, H, W, fu, fd)
        elif amode is not None:
            img5, mask = project_batch_ring_aligned_planes(
                x, y, z, rem, vld, H, W, fu, fd, check=amode,
                fallback=_planes_fb)
        else:
            img5, mask = _planes_fb(x, y, z, rem, vld)
        img = assemble_channels(img5, mask, channels)
        img = normalize_channels(img, mask, mean, std)
        if out_dtype is not None:
            img = img.astype(out_dtype)
        return img, mask

    def project(points, valid: jax.Array):
        if layout == "planes":
            x, y, z, rem = points
            lead = x.shape[:-1]
            n = x.shape[-1]
            vld = valid.reshape((-1, n))
            if backend == "pallas-ring" and jax.default_backend() == "tpu":
                planes = tuple(p.reshape((-1, n)) for p in (x, y, z, rem))
                img, mask = kernel_planes(planes, vld)
                c = img.shape[-1]
                return (img.reshape(lead + (H, W, c)),
                        mask.reshape(lead + (H, W)))
            points = jnp.stack((x, y, z, rem), axis=-1)
        lead = points.shape[:-2]
        n = points.shape[-2]
        pts = points.reshape((-1, n, 4))
        vld = valid.reshape((-1, n))
        b = pts.shape[0]
        # The Mosaic ring kernel streams scans through its own grid with
        # double-buffered block DMA — lax.map chunking would only serialize
        # pallas_calls around it.
        if chunk > 0 and b > chunk and backend != "pallas-ring":
            pad = (-b) % chunk
            if pad:
                pts = jnp.concatenate(
                    [pts, jnp.zeros((pad, n, 4), pts.dtype)], axis=0)
                vld = jnp.concatenate(
                    [vld, jnp.zeros((pad, n), vld.dtype)], axis=0)
            pts = pts.reshape(-1, chunk, n, 4)
            vld = vld.reshape(-1, chunk, n)
            img, mask = jax.lax.map(lambda a: kernel(*a), (pts, vld))
            img = img.reshape((-1,) + img.shape[2:])[:b]
            mask = mask.reshape((-1,) + mask.shape[2:])[:b]
        else:
            img, mask = kernel(pts, vld)
        c = img.shape[-1]
        return img.reshape(lead + (H, W, c)), mask.reshape(lead + (H, W))

    return project


def _num_ch(channels: Sequence[str]) -> int:
    return sum(3 if c == "normals" else 1 for c in channels)


# ---------------------------------------------------------------------------
# Numpy oracle — the parity reference for kernel implementations.
# ---------------------------------------------------------------------------

def project_scan_np(
    points: np.ndarray,
    valid: np.ndarray,
    H: int,
    W: int,
    fov_up_deg: float,
    fov_down_deg: float,
    quantize: bool = True,
    key_layout: str = "pixel",
) -> Tuple[np.ndarray, np.ndarray]:
    """Sequential-fill oracle with identical semantics to :func:`project_batch`.

    Mirrors the reference's host-side numpy projection behaviour: iterate
    points in order, keep the closest range per pixel (ties -> first point).
    With ``quantize=True`` (default) the comparison uses the same quantized
    range as the production sort key, so winners match bit-exactly; with
    ``quantize=False`` the comparison is exact-float (sub-centimetre ties may
    pick a different, equally-close point). ``key_layout`` selects whose
    quantization to mirror: "pixel" = the sort paths' pixel<<rq keys,
    "index" = the ring path's rq<<idx keys (coarser when idx_bits squeezes
    the budget). Deliberately simple; tests only.
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r = np.sqrt(x * x + y * y + z * z)
    yaw = np.arctan2(y, x)
    pitch = np.arcsin(np.clip(z / np.maximum(r, 1e-9), -1.0, 1.0))
    fov_down = np.float32(np.deg2rad(fov_down_deg))
    fov = np.float32(np.deg2rad(fov_up_deg - fov_down_deg))
    u = np.floor(0.5 * (1.0 - yaw / np.float32(np.pi)) * W).astype(np.int64)
    v = np.floor((1.0 - (pitch - fov_down) / fov) * H).astype(np.int64)
    u = np.clip(u, 0, W - 1)
    v = np.clip(v, 0, H - 1)

    if quantize:
        if key_layout == "index":
            _, rq_bits, rq_scale = _idx_key_layout(points.shape[0], H * W)
        else:
            rq_bits = _rq_bits_for(H * W)
            rq_scale = (100.0 if rq_bits >= DEFAULT_RQ_BITS
                        else (1 << rq_bits) / 164.0)
        rq_max = (1 << rq_bits) - 1
        cmp = np.clip((r * rq_scale).astype(np.int64), 0, rq_max - 1)
    else:
        cmp = r

    img = np.zeros((H, W, 5), np.float32)
    mask = np.zeros((H, W), np.float32)
    best = np.full((H, W), np.inf, np.float64)
    ok = np.asarray(valid, bool) & (r > 1e-6)
    for i in range(points.shape[0]):
        if not ok[i]:
            continue
        vi, ui = v[i], u[i]
        if cmp[i] < best[vi, ui]:
            best[vi, ui] = cmp[i]
            img[vi, ui, :4] = points[i, :4]
            img[vi, ui, 4] = r[i]
            mask[vi, ui] = 1.0
    return img, mask
