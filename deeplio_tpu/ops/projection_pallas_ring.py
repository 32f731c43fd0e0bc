"""Pallas TPU ring-projection kernel: VMEM-resident, O(N)-movement.

Reference capability: the reference's numpy spherical projection
(``deeplio/datasets/kitti.py``, SURVEY.md §2.2) — here as a hand-written
Mosaic kernel for ring-ordered scans, the latency/throughput successor to
the XLA roll-based ``projection.project_batch_ring``.

Why a kernel: the XLA ring path is built from Hillis-Steele roll rounds —
segmented min-scan (17 rounds), rank jump-compaction (17) and MSB
jump-expansion (16), each round touching every element of every carried
array (~240 full-array passes; XLA pins them in VMEM but still executes
every round). This kernel keeps the whole scan in VMEM once and replaces
the two O(N log N) routing stages with O(N) data movement:

  1. two-level segmented min-scan: log2(LANES) intra-row rounds over a
     [R, LANES] view + a [R, 1] row-carry scan + one fixup pass (the same
     decomposition as ``projection._seg_min_scan_tiled``),
  2. intra-row rank compaction (log2(LANES) lane rounds; dest =
     within-row rank, so displacements are monotone over keeps),
  3. a sequential per-row loop of dynamic-offset MASKED WINDOW STORES
     concatenating each row's winners into a pix-sorted compact buffer —
     one rotated LANES-wide store per row instead of log2(N) global
     rounds,
  4. per-output-block rank bounds by vectorized counting, one rotated
     window LOAD per output block, and a single BATCHED local expansion
     to pixel slots (a LANES-pixel block holds <= LANES winners, so every
     window is exact).

Semantics are bit-identical to ``project_batch_ring(payload="carry-f16")``
(same (rq << idx_bits | idx) winner keys, same cummax handling of invalid
points, same graceful degradation for ring-order violations); the parity
suite drives both against the sequential numpy oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeplio_tpu.ops.projection import (
    _idx_key_layout,
    _pack_f16x2,
    _rq_to_depth,
    _unpack_f16x2,
    spherical_uv_planes,
)

LANES = 2048         # default logical lane width of the [R, LANES] working
                     # view; wide rows keep the sequential store/gather
                     # loops short (R + n_pix/LANES iterations dominate
                     # overhead). ``project_batch_ring_pallas(lanes=...)``
                     # sweeps it (benchmarks/bench_projection.py).
SENTINEL = np.int32(2**31 - 1)


def _ring_kernel(R: int, OUT_R: int, LANES: int, LOG_LANES: int,
                 PACKED: bool, IDX_BITS: int, RQ_BITS: int, SPB: int,
                 pix_ref, key_ref, p1_ref, p2_ref,
                 okey_ref, op1_ref, op2_ref,
                 cpix_ref, ckey_ref, cp1_ref, cp2_ref,
                 spix_ref, skey_ref, s1_ref, s2_ref, meta_ref, wwin_ref):
    """SPB scans per grid step: [SPB, R, LANES] ring-ordered points ->
    [SPB, OUT_R, LANES] pixels.

    The SPB scans are processed on FLATTENED [SPB*R, LANES] views — lane
    ops are per-row independent so they need no changes at all; the few
    row-axis ops (carry scans, prev/next-row wraps) become per-scan exact
    via a row-within-scan iota ``rowm``: carry-scan windows mask on
    (row % R) >= d, and the wrap reads at scan boundaries land only on
    lanes whose value is then FORCED by the (rowm == 0 / R-1) start/end
    clauses, so cross-scan garbage never reaches a result. SPB=1 reduces
    to the single-scan kernel op-for-op. Fewer grid steps amortize any
    per-grid-step overhead (docs/performance.md: the ~64 us/scan
    custom-call residual hypothesis).

    PACKED route: after the seg-min the winner's (pix, rq) pair fits one
    int32 (``pix << RQ_BITS | rq``; feasibility checked by the wrapper —
    the idx tie-break bits are dead once winners are chosen), so the
    compaction routes 3 data arrays instead of 4 and the store/gather
    loops touch 3 compact buffers instead of 4. Output okey then holds
    the packed word; the wrapper decodes rq from the low bits.
    Bit-identical winners/masks/payloads either way (parity suite runs
    both routes and SPB widths)."""
    SR = SPB * R
    SOUT = SPB * OUT_R
    # Per-scan compact-region stride, padded to a sublane multiple: Mosaic
    # (libtpu >= 0.0.34) requires dynamic row bases of multi-row vector
    # loads to be PROVABLY 8-aligned, and `scan * CSTRIDE` with
    # CSTRIDE % 8 == 0 is; `scan * (OUT_R + 2)` is not. The pad rows stay
    # sentinel-filled, so the rank-bound count below is unaffected.
    CSTRIDE = -(-(OUT_R + 2) // 8) * 8
    CROWS = SPB * CSTRIDE              # compact-buffer rows (per-scan)
    big = jnp.int32(SENTINEL)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SR, LANES), 1)
    # row WITHIN its scan (0..R-1 repeated SPB times) — free iota reshape.
    rowm = jax.lax.broadcasted_iota(
        jnp.int32, (SPB, R, LANES), 1).reshape(SR, LANES)
    rowim = jax.lax.broadcasted_iota(
        jnp.int32, (SPB, R, 1), 1).reshape(SR, 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    pix = pix_ref[:]                  # [SR, LANES]; raw: -1 where invalid
    m = key_ref[:]
    p1 = p1_ref[:]
    p2 = p2_ref[:]

    # -- flat cummax: invalid points inherit the previous valid pixel -------
    # (two-level like every scan here: lane rounds + row carry + fixup; XLA's
    # reduce-window cummax on the unchunked batch measured 8 ms/step).
    #
    # ADAPTIVE ROUNDS: ring-ordered scans settle in K0 rounds — after K0
    # windowed rounds, a row-wise NONDECREASING pix sequence proves the
    # windowed cummax equals the prefix cummax (each value >= its
    # predecessor >= ... >= every earlier value), so the remaining rounds
    # are skipped unless a violation (an unfilled -1 beyond the window, or
    # out-of-ring-order pixels) is present. Exactness is data-independent:
    # the gated branch runs the FULL remaining rounds whenever the cheap
    # monotonicity check fails. (Same pattern gates the segmented min-scan
    # and the expansion's high bits below; bench: docs/performance.md.)
    K0 = min(4, LOG_LANES)
    for k in range(K0):
        d = 1 << k
        pix = jnp.maximum(pix, jnp.where(lane >= d, pltpu.roll(pix, d, 1),
                                         -1))
    viol1 = jnp.max(jnp.where(
        (lane >= 1) & (pix < pltpu.roll(pix, 1, 1)), 1, 0))
    spix_ref[:] = pix

    @pl.when(viol1 > 0)
    def _cummax_rest():
        p = spix_ref[:]
        for k in range(K0, LOG_LANES):
            d = 1 << k
            p = jnp.maximum(p, jnp.where(lane >= d, pltpu.roll(p, d, 1), -1))
        spix_ref[:] = p

    pix = spix_ref[:]
    rounds_r = max(int(np.ceil(np.log2(R))), 1) if R > 1 else 0
    rmax = pix[:, LANES - 1:]
    for k in range(rounds_r):
        d = 1 << k
        rmax = jnp.maximum(rmax, jnp.where(rowim >= d,
                                           pltpu.roll(rmax, d, 0), -1))
    carry = jnp.where(rowim >= 1, pltpu.roll(rmax, 1, 0), -1)
    pix = jnp.maximum(jnp.maximum(pix, carry), 0)

    # -- run boundaries over the FLAT order ---------------------------------
    # NOTE: every rolled flag is int32 — Mosaic has no rotate for i1
    # vectors ("Rotate with non-32-bit data").
    # Scan-boundary rows read the PREVIOUS scan's last row here — that
    # value only reaches lane 0 of rowm==0 rows, where `start` is forced.
    pix_l1 = pltpu.roll(pix, 1, 1)                     # lane j <- j-1 (wraps)
    prev_row_last = pltpu.roll(pix_l1, 1, 0)           # row r <- r-1
    prev = jnp.where(lane == 0, prev_row_last, pix_l1)
    start = jnp.where((pix != prev) | ((lane == 0) & (rowm == 0)), 1, 0)

    # -- two-level segmented min-scan (value m, payloads p1 p2) -------------
    # Only the REAL-boundary window-OR g is tracked: the classic
    # origin-fill flag is redundant — a position j >= 2^k (the only ones
    # whose m_prev isn't big-filled) has window (j-2^k, j], which cannot
    # reach the row origin, so "saw origin or boundary" == g there.
    # Adaptive rounds: a lane is settled once its window saw a boundary
    # (g==1) or reached the row origin (lane < window). Ring scans have
    # ~2-point runs, so K0 rounds settle everything; long runs (e.g.
    # interleaved invalid masks) take the gated full-rounds branch.
    g = start                    # boundary OR over the (2^k)-window
    for k in range(K0):
        d = 1 << k
        in_range = lane >= d
        m_prev = jnp.where(in_range, pltpu.roll(m, d, 1), big)
        g_prev = jnp.where(in_range, pltpu.roll(g, d, 1), 0)
        take = (g == 0) & (m_prev < m)
        m = jnp.where(take, m_prev, m)
        p1 = jnp.where(take, pltpu.roll(p1, d, 1), p1)
        p2 = jnp.where(take, pltpu.roll(p2, d, 1), p2)
        g = g | g_prev
    # Out-of-range runs (pix >= n_pix: the re-keyed invalid tail, see the
    # wrapper) are excluded from the settle check — their winners are
    # discarded wholesale downstream (dest >= LANES in the expansion, not
    # counted by rank bounds), and seg-min propagation only flows FORWARD
    # into them, so an unsettled tail cannot corrupt in-range results.
    viol2 = jnp.max(jnp.where(
        (g == 0) & (lane >= (1 << K0)) & (pix < OUT_R * LANES), 1, 0))
    spix_ref[:] = m
    skey_ref[:] = g
    s1_ref[:] = p1
    s2_ref[:] = p2

    @pl.when(viol2 > 0)
    def _segmin_rest():
        m_ = spix_ref[:]
        g_ = skey_ref[:]
        p1_ = s1_ref[:]
        p2_ = s2_ref[:]
        for k in range(K0, LOG_LANES):
            d = 1 << k
            in_range = lane >= d
            m_prev = jnp.where(in_range, pltpu.roll(m_, d, 1), big)
            g_prev = jnp.where(in_range, pltpu.roll(g_, d, 1), 0)
            take = (g_ == 0) & (m_prev < m_)
            m_ = jnp.where(take, m_prev, m_)
            p1_ = jnp.where(take, pltpu.roll(p1_, d, 1), p1_)
            p2_ = jnp.where(take, pltpu.roll(p2_, d, 1), p2_)
            g_ = g_ | g_prev
        spix_ref[:] = m_
        skey_ref[:] = g_
        s1_ref[:] = p1_
        s2_ref[:] = p2_

    m = spix_ref[:]
    g = skey_ref[:]
    p1 = s1_ref[:]
    p2 = s2_ref[:]

    # row aggregates at the last lane -> [SR, 1] per-scan carry scan.
    F = g[:, LANES - 1:]                      # row has a real boundary
    M = m[:, LANES - 1:]
    A1 = p1[:, LANES - 1:]
    A2 = p2[:, LANES - 1:]
    for k in range(rounds_r):
        d = 1 << k
        in_range = rowim >= d
        M_prev = jnp.where(in_range, pltpu.roll(M, d, 0), big)
        F_prev = jnp.where(in_range, pltpu.roll(F, d, 0), 0)
        take = (F == 0) & (M_prev < M)
        M = jnp.where(take, M_prev, M)
        A1 = jnp.where(take, pltpu.roll(A1, d, 0), A1)
        A2 = jnp.where(take, pltpu.roll(A2, d, 0), A2)
        F = F | F_prev
    # carry-in for row r = aggregate of rows < r (exclusive shift down).
    CM = jnp.where(rowim >= 1, pltpu.roll(M, 1, 0), big)
    C1 = jnp.where(rowim >= 1, pltpu.roll(A1, 1, 0), 0)
    C2 = jnp.where(rowim >= 1, pltpu.roll(A2, 1, 0), 0)
    take = (g == 0) & (CM < m)
    m = jnp.where(take, CM, m)
    p1 = jnp.where(take, C1, p1)
    p2 = jnp.where(take, C2, p2)

    # -- run ends hold the winners ------------------------------------------
    # (flat roll by SR-1 = row r <- r+1; the cross-SCAN read at rowm==R-1
    # only reaches lane LANES-1, where endi is forced.)
    pix_r1 = pltpu.roll(pix, LANES - 1, 1)             # lane j <- j+1
    next_row_first = pltpu.roll(pix_r1, SR - 1, 0)     # row r <- r+1
    nxt = jnp.where(lane == LANES - 1, next_row_first, pix_r1)
    endi = jnp.where(
        (pix != nxt) | ((lane == LANES - 1) & (rowm == R - 1)), 1, 0)

    # -- intra-row rank compaction (LSB jump routing) -----------------------
    rank = endi
    for k in range(LOG_LANES):                        # inclusive prefix sum
        d = 1 << k
        rank = rank + jnp.where(lane >= d, pltpu.roll(rank, d, 1), 0)
    cnt_col = rank[:, LANES - 1:]                     # [SR, 1] winners per row
    rank = rank - endi                                # exclusive = local dest

    if PACKED:
        # m is a winner key (rq << IDX_BITS | idx) < 2^31, so the
        # arithmetic >> equals a logical shift; pix << RQ_BITS fits int32
        # by the wrapper's feasibility check.
        data = [(pix << RQ_BITS) | (m >> IDX_BITS), p1, p2]
    else:
        data = [pix, m, p1, p2]
    live = endi
    delta = jnp.where(endi == 1, lane - rank, 0)
    for k in range(LOG_LANES):
        d = 1 << k
        move = live * (((delta >> k) & 1) == 1)
        move_in = pltpu.roll(move, LANES - d, 1)
        mv = move_in == 1
        data = [jnp.where(mv, pltpu.roll(a, LANES - d, 1), a) for a in data]
        delta = jnp.where(mv, pltpu.roll(delta, LANES - d, 1) - d, delta)
        live = (live & (1 - move)) | move_in

    # row offsets: exclusive PER-SCAN cumsum of per-row counts -> [SR, 1].
    off_col = cnt_col
    for k in range(rounds_r):
        d = 1 << k
        off_col = off_col + jnp.where(rowim >= d,
                                      pltpu.roll(off_col, d, 0), 0)
    off_col = off_col - cnt_col

    # stage winner arrays + per-row (offset, count) in scratch so the
    # sequential loops below can dynamically index them as REFS.
    stage_refs = ([spix_ref, s1_ref, s2_ref] if PACKED
                  else [spix_ref, skey_ref, s1_ref, s2_ref])
    compact_refs = ([cpix_ref, cp1_ref, cp2_ref] if PACKED
                    else [cpix_ref, ckey_ref, cp1_ref, cp2_ref])
    for ref, a in zip(stage_refs, data):
        ref[:] = a
    meta_ref[pl.ds(0, SR), :] = off_col
    meta_ref[pl.ds(SR, SR), :] = cnt_col

    # -- 3. concatenate rows' winners into the compact buffers --------------
    # (sentinel-fill pix/key first: expansion windows read past the tail;
    # each scan owns rows [scan*CSTRIDE, (scan+1)*CSTRIDE) )
    cpix_ref[:] = jnp.full((CROWS, LANES), big)
    if not PACKED:
        ckey_ref[:] = jnp.full((CROWS, LANES), big)

    def store_row(r, _):
        o = meta_ref[pl.ds(r, 1), :][0, 0]
        c = meta_ref[pl.ds(SR + r, 1), :][0, 0]
        q = (r // R) * CSTRIDE + o // LANES
        s = o % LANES
        mask = pltpu.roll(jnp.where(lane1 < c, 1, 0), s, 1)
        hi = (mask == 1) & (lane1 >= s)
        lo = (mask == 1) & (lane1 < s)
        for src, dst in zip(stage_refs, compact_refs):
            vrot = pltpu.roll(src[pl.ds(r, 1), :], s, 1)
            dst[pl.ds(q, 1), :] = jnp.where(hi, vrot, dst[pl.ds(q, 1), :])
            dst[pl.ds(q + 1, 1), :] = jnp.where(lo, vrot,
                                                dst[pl.ds(q + 1, 1), :])
        return 0

    jax.lax.fori_loop(0, SR, store_row, 0)

    # -- 4. per-block rank bounds (cheap at wide LANES: OUT_R reduces over
    # the scan's compact region) + windowed expansion.
    pix_thresh_shift = RQ_BITS if PACKED else 0

    def gather_block(o, _):
        scan = o // OUT_R
        base = scan * CSTRIDE
        # Full padded region (aligned base AND 8-multiple size): the pad
        # rows hold the sentinel, which never passes the `<` threshold.
        seg = cpix_ref[pl.ds(base, CSTRIDE), :]
        lo = jnp.sum(jnp.where(
            seg < ((o - scan * OUT_R) * LANES) << pix_thresh_shift, 1, 0))
        q = base + lo // LANES
        s = lo % LANES
        sh = (LANES - s) % LANES
        sel = lane1 < LANES - s
        if PACKED:
            pairs = ((okey_ref, cpix_ref), (op1_ref, cp1_ref),
                     (op2_ref, cp2_ref))
        else:
            pairs = ((okey_ref, ckey_ref), (op1_ref, cp1_ref),
                     (op2_ref, cp2_ref), (wwin_ref, cpix_ref))
        for dst, buf in pairs:
            a = buf[pl.ds(q, 1), :]
            b = buf[pl.ds(q + 1, 1), :]
            w = jnp.where(sel, pltpu.roll(a, sh, 1), pltpu.roll(b, sh, 1))
            dst[pl.ds(o, 1), :] = w
        return 0

    jax.lax.fori_loop(0, SOUT, gather_block, 0)

    # batched local expansion: window lane j of block o holds the
    # (rank_lo[o]+j)-th winner; this block's winners sit at j < cnt_o with
    # strictly increasing dests in [j, LANES).
    okey = okey_ref[:]
    o1 = op1_ref[:]
    o2 = op2_ref[:]
    # Packed words are nonnegative (< 2^31), so arithmetic >> is exact.
    owin_pix = (okey >> RQ_BITS) if PACKED else wwin_ref[:]
    # block index WITHIN its scan (0..OUT_R-1 repeated SPB times).
    orow = jax.lax.broadcasted_iota(
        jnp.int32, (SPB, OUT_R, LANES), 1).reshape(SOUT, LANES)
    olane = jax.lax.broadcasted_iota(jnp.int32, (SOUT, LANES), 1)
    dest = owin_pix - orow * LANES
    sentinel_pix = jnp.int32(int(SENTINEL) >> RQ_BITS) if PACKED else big
    live = jnp.where((dest >= olane) & (dest < LANES)
                     & (owin_pix != sentinel_pix), 1, 0)
    delta = jnp.where(live == 1, dest - olane, 0)

    # Adaptive high bits: deltas are known upfront; on dense scans the
    # j-th winner of a block lands near lane j (delta = #empty pixels
    # skipped), so the MSB rounds are no-ops unless some delta >= 2^K0E.
    # The compact-buffer scratch (cpix/ckey/cp1/cp2) and wwin are dead at
    # this point and host the gated branch's values.
    K0E = min(5, LOG_LANES)
    hi_viol = jnp.max(jnp.where((live == 1) & (delta >= (1 << K0E)), 1, 0))
    cpix_ref[pl.ds(0, SOUT), :] = okey
    ckey_ref[pl.ds(0, SOUT), :] = o1
    cp1_ref[pl.ds(0, SOUT), :] = o2
    cp2_ref[pl.ds(0, SOUT), :] = delta
    wwin_ref[:] = live

    @pl.when(hi_viol > 0)
    def _expand_hi():
        okey_ = cpix_ref[pl.ds(0, SOUT), :]
        o1_ = ckey_ref[pl.ds(0, SOUT), :]
        o2_ = cp1_ref[pl.ds(0, SOUT), :]
        delta_ = cp2_ref[pl.ds(0, SOUT), :]
        live_ = wwin_ref[:]
        for k in reversed(range(K0E, LOG_LANES)):
            d = 1 << k
            move = live_ * (((delta_ >> k) & 1) == 1)
            move_in = pltpu.roll(move, d, 1)
            mv = move_in == 1
            okey_ = jnp.where(mv, pltpu.roll(okey_, d, 1), okey_)
            o1_ = jnp.where(mv, pltpu.roll(o1_, d, 1), o1_)
            o2_ = jnp.where(mv, pltpu.roll(o2_, d, 1), o2_)
            delta_ = jnp.where(mv, pltpu.roll(delta_, d, 1) - d, delta_)
            live_ = (live_ & (1 - move)) | move_in
        cpix_ref[pl.ds(0, SOUT), :] = okey_
        ckey_ref[pl.ds(0, SOUT), :] = o1_
        cp1_ref[pl.ds(0, SOUT), :] = o2_
        cp2_ref[pl.ds(0, SOUT), :] = delta_
        wwin_ref[:] = live_

    okey = cpix_ref[pl.ds(0, SOUT), :]
    o1 = ckey_ref[pl.ds(0, SOUT), :]
    o2 = cp1_ref[pl.ds(0, SOUT), :]
    delta = cp2_ref[pl.ds(0, SOUT), :]
    live = wwin_ref[:]
    for k in reversed(range(K0E)):
        d = 1 << k
        move = live * (((delta >> k) & 1) == 1)
        move_in = pltpu.roll(move, d, 1)
        mv = move_in == 1
        okey = jnp.where(mv, pltpu.roll(okey, d, 1), okey)
        o1 = jnp.where(mv, pltpu.roll(o1, d, 1), o1)
        o2 = jnp.where(mv, pltpu.roll(o2, d, 1), o2)
        delta = jnp.where(mv, pltpu.roll(delta, d, 1) - d, delta)
        live = (live & (1 - move)) | move_in

    landed = (live == 1) & (delta == 0)
    okey_ref[:] = jnp.where(landed, okey, big)
    # Zero non-landed payload lanes: expansion windows can extend past the
    # last winner into UNINITIALIZED scratch, and garbage bits unpack to
    # f16 NaN which the wrapper's mask multiply (0 * NaN) cannot remove.
    op1_ref[:] = jnp.where(landed, o1, 0)
    op2_ref[:] = jnp.where(landed, o2, 0)


def project_batch_ring_pallas(
    points: jax.Array,
    valid: jax.Array,
    H: int,
    W: int,
    fov_up_deg: float,
    fov_down_deg: float,
    interpret: bool = False,
    lanes: int = LANES,
    packed_route: str = "auto",
    spb: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Same contract as ``project_batch_ring(payload="carry-f16")``.

    points [B, N, 4] float32, valid [B, N] bool ->
    (img [B, H, W, 5] float32, mask [B, H, W] float32).
    """
    return project_batch_ring_pallas_planes(
        points[..., 0], points[..., 1], points[..., 2], points[..., 3],
        valid, H, W, fov_up_deg, fov_down_deg,
        interpret=interpret, lanes=lanes, packed_route=packed_route, spb=spb)


def project_batch_ring_pallas_planes(
    x: jax.Array,
    y: jax.Array,
    z: jax.Array,
    rem: jax.Array,
    valid: jax.Array,
    H: int,
    W: int,
    fov_up_deg: float,
    fov_down_deg: float,
    interpret: bool = False,
    lanes: int = LANES,
    packed_route: str = "auto",
    spb: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Planes entry: x/y/z/rem [B, N] float32 channel planes.

    The SoA hot path (train/step.py feeds ``points [B, S, 4, N]``): plane
    slices of an SoA batch are contiguous, so the prologue needs no
    channel-minor relayout copy (measured 0.9 ms/step at flagship scale
    for the f32[144,131072,4] copy the AoS layout forces).
    """
    LANES_ = int(lanes)
    if LANES_ & (LANES_ - 1):
        raise ValueError(f"lanes must be a power of 2, got {LANES_}")
    LOG_LANES = int(np.log2(LANES_))
    b, n = x.shape[0], x.shape[1]
    n_pix = H * W
    if n_pix % LANES_:
        raise ValueError(
            f"H*W must be a multiple of {LANES_} for the ring kernel")
    idx_bits, rq_bits, rq_scale = _idx_key_layout(n, n_pix)
    rq_max = (1 << rq_bits) - 1

    u, v, r = spherical_uv_planes(x, y, z, H, W, fov_up_deg, fov_down_deg)
    ok = valid & (r > 1e-6)
    pix = jnp.where(ok, v * W + u, -1)        # cummax happens in-kernel
    # Re-key a PURE-TAIL invalid suffix (the loaders' only invalid shape:
    # real scans padded to max_points) to its own out-of-range run at
    # pix = n_pix: the tail then stops stretching the last real run, so
    # the kernel's adaptive seg-min settles on real padded scans, and the
    # tail "winner" is discarded downstream (dest >= LANES, rank bounds
    # never count pix >= n_pix). Interleaved masks fail the pure-tail
    # check and keep the exact inherit-previous-pixel semantics,
    # bit-identical to the XLA twin either way (parity suite).
    oki = ok.astype(jnp.int32)
    idx0 = jnp.arange(n, dtype=jnp.int32)[None, :]
    count = jnp.sum(oki, axis=1, keepdims=True)
    pure = jnp.sum(jnp.where(idx0 < count, oki, 0), axis=1,
                   keepdims=True) == count
    pix = jnp.where(pure & ~ok & (idx0 >= count), n_pix, pix)
    rq = jnp.clip((r * rq_scale).astype(jnp.int32), 0, rq_max - 1)
    rqv = jnp.where(ok, rq, rq_max)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    mkey = (rqv << idx_bits) | idx
    p1 = _pack_f16x2(x, y)
    p2 = _pack_f16x2(z, rem)

    # Pad N to a LANES multiple. Padding joins the last run with losing
    # keys: rq_max in the range bits keeps them behind every real point
    # (index bits may spill upward for non-padded n — the key only grows,
    # stays positive, and rq_ok below masks any such "winner").
    n_pad = (-n) % LANES_
    if n_pad:
        pad_idx = jnp.arange(n, n + n_pad, dtype=jnp.int32)
        # pad pix = -1: the in-kernel cummax raises it to the running max,
        # joining the last run (where the losing rq_max key buries it).
        pix = jnp.concatenate(
            [pix, jnp.full((b, n_pad), -1, jnp.int32)], axis=1)
        mkey = jnp.concatenate(
            [mkey, jnp.broadcast_to((rq_max << idx_bits) + pad_idx,
                                    (b, n_pad))], axis=1)
        zpad = jnp.zeros((b, n_pad), jnp.int32)
        p1 = jnp.concatenate([p1, zpad], axis=1)
        p2 = jnp.concatenate([p2, zpad], axis=1)
    n_tot = n + n_pad
    R = n_tot // LANES_
    OUT_R = n_pix // LANES_

    # packed route: (pix << rq_bits | rq) must fit int32, pix up to the
    # n_pix out-of-range marker. Falls back to the 4-array route for
    # exotic shapes (huge n_pix with wide rq).
    if packed_route not in ("auto", "on", "off"):
        # A typo silently selecting the unpacked route would make every
        # A/B measurement a lie — reject like make_projector rejects
        # unknown layouts.
        raise ValueError(
            f"packed_route must be auto|on|off, got {packed_route!r}")
    if packed_route == "auto":
        packed = ((n_pix << rq_bits) | rq_max) < 2**31
    else:
        packed = packed_route == "on"
        if packed and ((n_pix << rq_bits) | rq_max) >= 2**31:
            raise ValueError("packed route infeasible for this shape")

    # scans per grid step: fewer grid steps amortize per-step overhead;
    # falls back to 1 when the batch doesn't divide (exactness is
    # SPB-independent — parity suite sweeps it).
    SPB = int(spb) if int(spb) > 1 and b % int(spb) == 0 else 1
    SR = SPB * R
    SOUT = SPB * OUT_R
    CROWS = SPB * (-(-(OUT_R + 2) // 8) * 8)   # kernel's padded CSTRIDE
    nblk = b // SPB

    shape3 = (nblk, SR, LANES_)
    kern = functools.partial(_ring_kernel, R, OUT_R, LANES_, LOG_LANES,
                             packed, idx_bits, rq_bits, SPB)
    okey, op1, op2 = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((None, SR, LANES_), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec((None, SOUT, LANES_), lambda s: (s, 0, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((nblk, SOUT, LANES_), jnp.int32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((CROWS, LANES_), jnp.int32),       # cpix
            pltpu.VMEM((CROWS, LANES_), jnp.int32),       # ckey
            pltpu.VMEM((CROWS, LANES_), jnp.int32),       # cp1
            pltpu.VMEM((CROWS, LANES_), jnp.int32),       # cp2
            pltpu.VMEM((SR, LANES_), jnp.int32),          # staged wpix
            pltpu.VMEM((SR, LANES_), jnp.int32),          # staged wkey
            pltpu.VMEM((SR, LANES_), jnp.int32),          # staged w1
            pltpu.VMEM((SR, LANES_), jnp.int32),          # staged w2
            pltpu.VMEM((2 * SR, 1), jnp.int32),           # off ++ cnt
            pltpu.VMEM((SOUT, LANES_), jnp.int32),        # window pix
        ],
        # The adaptive-rounds gates (scratch-staged pl.when branches)
        # raise peak scoped-VMEM past the 16M default (measured 17.9M at
        # flagship R=64/OUT_R=32: the branch bodies' live sets overlap
        # the mainline's) — give Mosaic room.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(pix.reshape(shape3), mkey.reshape(shape3),
      p1.reshape(shape3), p2.reshape(shape3))

    okey = okey.reshape(b, n_pix)
    rq_out = (okey & rq_max) if packed else (okey >> idx_bits)
    rq_ok = rq_out < rq_max
    maskf = jnp.logical_and(okey != SENTINEL, rq_ok).astype(jnp.float32)
    x, y = _unpack_f16x2(op1.reshape(b, n_pix))
    z, rem = _unpack_f16x2(op2.reshape(b, n_pix))
    depth = _rq_to_depth(rq_out, rq_scale)
    img = jnp.stack([x, y, z, rem, depth], -1) * maskf[..., None]
    return img.reshape(b, H, W, 5), maskf.reshape(b, H, W)
