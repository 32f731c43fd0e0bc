"""Native C++ slot-bin op vs the numpy oracle (data/synthetic.py::
slot_bin_scan_np). The selection/placement logic must be BIT-EXACT (it is
pure integer work, tested via injected keys); the end-to-end path may in
principle differ on pixel-boundary points by trig ulps (native/
slot_bin_trig.cpp caveat, measured zero flips over 4M points) — the fixed
fixtures here are expected to match exactly and pin any regression.
"""

import ctypes

import numpy as np
import pytest

from deeplio_tpu import native
from deeplio_tpu.data import synthetic as syn

H, W = 32, 256
N_PIX = H * W

pytestmark = pytest.mark.skipif(
    native.lib() is None,
    reason=f"native toolchain unavailable: {native.build_error()}")


def _cloud(seed, n, invalid_frac=0.1):
    rng = np.random.default_rng(seed)
    world = syn.synthetic_world(20000, seed=seed)
    Ts, _ = syn.synthetic_trajectory(2, seed=seed)
    pts, valid = syn.synthetic_scan(world, Ts[0], n, seed=seed)
    pts = np.array(pts)
    valid = np.array(valid) & (rng.uniform(size=n) >= invalid_frac)
    return pts, valid


@pytest.mark.parametrize("spp", [1, 2, 3])
@pytest.mark.parametrize("layout", ["slots", "halves"])
def test_matches_numpy_oracle(spp, layout):
    pts, valid = _cloud(spp, 3 * N_PIX)
    a, av = syn.slot_bin_scan(pts, valid, H, W, spp, layout=layout)
    b, bv = syn.slot_bin_scan_np(pts, valid, H, W, spp, layout=layout)
    np.testing.assert_array_equal(av, bv)
    np.testing.assert_array_equal(a, b)


def test_all_invalid_and_empty_pixels():
    pts, _ = _cloud(7, 2 * N_PIX)
    valid = np.zeros(2 * N_PIX, bool)
    a, av = syn.slot_bin_scan(pts, valid, H, W, 2)
    assert not av.any() and not a.any()


def test_far_points_clip_like_numpy():
    """Beyond-key-ceiling ranges must follow the clipped-tie rule on both
    paths (round-5 advisor fix applies to both)."""
    pts, valid = _cloud(9, 3 * N_PIX)
    rng = np.random.default_rng(9)
    far = rng.uniform(size=len(pts)) < 0.4
    pts[far, :3] *= 60.0
    a, av = syn.slot_bin_scan(pts, valid, H, W, 2)
    b, bv = syn.slot_bin_scan_np(pts, valid, H, W, 2)
    np.testing.assert_array_equal(av, bv)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("layout_id,layout", [(0, "slots"), (1, "halves")])
def test_selection_logic_bit_exact_from_keys(layout_id, layout):
    """Inject (pix, rq, ok) directly: the native selection must reproduce
    the oracle's (quantized range, original index) rule exactly,
    including rq ties (first point wins) and over-subscribed pixels."""
    rng = np.random.default_rng(0)
    n, n_pix, spp = 5000, 64, 3
    pix = rng.integers(0, n_pix, n).astype(np.int32)
    rq = rng.integers(0, 5, n).astype(np.int32)  # heavy tie pressure
    ok = (rng.uniform(size=n) > 0.2).astype(np.uint8)

    lib = native.lib()
    out_src = np.empty(n_pix * spp, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.dlt_slot_bin_from_keys(
        pix.ctypes.data_as(i32p), rq.ctypes.data_as(i32p),
        ok.ctypes.data_as(u8p), n, n_pix, spp, layout_id,
        out_src.ctypes.data_as(i32p))

    # oracle: stable lexsort by (pix, rq), rank < spp
    sel = np.flatnonzero(ok.astype(bool))
    order = sel[np.lexsort((rq[sel], pix[sel]))]
    expect = np.full(n_pix * spp, -1, np.int32)
    counts = np.zeros(n_pix, np.int64)
    for i in order:
        p = pix[i]
        if counts[p] < spp:
            rank = counts[p]
            pos = rank * n_pix + p if layout == "halves" else p * spp + rank
            expect[pos] = i
            counts[p] += 1
    np.testing.assert_array_equal(out_src, expect)


def test_batch_entry_matches_scan_entry():
    lib = native.lib()
    spp, n = 2, 2 * N_PIX
    scans = [_cloud(s, n) for s in range(3)]
    pts = np.stack([p for p, _ in scans])
    valid = np.stack([v for _, v in scans]).astype(np.uint8)
    from deeplio_tpu.ops.projection import _idx_key_layout

    _, rq_bits, rq_scale = _idx_key_layout(n, N_PIX)
    cap = N_PIX * spp
    out = np.empty((3, cap, 4), np.float32)
    out_valid = np.empty((3, cap), np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.dlt_slot_bin_batch(
        np.ascontiguousarray(pts).ctypes.data_as(f32p),
        np.ascontiguousarray(valid).ctypes.data_as(u8p),
        3, n, H, W, spp, 3.0, -25.0, float(rq_scale),
        (1 << rq_bits) - 2, 0,
        out.ctypes.data_as(f32p), out_valid.ctypes.data_as(u8p))
    for s, (p, v) in enumerate(scans):
        a, av = syn.slot_bin_scan(p, v, H, W, spp)
        np.testing.assert_array_equal(out[s], a)
        np.testing.assert_array_equal(out_valid[s].view(bool), av)
