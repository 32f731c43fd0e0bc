"""Parity of the Pallas ring kernel (interpret mode on CPU) against the
XLA ring path and the sequential numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.data.synthetic import synthetic_ring_batch
from deeplio_tpu.ops import projection as proj
from deeplio_tpu.ops import projection_pallas_ring as ppr

# Heavy end-to-end/parity module: excluded from the fast inner loop
# (`pytest -m "not slow"`); full suite runs everything.
pytestmark = pytest.mark.slow

# H*W = 8192 = 4 output blocks of LANES=2048; N = 8192 = 4 point rows —
# exercises the row-carry scans, cross-row runs, store_row wrap paths and
# multi-block gather windows (NOT just the degenerate R=1/OUT_R=1 case).
H, W, FU, FD = 64, 128, 3.0, -25.0
N = 8192


def _ring_cloud(seed, b=1, n=N, invalid_frac=0.0):
    rng = np.random.default_rng(seed)
    pts = synthetic_ring_batch(rng, b, n, rings=H, fov_up_deg=FU,
                               fov_down_deg=FD)
    valid = rng.uniform(size=(b, n)) >= invalid_frac
    return jnp.asarray(pts), jnp.asarray(valid)


@pytest.mark.parametrize("seed,invalid_frac", [(0, 0.0), (1, 0.3)])
def test_matches_xla_ring_carry_f16(seed, invalid_frac):
    pts, valid = _ring_cloud(seed, b=2, invalid_frac=invalid_frac)
    ik, mk = ppr.project_batch_ring_pallas(pts, valid, H, W, FU, FD,
                                           interpret=True)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(ix))


def test_matches_numpy_oracle():
    pts, valid = _ring_cloud(3)
    ik, mk = ppr.project_batch_ring_pallas(pts, valid, H, W, FU, FD,
                                           interpret=True)
    io, mo = proj.project_scan_np(np.asarray(pts[0]), np.asarray(valid[0]),
                                  H, W, FU, FD, key_layout="index")
    np.testing.assert_array_equal(np.asarray(mk[0]), mo)
    # winner identity is exact; x/y/z/rem carry f16 rounding, depth is the
    # quantized-range reconstruction.
    np.testing.assert_allclose(np.asarray(ik[0, ..., :4]), io[..., :4],
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(ik[0, ..., 4]), io[..., 4],
                               atol=0.05)


def test_unpadded_point_count():
    # N not a multiple of 512 exercises the pad path (pad joins last run).
    pts, valid = _ring_cloud(4, n=7040)   # pads to 8192
    ik, mk = ppr.project_batch_ring_pallas(pts, valid, H, W, FU, FD,
                                           interpret=True)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(ix))


def test_all_invalid():
    pts, _ = _ring_cloud(5)
    valid = jnp.zeros((1, N), bool)
    ik, mk = ppr.project_batch_ring_pallas(pts, valid, H, W, FU, FD,
                                           interpret=True)
    assert float(jnp.sum(mk)) == 0.0
    assert float(jnp.sum(jnp.abs(ik))) == 0.0


def test_make_projector_cpu_fallback():
    """backend=pallas-ring on a CPU backend silently uses the bit-identical
    XLA ring path (Mosaic needs a TPU), so flagship configs stay runnable
    everywhere."""
    from deeplio_tpu.config.schema import ProjectionConfig
    cfg = ProjectionConfig(height=H, width=W, fov_up_deg=FU, fov_down_deg=FD,
                           max_points=N, packed=True, backend="pallas-ring",
                           chunk=0)
    projector = proj.make_projector(cfg, ("x", "y", "z", "remission", "depth"))
    pts, valid = _ring_cloud(9)
    img, mask = projector(pts, valid)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ix))


def test_make_projector_out_dtype():
    """out_dtype emits the training dtype from the fused projection graph
    with values equal to the f32 path cast afterwards."""
    import jax.numpy as jnp
    from deeplio_tpu.config.schema import ProjectionConfig
    cfg = ProjectionConfig(height=H, width=W, fov_up_deg=FU, fov_down_deg=FD,
                           max_points=N, backend="ring", chunk=0)
    ch = ("x", "y", "z", "remission", "depth")
    mean = (0.0, 0.0, -1.0, 0.25, 12.0)
    std = (12.0, 12.0, 1.5, 0.16, 12.0)
    p32 = proj.make_projector(cfg, ch, mean, std)
    p16 = proj.make_projector(cfg, ch, mean, std, out_dtype=jnp.bfloat16)
    pts, valid = _ring_cloud(11)
    i32, m32 = p32(pts, valid)
    i16, m16 = p16(pts, valid)
    assert i16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(m32), np.asarray(m16))
    np.testing.assert_array_equal(
        np.asarray(i32.astype(jnp.bfloat16)), np.asarray(i16))


@pytest.mark.parametrize("packed_route", ["on", "off"])
def test_packed_route_bit_identical(packed_route):
    """The packed (pix<<rq_bits|rq) routing word changes scheduling only:
    winners, payloads and masks stay bit-identical to the XLA ring path
    for both the 3-array packed and 4-array fallback routes."""
    pts, valid = _ring_cloud(13, b=2, invalid_frac=0.25)
    ik, mk = ppr.project_batch_ring_pallas(pts, valid, H, W, FU, FD,
                                           interpret=True,
                                           packed_route=packed_route)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(ix))


@pytest.mark.parametrize("spb,b", [(2, 6), (3, 6), (4, 4)])
def test_scans_per_block_bit_identical(spb, b):
    """SPB scans per grid step (flattened [SPB*R, LANES] views with
    per-scan masked row carries) changes scheduling only — bit-identical
    to the XLA twin for every batch the width divides."""
    pts, valid = _ring_cloud(15, b=b, invalid_frac=0.2)
    ik, mk = ppr.project_batch_ring_pallas(pts, valid, H, W, FU, FD,
                                           interpret=True, spb=spb)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(ix))


def test_scans_per_block_unpacked_route():
    """SPB>1 with the 4-array fallback route (packed off)."""
    pts, valid = _ring_cloud(18, b=4, invalid_frac=0.1)
    ik, mk = ppr.project_batch_ring_pallas(pts, valid, H, W, FU, FD,
                                           interpret=True, spb=2,
                                           packed_route="off")
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(ix))


def test_scans_per_block_indivisible_falls_back():
    """b % spb != 0 silently uses SPB=1 (same results)."""
    pts, valid = _ring_cloud(16, b=3)
    ik, mk = ppr.project_batch_ring_pallas(pts, valid, H, W, FU, FD,
                                           interpret=True, spb=2)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(ix))


def test_scans_per_block_tail_masks():
    """Per-scan invalid tails of DIFFERENT lengths inside one grid block:
    the re-keyed out-of-range runs and the forced start/end clauses must
    keep scans fully independent."""
    pts, _ = _ring_cloud(17, b=4)
    valid = np.ones((4, N), bool)
    valid[0, 5000:] = False
    valid[1, 7900:] = False
    valid[3, 1000:] = False
    ik, mk = ppr.project_batch_ring_pallas(pts, jnp.asarray(valid),
                                           H, W, FU, FD, interpret=True,
                                           spb=2)
    ix, mx = proj.project_batch_ring(pts, jnp.asarray(valid), H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(ix))


def test_packed_route_infeasible_raises():
    pts, valid = _ring_cloud(14)
    with pytest.raises(ValueError, match="infeasible"):
        # 1024x1024 pixels: pix marker needs 21 bits, rq 14 -> > int32.
        ppr.project_batch_ring_pallas(pts, valid, 1024, 1024, FU, FD,
                                      interpret=True, packed_route="on")


@pytest.mark.parametrize("lanes", [512, 1024, 4096])
def test_lane_width_sweep_bit_identical(lanes):
    """The lane-width knob changes scheduling only — winners, payloads and
    masks stay bit-identical to the default-LANES kernel and the XLA ring
    path (benchmarks/bench_projection.py sweeps the same widths for
    speed)."""
    pts, valid = _ring_cloud(6, b=2, invalid_frac=0.2)
    ik, mk = ppr.project_batch_ring_pallas(pts, valid, H, W, FU, FD,
                                           interpret=True, lanes=lanes)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(ix))


def test_long_equal_pixel_run_takes_gated_branch():
    """A 3000-point run of one pixel mid-scan defeats the K0-round settle
    check: the adaptive seg-min must take its full-rounds branch and stay
    bit-identical to the XLA twin (run winner = min key over the run)."""
    pts, valid = _ring_cloud(7)
    p = np.array(pts)
    # collapse points 2000..5000 onto one direction (same pixel), varied
    # ranges so the winner is a real min over the whole run
    rng = np.random.default_rng(8)
    rr = rng.uniform(2.0, 70.0, 3000)
    d = p[0, 2500] / np.linalg.norm(p[0, 2500, :3])
    p[0, 2000:5000, :3] = d[None, :3] * rr[:, None] * 30.0
    pts = jnp.asarray(p)
    ik, mk = ppr.project_batch_ring_pallas(pts, valid, H, W, FU, FD,
                                           interpret=True)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(ix))


def test_pure_tail_invalid_mask_rekeyed():
    """The loader shape (real points + invalid tail padding) is re-keyed to
    an out-of-range run so the adaptive gates settle — results must stay
    bit-identical to the XLA twin, which keeps inherit semantics."""
    pts, _ = _ring_cloud(12, b=2)
    valid = np.ones((2, N), bool)
    valid[0, 5000:] = False           # 3192-lane tail
    valid[1, 7900:] = False
    ik, mk = ppr.project_batch_ring_pallas(pts, jnp.asarray(valid),
                                           H, W, FU, FD, interpret=True)
    ix, mx = proj.project_batch_ring(pts, jnp.asarray(valid), H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ik), np.asarray(ix))
