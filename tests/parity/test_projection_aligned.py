"""Parity of the slot-aligned direct route (pure XLA, no kernel) against
the XLA ring path and the sequential numpy oracle.

The route (ops/projection.py::project_batch_ring_aligned_planes) replaces
the whole scan/route/compact pipeline with a windowed min when the scan is
a fixed ring/azimuth grid — the synthetic fixtures satisfy the contract
exactly (u = floor(slot/SPP) for every jitter draw), and a runtime
predicate + lax.cond falls back to the ring path otherwise, so the output
must be bit-identical to project_batch_ring(payload="carry-f16") on EVERY
input, aligned or not.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.data.synthetic import synthetic_ring_batch
from deeplio_tpu.ops import projection as proj

H, W, FU, FD = 64, 128, 3.0, -25.0
N2 = 2 * H * W          # SPP=2, the flagship shape class
N1 = H * W              # SPP=1


def _ring_cloud(seed, b=2, n=N2, invalid_frac=0.0):
    rng = np.random.default_rng(seed)
    pts = synthetic_ring_batch(rng, b, n, rings=H, fov_up_deg=FU,
                               fov_down_deg=FD)
    valid = rng.uniform(size=(b, n)) >= invalid_frac
    return jnp.asarray(pts), jnp.asarray(valid)


def _fallback(x, y, z, rem, vld):
    return proj.project_batch_ring(jnp.stack((x, y, z, rem), -1), vld,
                                   H, W, FU, FD, payload="carry-f16")


def _aligned(pts, valid, check="cond"):
    return proj.project_batch_ring_aligned_planes(
        pts[..., 0], pts[..., 1], pts[..., 2], pts[..., 3], valid,
        H, W, FU, FD, check=check,
        fallback=_fallback if check == "cond" else None)


@pytest.mark.parametrize("check", ["cond", "assert-off"])
@pytest.mark.parametrize("n,invalid_frac", [(N2, 0.0), (N2, 0.3), (N1, 0.2)])
def test_matches_xla_ring(check, n, invalid_frac):
    pts, valid = _ring_cloud(0, n=n, invalid_frac=invalid_frac)
    ia, ma = _aligned(pts, valid, check)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ix))


@pytest.mark.parametrize("spp", [3, 5, 6, 7])
def test_non_power_of_two_spp(spp):
    """Regression (round-5 advisor, high): the windowed-min doubling loop
    used to cover next_pow2(spp) slots, so for spp=3/5/6 pixels stole
    their neighbours' winners (and wrapped at the scan end). The final
    overlapping round makes the window exactly spp — the route must match
    the XLA ring path bit-for-bit for any aligned spp, in both check
    modes, including with invalid points."""
    n = spp * H * W
    pts, valid = _ring_cloud(20 + spp, n=n, invalid_frac=0.25)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    for check in ("cond", "assert-off"):
        ia, ma = _aligned(pts, valid, check)
        np.testing.assert_array_equal(np.asarray(ma), np.asarray(mx))
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ix))


def test_slot_bin_clips_range_to_key_ceiling():
    """Regression (round-5 advisor, low): slot_bin_scan used to lexsort by
    UNCLIPPED quantized range; beyond the key ceiling (~164 m at 131k
    capacity) the host could keep/order candidates differently from the
    clipped-tie first-index rule the device and oracle share. Scaled-up
    far points must now reproduce the oracle exactly."""
    from deeplio_tpu.data.synthetic import slot_bin_scan

    rng = np.random.default_rng(42)
    n_raw = 3 * H * W
    pts, _ = _ring_cloud(21, b=1, n=n_raw)
    pts = np.array(pts[0])  # writable copy (np.asarray of a jax array is RO)
    # push a third of the cloud past the ceiling (range x50 ~ 250-1000 m)
    far = rng.uniform(size=n_raw) < 0.33
    pts[far, :3] *= 50.0
    pts = pts[rng.permutation(n_raw)]
    valid = rng.uniform(size=n_raw) >= 0.2

    spp = 2
    binned, bvalid = slot_bin_scan(pts, valid, H, W, spp, FU, FD)
    jb, jv = jnp.asarray(binned)[None], jnp.asarray(bvalid)[None]
    ia, ma = proj.project_batch_ring_aligned_planes(
        jb[..., 0], jb[..., 1], jb[..., 2], jb[..., 3], jv,
        H, W, FU, FD, check="assert-off")
    io, mo = proj.project_scan_np(pts, valid, H, W, FU, FD,
                                  key_layout="index")
    np.testing.assert_array_equal(np.asarray(ma[0]), mo)
    # f16 payload round-trip: ~1e-3 relative at any magnitude (values
    # here reach ~1000 m, so abs tolerance alone would be misleading).
    np.testing.assert_allclose(np.asarray(ia[0, ..., :4]), io[..., :4],
                               rtol=2e-3, atol=0.05)


def test_pure_tail_padding():
    # real-loader shape: scan padded to max_points with an invalid tail.
    pts, _ = _ring_cloud(1)
    valid = np.ones((2, N2), bool)
    valid[:, N2 - 3000:] = False
    valid = jnp.asarray(valid)
    ia, ma = _aligned(pts, valid)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ix))


def test_misaligned_takes_fallback():
    # shift the stream one slot: ~half the valid points sit off their
    # slot pixel, so the predicate must route to the ring path — and the
    # direct path (forced via assert-off) must actually DIFFER, proving
    # the predicate is load-bearing.
    pts, valid = _ring_cloud(2)
    pts = jnp.roll(pts, 1, axis=1)
    ia, ma = _aligned(pts, valid)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry-f16")
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ix))
    id_, _ = _aligned(pts, valid, check="assert-off")
    assert not bool(jnp.all(id_ == ix))


def test_matches_numpy_oracle():
    pts, valid = _ring_cloud(3, b=1)
    ia, ma = _aligned(pts, valid)
    io, mo = proj.project_scan_np(np.asarray(pts[0]), np.asarray(valid[0]),
                                  H, W, FU, FD, key_layout="index")
    np.testing.assert_array_equal(np.asarray(ma[0]), mo)
    np.testing.assert_allclose(np.asarray(ia[0, ..., :4]), io[..., :4],
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(ia[0, ..., 4]), io[..., 4],
                               atol=0.05)


def test_all_invalid():
    pts, _ = _ring_cloud(4, b=1)
    valid = jnp.zeros((1, N2), bool)
    ia, ma = _aligned(pts, valid)
    assert float(jnp.sum(ma)) == 0.0
    assert float(jnp.sum(jnp.abs(ia))) == 0.0
    assert not bool(jnp.any(jnp.isnan(ia)))


def test_feasibility_and_arg_validation():
    assert proj.aligned_route_feasible(N2, H, W)
    assert proj.aligned_route_feasible(N1, H, W)
    assert not proj.aligned_route_feasible(N2 - 1, H, W)
    pts, valid = _ring_cloud(5, b=1)
    with pytest.raises(ValueError, match="fallback"):
        proj.project_batch_ring_aligned_planes(
            pts[..., 0], pts[..., 1], pts[..., 2], pts[..., 3], valid,
            H, W, FU, FD, check="cond", fallback=None)
    with pytest.raises(ValueError, match="check"):
        proj.project_batch_ring_aligned_planes(
            pts[..., 0], pts[..., 1], pts[..., 2], pts[..., 3], valid,
            H, W, FU, FD, check="bogus", fallback=_fallback)
    bad = pts[:, : N2 - 10]
    with pytest.raises(ValueError, match="aligned"):
        proj.project_batch_ring_aligned_planes(
            bad[..., 0], bad[..., 1], bad[..., 2], bad[..., 3],
            valid[:, : N2 - 10], H, W, FU, FD, check="assert-off")


def test_make_projector_knob():
    """kernel-aligned threads through make_projector: on a CPU backend the
    aligned route must be bit-identical to the kernel-aligned=off (XLA
    ring) dispatch, for both layouts."""
    from deeplio_tpu.config.schema import ProjectionConfig

    pts, valid = _ring_cloud(6)
    base = dict(height=H, width=W, fov_up_deg=FU, fov_down_deg=FD,
                max_points=N2, backend="pallas-ring", packed=True)
    chans = ("x", "y", "z", "remission", "depth")
    ref = proj.make_projector(ProjectionConfig(**base), chans)(pts, valid)
    for mode in ("auto", "on", "trust"):
        got = proj.make_projector(
            ProjectionConfig(**base, kernel_aligned=mode), chans)(pts, valid)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    planes = tuple(pts[..., i] for i in range(4))
    gotp = proj.make_projector(
        ProjectionConfig(**base, kernel_aligned="auto"), chans,
        layout="planes")(planes, valid)
    np.testing.assert_array_equal(np.asarray(gotp[0]), np.asarray(ref[0]))
    with pytest.raises(ValueError, match="kernel-aligned"):
        proj.make_projector(
            ProjectionConfig(**base, kernel_aligned="bogus"), chans)

    # infeasible shape: auto falls back statically, on raises at call.
    short = pts[:, : N2 - 512]
    vshort = valid[:, : N2 - 512]
    auto_fn = proj.make_projector(
        ProjectionConfig(**{**base, "max_points": N2 - 512},
                         kernel_aligned="auto"), chans)
    refs = proj.make_projector(
        ProjectionConfig(**{**base, "max_points": N2 - 512}), chans)(
            short, vshort)
    gots = auto_fn(short, vshort)
    np.testing.assert_array_equal(np.asarray(gots[0]), np.asarray(refs[0]))
    on_fn = proj.make_projector(
        ProjectionConfig(**{**base, "max_points": N2 - 512},
                         kernel_aligned="on"), chans)
    with pytest.raises(ValueError, match="infeasible"):
        on_fn(short, vshort)


def test_slot_bin_matches_oracle():
    """Binning an ARBITRARY-ORDER scan onto the slot grid + the direct
    route reproduces the sequential numpy oracle's projection of the
    original scan (the reference's host-numpy semantics): same winners
    incl. quantized-range ties, dropped per-pixel losers never win."""
    from deeplio_tpu.data.synthetic import slot_bin_scan

    rng = np.random.default_rng(7)
    n_raw = 3 * H * W  # more candidates than slots -> real drops
    pts, _ = _ring_cloud(7, b=1, n=n_raw)
    pts = np.asarray(pts[0])
    perm = rng.permutation(n_raw)
    pts = pts[perm]                      # destroy ring order entirely
    valid = rng.uniform(size=n_raw) >= 0.2

    spp = 2
    binned, bvalid = slot_bin_scan(pts, valid, H, W, spp, FU, FD)
    assert binned.shape == (H * W * spp, 4) and bvalid.shape == (H * W * spp,)
    jb, jv = jnp.asarray(binned)[None], jnp.asarray(bvalid)[None]
    ia, ma = proj.project_batch_ring_aligned_planes(
        jb[..., 0], jb[..., 1], jb[..., 2], jb[..., 3], jv,
        H, W, FU, FD, check="assert-off")
    io, mo = proj.project_scan_np(pts, valid, H, W, FU, FD,
                                  key_layout="index")
    np.testing.assert_array_equal(np.asarray(ma[0]), mo)
    np.testing.assert_allclose(np.asarray(ia[0, ..., :4]), io[..., :4],
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(ia[0, ..., 4]), io[..., 4],
                               atol=0.05)


def test_slot_bin_drive_wiring():
    """datasets `slot-bin: true` threads through build_drives into
    KittiRawDrive; binned scans come back grid-shaped, and per-point
    labels are refused (they index the raw order)."""
    from deeplio_tpu.data.drives import KittiRawDrive

    d = KittiRawDrive.__new__(KittiRawDrive)
    d.max_points = 2 * H * W
    d.slot_grid = (H, W, FU, FD)
    with pytest.raises(ValueError, match="slot-bin"):
        d.labels(0, "/nonexistent")
    # constructor validation precedes any IO (no on-disk tree needed)
    with pytest.raises(ValueError, match="multiple"):
        KittiRawDrive("/nonexistent", "2011_09_26", 1,
                      max_points=2 * H * W - 1, slot_grid=(H, W, FU, FD))


# --------------------------------------------------------------------------
# dual-half layout route (kernel-aligned=halves)
# --------------------------------------------------------------------------

def _to_halves(a, n=N2):
    idx = proj.halves_permutation(n, H, W)
    return a[:, idx]


@pytest.mark.parametrize("n,invalid_frac", [(N2, 0.0), (N2, 0.3), (N1, 0.2)])
def test_halves_matches_xla_ring_carry(n, invalid_frac):
    """The halves route carries EXACT f32 payloads + exact winner range —
    project_batch_ring(payload="carry") semantics, bit-for-bit."""
    pts, valid = _ring_cloud(10, n=n, invalid_frac=invalid_frac)
    ix, mx = proj.project_batch_ring(pts, valid, H, W, FU, FD,
                                     payload="carry")
    idx = proj.halves_permutation(n, H, W)
    hp = pts[:, idx]
    hv = valid[:, idx]
    ia, ma = proj.project_batch_ring_halves_planes(
        hp[..., 0], hp[..., 1], hp[..., 2], hp[..., 3], hv, H, W, FU, FD)
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ix))


def test_halves_matches_numpy_oracle_exactly():
    """Exact payloads mean the oracle comparison needs NO f16 tolerance."""
    pts, valid = _ring_cloud(11, b=1)
    idx = proj.halves_permutation(N2, H, W)
    hp, hv = pts[:, idx], valid[:, idx]
    ia, ma = proj.project_batch_ring_halves_planes(
        hp[..., 0], hp[..., 1], hp[..., 2], hp[..., 3], hv, H, W, FU, FD)
    io, mo = proj.project_scan_np(np.asarray(pts[0]), np.asarray(valid[0]),
                                  H, W, FU, FD, key_layout="index")
    np.testing.assert_array_equal(np.asarray(ma[0]), mo)
    np.testing.assert_array_equal(np.asarray(ia[0]), io)


def test_halves_knob_and_drive_layout():
    """kernel-aligned=halves through make_projector equals the exact-f32
    ring dispatch on interleaved data; build_drives makes slot-binned
    drives emit the dual-half layout straight from the binning pass (no
    PermutedDrive gather) so every consumer gets the layout."""
    from deeplio_tpu.config import load_config_dict
    from deeplio_tpu.config.schema import ProjectionConfig
    from deeplio_tpu.data.dataset import build_drives

    pts, valid = _ring_cloud(12)
    chans = ("x", "y", "z", "remission", "depth")
    ref = proj.make_projector(
        ProjectionConfig(height=H, width=W, fov_up_deg=FU, fov_down_deg=FD,
                         max_points=N2, backend="ring", packed=False),
        chans)(pts, valid)
    got = proj.make_projector(
        ProjectionConfig(height=H, width=W, fov_up_deg=FU, fov_down_deg=FD,
                         max_points=N2, backend="pallas-ring", packed=True,
                         kernel_aligned="halves"),
        chans)(_to_halves(pts), _to_halves(valid))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))

    cfg = load_config_dict({
        "arch": "deeplo",
        "datasets": {"synthetic": True, "kernel-aligned": "halves",
                     "backend": "pallas-ring", "image-height": H,
                     "image-width": W, "max-points": N2},
        "deeplo": {"lidar-feat-net": {"name": "lidar-feat-simple-0"},
                   "odom-feat-net": {"name": "odom-feat-fc"}}})
    drives = build_drives(cfg, "train")
    assert all(getattr(d, "slot_layout", None) == "halves" for d in drives)
    with pytest.raises(ValueError, match="slot-bin|halves"):
        drives[0].labels(0, "/nonexistent")
    # round-trip: drive points come straight back in halves layout —
    # identical to the slots-layout drive's points under the halves
    # permutation, and projecting them through the halves route equals
    # the ring path on the slots-layout points (slots order IS monotone
    # ring order, so the ring path accepts it directly).
    trust_cfg = load_config_dict({
        "arch": "deeplo",
        "datasets": {"synthetic": True, "kernel-aligned": "trust",
                     "backend": "pallas-ring", "image-height": H,
                     "image-width": W, "max-points": N2},
        "deeplo": {"lidar-feat-net": {"name": "lidar-feat-simple-0"},
                   "odom-feat-net": {"name": "odom-feat-fc"}}})
    hp, hv = drives[0].points(0)
    ip, iv = build_drives(trust_cfg, "train")[0].points(0)
    idx = proj.halves_permutation(N2, H, W)
    np.testing.assert_array_equal(hp, ip[idx])
    np.testing.assert_array_equal(hv, iv[idx])
    ia, ma = proj.project_batch_ring_halves_planes(
        jnp.asarray(hp[None, :, 0]), jnp.asarray(hp[None, :, 1]),
        jnp.asarray(hp[None, :, 2]), jnp.asarray(hp[None, :, 3]),
        jnp.asarray(hv[None]), H, W, FU, FD)
    ix, mx = proj.project_batch_ring(jnp.asarray(ip[None]),
                                     jnp.asarray(iv[None]), H, W, FU, FD,
                                     payload="carry")
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ix))


def test_halves_config_gates():
    from deeplio_tpu.config import ConfigError, load_config_dict

    base = {"arch": "deepio", "datasets": {"kernel-aligned": "halves"}}
    with pytest.raises(ConfigError, match="grid-aligned"):
        load_config_dict(base)
    base["datasets"]["synthetic"] = True
    load_config_dict(base)
    base["datasets"]["augment-yaw"] = True
    with pytest.raises(ConfigError, match="augment-yaw"):
        load_config_dict(base)
    base["datasets"].update({"kernel-aligned": "trust"})
    with pytest.raises(ConfigError, match="augment-yaw"):
        load_config_dict(base)
