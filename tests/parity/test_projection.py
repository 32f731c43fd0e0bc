"""Projection kernel parity vs the sequential numpy oracle (SURVEY.md §4:
exact index parity on synthetic clouds)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplio_tpu.config.schema import ProjectionConfig
from deeplio_tpu.data.synthetic import synthetic_scan, synthetic_trajectory, synthetic_world
from deeplio_tpu.ops import projection as proj

# Heavy end-to-end/parity module: excluded from the fast inner loop
# (`pytest -m "not slow"`); full suite runs everything.
pytestmark = pytest.mark.slow

H, W = 32, 256
FU, FD = 3.0, -25.0


def assert_img_parity(img_j, img_n):
    """Winner channels (x,y,z,remission) are copies -> bit-exact; the range
    channel is recomputed (jnp FMA vs numpy) -> ulp tolerance."""
    img_j = np.asarray(img_j)
    np.testing.assert_array_equal(img_j[..., :4], img_n[..., :4])
    np.testing.assert_allclose(img_j[..., 4], img_n[..., 4], atol=1e-5, rtol=1e-6)


def _random_cloud(rng, n, n_valid=None):
    pts = np.zeros((n, 4), np.float32)
    m = n if n_valid is None else n_valid
    rr = rng.uniform(2.0, 70.0, m)
    yaw = rng.uniform(-np.pi, np.pi, m)
    pitch = rng.uniform(np.deg2rad(FD), np.deg2rad(FU), m)
    pts[:m, 0] = rr * np.cos(pitch) * np.cos(yaw)
    pts[:m, 1] = rr * np.cos(pitch) * np.sin(yaw)
    pts[:m, 2] = rr * np.sin(pitch)
    pts[:m, 3] = rng.uniform(0, 1, m)
    valid = np.zeros(n, bool)
    valid[:m] = True
    return pts, valid


class TestParity:
    @pytest.mark.parametrize("n,seed", [(512, 0), (4096, 1), (20000, 2)])
    def test_exact_parity_random(self, n, seed):
        rng = np.random.default_rng(seed)
        pts, valid = _random_cloud(rng, n)
        img_j, mask_j = jax.jit(
            lambda p, v: proj.project_scan(p, v, H, W, FU, FD)
        )(jnp.asarray(pts), jnp.asarray(valid))
        img_n, mask_n = proj.project_scan_np(pts, valid, H, W, FU, FD)
        np.testing.assert_array_equal(np.asarray(mask_j), mask_n)
        assert_img_parity(img_j, img_n)

    def test_parity_with_padding(self):
        rng = np.random.default_rng(3)
        pts, valid = _random_cloud(rng, 4096, n_valid=1000)
        # Poison the padded region — it must be ignored.
        pts[1000:] = 123.0
        img_j, mask_j = proj.project_scan(jnp.asarray(pts), jnp.asarray(valid), H, W, FU, FD)
        img_n, mask_n = proj.project_scan_np(pts, valid, H, W, FU, FD)
        np.testing.assert_array_equal(np.asarray(mask_j), mask_n)
        assert_img_parity(img_j, img_n)

    def test_parity_synthetic_drive(self):
        world = synthetic_world(20000, seed=5)
        Ts, _ = synthetic_trajectory(3, seed=5)
        for i in range(3):
            pts, valid = synthetic_scan(world, Ts[i], 16384, seed=i)
            img_j, mask_j = proj.project_scan(jnp.asarray(pts), jnp.asarray(valid), H, W, FU, FD)
            img_n, mask_n = proj.project_scan_np(pts, valid, H, W, FU, FD)
            np.testing.assert_array_equal(np.asarray(mask_j), mask_n)
            np.testing.assert_array_equal(np.asarray(img_j), img_n)

    def test_tie_break_first_index_wins(self):
        # Two identical points -> the first one wins (its remission shows).
        pts = np.zeros((8, 4), np.float32)
        pts[0] = [10.0, 0.0, 0.0, 0.25]
        pts[1] = [10.0, 0.0, 0.0, 0.75]
        valid = np.zeros(8, bool)
        valid[:2] = True
        img, mask = proj.project_scan(jnp.asarray(pts), jnp.asarray(valid), H, W, FU, FD)
        img_n, _ = proj.project_scan_np(pts, valid, H, W, FU, FD)
        got = np.asarray(img)
        assert mask.sum() == 1.0
        np.testing.assert_array_equal(got, img_n)
        assert got[..., 3].max() == np.float32(0.25)

    def test_closest_wins(self):
        pts = np.zeros((4, 4), np.float32)
        pts[0] = [20.0, 0.0, 0.0, 0.1]
        pts[1] = [10.0, 0.0, 0.0, 0.9]  # closer, same direction
        valid = np.array([True, True, False, False])
        img, mask = proj.project_scan(jnp.asarray(pts), jnp.asarray(valid), H, W, FU, FD)
        got = np.asarray(img)
        assert got[..., 4].max() == np.float32(10.0)
        assert got[..., 3].max() == np.float32(0.9)

    def test_all_invalid(self):
        pts = np.ones((16, 4), np.float32)
        valid = np.zeros(16, bool)
        img, mask = proj.project_scan(jnp.asarray(pts), jnp.asarray(valid), H, W, FU, FD)
        assert float(jnp.abs(img).sum()) == 0.0
        assert float(mask.sum()) == 0.0


class TestNormals:
    def test_wall_normal(self):
        # A vertical wall at x=10 -> normals should point along -x (toward
        # or away from sensor depending on winding); check axis alignment.
        rng = np.random.default_rng(0)
        ys = rng.uniform(-3, 3, 5000)
        zs = rng.uniform(-2, 1, 5000)
        pts = np.zeros((8192, 4), np.float32)
        pts[:5000] = np.stack([np.full(5000, 10.0), ys, zs, np.ones(5000)], -1)
        valid = np.zeros(8192, bool)
        valid[:5000] = True
        img, mask = proj.project_scan(jnp.asarray(pts), jnp.asarray(valid), H, W, FU, FD)
        n = proj.compute_normals(img[..., :3], mask)
        n = np.asarray(n)
        filled = np.asarray(mask) > 0.5
        # Consider only pixels with a complete stencil (nonzero normal).
        nz = np.linalg.norm(n, axis=-1) > 0.5
        sel = filled & nz
        assert sel.sum() > 50
        ax = np.abs(n[sel])
        assert (ax[:, 0] > 0.9).mean() > 0.8  # dominantly +-x

    def test_normals_zero_on_empty(self):
        img = jnp.zeros((H, W, 3))
        mask = jnp.zeros((H, W))
        n = proj.compute_normals(img, mask)
        assert float(jnp.abs(n).sum()) == 0.0


class TestChannelsAndNormalize:
    def test_assemble_order_and_width(self):
        rng = np.random.default_rng(1)
        pts, valid = _random_cloud(rng, 2048)
        img5, mask = proj.project_scan(jnp.asarray(pts), jnp.asarray(valid), H, W, FU, FD)
        img = proj.assemble_channels(img5, mask, ["depth", "remission", "normals"])
        assert img.shape == (H, W, 5)
        np.testing.assert_array_equal(np.asarray(img[..., 0]), np.asarray(img5[..., 4]))
        np.testing.assert_array_equal(np.asarray(img[..., 1]), np.asarray(img5[..., 3]))

    def test_normalize_zeroes_empty(self):
        img = jnp.ones((4, 4, 2))
        mask = jnp.zeros((4, 4)).at[0, 0].set(1.0)
        out = proj.normalize_channels(img, mask, [0.5, 0.0], [0.5, 2.0])
        out = np.asarray(out)
        assert out[0, 0, 0] == 1.0 and out[0, 0, 1] == 0.5
        assert np.abs(out[1:, :, :]).sum() == 0.0

    def test_make_projector_end_to_end_jit_vmap(self):
        cfg = ProjectionConfig(height=H, width=W, fov_up_deg=FU, fov_down_deg=FD)
        fn = proj.make_projector(cfg, ["x", "y", "z", "remission", "depth"],
                                 mean=[0, 0, 0, 0.5, 20.0], std=[10, 10, 2, 0.3, 20.0])
        rng = np.random.default_rng(2)
        batch_pts = np.stack([_random_cloud(rng, 2048)[0] for _ in range(3)])
        batch_valid = np.ones((3, 2048), bool)
        imgs, masks = jax.jit(jax.vmap(fn))(jnp.asarray(batch_pts), jnp.asarray(batch_valid))
        assert imgs.shape == (3, H, W, 5)
        assert masks.shape == (3, H, W)
        assert np.isfinite(np.asarray(imgs)).all()

    def test_projector_rejects_bad_mean_width(self):
        cfg = ProjectionConfig(height=H, width=W)
        with pytest.raises(ValueError):
            proj.make_projector(cfg, ["depth"], mean=[1, 2], std=[1, 2])


class TestPackedMode:
    def test_packed_close_to_exact(self):
        rng = np.random.default_rng(11)
        pts, valid = _random_cloud(rng, 8192)
        exact, m1 = proj.project_batch(jnp.asarray(pts)[None], jnp.asarray(valid)[None],
                                       H, W, FU, FD, packed=False)
        packd, m2 = proj.project_batch(jnp.asarray(pts)[None], jnp.asarray(valid)[None],
                                       H, W, FU, FD, packed=True)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        e, p = np.asarray(exact)[0], np.asarray(packd)[0]
        # f16 rounding on xyz: rel ~2^-11 of magnitude (<=70m -> <4cm)
        np.testing.assert_allclose(p[..., :3], e[..., :3], atol=0.05)
        np.testing.assert_allclose(p[..., 3], e[..., 3], atol=2e-3)  # remission
        # range reconstructed from the 1cm-quantized key
        np.testing.assert_allclose(p[..., 4], e[..., 4], atol=0.011)

    def test_packed_winners_identical(self):
        # Same sort keys -> identical winner selection (mask + quantized r).
        rng = np.random.default_rng(12)
        pts, valid = _random_cloud(rng, 4096, n_valid=3000)
        _, m1 = proj.project_batch(jnp.asarray(pts)[None], jnp.asarray(valid)[None],
                                   H, W, FU, FD, packed=False)
        _, m2 = proj.project_batch(jnp.asarray(pts)[None], jnp.asarray(valid)[None],
                                   H, W, FU, FD, packed=True)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


class TestJumpCompaction:
    def test_matches_sort_based_compaction(self, rng):
        """Randomized property test of the LSB-first jump router against
        numpy fancy-indexing compaction (monotone distinct destinations)."""
        import jax.numpy as jnp
        from deeplio_tpu.ops.projection import _jump_compact
        for trial in range(20):
            m = int(rng.integers(64, 2048))
            n_keep = int(rng.integers(1, m // 2 + 1))
            pos_keep = np.sort(rng.choice(m, n_keep, replace=False))
            keep = np.zeros(m, bool)
            keep[pos_keep] = True
            dest = np.zeros(m, np.int32)
            dest[pos_keep] = np.arange(n_keep)
            vals = rng.integers(0, 1 << 30, m).astype(np.int32)
            vals2 = rng.integers(0, 1 << 30, m).astype(np.int32)
            out, live = _jump_compact(
                jnp.asarray(keep)[None], jnp.asarray(dest)[None],
                [jnp.asarray(vals)[None], jnp.asarray(vals2)[None]], n_keep)
            np.testing.assert_array_equal(np.asarray(out[0])[0], vals[pos_keep])
            np.testing.assert_array_equal(np.asarray(out[1])[0], vals2[pos_keep])
            assert bool(np.asarray(live)[0, :n_keep].all())

    def test_expand_inverts_compact(self, rng):
        """MSB-first expansion scatters compacted values back to strictly
        increasing destinations (the time-reversal property)."""
        import jax.numpy as jnp
        from deeplio_tpu.ops.projection import _jump_expand
        for trial in range(20):
            m = int(rng.integers(64, 2048))
            n_live = int(rng.integers(1, m + 1))
            dest_vals = np.sort(rng.choice(m, n_live, replace=False))
            # Elements sit compacted at the front; dest[i] >= i guaranteed
            # by sortedness + distinctness.
            live = np.zeros(m, bool)
            live[:n_live] = True
            dest = np.zeros(m, np.int32)
            dest[:n_live] = dest_vals
            vals = rng.integers(0, 1 << 30, m).astype(np.int32)
            out, landed = _jump_expand(
                jnp.asarray(live)[None], jnp.asarray(dest)[None],
                [jnp.asarray(vals)[None]])
            expect = np.zeros(m, np.int32)
            expect[dest_vals] = vals[:n_live]
            got = np.where(np.asarray(landed)[0], np.asarray(out[0])[0], 0)
            np.testing.assert_array_equal(got, expect)
            np.testing.assert_array_equal(
                np.asarray(landed)[0], np.isin(np.arange(m), dest_vals))


def _ring_cloud(rng, n, H, W, n_valid=None, dropout=0.0, fu=FU, fd=FD):
    """Spinning-sensor-ordered cloud with ring pitches at row centers."""
    rings, per = H, n // H
    fur, fdr = np.deg2rad(fu), np.deg2rad(fd)
    fov = fur - fdr
    pitch = fdr + fov * (1.0 - (np.arange(rings) + 0.5) / H)
    jit = rng.uniform(0.05, 0.95, (rings, per))
    yaw = np.pi - 2 * np.pi * (np.arange(per) + jit) / per
    rr = rng.uniform(2.0, 70.0, (rings, per))
    cp = np.cos(pitch)[:, None]
    pts = np.stack([rr * cp * np.cos(yaw), rr * cp * np.sin(yaw),
                    rr * np.sin(pitch)[:, None],
                    rng.uniform(0, 1, (rings, per))], -1)
    pts = pts.reshape(n, 4).astype(np.float32)
    valid = np.ones(n, bool)
    if dropout:
        valid &= rng.uniform(size=n) > dropout
    if n_valid is not None:
        valid[n_valid:] = False
    return pts, valid


class TestSortedFreeParity:
    """Sentinel-free sort backend vs the oracle (arbitrary point order)."""

    @pytest.mark.parametrize("n,nv,seed", [(512, None, 0), (4096, 1000, 1),
                                           (20000, None, 2)])
    def test_carry_exact(self, n, nv, seed):
        rng = np.random.default_rng(seed)
        pts, valid = _random_cloud(rng, n, n_valid=nv)
        img_j, mask_j = jax.jit(lambda p, v: proj.project_batch_sorted(
            p[None], v[None], H, W, FU, FD))(jnp.asarray(pts),
                                             jnp.asarray(valid))
        img_n, mask_n = proj.project_scan_np(pts, valid, H, W, FU, FD)
        np.testing.assert_array_equal(np.asarray(mask_j)[0], mask_n)
        assert_img_parity(img_j[0], img_n)

    def test_carry_f16_winners_identical(self):
        rng = np.random.default_rng(3)
        pts, valid = _random_cloud(rng, 8192)
        j = jnp.asarray(pts)[None], jnp.asarray(valid)[None]
        exact, m1 = proj.project_batch_sorted(*j, H, W, FU, FD)
        f16, m2 = proj.project_batch_sorted(*j, H, W, FU, FD,
                                            payload="carry-f16")
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        e, p = np.asarray(exact)[0], np.asarray(f16)[0]
        np.testing.assert_allclose(p[..., :3], e[..., :3], atol=0.05)
        np.testing.assert_allclose(p[..., 4], e[..., 4], atol=0.011)

    def test_gather_matches_carry(self):
        rng = np.random.default_rng(4)
        pts, valid = _random_cloud(rng, 4096, n_valid=3000)
        j = jnp.asarray(pts)[None], jnp.asarray(valid)[None]
        a, m1 = proj.project_batch_sorted(*j, H, W, FU, FD, payload="carry")
        b, m2 = proj.project_batch_sorted(*j, H, W, FU, FD, payload="gather")
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_array_equal(np.asarray(a)[..., :4],
                                      np.asarray(b)[..., :4])

    def test_small_capacity_vs_image(self):
        # max_points < H*W exercises the pad-before-expand path.
        rng = np.random.default_rng(5)
        pts, valid = _random_cloud(rng, 1024)
        img_j, mask_j = proj.project_batch_sorted(
            jnp.asarray(pts)[None], jnp.asarray(valid)[None], H, W, FU, FD)
        img_n, mask_n = proj.project_scan_np(pts, valid, H, W, FU, FD)
        np.testing.assert_array_equal(np.asarray(mask_j)[0], mask_n)
        assert_img_parity(img_j[0], img_n)


class TestRingParity:
    """Sort-free ring backend vs the oracle on sensor-ordered clouds."""

    @pytest.mark.parametrize("nv,drop,seed", [(None, 0.0, 0), (1500, 0.0, 1),
                                              (None, 0.3, 2)])
    def test_carry_exact(self, nv, drop, seed):
        rng = np.random.default_rng(seed)
        pts, valid = _ring_cloud(rng, 64 * H, H, W, n_valid=nv, dropout=drop)
        assert proj.check_ring_order(pts, valid, H, W, FU, FD)
        img_j, mask_j = jax.jit(lambda p, v: proj.project_batch_ring(
            p[None], v[None], H, W, FU, FD))(jnp.asarray(pts),
                                             jnp.asarray(valid))
        img_n, mask_n = proj.project_scan_np(pts, valid, H, W, FU, FD,
                                             key_layout="index")
        np.testing.assert_array_equal(np.asarray(mask_j)[0], mask_n)
        assert_img_parity(img_j[0], img_n)

    def test_carry_f16_winners_identical(self):
        rng = np.random.default_rng(3)
        pts, valid = _ring_cloud(rng, 64 * H, H, W, dropout=0.05)
        j = jnp.asarray(pts)[None], jnp.asarray(valid)[None]
        exact, m1 = proj.project_batch_ring(*j, H, W, FU, FD)
        f16, m2 = proj.project_batch_ring(*j, H, W, FU, FD,
                                          payload="carry-f16")
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        e, p = np.asarray(exact)[0], np.asarray(f16)[0]
        np.testing.assert_allclose(p[..., :3], e[..., :3], atol=0.05)
        np.testing.assert_allclose(p[..., 4], e[..., 4], atol=0.022)

    def test_all_invalid(self):
        pts = np.ones((2048, 4), np.float32)
        valid = np.zeros(2048, bool)
        img, mask = proj.project_batch_ring(jnp.asarray(pts)[None],
                                            jnp.asarray(valid)[None],
                                            H, W, FU, FD)
        assert float(jnp.abs(img).sum()) == 0.0
        assert float(mask.sum()) == 0.0

    def test_unordered_degrades_gracefully(self):
        # The contract-violating cloud must still produce a well-formed
        # image: every reported pixel's channels belong to SOME real point.
        rng = np.random.default_rng(6)
        pts, valid = _random_cloud(rng, 2048)
        img, mask = proj.project_batch_ring(jnp.asarray(pts)[None],
                                            jnp.asarray(valid)[None],
                                            H, W, FU, FD)
        img, mask = np.asarray(img)[0], np.asarray(mask)[0]
        assert np.isfinite(img).all()
        got = img[mask > 0.5][:, :4]
        pool = {tuple(p) for p in pts}
        assert all(tuple(g) in pool for g in got)

    def test_synthetic_scan_ring_order(self):
        from deeplio_tpu.data.synthetic import (synthetic_scan,
                                                synthetic_trajectory,
                                                synthetic_world)
        world = synthetic_world(20000, seed=9)
        Ts, _ = synthetic_trajectory(2, seed=9)
        pts, valid = synthetic_scan(world, Ts[0], 16384, seed=0, rings=H)
        assert proj.check_ring_order(pts, valid, H, W, FU, FD)


class TestTiledSegScan:
    """_seg_min_scan_tiled must equal the flat scan bit-for-bit."""

    @pytest.mark.parametrize("n,lane", [(4096, 512), (2048, 128), (1024, 1024)])
    def test_matches_flat(self, n, lane):
        from deeplio_tpu.ops.projection import _seg_min_scan, _seg_min_scan_tiled
        rng = np.random.default_rng(7)
        b = 3
        val = jnp.asarray(rng.integers(0, 2**28, size=(b, n)), jnp.int32)
        # sparse + clumpy boundaries, always one at 0
        bound = rng.random((b, n)) < 0.03
        bound[:, 0] = True
        bound = jnp.asarray(bound)
        p1 = jnp.asarray(rng.integers(-2**30, 2**30, size=(b, n)), jnp.int32)
        m0, ps0 = jax.jit(lambda *a: _seg_min_scan(*a))(bound, val, (p1,))
        m1, ps1 = jax.jit(lambda *a: _seg_min_scan_tiled(*a))(bound, val, (p1,))
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
        # 2^28-range random vals make in-segment ties vanishingly rare, so
        # the payload (selected by strict-< like the production keys, which
        # embed a unique index) must match too.
        np.testing.assert_array_equal(np.asarray(ps0[0]), np.asarray(ps1[0]))

    def test_long_segment_spanning_rows(self):
        from deeplio_tpu.ops.projection import _seg_min_scan, _seg_min_scan_tiled
        b, n, lane = 1, 2048, 256
        val = jnp.asarray(np.arange(n, 0, -1, dtype=np.int32)[None])
        bound = np.zeros((b, n), bool)
        bound[:, 0] = True      # ONE segment across all 8 rows
        m0, _ = _seg_min_scan(jnp.asarray(bound), val)
        m1, _ = _seg_min_scan_tiled(jnp.asarray(bound), val, lane=lane)
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))


def test_make_projector_planes_matches_aos():
    """layout="planes" (x/y/z/rem plane tuple — the train-step contract)
    is bit-identical to the AoS projector (CPU takes the stack fallback;
    on TPU the Mosaic planes prologue is exercised by the bench/train
    entry points)."""
    from deeplio_tpu.config.schema import ProjectionConfig

    cfg = ProjectionConfig(height=16, width=128, fov_up_deg=3.0,
                           fov_down_deg=-25.0, max_points=2048,
                           backend="ring", packed=True)
    ch = ["x", "y", "z", "remission", "depth"]
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(2, 3, 2048, 4)).astype(np.float32) * 10
    vld = rng.uniform(size=(2, 3, 2048)) > 0.1
    fa = jax.jit(proj.make_projector(cfg, ch))
    fs = jax.jit(proj.make_projector(cfg, ch, layout="planes"))
    ia, ma = fa(jnp.asarray(pts), jnp.asarray(vld))
    planes = tuple(jnp.asarray(pts[..., k]) for k in range(4))
    is_, ms = fs(planes, jnp.asarray(vld))
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(ia))
    np.testing.assert_array_equal(np.asarray(ms), np.asarray(ma))
