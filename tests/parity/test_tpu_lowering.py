"""TPU cross-platform lowering checks for the Mosaic ring kernel.

``jax.export(..., platforms=["tpu"])`` runs the pallas->Mosaic-MLIR
lowering rules WITHOUT a TPU device, so unsupported-op regressions (e.g.
"Rotate with non-32-bit data", strided lane slices) surface in CPU CI
instead of on the first real-chip run — the exact class of failure that
cannot be caught by interpret-mode parity tests. This does NOT run the
Mosaic backend pass pipeline (apply-vector-layout, VMEM budgeting): those
still need a chip; the driver-protocol A/Bs (benchmarks/r3_measure.sh)
remain the on-chip gate before any route is adopted.
"""

import jax
import jax.numpy as jnp
import pytest
from jax import export

from deeplio_tpu.ops import projection_pallas_ring as ppr

H, W, FU, FD = 16, 128, 3.0, -25.0
N, B = 4096, 4


@pytest.mark.parametrize("packed_route,spb", [
    ("on", 1), ("off", 1),      # the two routing words
    ("on", 2), ("off", 2),      # scans-per-block paths
    ("on", 4),                  # the blitz's widest A/B route
])
def test_ring_kernel_lowers_for_tpu(packed_route, spb):
    def f(pts, valid):
        return ppr.project_batch_ring_pallas(
            pts, valid, H, W, FU, FD,
            packed_route=packed_route, spb=spb)

    pts = jnp.zeros((B, N, 4), jnp.float32)
    valid = jnp.ones((B, N), bool)
    exp = export.export(jax.jit(f), platforms=["tpu"])(pts, valid)
    assert exp.platforms == ("tpu",)


@pytest.mark.parametrize("mode", ["on", "trust", "halves"])
def test_aligned_route_lowers_for_tpu(mode):
    """The slot-aligned direct route is pure XLA, but its cond fallback
    branch CONTAINS the Mosaic kernel — the whole dispatch (predicate +
    both branches) must lower for TPU."""
    # make_projector picks the XLA twin off-TPU; lower the route the TPU
    # dispatch takes by exporting the aligned entry with the pallas
    # fallback directly.
    from deeplio_tpu.ops.projection import project_batch_ring_aligned_planes

    pts = jnp.zeros((B, 2 * H * W, 4), jnp.float32)
    valid = jnp.ones((B, 2 * H * W), bool)

    def f(pts, valid):
        x, y, z, rem = (pts[..., i] for i in range(4))
        if mode == "halves":
            from deeplio_tpu.ops.projection import (
                project_batch_ring_halves_planes)

            return project_batch_ring_halves_planes(
                x, y, z, rem, valid, H, W, FU, FD)
        if mode == "trust":
            return project_batch_ring_aligned_planes(
                x, y, z, rem, valid, H, W, FU, FD, check="assert-off")
        return project_batch_ring_aligned_planes(
            x, y, z, rem, valid, H, W, FU, FD, check="cond",
            fallback=lambda fx, fy, fz, fr, fv: ppr.project_batch_ring_pallas(
                jnp.stack((fx, fy, fz, fr), -1), fv, H, W, FU, FD))

    exp = export.export(jax.jit(f), platforms=["tpu"])(pts, valid)
    assert exp.platforms == ("tpu",)


@pytest.mark.slow
def test_driver_entry_lowers_for_tpu():
    """The driver compile-checks ``__graft_entry__.entry()`` on the real
    chip; this lowers the same program for TPU in CPU CI, so an
    HLO-breaking commit fails here instead of in the graded artifact
    (round-2 lesson: validate contract entry points off-chip too)."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert exp.platforms == ("tpu",)
