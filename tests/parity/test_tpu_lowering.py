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
